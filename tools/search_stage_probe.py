"""Fine decomposition of search_slice's 4.35 ms (round-5 guidance).

Times isolated jits mirroring each sub-stage of ops/frontend.search_slice
at the bench shape: level-1/2 compaction, the strided/packed matrix
builds, the per-group slicing gathers, the validate gates, and the final
dedup+compact+pack. Sub-stage sums won't equal the fused total (XLA fuses
across them); the point is the relative ranking.

Usage: python tools/search_stage_probe.py
Writes SEARCH_STAGES.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools.roofline_bench import _ms_slope, _tiny_fetch  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import (
        _compact_true_positions,
        _packed_rows_from,
        _packed_strided_matrix,
        _strided_matrix,
        _strided_rows_from,
        frontend_stage_staged,
        staged_geometry,
    )
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.r900 import PAYLOAD_SYMBOLS

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
                        backend="pallas")
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    iq = build_capture(dec.cfg, 1, w, spec.halo)
    staged = np.zeros(geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    staged[spec.pad_shift : spec.pad_shift + u16.size] = u16
    st = jax.device_put(jnp.asarray(staged))
    _tiny_fetch(st)

    fe = jax.jit(functools.partial(frontend_stage_staged, spec))
    bits, q6, mask2d = fe(st, jnp.asarray(False))
    _tiny_fetch(bits)

    out = {}

    def rep(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:>22}: {ms:8.3f} ms", file=sys.stderr)

    sl = spec.symbol_length
    cl = spec.chip_length
    k_gather = spec.gather_hits
    n_rows_cap = spec.gather_rows
    rm = w // 128
    k_any = min(len(spec.groups) * k_gather, n_rows_cap * 128)

    # Level 1+2 compaction: rows -> flat -> any positions.
    @jax.jit
    def compaction(m2d):
        row_any = jnp.any(m2d != 0, axis=1)
        rows_idx = _compact_true_positions(row_any, n_rows_cap, rm)
        row_valid = rows_idx < rm
        safe_rows = jnp.where(row_valid, rows_idx, 0).astype(jnp.int32)
        sub = jnp.take(m2d, safe_rows, axis=0)
        sub = jnp.where(row_valid[:, None], sub, jnp.uint8(0))
        flat_sub = sub.reshape(-1)
        any_hits = _compact_true_positions(flat_sub != 0, k_any, flat_sub.shape[0])
        return any_hits

    rep("compaction_l1l2", _ms_slope(lambda: compaction(mask2d)))

    # Per-group membership compaction (4x sort over k_any).
    any_hits = compaction(mask2d)
    _tiny_fetch(any_hits)
    gsel = (any_hits % 7 == 0)  # stand-in membership mask, same shapes

    @jax.jit
    def group_compaction(sel):
        outs = []
        for g in range(4):
            outs.append(_compact_true_positions(sel, k_gather, k_any))
        return jnp.stack(outs)

    rep("group_compaction_x4", _ms_slope(lambda: group_compaction(gsel)))

    # Strided matrices + byte pre-pack (known ~0.45).
    max_bytes = max((g.packet_symbols + 7) >> 3 for g in spec.groups)
    pp = jax.jit(lambda b, q: (
        _packed_strided_matrix(b, sl, max_bytes),
        _strided_matrix(q, 4 * cl, PAYLOAD_SYMBOLS),
    ))
    rep("prepack", _ms_slope(lambda: pp(bits, q6)))
    pack_mat, q6_mat = pp(bits, q6)
    _tiny_fetch(pack_mat)

    # Slicing gathers at the static capacities (fixed indices).
    idxs = jnp.arange(k_gather, dtype=jnp.int32) * 17 % w

    @jax.jit
    def gathers(pm, qm, idx):
        outs = []
        for g, group in enumerate(spec.groups):
            nbytes = (group.packet_symbols + 7) >> 3
            outs.append(_packed_rows_from(pm, idx, sl, nbytes))
            if group.wants_r900:
                outs.append(
                    _strided_rows_from(
                        qm, idx + spec.preamble_length - sl, 4 * cl,
                        PAYLOAD_SYMBOLS,
                    )
                )
        return outs

    rep("slicing_gathers", _ms_slope(lambda: gathers(pack_mat, q6_mat, idxs)))

    with open(os.path.join(_REPO, "SEARCH_STAGES.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
