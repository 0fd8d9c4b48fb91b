"""Probe: per-group PRE-COLLAPSE survivor counts (pre_keep) at the bench
density, to size FrontendSpec.slice_hits. Mirrors search_slice's pre-collapse
stage exactly, reporting counts instead of compacting."""

import functools
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as F
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.r900 import PAYLOAD_SYMBOLS

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
                        backend="pallas")
    spec = dec.spec
    geo = F.staged_geometry(spec)
    w = spec.window
    n_windows = 8
    iq = build_capture(dec.cfg, n_windows, w, spec.halo)
    full = np.zeros((n_windows - 1) * w + geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16

    sl = spec.symbol_length
    cl = spec.chip_length
    max_bytes = max((g.packet_symbols + 7) >> 3 for g in spec.groups)

    @jax.jit
    def pre_counts(staged):
        bits, q6, mask2d = F.frontend_stage_staged(
            spec, staged, jnp.asarray(False)
        )
        bit_mat = F._strided_matrix(bits, sl, 8 * max_bytes + 8)
        q6_mat = F._strided_matrix(q6, 4 * cl, PAYLOAD_SYMBOLS)
        bits_edge = F._edge_index(bit_mat)
        q6_edge = F._edge_index(q6_mat)
        k_gather = spec.gather_hits
        rm = w // 128
        row_any = jnp.any(mask2d != 0, axis=1)
        rows_idx = F._compact_true_positions(row_any, spec.gather_rows, rm)
        row_valid = rows_idx < rm
        safe_rows = jnp.where(row_valid, rows_idx, 0).astype(jnp.int32)
        sub = jnp.take(mask2d, safe_rows, axis=0)
        sub = jnp.where(row_valid[:, None], sub, jnp.uint8(0))
        flat_sub = sub.reshape(-1)
        flat_pos = (
            safe_rows[:, None] * 128
            + jnp.arange(128, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        k_any = min(len(spec.groups) * k_gather, spec.gather_rows * 128)
        any_hits = F._compact_true_positions(
            flat_sub != 0, k_any, flat_pos.shape[0]
        )
        any_valid = any_hits < flat_pos.shape[0]
        safe_any = jnp.where(any_valid, any_hits, 0)
        any_idx = jnp.where(
            any_valid, jnp.take(flat_pos, safe_any), w
        ).astype(jnp.int32)
        any_mask = jnp.where(
            any_valid, jnp.take(flat_sub, safe_any), jnp.uint8(0)
        )
        out = []
        for g, group in enumerate(spec.groups):
            gsel = (any_mask >> g) & 1
            ghits = F._compact_true_positions(gsel != 0, k_gather, k_any)
            gvalid = ghits < k_any
            safe_g = jnp.where(gvalid, ghits, 0)
            hit_idx = jnp.where(
                gvalid, jnp.take(any_idx, safe_g), w
            ).astype(jnp.int32)
            valid = jnp.logical_and(gvalid, hit_idx < w)
            s_g = group.packet_symbols
            prev_q = jnp.maximum(hit_idx - 1, 0)
            if group.wants_r900:
                eq = F._no_edge_in_span(
                    q6_edge, prev_q + (spec.preamble_length - sl),
                    4 * cl, PAYLOAD_SYMBOLS,
                )
            else:
                eq = F._no_edge_in_span(bits_edge, prev_q, sl, s_g)
            adj = jnp.concatenate(
                [jnp.zeros(1, jnp.bool_), hit_idx[1:] == hit_idx[:-1] + 1]
            )
            sameblk = jnp.concatenate(
                [
                    jnp.zeros(1, jnp.bool_),
                    hit_idx[1:] // spec.block_size
                    == hit_idx[:-1] // spec.block_size,
                ]
            )
            pre_keep = jnp.logical_and(
                valid, jnp.logical_not(adj & sameblk & eq)
            )
            out.append(jnp.sum(pre_keep, dtype=jnp.int32))
        return jnp.stack(out)

    counts = []
    for i in range(n_windows):
        st = jnp.asarray(full[i * w : i * w + geo.staged_samples])
        counts.append(np.asarray(pre_counts(st)))
    counts = np.stack(counts)
    print("pre_keep per group per window:")
    print(counts)
    print("max per group:", counts.max(axis=0))


if __name__ == "__main__":
    main()
