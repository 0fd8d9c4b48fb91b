"""Per-stage decomposition of the decode window program (VERDICT r4 item 1).

Splits one window's wall time into:
  frontend  — the fused Pallas stencil (mag -> cumsum -> Manchester -> R900
              bank -> preamble correlation), bits/q6/mask written to HBM
  search    — search_slice: strided matrices + byte pre-pack, two-level hit
              compaction, packed-row gathers, device CRC/RS gates, dedup
              collapse (the un-fused half, frontend.py:591-736)
  prepack   — just the strided-matrix + byte-pre-pack sub-stage of search
  validate  — search with device_validate on vs off (CRC/RS gate cost)
  fetch     — device->host transfer of the packed result batch
  parse     — host _parse_window on the fetched results
plus the scan-batched full program (the bench.py configuration) and a
paced engine rerun for the same-session yardstick.

All stages run on the SAME staged window batch at the bench configuration
(all-protocol chip 72, window_blocks=1024, max_hits=256, pallas backend).
Writes ROOFLINE.json at the repo root.

Usage: python tools/roofline_bench.py [reps=30] [window_blocks=1024]
(window_blocks is a smoke-test knob; the committed numbers use 1024)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _tiny_fetch(res) -> None:
    """Force completion: fetch 8 bytes of the first leaf. On the axon
    transport jax.block_until_ready is a NO-OP (measured: a 137-GFLOP
    matmul 'completes' in 0.07 ms), so a real D2H read is the only sync."""
    import jax

    leaf = jax.tree_util.tree_leaves(res)[0]
    np.asarray(leaf.reshape(-1)[:8])


def _ms_slope(fn, n_small: int = 4, n_big: int = 16, trials: int = 5) -> float:
    """Marginal ms per invocation: (T(n_big) - T(n_small)) / delta.

    Each T chains n independent dispatches and ends with one tiny fetch
    (in-order execution makes it a barrier); the subtraction cancels the
    transport's fixed sync/round-trip latency exactly.
    """
    r = fn()
    _tiny_fetch(r)  # warm/compile

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn()
        _tiny_fetch(r)
        return (time.perf_counter() - t0) * 1e3

    vals = []
    for _ in range(trials):
        a = run(n_small)
        b = run(n_big)
        vals.append((b - a) / (n_big - n_small))
    return float(np.median(vals))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    window_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import dataclasses

    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import (
        _packed_strided_matrix,
        _strided_matrix,
        decode_core_staged,
        decode_windows_scan,
        frontend_stage_staged,
        pack_results,
        search_slice,
        staged_geometry,
        unpack_results,
    )
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.r900 import PAYLOAD_SYMBOLS

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=256,
                        backend="pallas")
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    n_windows = 8
    iq = build_capture(dec.cfg, n_windows, w, spec.halo)

    full = np.zeros((n_windows - 1) * w + geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    batch = np.stack(
        [full[i * w : i * w + geo.staged_samples] for i in range(n_windows)]
    )
    batch_dev = jax.device_put(jnp.asarray(batch))
    _tiny_fetch(batch_dev)
    win0 = batch_dev[0]
    false_ = jnp.asarray(False)
    falses = jnp.zeros(n_windows, bool)

    out = {"config": {
        "window_blocks": window_blocks, "window_samples": w,
        "n_windows": n_windows,
        "backend": "pallas", "max_hits": spec.max_hits,
        "gather_hits": spec.gather_hits, "reps": reps,
    }}

    def report(name, ms_per_window, note=""):
        out[name] = {
            "ms_per_window": round(ms_per_window, 3),
            "ms_per_msample": round(ms_per_window / (w / 1e6), 4),
            "note": note,
        }
        print(f"{name:>22}: {ms_per_window:8.3f} ms/window  {note}",
              file=sys.stderr)

    # --- full scan-batched program (bench configuration), device only.
    scan_fn = lambda: decode_windows_scan(spec, batch_dev, falses)
    ms = _ms_slope(scan_fn)
    report("full_scan_device", ms / n_windows,
           "decode_windows_scan(8)/8, no fetch")
    packed_batch = scan_fn()
    _tiny_fetch(packed_batch)

    # --- single-window full program (dispatch granularity cost).
    one = jax.jit(lambda s, f: pack_results(decode_core_staged(spec, s, f)),
                  static_argnums=())
    ms = _ms_slope(lambda: one(win0, false_))
    report("full_single_device", ms, "one window per dispatch")

    # --- frontend stencil only.
    fe = jax.jit(functools.partial(frontend_stage_staged, spec))
    ms = _ms_slope(lambda: fe(win0, false_))
    report("frontend_device", ms, "Pallas stencil: bits+q6+mask to HBM")

    # --- search_slice only (over precomputed frontend outputs).
    bits, q6, mask2d = fe(win0, false_)
    _tiny_fetch(bits)
    ss = jax.jit(lambda b, q, m: pack_results(search_slice(spec, b, q, m)))
    ms = _ms_slope(lambda: ss(bits, q6, mask2d))
    report("search_device", ms, "compaction+gather+validate+pack")

    # --- pre-pack sub-stage (strided matrices + byte pre-pack).
    max_bytes = max((g.packet_symbols + 7) >> 3 for g in spec.groups)
    pp = jax.jit(lambda b, q: (
        _packed_strided_matrix(b, spec.symbol_length, max_bytes),
        _strided_matrix(q, 4 * spec.chip_length, PAYLOAD_SYMBOLS),
    ))
    ms = _ms_slope(lambda: pp(bits, q6))
    report("prepack_device", ms, "strided transposes + byte pre-pack")

    # --- device validate cost (same search program, gates off).
    spec_nv = dataclasses.replace(spec, device_validate=False)
    ss_nv = jax.jit(
        lambda b, q, m: pack_results(search_slice(spec_nv, b, q, m))
    )
    ms = _ms_slope(lambda: ss_nv(bits, q6, mask2d))
    report("search_no_validate", ms, "search_slice w/o CRC/RS gates")

    # --- jnp (non-Pallas) frontend for contrast.
    spec_jnp = dataclasses.replace(spec, backend="jnp")
    fe_jnp = jax.jit(functools.partial(frontend_stage_staged, spec_jnp))
    ms = _ms_slope(lambda: fe_jnp(win0, false_))
    report("frontend_jnp_device", ms, "plain-XLA frontend for contrast")

    # --- fetch: device->host of the packed result batch.
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(packed_batch)
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(ts))
    report("fetch_host", ms / n_windows, "packed result batch D2H / 8")

    # --- host parse of the fetched batch.
    host = np.asarray(packed_batch)
    # Occupancy diagnostics: raw plateau hits and unique candidates per
    # group per window, vs the static capacities the program pays for.
    raw = np.stack(
        [unpack_results(spec, host[i])["counts"] for i in range(n_windows)]
    )  # (K, G, 2)
    out["occupancy"] = {
        "raw_hits_per_group_max": raw[:, :, 0].max(axis=0).tolist(),
        "unique_candidates_per_group_max": raw[:, :, 1].max(axis=0).tolist(),
        "gather_hits_capacity": spec.gather_hits,
        "gather_rows_capacity": spec.gather_rows,
    }
    print("occupancy:", out["occupancy"], file=sys.stderr)
    def parse_all():
        dec.reset()
        dec._first = False
        n = 0
        for i in range(n_windows):
            res = unpack_results(spec, host[i])
            n += len(dec._parse_window(res, None, dec._window_index))
            dec._window_index += 1
        return n
    msgs = parse_all()
    t0 = time.perf_counter()
    for _ in range(max(reps // 3, 5)):
        parse_all()
    ms = (time.perf_counter() - t0) * 1e3 / max(reps // 3, 5)
    report("parse_host", ms / n_windows, f"{msgs // n_windows} msgs/window")

    # --- paced engine rerun (same session) for the yardstick.
    dec.reset()
    dec._first = False
    dec.decode_staged_batch(batch_dev)  # warm the pipeline
    dec.reset()
    dec._first = False
    n_iter = 0
    start = time.perf_counter()
    while time.perf_counter() - start < 10.0 or n_iter < 32:
        dec.decode_staged_batch(batch_dev, drain=False)
        n_iter += n_windows
    dec.drain()
    elapsed = time.perf_counter() - start
    rate = n_iter * w / elapsed
    out["engine_same_session"] = {
        "samples_per_s": round(rate, 1),
        "ms_per_window": round(elapsed / n_iter * 1e3, 3),
    }
    print(f"engine (same session): {rate / 1e6:.1f} MS/s", file=sys.stderr)

    with open(os.path.join(_REPO, "ROOFLINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": True, "engine_MSps": round(rate / 1e6, 1)}))


if __name__ == "__main__":
    main()
