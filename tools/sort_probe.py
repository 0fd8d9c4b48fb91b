"""Micro-probes for the search_slice compaction redesign.

1. lax.sort i32 cost vs length (the compaction primitive's scaling).
2. Row occupancy of the bench capture (how many 128-sample mask rows
   actually contain hits, vs the gather_rows capacity).
3. Full-program timing + parity at the NEW spec defaults (gather_hits
   2048 floor, gather_rows 256 floor) vs the old capacities.
4. Engine rerun at the new defaults.

Usage: python tools/sort_probe.py
Appends results into SEARCH_TUNING.json.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

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
        decode_core_staged,
        frontend_stage_staged,
        pack_results,
        staged_geometry,
        unpack_results,
    )
    from rtlamr_tpu.protocols import new_parser

    out = {}

    # --- 1. sort scaling.
    rng = np.random.default_rng(0)
    sort_ms = {}
    for n in (8192, 32768, 65536, 131072):
        x = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        )
        _tiny_fetch(x)
        f = jax.jit(jax.lax.sort)
        ms = _ms_slope(lambda: f(x))
        sort_ms[n] = round(ms, 4)
        print(f"lax.sort({n}): {ms:.4f} ms", file=sys.stderr)
    out["sort_ms_by_n"] = sort_ms

    # --- build the bench batch.
    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
                        backend="pallas")
    spec = dec.spec  # NEW defaults (2048h/256r)
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

    # --- 2. row occupancy.
    fe = jax.jit(functools.partial(frontend_stage_staged, spec))
    rows_probe = jax.jit(
        lambda s, f: jnp.sum(
            jnp.any(frontend_stage_staged(spec, s, f)[2] != 0, axis=1),
            dtype=jnp.int32,
        )
    )
    n_rows = [int(np.asarray(rows_probe(batch_dev[i], false_)))
              for i in range(n_windows)]
    out["hit_rows_per_window"] = n_rows
    out["gather_rows_capacity_new"] = spec.gather_rows
    print("hit rows per window:", n_rows,
          f"(capacity {spec.gather_rows})", file=sys.stderr)

    # --- 3. program timing + parity old vs new capacities.
    spec_old = dataclasses.replace(spec, gather_hits=4096, gather_rows=512)

    def program(sp):
        return jax.jit(
            lambda s, f: pack_results(decode_core_staged(sp, s, f))
        )

    fn_old, fn_new = program(spec_old), program(spec)
    ms_old = _ms_slope(lambda: fn_old(win0, false_))
    ms_new = _ms_slope(lambda: fn_new(win0, false_))
    print(f"full program old caps: {ms_old:.3f} ms, new caps: {ms_new:.3f} ms",
          file=sys.stderr)
    parity = True
    overflow = False
    for i in range(n_windows):
        ro = unpack_results(spec_old, np.asarray(fn_old(batch_dev[i], false_)))
        rn = unpack_results(spec, np.asarray(fn_new(batch_dev[i], false_)))
        co, cn = np.asarray(ro["counts"]), np.asarray(rn["counts"])
        if (cn[:, 0] > spec.gather_hits).any():
            overflow = True
        if not (co[:, 1] == cn[:, 1]).all():
            parity = False
            continue
        for g in range(len(spec.groups)):
            n_u = int(co[g, 1])
            if not (ro["idx"][g][:n_u] == rn["idx"][g][:n_u]).all():
                parity = False
            if not (ro["bytes"][g][:n_u] == rn["bytes"][g][:n_u]).all():
                parity = False
    out["new_defaults"] = {
        "gather_hits": spec.gather_hits,
        "gather_rows": spec.gather_rows,
        "ms_old_caps": round(ms_old, 3),
        "ms_new_caps": round(ms_new, 3),
        "parity": parity,
        "overflowed": overflow,
    }
    print(out["new_defaults"], file=sys.stderr)

    # --- 4. engine rerun at the new defaults.
    dec.reset()
    dec._first = False
    dec.decode_staged_batch(batch_dev)
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
    out["engine_new_defaults_MSps"] = round(rate / 1e6, 1)
    print(f"engine (new defaults): {rate / 1e6:.1f} MS/s", file=sys.stderr)

    path = os.path.join(_REPO, "SEARCH_TUNING.json")
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev["probe2"] = out
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps({"ok": True, "engine_MSps": out["engine_new_defaults_MSps"]}))


if __name__ == "__main__":
    main()
