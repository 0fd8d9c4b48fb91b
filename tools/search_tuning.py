"""Capacity tuning probe for search_slice (roofline follow-up).

The compaction sort sizes and slicing gather volumes are proportional to
the STATIC capacities gather_rows (level-1 row compaction) and gather_hits
(per-group candidate slots), not to actual occupancy. This probe measures
the real occupancy of the bench capture, then times the full window
program at reduced capacities and checks result parity window-by-window.

Usage: python tools/search_tuning.py
Prints one JSON line; detailed table on stderr.
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
        pack_results,
        staged_geometry,
        unpack_results,
    )
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=1024, max_hits=256,
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

    def program(spec_v):
        return jax.jit(
            lambda s, f: pack_results(decode_core_staged(spec_v, s, f))
        )

    def run_all(spec_v):
        fn = program(spec_v)
        outs = [np.asarray(fn(batch_dev[i], false_)) for i in range(n_windows)]
        return outs

    base_out = run_all(spec)
    base_res = [unpack_results(spec, o) for o in base_out]
    raw = np.stack([r["counts"] for r in base_res])
    occ = {
        "raw_hits_per_group_max": raw[:, :, 0].max(axis=0).tolist(),
        "unique_per_group_max": raw[:, :, 1].max(axis=0).tolist(),
    }
    print("occupancy:", occ, file=sys.stderr)

    variants = [
        ("base_1024r_4096h", spec.gather_rows, spec.gather_hits),
        ("512r_2048h", 512, 2048),
        ("256r_1024h", 256, 1024),
        ("128r_512h", 128, 512),
    ]
    results = {"occupancy": occ, "variants": []}
    for name, rows, hits in variants:
        spec_v = dataclasses.replace(
            spec, gather_rows=rows, gather_hits=hits
        )
        fn = program(spec_v)
        ms = _ms_slope(lambda: fn(win0, false_))
        # Parity: same unique candidates and indices on every window.
        outs = [np.asarray(fn(batch_dev[i], false_)) for i in range(n_windows)]
        ok = True
        overflow = False
        for i, o in enumerate(outs):
            rv = unpack_results(spec_v, o)
            rb = base_res[i]
            cv, cb = np.asarray(rv["counts"]), np.asarray(rb["counts"])
            if (cv[:, 0] > spec_v.gather_hits).any():
                overflow = True
            if not (cv[:, 1] == cb[:, 1]).all():
                ok = False
                continue
            for g in range(len(spec.groups)):
                n_u = int(cb[g, 1])
                if not (rv["idx"][g][:n_u] == rb["idx"][g][:n_u]).all():
                    ok = False
                if not (rv["bytes"][g][:n_u] == rb["bytes"][g][:n_u]).all():
                    ok = False
        row = {
            "variant": name,
            "gather_rows": rows,
            "gather_hits": hits,
            "ms_per_window": round(ms, 3),
            "parity": ok,
            "overflowed": overflow,
        }
        results["variants"].append(row)
        print(row, file=sys.stderr)

    with open(os.path.join(_REPO, "SEARCH_TUNING.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
