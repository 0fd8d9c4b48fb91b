"""Time each phase of the real decode loop: dispatch, D2H, unpack, parse."""

from __future__ import annotations

import sys
import time

import numpy as np

import os

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    window_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as fe
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=4096)
    spec = dec.spec
    w = spec.window
    halo2 = 2 * spec.halo
    iq = build_capture(dec.cfg, 2, w, spec.halo)
    cap = jax.device_put(jnp.asarray(iq))
    jax.block_until_ready(cap)
    staged = [
        jax.block_until_ready(
            jax.lax.dynamic_slice(cap, (2 * i * w,), (halo2 + 2 * w,))
        )
        for i in range(2)
    ]
    first = jnp.asarray(False)
    f = lambda x: fe.decode_window_packed(spec, x, first)
    np.asarray(f(staged[0]))  # warm

    n = 10
    td = tb = tf = tu = tp = 0.0
    for i in range(n):
        x = staged[i % 2]
        t0 = time.perf_counter()
        buf = f(x)
        t1 = time.perf_counter()
        jax.block_until_ready(buf)
        t2 = time.perf_counter()
        host = np.asarray(buf)
        t3 = time.perf_counter()
        res = fe.unpack_results(spec, host)
        t4 = time.perf_counter()
        dec._parse_window(res, None, i)
        t5 = time.perf_counter()
        td += t1 - t0
        tb += t2 - t1
        tf += t3 - t2
        tu += t4 - t3
        tp += t5 - t4
    for name, t in [
        ("dispatch", td),
        ("block_until_ready", tb),
        ("D2H np.asarray", tf),
        ("unpack", tu),
        ("parse", tp),
    ]:
        print(f"{name:18s} {t / n * 1e3:8.1f} ms")
    total = (td + tb + tf + tu + tp) / n
    print(f"{'total':18s} {total * 1e3:8.1f} ms  ({w / total / 1e6:.1f} MS/s)")


if __name__ == "__main__":
    main()
