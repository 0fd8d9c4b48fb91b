"""Bisect device-side stage costs with forced execution (1-byte D2H)."""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

import os

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def force(x):
    import jax
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0].ravel()[0:1])


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    window_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    max_hits = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as fe
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=max_hits)
    spec = dec.spec
    pspec = dataclasses.replace(spec, backend="pallas")
    w = spec.window
    print(
        f"window={w} max_hits={spec.max_hits} gather={spec.gather_hits} "
        f"rows={spec.gather_rows}",
        file=sys.stderr,
    )
    iq = build_capture(dec.cfg, 1, w, spec.halo)
    x = jax.device_put(jnp.asarray(iq))
    jax.block_until_ready(x)
    first = jnp.asarray(False)

    def report(name, f):
        try:
            jf = jax.jit(f)
            force(jf(x, first))
            t = timeit(lambda: force(jf(x, first)))
            print(f"{name:26s} {t*1e3:9.1f} ms   ({w/t/1e6:8.0f} MS/s)", file=sys.stderr)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)

    report("stage1 jnp", lambda a, f: fe.frontend_stage(spec, a, f))
    report("stage1 pallas", lambda a, f: fe.frontend_stage(pspec, a, f))
    report("full jnp", lambda a, f: fe.pack_results(fe.decode_core(spec, a, f)))
    report("full pallas", lambda a, f: fe.pack_results(fe.decode_core(pspec, a, f)))

    # search_slice alone on pallas-produced streams
    st = jax.jit(lambda a, f: fe.frontend_stage(pspec, a, f))
    bits, q6, mask = st(x, first)
    jax.block_until_ready((bits, q6, mask))
    ss = jax.jit(lambda b, q, m: fe.search_slice(spec, b, q, m))
    try:
        force(ss(bits, q6, mask))
        t = timeit(lambda: force(ss(bits, q6, mask)))
        print(f"{'search_slice':26s} {t*1e3:9.1f} ms", file=sys.stderr)
    except Exception as e:
        print(f"search_slice FAILED: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
