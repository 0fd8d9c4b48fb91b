"""Stage-level timing of the window decode on the real chip.

Times each stage independently: bits_q6 (jnp vs pallas), full
decode_window_packed, D2H fetch, host parse. Run: python tools/profile_bench.py
[window_blocks] [loop] — the second form times the realistic per-window loop
(fresh dispatch + fresh D2H + host parse).

Durable findings from the round-2 probe campaign (tools/scratch/*, measured
on the TPU v5 lite rig) that shaped the engine:

- The u8->f32 deinterleave prologue dominated the early kernel; staging the
  raw bytes as little-endian u16 words (I in the low byte, Q high) and
  unpacking inside the kernel removed it — hence the StagedGeometry layout.
- Per-dispatch overhead on the remote-attached transport is ~1 ms, large
  against a ~2 ms window program; batching 8 windows per program via
  lax.scan and fetching ONE packed result buffer amortizes it — hence
  decode_staged_batch.
- D2H latency is per-transfer, not per-byte, at these sizes; packing all
  groups' results into a single u32 buffer beats per-group fetches ~4x.
- Host parse is noise (<3%) once the device-side CRC/RS gate filters
  candidate rows.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, n=6, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    window_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

    sys.path.insert(0, _REPO)
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as fe
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=4096)
    spec = dec.spec
    w = spec.window
    print(f"window={w} samples, halo={spec.halo}, groups={len(spec.groups)}, "
          f"max_hits={spec.max_hits}, gather_hits={spec.gather_hits}",
          file=sys.stderr)

    iq = build_capture(dec.cfg, 1, w, spec.halo)
    iq_dev = jax.device_put(jnp.asarray(iq))
    jax.block_until_ready(iq_dev)
    first = jnp.asarray(False)

    # Stage 1: bits_q6 jnp
    f1 = jax.jit(lambda x, f: fe.bits_q6_jnp(spec, x, f))
    r = f1(iq_dev, first); jax.block_until_ready(r)
    t = timeit(lambda: jax.block_until_ready(f1(iq_dev, first)))
    print(f"bits_q6 jnp:      {t*1e3:8.1f} ms  ({w/t/1e6:.0f} MS/s)", file=sys.stderr)

    # Stage 1b: bits_q6 pallas
    try:
        from rtlamr_tpu.ops.pallas_frontend import bits_q6_pallas
        import dataclasses
        pspec = dataclasses.replace(spec, backend="pallas")
        f2 = jax.jit(lambda x, f: bits_q6_pallas(pspec, x, f))
        r = f2(iq_dev, first); jax.block_until_ready(r)
        t = timeit(lambda: jax.block_until_ready(f2(iq_dev, first)))
        print(f"bits_q6 pallas:   {t*1e3:8.1f} ms  ({w/t/1e6:.0f} MS/s)", file=sys.stderr)
    except Exception as e:
        print(f"bits_q6 pallas FAILED: {e}", file=sys.stderr)

    # Stage 2: search_slice alone (feed it the frontend stage outputs)
    fs_fn = jax.jit(lambda x, f: fe.frontend_stage(spec, x, f))
    bits, q6, mask2d = jax.block_until_ready(fs_fn(iq_dev, first))
    f3 = jax.jit(lambda b, q, m: fe.search_slice(spec, b, q, m))
    r = f3(bits, q6, mask2d); jax.block_until_ready(r)
    t = timeit(lambda: jax.block_until_ready(f3(bits, q6, mask2d)))
    print(f"search_slice:     {t*1e3:8.1f} ms", file=sys.stderr)

    # Full program, device only
    f4 = jax.jit(lambda x, f: fe.pack_results(fe.decode_core(spec, x, f)))
    r = f4(iq_dev, first); jax.block_until_ready(r)
    t = timeit(lambda: jax.block_until_ready(f4(iq_dev, first)))
    print(f"full packed (jnp):{t*1e3:8.1f} ms  ({w/t/1e6:.0f} MS/s)", file=sys.stderr)

    # full program with pallas bits
    try:
        f5 = jax.jit(lambda x, f: fe.pack_results(fe.decode_core(pspec, x, f)))
        r = f5(iq_dev, first); jax.block_until_ready(r)
        t = timeit(lambda: jax.block_until_ready(f5(iq_dev, first)))
        print(f"full packed (pal):{t*1e3:8.1f} ms  ({w/t/1e6:.0f} MS/s)", file=sys.stderr)
    except Exception as e:
        print(f"full pallas FAILED: {e}", file=sys.stderr)

    # D2H fetch cost
    buf = f4(iq_dev, first); jax.block_until_ready(buf)
    print(f"result buffer: {buf.size} bytes", file=sys.stderr)
    t = timeit(lambda: np.asarray(buf))
    print(f"D2H fetch:        {t*1e3:8.1f} ms", file=sys.stderr)

    # Host parse cost
    res = fe.unpack_results(spec, np.asarray(buf))
    t = timeit(lambda: dec._parse_window(res, None, 1))
    print(f"host parse:       {t*1e3:8.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()


def loop_profile(window_blocks=1024):
    """Per-window realistic loop: fresh dispatch + fresh D2H + parse."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    sys.path.insert(0, _REPO)
    from bench import build_capture
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops import frontend as fe
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    dec = WindowDecoder(parsers, window_blocks=window_blocks, max_hits=4096)
    spec = dec.spec
    w = spec.window
    iq = build_capture(dec.cfg, 2, w, spec.halo)
    capture = jax.device_put(jnp.asarray(iq)); jax.block_until_ready(capture)
    halo2 = 2 * spec.halo
    staged = [jax.block_until_ready(jax.lax.dynamic_slice(capture, (2*i*w,), (halo2+2*w,))) for i in range(2)]
    first = jnp.asarray(False)
    f4 = jax.jit(lambda x, f: fe.pack_results(fe.decode_core(spec, x, f)))
    jax.block_until_ready(f4(staged[0], first))

    # dispatch+block only (alternating inputs, no D2H)
    t = timeit(lambda: jax.block_until_ready(f4(staged[0], first)), n=10)
    print(f"dispatch+block:   {t*1e3:8.1f} ms ({w/t/1e6:.0f} MS/s)", file=sys.stderr)

    # dispatch + fresh D2H
    def step():
        buf = f4(staged[0], first)
        return np.asarray(buf)
    t = timeit(step, n=10)
    print(f"dispatch+D2H:     {t*1e3:8.1f} ms ({w/t/1e6:.0f} MS/s)", file=sys.stderr)

    # full step incl parse
    buf0 = np.asarray(f4(staged[0], first))
    res = fe.unpack_results(spec, buf0)
    def full():
        buf = np.asarray(f4(staged[0], first))
        r = fe.unpack_results(spec, buf)
        dec._parse_window(r, None, 1)
    t = timeit(full, n=10)
    print(f"full step:        {t*1e3:8.1f} ms ({w/t/1e6:.0f} MS/s)", file=sys.stderr)

    counts = np.asarray(res["counts"])
    print(f"counts raw/uniq per group: {counts.tolist()}", file=sys.stderr)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "loop":
    loop_profile(int(sys.argv[1]))
