"""Second-stage probes: DMA bandwidth, per-call overhead, dtype penalties."""

from __future__ import annotations

import sys
import time

import numpy as np

import os

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LANES = 128


def timeit(fn, n=10, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def report(name, t, nbytes):
    print(f"{name:36s} {t*1e3:9.3f} ms  ({nbytes / t / 1e9:8.1f} GB/s)", file=sys.stderr)


def copy_kernel_factory(r_out, r_in, dtype):
    def kernel(x_hbm, out_ref, x_vmem, sems):
        t = pl.program_id(0)
        c = pltpu.make_async_copy(x_hbm.at[pl.ds(t * r_out, r_in)], x_vmem, sems.at[0])
        c.start(); c.wait()
        out_ref[:] = x_vmem[:r_out]

    return kernel


def run_copy(x2d, r_out, r_in, n_tiles, dtype):
    kernel = copy_kernel_factory(r_out, r_in, dtype)

    @jax.jit
    def run(x2d):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n_tiles * r_out, LANES), dtype)],
            scratch_shapes=[
                pltpu.VMEM((r_in, LANES), dtype),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x2d)

    return run


def main():
    rng = np.random.default_rng(0)

    # A. pure DMA copy bandwidth at various sizes/dtypes
    for dtype, rows in ((jnp.uint8, 65536), (jnp.int32, 16384), (jnp.int32, 65536)):
        nbytes = rows * LANES * np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype).itemsize
        x = jax.block_until_ready(
            jnp.zeros((rows + 64, LANES), dtype)
        )
        for r_out in (2048, 8192):
            if r_out > rows:
                continue
            n_tiles = rows // r_out
            run = run_copy(x, r_out, r_out + 64, n_tiles, dtype)
            t = timeit(lambda: run(x))
            report(f"copy {np.dtype(x.dtype).name} rows={rows} r_out={r_out}", t, 2 * rows * LANES * x.dtype.itemsize)

    # B. per-call overhead: tiny kernel
    x_small = jax.block_until_ready(jnp.zeros((256 + 64, LANES), jnp.uint8))
    run = run_copy(x_small, 256, 256 + 64, 1, jnp.uint8)
    t = timeit(lambda: run(x_small), n=30)
    report("copy tiny (1 tile, 32KB)", t, 2 * 256 * LANES)

    # C. elementwise int32 compute in kernel (square) over 32MB
    rows = 65536
    x32 = jax.block_until_ready(jnp.ones((rows + 64, LANES), jnp.int32))

    def sq_kernel(x_hbm, out_ref, x_vmem, sems):
        t = pl.program_id(0)
        r_out = 8192
        c = pltpu.make_async_copy(x_hbm.at[pl.ds(t * r_out, r_out + 64)], x_vmem, sems.at[0])
        c.start(); c.wait()
        v = x_vmem[:r_out]
        out_ref[:] = v * v + v

    @jax.jit
    def run_sq(x):
        return pl.pallas_call(
            sq_kernel,
            grid=(rows // 8192,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((8192, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
            scratch_shapes=[
                pltpu.VMEM((8192 + 64, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x)

    t = timeit(lambda: run_sq(x32))
    report("int32 square 32MB", t, 2 * rows * LANES * 4)

    # D. u16 -> mag int32 but smaller window (1 MS) to test scaling
    for n_samp in (1 << 20, 1 << 23):
        rows = n_samp // LANES
        x = jax.block_until_ready(jnp.zeros((rows + 64, LANES), jnp.uint16))
        r_out = min(8192, rows)

        def mag_kernel(x_hbm, out_ref, x_vmem, sems, _r=r_out):
            t = pl.program_id(0)
            c = pltpu.make_async_copy(x_hbm.at[pl.ds(t * _r, _r + 64)], x_vmem, sems.at[0])
            c.start(); c.wait()
            v = x_vmem[:_r].astype(jnp.int32)
            di = 255 - 2 * (v & 255)
            dq = 255 - 2 * (v >> 8)
            mag = di * di + dq * dq
            out_ref[:] = (mag & 1).astype(jnp.uint8)

        @jax.jit
        def run_mag(x, _rows=rows, _r=r_out, _k=mag_kernel):
            return pl.pallas_call(
                _k,
                grid=(_rows // _r,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((_r, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)],
                out_shape=[jax.ShapeDtypeStruct((_rows, LANES), jnp.uint8)],
                scratch_shapes=[
                    pltpu.VMEM((_r + 64, LANES), jnp.uint16),
                    pltpu.SemaphoreType.DMA((1,)),
                ],
            )(x)

        t = timeit(lambda: run_mag(x))
        report(f"mag u16 n={n_samp>>20}MS", t, rows * LANES * 3)

    # E. mag but keep int32 output (4x write traffic)
    rows = (1 << 23) // LANES

    x = jax.block_until_ready(jnp.zeros((rows + 64, LANES), jnp.uint16))

    def mag32_kernel(x_hbm, out_ref, x_vmem, sems):
        t = pl.program_id(0)
        c = pltpu.make_async_copy(x_hbm.at[pl.ds(t * 8192, 8192 + 64)], x_vmem, sems.at[0])
        c.start(); c.wait()
        v = x_vmem[:8192].astype(jnp.int32)
        di = 255 - 2 * (v & 255)
        dq = 255 - 2 * (v >> 8)
        out_ref[:] = di * di + dq * dq

    @jax.jit
    def run_mag32(x):
        return pl.pallas_call(
            mag32_kernel,
            grid=(rows // 8192,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((8192, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
            scratch_shapes=[
                pltpu.VMEM((8192 + 64, LANES), jnp.uint16),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x)

    t = timeit(lambda: run_mag32(x))
    report("mag u16->int32 out 8MS", t, rows * LANES * 6)

    # F. XLA concatenate-pad cost on 16MB u8
    iq = jax.block_until_ready(jnp.zeros(2 * (1 << 23), jnp.uint8))

    @jax.jit
    def pad(iq):
        return jnp.concatenate([iq, jnp.zeros(16384, jnp.uint8)])

    t = timeit(lambda: pad(iq))
    report("XLA concat-pad 16MB u8", t, 2 * iq.size)

    # G. XLA nonzero-style ops used by search_slice, full window scale
    w = 1 << 23
    mask2d = jax.block_until_ready(jnp.zeros((w // 128, 128), jnp.uint8))

    @jax.jit
    def rowany(m):
        row_any = jnp.any(m != 0, axis=1)
        (rows_idx,) = jnp.nonzero(row_any, size=1024, fill_value=m.shape[0])
        return rows_idx

    t = timeit(lambda: rowany(mask2d))
    report("search level-1 rowany+nonzero", t, mask2d.size)

    @jax.jit
    def persum(m):
        return jnp.stack([jnp.sum((m >> g) & 1, dtype=jnp.int32) for g in range(4)])

    t = timeit(lambda: persum(mask2d))
    report("search per-group sums x4", t, 4 * mask2d.size)


if __name__ == "__main__":
    main()
