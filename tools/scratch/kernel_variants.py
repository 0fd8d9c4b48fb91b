"""Time cut-down variants of the Pallas kernel to find the cost driver."""

from __future__ import annotations

import functools
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

from rtlamr_tpu.ops import pallas_frontend as pf
from rtlamr_tpu.ops.frontend import make_frontend_spec
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.protocols.base import build_decoder_config

LANES = 128


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0].ravel()[0:1])


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def run_variant(name, spec, stages, w):
    sl = spec.symbol_length
    lp = w + spec.packet_length - sl

    tile = min(1 << 16, -(-lp // (8 * LANES)) * 8 * LANES)
    n_tiles = -(-lp // tile)
    r_out = tile // LANES
    max_pre = max(len(g.bits) for g in spec.groups)
    pre_reach = (max_pre - 1) * sl
    m_extra = -(-(pre_reach + 3 * sl) // (8 * LANES)) * 8 * LANES + 2 * 8 * LANES
    r_in = r_out + m_extra // LANES
    r_bits = r_out + -(-pre_reach // LANES) + 1

    def kernel(first_ref, i_hbm, q_hbm, out_ref, i_vmem, q_vmem, sems):
        cl = spec.chip_length
        t = pl.program_id(0)
        copy_i = pltpu.make_async_copy(i_hbm.at[pl.ds(t * r_out, r_in)], i_vmem, sems.at[0])
        copy_q = pltpu.make_async_copy(q_hbm.at[pl.ds(t * r_out, r_in)], q_vmem, sems.at[1])
        copy_i.start(); copy_q.start(); copy_i.wait(); copy_q.wait()
        di = 255 - 2 * i_vmem[:].astype(jnp.int32)
        dq = 255 - 2 * q_vmem[:].astype(jnp.int32)
        mag = di * di + dq * dq
        if "mag" == stages:
            out_ref[:] = (mag[:r_out] & 1).astype(jnp.uint8); return
        cs = pf._flat_cumsum(mag)
        if "cumsum" == stages:
            out_ref[:] = (cs[:r_out] & 1).astype(jnp.uint8); return
        ex = cs - mag
        f = 2 * pf._shifted(ex, cl, r_bits) - pf._shifted(ex, 0, r_bits) - pf._shifted(ex, sl, r_bits)
        bits_ext = (f >= 0).astype(jnp.uint8)
        if "bits" == stages:
            out_ref[:] = bits_ext[:r_out]; return
        if "corr" == stages:
            bits32 = bits_ext.astype(jnp.int32)
            mask = jnp.zeros((r_out, LANES), jnp.int32)
            for g, group in enumerate(spec.groups):
                acc = jnp.ones((r_out, LANES), jnp.bool_)
                for k, bit in enumerate(group.bits):
                    seg = pf._shifted(bits32, k * sl, r_out)
                    acc = jnp.logical_and(acc, seg == bit)
                mask = mask | jnp.where(acc, jnp.int32(1 << g), 0)
            out_ref[:] = mask.astype(jnp.uint8); return
        if "corr_shared" == stages:
            bits32 = bits_ext.astype(jnp.int32)
            segs = [pf._shifted(bits32, k * sl, r_out) for k in range(max_pre)]
            mask = jnp.zeros((r_out, LANES), jnp.int32)
            for g, group in enumerate(spec.groups):
                acc = jnp.ones((r_out, LANES), jnp.bool_)
                for k, bit in enumerate(group.bits):
                    acc = jnp.logical_and(acc, segs[k] == bit)
                mask = mask | jnp.where(acc, jnp.int32(1 << g), 0)
            out_ref[:] = mask.astype(jnp.uint8); return
        if "r900" == stages:
            def e(k):
                return pf._shifted(ex, k, r_out)
            c0, c1, c2, c3, c4 = (e(sl + i * cl) for i in range(5))
            a0 = 2 * c2 - c4 - c0
            a1 = 2 * c1 - 2 * c2 + 2 * c3 - c4 - c0
            a2 = 2 * c1 - 2 * c3 + c4 - c0
            m0, m1, m2 = jnp.abs(a0), jnp.abs(a1), jnp.abs(a2)
            arg = jnp.where(m1 > m0, 1, 0)
            best = jnp.maximum(m0, m1)
            arg = jnp.where(m2 > best, 2, arg)
            chosen = jnp.where(arg == 0, a0, jnp.where(arg == 1, a1, a2))
            out_ref[:] = (arg + jnp.where(chosen > 0, 3, 0)).astype(jnp.uint8)
            return
        raise ValueError(stages)

    @jax.jit
    def run(iq, first):
        need = n_tiles * tile + m_extra
        i_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[0::2])
        q_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[1::2])
        first_arr = jnp.asarray(first, jnp.int32).reshape(1, 1)
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n_tiles * r_out, LANES), jnp.uint8)],
            scratch_shapes=[
                pltpu.VMEM((r_in, LANES), jnp.uint8),
                pltpu.VMEM((r_in, LANES), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(first_arr, i_plane.reshape(-1, LANES), q_plane.reshape(-1, LANES))

    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.integers(0, 256, 2 * (spec.halo + w)).astype(np.uint8))
    iq = jax.device_put(iq)
    jax.block_until_ready(iq)
    try:
        force(run(iq, False))
        t = timeit(lambda: force(run(iq, False)))
        print(f"{name:16s} {t*1e3:9.1f} ms  ({w/t/1e6:8.0f} MS/s)", file=sys.stderr)
    except Exception as e:
        print(f"{name:16s} FAILED: {str(e)[:200]}", file=sys.stderr)


def main():
    cfg = build_decoder_config([new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")])
    spec = make_frontend_spec(cfg, 1024, 256)
    w = spec.window
    for v in ("mag", "cumsum", "bits", "r900", "corr", "corr_shared"):
        run_variant(v, spec, v, w)


if __name__ == "__main__":
    main()
