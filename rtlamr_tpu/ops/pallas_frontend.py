"""Fused Pallas stencil kernel for the DSP front half.

One pass over HBM replacing the jnp chain magnitude -> cumsum -> Manchester
filter -> R900 filter bank (decode.go:199-245, r900/r900.go:82-150): each
grid step DMAs a tile of raw u8 IQ into VMEM, computes the exact-int32
magnitude, a flattened 2D prefix sum (wrap-around int32; all filter outputs
are zero-coefficient-sum combinations so the wrap cancels), and derives both
quantized streams with shifted VMEM reads — no int32 magnitude or cumsum
array ever touches HBM.

Layout: 1D sample streams are viewed as (rows, 128) lane-major tiles. A
flattened shift by k = k_r*128 + k_c becomes a row slice + lane roll +
row-boundary select (`_shifted`). Tiles overlap by ~3*SymbolLength samples
(the deepest stencil reach, the R900 kernel at SL+4*CL); the overlap is
re-read from HBM per tile, a few percent of traffic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import FrontendSpec

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _use_interpret() -> bool:
    """Interpreter mode off-TPU so CPU tests exercise the same kernel."""
    return jax.default_backend() not in ("tpu", "axon")


def _shifted(arr: jnp.ndarray, k: int, r_out: int) -> jnp.ndarray:
    """out[r, c] = arr_flat[r*128 + c + k] for a (rows, 128) VMEM array."""
    k_r, k_c = divmod(k, LANES)
    a = arr[k_r : k_r + r_out + 1]
    if k_c == 0:
        return a[:r_out]
    b = pltpu.roll(a, LANES - k_c, axis=1)  # out[c] = a[(c + k_c) % LANES]
    col = jax.lax.broadcasted_iota(jnp.int32, (r_out, LANES), 1)
    return jnp.where(col < LANES - k_c, b[:r_out], b[1 : r_out + 1])


def _flat_cumsum(mag: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of the flattened (rows, 128) int32 array."""
    row_cs = jnp.cumsum(mag, axis=1)
    row_tot = row_cs[:, LANES - 1 :]
    row_off = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive row offsets
    return row_cs + row_off


def _kernel(
    spec: FrontendSpec,
    r_out: int,
    r_in: int,
    first_ref,
    i_hbm,
    q_hbm,
    bits_ref,
    q6_ref,
    i_vmem,
    q_vmem,
    sems,
):
    cl = spec.chip_length
    sl = spec.symbol_length
    t = pl.program_id(0)
    tile = r_out * LANES  # output positions per tile

    # DMA this tile's I and Q spans (overlapping reads between tiles).
    copy_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(t * r_out, r_in)], i_vmem, sems.at[0]
    )
    copy_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(t * r_out, r_in)], q_vmem, sems.at[1]
    )
    copy_i.start()
    copy_q.start()
    copy_i.wait()
    copy_q.wait()

    di = 255 - 2 * i_vmem[:].astype(jnp.int32)
    dq = 255 - 2 * q_vmem[:].astype(jnp.int32)
    mag = di * di + dq * dq  # exact-int magnitude (decode.go:209-225)

    # First window of a stream: zero history (decode.go:144-146). Magnitude
    # positions below halo are masked to zero.
    first = first_ref[0, 0]
    base = t * tile
    row = jax.lax.broadcasted_iota(jnp.int32, (r_in, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r_in, LANES), 1)
    gpos = base + row * LANES + col
    mag = jnp.where(
        jnp.logical_and(first != 0, gpos < spec.halo), 0, mag
    )

    cs = _flat_cumsum(mag)
    # Exclusive prefix E[j] = sum mag[:j] (local; global offset cancels).
    ex = cs - mag

    def e(k):  # E at flat offset q + k for q in [0, tile)
        return _shifted(ex, k, r_out)

    # Manchester: f[q] = 2E(q+CL) - E(q) - E(q+SL); bit = f >= 0
    f = 2 * e(cl) - e(0) - e(sl)
    bits = (f >= 0).astype(jnp.uint8)
    # Initial PacketLength zero bits of the stream (decode.go:145).
    opos = base + jax.lax.broadcasted_iota(jnp.int32, (r_out, LANES), 0) * LANES + jax.lax.broadcasted_iota(jnp.int32, (r_out, LANES), 1)
    bits = jnp.where(
        jnp.logical_and(first != 0, opos < spec.packet_length),
        jnp.uint8(0),
        bits,
    )
    bits_ref[:] = bits

    if spec.wants_r900:
        # R900 filter bank over mag[q+SL .. q+SL+4CL) (r900/r900.go:96-149)
        c0 = e(sl)
        c1 = e(sl + cl)
        c2 = e(sl + 2 * cl)
        c3 = e(sl + 3 * cl)
        c4 = e(sl + 4 * cl)
        a0 = 2 * c2 - c4 - c0  # 1100
        a1 = 2 * c1 - 2 * c2 + 2 * c3 - c4 - c0  # 1010
        a2 = 2 * c1 - 2 * c3 + c4 - c0  # 1001
        m0, m1, m2 = jnp.abs(a0), jnp.abs(a1), jnp.abs(a2)
        # Strict-> argmax chain (r900/r900.go:133-143)
        arg = jnp.where(m1 > m0, 1, 0)
        best = jnp.maximum(m0, m1)
        arg = jnp.where(m2 > best, 2, arg)
        chosen = jnp.where(arg == 0, a0, jnp.where(arg == 1, a1, a2))
        q6 = (arg + jnp.where(chosen > 0, 3, 0)).astype(jnp.uint8)
        q6_ref[:] = q6
    else:
        q6_ref[:] = jnp.zeros((r_out, LANES), jnp.uint8)


@functools.partial(jax.jit, static_argnums=(0,))
def bits_q6_pallas(
    spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pallas-backed replacement for bits_q6_jnp (same contract)."""
    sl = spec.symbol_length
    pl_ = spec.packet_length
    w = spec.window
    lp = w + pl_ - sl
    lq = w + pl_ - 2 * sl

    tile = min(1 << 16, _round_up(lp, LANES))
    n_tiles = -(-lp // tile)
    r_out = tile // LANES
    m_extra = _round_up(3 * sl, LANES) + LANES
    r_in = r_out + m_extra // LANES

    # Deinterleave + pad so every tile's overlapping read is in bounds.
    need = n_tiles * tile + m_extra
    i_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[0::2])
    q_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[1::2])
    i2d = i_plane.reshape(-1, LANES)
    q2d = q_plane.reshape(-1, LANES)

    first_arr = jnp.asarray(first, jnp.int32).reshape(1, 1)

    kernel = functools.partial(_kernel, spec, r_out, r_in)
    bits2d, q62d = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * r_out, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((n_tiles * r_out, LANES), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((r_in, LANES), jnp.uint8),
            pltpu.VMEM((r_in, LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(first_arr, i2d, q2d)

    bits = bits2d.reshape(-1)[:lp]
    q6 = q62d.reshape(-1)[:lq] if spec.wants_r900 else None
    return bits, q6
