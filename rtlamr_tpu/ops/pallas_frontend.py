"""Fused Pallas stencil kernel for the DSP front half.

One pass over HBM replacing the jnp chain magnitude -> cumsum -> Manchester
filter -> R900 filter bank -> preamble correlation (decode.go:199-348,
r900/r900.go:82-150): each grid step DMAs a tile of raw u8 IQ into VMEM,
computes the exact-int32 magnitude, a tile-local 2D prefix sum (wrap-around
int32; all filter outputs are zero-coefficient-sum combinations so both the
wrap and the tile-local offset cancel), derives both quantized streams with
shifted VMEM reads, and correlates the bit stream against every registered
preamble — no int32 magnitude or cumsum array ever touches HBM, and the
preamble-hit mask leaves the kernel as one u8 per search position with one
bit per preamble group.

Layout: 1D sample streams are viewed as (rows, 128) lane-major tiles. A
flattened shift by k = k_r*128 + k_c becomes a row slice + lane roll +
row-boundary select (`_shifted`). Tiles overlap by the deepest stencil reach
(preamble correlation, ~PreambleLength samples); the overlap is re-read from
HBM per tile, a few percent of traffic.

The prefix sum itself avoids the (TPU-unlowerable, layout-hostile) 1D
``cumsum`` primitive: lane-axis inclusive scan via log2(128)=7 masked
roll-adds, then cross-row offsets via log-depth shifted adds along the
sublane axis — all exact int32 wrap-around arithmetic.
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
    """out[r, c] = arr_flat[r*128 + c + k] for a (rows, 128) VMEM array.

    Mosaic-friendly formulation: whole-array sublane/lane rotates plus a
    lane-boundary select; the only slices start at row 0 with 8-aligned
    length (Mosaic's sublane tiling constraint — arbitrary row offsets are
    not sliceable).
    """
    k_r, k_c = divmod(k, LANES)
    rows = arr.shape[0]
    dtype = arr.dtype
    a = arr if dtype.itemsize == 4 else arr.astype(jnp.int32)
    up = a if k_r == 0 else pltpu.roll(a, rows - k_r, axis=0)  # up[r]=a[r+k_r]
    if k_c == 0:
        return up[:r_out].astype(dtype)
    up1 = pltpu.roll(a, rows - k_r - 1, axis=0)  # up1[r] = a[r + k_r + 1]
    b = pltpu.roll(up, LANES - k_c, axis=1)  # b[c] = up[(c + k_c) % 128]
    b1 = pltpu.roll(up1, LANES - k_c, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    out = jnp.where(col < LANES - k_c, b, b1)[:r_out]
    return out.astype(dtype)


def _flat_cumsum(mag: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of the flattened (rows, 128) int32 array.

    Lane axis: 7 masked roll-adds (Hillis-Steele). Row axis: log-depth
    masked sublane-roll adds of the broadcast per-row totals. Exact int32
    wrap-around; full-width (rows, 128) shapes throughout to stay inside
    Mosaic's supported layouts.
    """
    rows = mag.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
    cs = mag
    s = 1
    while s < LANES:
        rolled = pltpu.roll(cs, s, axis=1)  # rolled[c] = cs[(c - s) % 128]
        cs = cs + jnp.where(col >= s, rolled, 0)
        s <<= 1
    # Inclusive row-total scan, broadcast across lanes. The totals come from
    # a fresh reduction (not a lane-127 slice, which Mosaic can't relayout).
    tot = jnp.broadcast_to(jnp.sum(mag, axis=1, keepdims=True), mag.shape)
    t = tot
    s = 1
    while s < rows:
        rolled = pltpu.roll(t, s, axis=0)  # rolled[r] = t[(r - s) % rows]
        t = t + jnp.where(row >= s, rolled, 0)
        s <<= 1
    return cs + (t - tot)  # + exclusive row offsets


def _kernel(
    spec: FrontendSpec,
    r_out: int,
    r_bits: int,
    r_in: int,
    first_ref,
    i_hbm,
    q_hbm,
    bits_ref,
    q6_ref,
    mask_ref,
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
    mag = jnp.where(jnp.logical_and(first != 0, gpos < spec.halo), 0, mag)

    cs = _flat_cumsum(mag)
    # Exclusive prefix E[j] = sum mag[:j] (tile-local; offset cancels).
    ex = cs - mag

    def e(k, r=r_out):  # E at flat offset q + k for q in [0, r*128)
        return _shifted(ex, k, r)

    # Manchester bits over the EXTENDED range r_bits (the correlation below
    # reads bits up to (PreambleSymbols-1)*SL past the tile's own output).
    # f[q] = 2E(q+CL) - E(q) - E(q+SL); bit = f >= 0 (decode.go:229-245).
    f = 2 * e(cl, r_bits) - e(0, r_bits) - e(sl, r_bits)
    bits_ext = (f >= 0).astype(jnp.uint8)
    # Initial PacketLength zero bits of the stream (decode.go:145).
    brow = jax.lax.broadcasted_iota(jnp.int32, (r_bits, LANES), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (r_bits, LANES), 1)
    bpos = base + brow * LANES + bcol
    bits_ext = jnp.where(
        jnp.logical_and(first != 0, bpos < spec.packet_length),
        jnp.uint8(0),
        bits_ext,
    )
    bits_ref[:] = bits_ext[:r_out]

    # Preamble correlation bank (decode.go:255-348): mask bit g set iff
    # group g's whole preamble matches at stride SL starting at q. All in
    # int32 — the VPU has no 8-bit compares.
    opos = bpos[:r_out]
    bits32 = bits_ext.astype(jnp.int32)
    mask = jnp.zeros((r_out, LANES), jnp.int32)
    for g, group in enumerate(spec.groups):
        acc = jnp.ones((r_out, LANES), jnp.bool_)
        for k, bit in enumerate(group.bits):
            seg = _shifted(bits32, k * sl, r_out)
            acc = jnp.logical_and(acc, seg == bit)
        mask = mask | jnp.where(acc, jnp.int32(1 << g), jnp.int32(0))
    # Search positions exist only in [0, window).
    mask_ref[:] = jnp.where(opos < spec.window, mask, 0).astype(jnp.uint8)

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
def frontend_pallas(
    spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Fused stencil stage: (bits, q6, mask2d).

    bits: (window + PacketLength - SymbolLength,) u8 bit stream slice.
    q6:   R900 6-ary stream on the same index convention (or None).
    mask2d: (window/128, 128) u8; bit g = preamble-group-g hit at that
      search position.
    """
    sl = spec.symbol_length
    pl_ = spec.packet_length
    w = spec.window
    lp = w + pl_ - sl
    lq = w + pl_ - 2 * sl

    max_pre_bits = max(len(g.bits) for g in spec.groups)
    pre_reach = (max_pre_bits - 1) * sl  # deepest bits read by correlation

    # Tiles are whole (8, 128) vregs: Mosaic slices must be 8-row aligned.
    tile = min(1 << 16, _round_up(lp, 8 * LANES))
    n_tiles = -(-lp // tile)
    r_out = tile // LANES
    r_bits = r_out + _round_up(pre_reach, LANES) // LANES + 1
    # ex must cover bits_ext reads (offset <= SL past r_bits) and the R900
    # bank (offset <= 3*SL past r_out).
    m_extra = _round_up(pre_reach + 3 * sl, 8 * LANES) + 2 * 8 * LANES
    r_in = r_out + m_extra // LANES  # multiple of 8 (Mosaic slice tiling)

    # Deinterleave + pad so every tile's overlapping read is in bounds.
    need = n_tiles * tile + m_extra
    i_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[0::2])
    q_plane = jnp.zeros(need, jnp.uint8).at[: iq.shape[0] // 2].set(iq[1::2])
    i2d = i_plane.reshape(-1, LANES)
    q2d = q_plane.reshape(-1, LANES)

    first_arr = jnp.asarray(first, jnp.int32).reshape(1, 1)

    kernel = functools.partial(_kernel, spec, r_out, r_bits, r_in)
    out2d = pl.pallas_call(
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
            pl.BlockSpec((r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * r_out, LANES), jnp.uint8),
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
    bits2d, q62d, mask2d = out2d

    bits = bits2d.reshape(-1)[:lp]
    q6 = q62d.reshape(-1)[:lq] if spec.wants_r900 else None
    return bits, q6, mask2d[: w // LANES]


def bits_q6_pallas(
    spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Compatibility wrapper: (bits, q6) only (parity tests)."""
    bits, q6, _ = frontend_pallas(spec, iq, first)
    return bits, q6
