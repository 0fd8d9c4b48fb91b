"""Fused Pallas stencil kernel for the DSP front half.

One pass over HBM replacing the jnp chain magnitude -> cumsum -> Manchester
filter -> R900 filter bank -> preamble correlation (decode.go:199-348,
r900/r900.go:82-150). Each grid step DMAs a tile of the staged u16 buffer
(one interleaved IQ byte pair per element — see frontend.StagedGeometry)
into VMEM, splits I/Q with shift/mask (no deinterleave gather anywhere),
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
(preamble correlation, ~PreambleLength samples, plus the staged pad_shift);
the overlap is re-read from HBM per tile, a few percent of traffic. All DMA
starts are multiples of tile_rows, so the staged pad alignment keeps Mosaic's
(8, 128) sublane tiling happy with zero XLA prologue work.

Instead of a full prefix sum, the kernel computes width-ChipLength
SLIDING sums by binary doubling (log2(CL) shifted adds): every matched-
filter output is a +-1 combination of chip-energy sums at CL-spaced
offsets, so the (much more expensive) log-depth lane+sublane scan is never
needed — all exact int32 wrap-around arithmetic, bit-identical to the jnp
chain's cumsum differences by associativity.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import LANES, FrontendSpec, stage_iq, staged_geometry


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


def _kernel(
    spec: FrontendSpec,
    first_ref,
    x_hbm,
    bits_ref,
    q6_ref,
    mask_ref,
    x_vmem,
    sems,
):
    geo = staged_geometry(spec)
    cl = spec.chip_length
    sl = spec.symbol_length
    ps = spec.pad_shift
    r_out, r_bits, r_in = geo.r_out, geo.r_bits, geo.r_in
    t = pl.program_id(0)
    tile = r_out * LANES  # output positions per tile

    # Double-buffered DMA: tile t+1's staged span (row-aligned; overlapping
    # tail re-read) streams in while tile t computes.
    def cp(i, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * r_out, r_in)], x_vmem.at[slot], sems.at[slot]
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        cp(0, 0).start()

    @pl.when(t + 1 < geo.n_tiles)
    def _():
        cp(t + 1, jax.lax.rem(t + 1, 2)).start()

    cp(t, slot).wait()

    # Split the interleaved byte pair and square (decode.go:209-225, exact):
    # staged element = I | (Q << 8) little-endian.
    v = x_vmem[slot].astype(jnp.int32)
    di = 255 - 2 * (v & 255)
    dq = 255 - 2 * (v >> 8)
    mag = di * di + dq * dq

    # First window of a stream: zero history (decode.go:144-146). Magnitude
    # at staged positions below halo_staged is masked to zero.
    first = first_ref[0, 0]
    base = t * tile
    row = jax.lax.broadcasted_iota(jnp.int32, (r_in, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r_in, LANES), 1)
    spos = base + row * LANES + col  # staged sample index
    mag = jnp.where(
        jnp.logical_and(first != 0, spos < spec.halo_staged), 0, mag
    )

    # Width-CL sliding sums W[x] = sum(mag[x .. x+CL)) by binary
    # decomposition (W_2k[x] = W_k[x] + W_k[x+k]; combine CL's set bits) —
    # every downstream filter output is a +-1 combination of W at CL-spaced
    # offsets, so the full prefix sum (log-depth lane scan + row scan,
    # ~2.5x the passes) is never needed. Exact: int32 wrap addition is
    # associative, so these sums equal the jnp chain's cumsum differences
    # bit-for-bit.
    parts = {1: mag}
    k = 1
    while 2 * k <= cl:
        parts[2 * k] = parts[k] + _shifted(parts[k], k, r_in)
        k *= 2
    w_cl = None
    off = 0
    rem = cl
    for bit in reversed(range(cl.bit_length())):
        p2 = 1 << bit
        if rem >= p2:
            term = (
                parts[p2] if off == 0 else _shifted(parts[p2], off, r_in)
            )
            w_cl = term if w_cl is None else w_cl + term
            off += p2
            rem -= p2

    def wat(k, r=r_out):  # W_CL at staged offset q + pad_shift + k
        return _shifted(w_cl, ps + k, r)

    # Manchester bits over the EXTENDED range r_bits (the correlation below
    # reads bits up to (PreambleSymbols-1)*SL past the tile's own output).
    # f[q] = 2E(q+CL) - E(q) - E(q+SL) = W(q) - W(q+CL); bit = f >= 0
    # (decode.go:229-245).
    f = wat(0, r_bits) - wat(cl, r_bits)
    bits_ext = (f >= 0).astype(jnp.uint8)
    # Initial PacketLength zero bits of the stream (decode.go:145).
    brow = jax.lax.broadcasted_iota(jnp.int32, (r_bits, LANES), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (r_bits, LANES), 1)
    bpos = base + brow * LANES + bcol  # output bit position
    bits_ext = jnp.where(
        jnp.logical_and(first != 0, bpos < spec.packet_length),
        jnp.uint8(0),
        bits_ext,
    )
    bits_ref[:] = bits_ext[:r_out]

    # Preamble correlation bank (decode.go:255-348): mask bit g set iff
    # group g's whole preamble matches at stride SL starting at q. Shifted
    # bit segments are shared across groups (IDM/NetIDM/R900 all have
    # 32-symbol preambles); all in int32 — the VPU has no 8-bit compares.
    opos = bpos[:r_out]
    bits32 = bits_ext.astype(jnp.int32)
    max_pre = max(len(g.bits) for g in spec.groups)
    accs = [jnp.ones((r_out, LANES), jnp.bool_) for _ in spec.groups]
    for k in range(max_pre):
        seg = _shifted(bits32, k * sl, r_out)
        for g, group in enumerate(spec.groups):
            if k < len(group.bits):
                accs[g] = jnp.logical_and(accs[g], seg == group.bits[k])
    mask = jnp.zeros((r_out, LANES), jnp.int32)
    for g in range(len(spec.groups)):
        mask = mask | jnp.where(accs[g], jnp.int32(1 << g), jnp.int32(0))
    # Search positions exist only in [0, window).
    mask_ref[:] = jnp.where(opos < spec.window, mask, 0).astype(jnp.uint8)

    if spec.wants_r900:
        # R900 filter bank over mag[q+SL .. q+SL+4CL) (r900/r900.go:96-149)
        # in chip-sum form: with d_i = W(q+SL+i*CL) (the i-th chip's
        # energy), the three kernels are exactly
        #   a0 = 2c2-c4-c0 = (d0+d1) - (d2+d3)   # 1100
        #   a1 = 2c1-2c2+2c3-c4-c0 = d0-d1+d2-d3 # 1010
        #   a2 = 2c1-2c3+c4-c0 = d0-d1-d2+d3     # 1001
        # (expand c_i = c_0 + sum(d_j, j<i); identical int32 results).
        d0 = wat(sl)
        d1 = wat(sl + cl)
        d2 = wat(sl + 2 * cl)
        d3 = wat(sl + 3 * cl)
        a0 = (d0 + d1) - (d2 + d3)  # 1100
        a1 = d0 - d1 + d2 - d3  # 1010
        a2 = d0 - d1 - d2 + d3  # 1001
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
def frontend_pallas_staged(
    spec: FrontendSpec, staged: jnp.ndarray, first
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Fused stencil stage over the staged u16 buffer: (bits, q6, mask2d).

    bits: (window + PacketLength - SymbolLength,) u8 bit stream slice.
    q6:   R900 6-ary stream on the same index convention (or None).
    mask2d: (window/128, 128) u8; bit g = preamble-group-g hit at that
      search position.
    """
    geo = staged_geometry(spec)
    first_arr = jnp.asarray(first, jnp.int32).reshape(1, 1)
    x2d = staged.reshape(-1, LANES)

    kernel = functools.partial(_kernel, spec)
    out_rows = geo.n_tiles * geo.r_out
    out2d = pl.pallas_call(
        kernel,
        grid=(geo.n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (geo.r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (geo.r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (geo.r_out, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, geo.r_in, LANES), jnp.uint16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(first_arr, x2d)
    bits2d, q62d, mask2d = out2d

    bits = bits2d.reshape(-1)[: geo.lp]
    q6 = q62d.reshape(-1)[: geo.lq] if spec.wants_r900 else None
    return bits, q6, mask2d[: spec.window // LANES]


def frontend_pallas(
    spec: FrontendSpec, iq: jnp.ndarray, first
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Fused stencil stage over u8 interleaved IQ (compat wrapper)."""
    return frontend_pallas_staged(spec, stage_iq(spec, iq), first)


def bits_q6_pallas(
    spec: FrontendSpec, iq: jnp.ndarray, first
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Compatibility wrapper: (bits, q6) only (parity tests)."""
    bits, q6, _ = frontend_pallas(spec, iq, first)
    return bits, q6
