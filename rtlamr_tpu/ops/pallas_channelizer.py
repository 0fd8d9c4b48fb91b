"""Fused Pallas channelizer kernel: branches + DFT mix + u16 requantize.

One VMEM pass replacing the XLA chain ``polyphase_branches -> mix_channels
-> requantize_u16`` (ops/channelizer.py), which is LAYOUT-bound on TPU
(CHAN_VARIANTS.json: the chain moves multi-GB of padded intermediates; see
BENCH.md "Channelizer layout findings"). The input rides the PACKED u16
plane layout (ops/channelizer.iq_bytes_to_planes_u16): one u16 element per
(I, Q) byte pair, so the XLA prologue is a single u16-width transpose —
half the traffic of a byte transpose, a quarter of the f32 plane
materialization this kernel previously consumed — and the I/Q split + DC
removal happen in VMEM. Each grid step double-buffers N row-range DMAs
(one per packed plane), computes the 8-tap polyphase branches with the
folded permutation, the N-branch DFT mix as an explicit f32 FMA chain, and
the u8-grid requantize, writing one staged-u16 tile per channel.

Exactness contract: the kernel replicates the accumulation orders of
the jnp reference (`polyphase_branches` taps ascending in p;
`mix_channels` branches ascending in b with the +er/-ei interleave;
`requantize_u16` round/clip/pack); the in-VMEM component split yields
exactly the f32 values of `planes_u16_to_frames` (u8-derived integers are
exact in f32). Two separately compiled f32 chains can still differ by one
ulp where a compiler contracts a*b+c into an FMA (e.g.
--xla_allow_excess_precision), which flips the u8 requantize only exactly
at a .5 boundary: measured 4 of 2.4M samples at +-1 LSB.
tests/test_pallas.py pins that contract element-wise AND asserts the
decoded message stream is identical across backends.

Layout: planes arrive as one (N * rows1, 128) u16 array — plane-major
rows, 128 frames per row, with one prologue row per plane holding [zeros |
the taps_per_branch frames of history] so a tile's backward tap reads
(<= taps+1 frames) stay inside the previous row. Shifted frame reads are
the same roll+select `_shifted` the decode stencil uses.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .channelizer import ChannelizerSpec, _mix_matrix, _polyphase_taps
from .pallas_frontend import _shifted, _use_interpret

LANES = 128
#: output frame rows (of 128) per grid step. Small on purpose: the
#: kernel keeps 2N branch accumulators plus shifted temporaries live, and
#: Mosaic's scoped-VMEM stack is 16 MB — 512-row tiles measured 77 MB of
#: stack. 96 rows compiles and benches fine; larger tiles need the stack
#: pressure reduced first.
TILE_ROWS = 96


def _kernel(spec: ChannelizerSpec, rows1: int, x_hbm, out_ref, x_vmem, sems):
    n = spec.n_channels
    p_taps = spec.taps_per_branch
    h2 = _polyphase_taps(spec)  # (P, N) np
    er_np, ei_np = _mix_matrix(spec)  # (N, N) np
    t = pl.program_id(0)
    grid = pl.num_programs(0)
    # 8-aligned tile height: Mosaic sublane slices must start at multiples
    # of 8, and per-plane scratch offsets are p * r_in.
    r_in = TILE_ROWS + 8

    # Double-buffered DMA (the decode stencil's scheme): tile t+1's N
    # packed-plane row ranges stream in while tile t computes.
    def cp(i, slot):
        return [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(p * rows1 + i * TILE_ROWS, r_in)],
                x_vmem.at[slot, pl.ds(p * r_in, r_in)],
                sems.at[slot, p],
            )
            for p in range(n)
        ]

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        for c in cp(0, 0):
            c.start()

    @pl.when(t + 1 < grid)
    def _():
        for c in cp(t + 1, jax.lax.rem(t + 1, 2)):
            c.start()

    for c in cp(t, slot):
        c.wait()

    # Packed int32 tile per plane; component split happens after the shift
    # so one roll serves both I and Q (planes_u16_to_frames semantics).
    def plane(p):  # (r_in, 128) i32 packed tile of plane p
        return x_vmem[slot, p * r_in : p * r_in + r_in].astype(jnp.int32)

    planes = [plane(p) for p in range(n)]

    def fr(j, k):
        """Plane j at output frame - k as (re, im) f32 tiles."""
        sh = _shifted(planes[j], LANES - k, TILE_ROWS)
        re = (sh & 255).astype(jnp.float32) - 127.5
        im = (sh >> 8).astype(jnp.float32) - 127.5
        return re, im

    # Polyphase branches, folded permutation (channelizer.py
    # polyphase_branches): branch b reads plane j=(N-b)%N delayed d frames;
    # taps ascending in p — the identical FMA order.
    yr = []
    yi = []
    for b in range(n):
        j = (n - b) % n
        d = 1 if b >= 1 else 0
        acc_r = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        acc_i = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        for p in range(p_taps):
            re, im = fr(j, p + d)
            acc_r = acc_r + h2[p, b] * re
            acc_i = acc_i + h2[p, b] * im
        yr.append(acc_r)
        yi.append(acc_i)

    # DFT mix + requantize per channel row (mix_channels FMA order:
    # branches ascending, +er term then -ei term per branch).
    for c in range(n):
        cr = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        ci = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        for b in range(n):
            cr = cr + er_np[c, b] * yr[b] - ei_np[c, b] * yi[b]
            ci = ci + er_np[c, b] * yi[b] + ei_np[c, b] * yr[b]
        iu = jnp.clip(jnp.round(cr + 127.5), 0, 255).astype(jnp.int32)
        qu = jnp.clip(jnp.round(ci + 127.5), 0, 255).astype(jnp.int32)
        out_ref[c] = (iu | (qu << 8)).astype(jnp.uint16)


def _pack_hist_u16(hist: jnp.ndarray) -> jnp.ndarray:
    """(2, N, P) f32 DC-removed history -> (N, P) packed u16 (exact)."""
    iu = jnp.round(hist[0] + 127.5).astype(jnp.int32)
    qu = jnp.round(hist[1] + 127.5).astype(jnp.int32)
    return (iu | (qu << 8)).astype(jnp.uint16)


def _plane_layout_u16(
    spec: ChannelizerSpec, hist: jnp.ndarray, planes: jnp.ndarray
) -> Tuple[jnp.ndarray, int, int]:
    """(N * rows1, 128) u16 plane-major layout with a one-row prologue
    per plane ([zeros | history]); returns (planes2d, rows1, out_rows)."""
    n = spec.n_channels
    p_taps = spec.taps_per_branch
    f = planes.shape[1]
    out_rows = -(-f // (TILE_ROWS * LANES)) * TILE_ROWS
    # One prologue row ([zeros | history]) plus 7 tail rows so the last
    # tile's 8-aligned (TILE_ROWS + 8)-row DMA stays in bounds.
    rows1 = out_rows + 8
    pad_tail = rows1 * LANES - LANES - f
    body = jnp.concatenate(
        [
            jnp.zeros((n, LANES - p_taps), jnp.uint16),
            _pack_hist_u16(hist),
            planes,
            jnp.zeros((n, pad_tail), jnp.uint16),
        ],
        axis=1,
    )  # (N, rows1*128)
    return body.reshape(-1, LANES), rows1, out_rows


@functools.partial(jax.jit, static_argnums=(0,))
def channelize_requantize_fused_u16(
    spec: ChannelizerSpec, hist: jnp.ndarray, planes: jnp.ndarray
) -> jnp.ndarray:
    """Fused branches+mix+requantize over (N, F) packed u16 planes.

    Replicates ``requantize_u16(mix_channels(spec, polyphase_branches(spec,
    hist, planes_u16_to_frames(planes))))`` in the same accumulation order
    (equal up to the FMA-contraction ulp — module docstring); the jnp
    chain remains the reference. Returns (N, F) staged u16.
    """
    n = spec.n_channels
    f = planes.shape[1]
    planes2d, rows1, out_rows = _plane_layout_u16(spec, hist, planes)
    grid = out_rows // TILE_ROWS
    kernel = functools.partial(_kernel, spec, rows1)
    out3d = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (n, TILE_ROWS, LANES), lambda t: (0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_rows, LANES), jnp.uint16),
        scratch_shapes=[
            pltpu.VMEM((2, n * (TILE_ROWS + 8), LANES), jnp.uint16),
            pltpu.SemaphoreType.DMA((2, n)),
        ],
        interpret=_use_interpret(),
    )(planes2d)
    return out3d.reshape(n, out_rows * LANES)[:, :f]


def channelize_requantize_fused(
    spec: ChannelizerSpec, hist: jnp.ndarray, frames: jnp.ndarray
) -> jnp.ndarray:
    """Compat wrapper over f32 (2, N, F) frames (tests / legacy callers):
    packs the frames back to u16 planes (exact) and runs the u16 kernel."""
    planes = _pack_hist_u16(frames)
    return channelize_requantize_fused_u16(spec, hist, planes)
