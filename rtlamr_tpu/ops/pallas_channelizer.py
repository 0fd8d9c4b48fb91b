"""Fused Pallas channelizer kernel: branches + DFT mix + u16 requantize.

One VMEM pass replacing the XLA chain ``polyphase_branches -> mix_channels
-> requantize_u16`` (ops/channelizer.py), which is LAYOUT-bound on TPU
(CHAN_VARIANTS.json: the chain moves multi-GB of padded intermediates; see
BENCH.md "Channelizer layout findings"). The deinterleave transpose
(``iq_bytes_to_frames``) stays in XLA — every probed alternative lost —
but nothing downstream of it ever touches HBM again: each grid step DMAs a
tile of every (component, position) plane, computes the 8-tap polyphase
branches with the folded permutation, the N-branch DFT mix as an explicit
f32 FMA chain, and the u8-grid requantize, writing one staged-u16 tile per
channel.

Exactness contract: the kernel replicates the accumulation orders of
the jnp reference (`polyphase_branches` taps ascending in p;
`mix_channels` branches ascending in b with the +er/-ei interleave;
`requantize_u16` round/clip/pack). Two separately compiled f32 chains can
still differ by one ulp where a compiler contracts a*b+c into an FMA
(e.g. --xla_allow_excess_precision), which flips the u8 requantize only
exactly at a .5 boundary: measured 4 of 2.4M samples at +-1 LSB.
tests/test_pallas.py pins that contract element-wise AND asserts the
decoded message stream is identical across backends.

Layout: planes arrive as one (2N * rows1, 128) f32 array — plane-major
rows, 128 frames per row, with one prologue row per plane holding [zeros |
the taps_per_branch frames of history] so a tile's backward tap reads
(<= taps+1 frames) stay inside the previous row. Each grid step issues 2N
row-range DMAs (one per plane) into a VMEM scratch; shifted frame reads
are the same roll+select `_shifted` the decode stencil uses.
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
#: stack. 96 rows (~14.4 MB scaled) compiles and benches fine (808.1 MS/s
#: full-band vs 802.8 at 64 rows); larger tiles need the stack pressure
#: reduced first.
TILE_ROWS = 96


def _kernel(spec: ChannelizerSpec, rows1: int, x_hbm, out_ref, x_vmem, sems):
    n = spec.n_channels
    p_taps = spec.taps_per_branch
    h2 = _polyphase_taps(spec)  # (P, N) np
    er_np, ei_np = _mix_matrix(spec)  # (N, N) np
    t = pl.program_id(0)
    # 8-aligned tile height: Mosaic sublane slices must start at multiples
    # of 8, and per-plane scratch offsets are p * r_in.
    r_in = TILE_ROWS + 8

    # One row-range DMA per plane: padded rows [t*TILE_ROWS, +r_in) of
    # plane p live at x_hbm rows p*rows1 + that range.
    copies = []
    for p in range(2 * n):
        copies.append(
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(p * rows1 + t * TILE_ROWS, r_in)],
                x_vmem.at[pl.ds(p * r_in, r_in)],
                sems.at[p],
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def plane(p):  # (r_in, 128) f32 tile of plane p
        return x_vmem[p * r_in : p * r_in + r_in]

    def fr(p, k):
        """Plane p at output frame - k: out[r, c] = tile_flat[(r+1)*128 +
        c - k], k in [0, taps]."""
        return _shifted(plane(p), LANES - k, TILE_ROWS)

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
            k = p + d
            acc_r = acc_r + h2[p, b] * fr(j, k)
            acc_i = acc_i + h2[p, b] * fr(n + j, k)
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


def _plane_layout(
    spec: ChannelizerSpec, hist: jnp.ndarray, frames: jnp.ndarray
) -> Tuple[jnp.ndarray, int, int]:
    """(2N * rows1, 128) f32 plane-major layout with a one-row prologue
    per plane ([zeros | history]); returns (planes2d, rows1, out_rows)."""
    n = spec.n_channels
    p_taps = spec.taps_per_branch
    f = frames.shape[2]
    out_rows = -(-f // (TILE_ROWS * LANES)) * TILE_ROWS
    # One prologue row ([zeros | history]) plus 7 tail rows so the last
    # tile's 8-aligned (TILE_ROWS + 8)-row DMA stays in bounds.
    rows1 = out_rows + 8
    pad_tail = rows1 * LANES - LANES - f
    body = jnp.concatenate(
        [
            jnp.zeros((2, n, LANES - p_taps), jnp.float32),
            hist,
            frames,
            jnp.zeros((2, n, pad_tail), jnp.float32),
        ],
        axis=2,
    )  # (2, N, rows1*128)
    return body.reshape(-1, LANES), rows1, out_rows


@functools.partial(jax.jit, static_argnums=(0,))
def channelize_requantize_fused(
    spec: ChannelizerSpec, hist: jnp.ndarray, frames: jnp.ndarray
) -> jnp.ndarray:
    """Fused branches+mix+requantize: (2, N, F) frames -> (N, F) staged u16.

    Replicates ``requantize_u16(mix_channels(spec,
    polyphase_branches(spec, hist, frames)))`` in the same accumulation
    order (equal up to the FMA-contraction ulp — module docstring); the
    jnp chain remains the reference.
    """
    n = spec.n_channels
    f = frames.shape[2]
    planes2d, rows1, out_rows = _plane_layout(spec, hist, frames)
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
            pltpu.VMEM((2 * n * (TILE_ROWS + 8), LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * n,)),
        ],
        interpret=_use_interpret(),
    )(planes2d)
    return out3d.reshape(n, out_rows * LANES)[:, :f]
