"""Wideband polyphase channelizer — frequency-channel parallelism.

The reference tunes ONE ~2.4 MS/s slab of the 902-928 MHz ISM band and
decodes whatever hops into its passband (misc/modes.go:14-16: ERT channel
width 196,568 Hz, ~12 hop channels covered per 2.36 MS/s of sample rate).
A TPU has the arithmetic to watch the WHOLE band at once: this module
splits a wideband IQ stream sampled at ``n_channels x (32768 * chip_length)``
into ``n_channels`` critically-sampled complex basebands, each exactly the
sample rate the decoder frontend (ops/frontend.py) expects — so every slab
of the band feeds the same decode program, composable as an embarrassingly
parallel ``channel`` mesh axis (no halo, unlike the time axis).

Design (classic analysis DFT filter bank, TPU-shaped):

- A windowed-sinc prototype lowpass ``h`` of length ``taps_per_branch * N``
  (unity DC gain) is decomposed into N polyphase branches.
- Branch signals ``y_b[m] = sum_p h[pN+b] * x[mN - pN - b]`` are computed as
  ``taps_per_branch`` shifted element-wise multiply-adds over a strided
  (frames, N) view — pure VPU work, no gathers.
- Channels are recovered by an N-point IFFT across the branch axis:
  ``x_c[m] = N * IFFT_b(y_b[m])[c]`` — equal to mixing x down by channel
  frequency c/N and lowpass-decimating by N (derivation in
  :func:`channelize`). The FFT batches over frames, which is the long axis.
- Requantization maps each channel back to the rtl-sdr u8 convention
  (DC offset 127.5, decode.go:212) — packed directly as the staged u16
  elements the decode program consumes, so a fused wideband->candidates
  program never materializes intermediate channels in HBM.

Streaming: the filter needs ``taps_per_branch * N`` wideband samples of
history; callers carry that tail between chunks (:func:`history_len`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


#: Largest supported filter-bank size. The DFT mix is an explicit f32 FMA
#: chain (an exactness contract shared by the jnp chain, the fused Pallas
#: kernel and the mesh shards — see mix_channels), so the traced program
#: grows O(N^2) with the channel count; 32 channels (~4x the whole 902-928
#: MHz ERT band at the default rate) keeps compile time and program size
#: sane. Larger banks would need the matmul formulation plus a re-derived
#: cross-backend parity contract.
MAX_CHANNELS = 32


@dataclass(frozen=True)
class ChannelizerSpec:
    """Static configuration of the analysis filter bank."""

    n_channels: int
    #: prototype filter taps per polyphase branch (filter length / N).
    taps_per_branch: int = 8
    #: lowpass cutoff as a multiple of the channel Nyquist 1/(2N); >1 trades
    #: adjacent-channel rejection for sharper OOK chip edges.
    cutoff_scale: float = 1.0

    def __post_init__(self):
        if not 1 <= self.n_channels <= MAX_CHANNELS:
            raise ValueError(
                f"n_channels={self.n_channels} outside [1, {MAX_CHANNELS}] "
                "(the explicit-FMA DFT mix grows O(N^2) traced ops; see "
                "ops/channelizer.MAX_CHANNELS)"
            )

    @property
    def length(self) -> int:
        return self.taps_per_branch * self.n_channels

    @property
    def history_frames(self) -> int:
        """Frames of branch-major history a streaming caller must carry
        (``taps_per_branch`` frames = one prototype-filter length)."""
        return self.taps_per_branch

    @property
    def history(self) -> int:
        """History in wideband samples (= length, for documentation)."""
        return self.length


def history_len(spec: ChannelizerSpec) -> int:
    return spec.history


@functools.lru_cache(maxsize=None)
def prototype_lowpass(spec: ChannelizerSpec) -> np.ndarray:
    """Hamming-windowed sinc, cutoff ``cutoff_scale/(2N)``, unity DC gain."""
    n = spec.length
    cutoff = spec.cutoff_scale / (2 * spec.n_channels)
    t = np.arange(n) - (n - 1) / 2.0
    h = 2 * cutoff * np.sinc(2 * cutoff * t)
    h *= np.hamming(n)
    h /= h.sum()
    h.flags.writeable = False
    return h


@functools.lru_cache(maxsize=None)
def _polyphase_taps(spec: ChannelizerSpec) -> np.ndarray:
    """h2[p, b] = h[p*N + b] — the per-branch tap matrix."""
    h = prototype_lowpass(spec)
    out = h.reshape(spec.taps_per_branch, spec.n_channels).copy()
    out.flags.writeable = False
    return out


@functools.lru_cache(maxsize=None)
def _mix_matrix(spec: ChannelizerSpec):
    """E[c, b] = exp(+j 2 pi c b / N) as separate (re, im) f32 matrices."""
    n = spec.n_channels
    c = np.arange(n)[:, None]
    b = np.arange(n)[None, :]
    ang = 2 * np.pi * c * b / n
    re = np.cos(ang).astype(np.float32)
    im = np.sin(ang).astype(np.float32)
    re.flags.writeable = False
    im.flags.writeable = False
    return re, im


def iq_bytes_to_planes_u16(
    spec: ChannelizerSpec, iq: jnp.ndarray
) -> jnp.ndarray:
    """u8 interleaved wideband IQ -> (N, F) u16 position-major planes.

    Each u16 element packs one (I, Q) byte pair (I in the low byte,
    little-endian) — the decode path's staged convention
    (ops/frontend.StagedGeometry). ONE u16-width transpose unscrambles the
    channel positions, moving HALF the elements of a byte-level transpose
    and carrying both components per element; the I/Q split and DC removal
    happen downstream in whatever layout the consumer prefers (the fused
    Pallas kernel does them in VMEM; :func:`planes_u16_to_frames` for XLA).
    """
    n = spec.n_channels
    if iq.dtype == jnp.uint16:
        return iq.reshape(-1, n).T  # (N, F)
    # u8 compat path: byte-level transpose first, then pack. (A device-side
    # u8->u16 bitcast would materialize a minor-dim-2 tile-padded
    # intermediate — ~64x the data; hosts should pass a zero-copy
    # .view(np.uint16) of the interleaved bytes instead.)
    z = iq.reshape(-1, 2 * n).T  # (2N, F) u8
    lo = z[0::2].astype(jnp.uint16)
    hi = z[1::2].astype(jnp.uint16)
    return lo | (hi << 8)


def planes_u16_to_frames(
    spec: ChannelizerSpec, planes: jnp.ndarray
) -> jnp.ndarray:
    """(N, F) u16 packed planes -> (2, N, F) f32 DC-removed frames.

    Exact: plane values are u8-derived integers, representable in f32."""
    v = planes.astype(jnp.int32)
    re = (v & 255).astype(jnp.float32) - 127.5
    im = (v >> 8).astype(jnp.float32) - 127.5
    return jnp.stack([re, im], axis=0)


def iq_bytes_to_frames(spec: ChannelizerSpec, iq: jnp.ndarray) -> jnp.ndarray:
    """u8 interleaved wideband IQ -> (2, N, F) f32 position-major planes.

    frames[s, j, m] = component s of wideband sample m*N + j, DC offset
    removed. Built via the u16 packed transpose
    (:func:`iq_bytes_to_planes_u16`) — half the transpose traffic of the
    byte-level formulation, bit-identical values (exact integers in f32) —
    with the component split done AFTER the transpose in the frame-minor
    layout every downstream op wants.
    """
    return planes_u16_to_frames(spec, iq_bytes_to_planes_u16(spec, iq))


def ri_to_frames(spec: ChannelizerSpec, ri: jnp.ndarray) -> jnp.ndarray:
    """(2, T) f32 re/im sample planes -> (2, N, F) position-major frames
    (test/synthesis helper; T must be a whole number of frames)."""
    n = spec.n_channels
    return ri.reshape(2, -1, n).transpose(0, 2, 1)


def polyphase_branches(
    spec: ChannelizerSpec, hist: jnp.ndarray, frames: jnp.ndarray
) -> jnp.ndarray:
    """Branch signals y[b, m] = sum_p h[pN+b] * x[mN - pN - b].

    ``frames`` is (2, N, F) position-major (from :func:`iq_bytes_to_frames`),
    ``hist`` is (2, N, P) — the previous chunk's last ``history_frames``
    frames (zeros at the stream head). Returns (2, N, F) f32 branch
    signals, frames on the minor (lane) axis.

    With x[kN + j] = frames[., j, k]: branch b reads position j_b =
    (N - b) mod N, delayed one frame for b >= 1 — a row permutation plus a
    one-frame shift of the stacked series, then each tap is a shifted
    multiply-add along the frame axis (full-lane VPU work);
    :func:`mix_channels` applies the DFT across b.
    """
    n = spec.n_channels
    p_taps = spec.taps_per_branch
    h2 = _polyphase_taps(spec)
    f = frames.shape[2]
    h = hist.shape[2]
    assert h == p_taps, "history must be taps_per_branch frames"

    # Permutation-FOLDED formulation (bit-identical to the materialized
    # row-permute + delayed-shift + 8 sliced FMAs it replaces, same tap
    # summation order — CHAN_VARIANTS.json: 24.4 -> 12.8 ms at the bench
    # shape): branch b reads plane j_b = (N - b) mod N delayed one frame
    # for b >= 1, so apply the taps per PLANE at per-branch offsets and
    # reorder rows only in the tiny output stack. No permuted/shifted
    # copy of the (2, N, P+F) array is ever materialized.
    full = jnp.concatenate([hist, frames], axis=2)  # (2, N, P+F)
    ys = []
    for b in range(n):
        j = (n - b) % n
        d = 1 if b >= 1 else 0
        acc = jnp.zeros((2, f), jnp.float32)
        for p in range(p_taps):
            lo = h - p - d
            acc = acc + h2[p, b] * jax.lax.slice(
                full[:, j], (0, lo), (2, lo + f)
            )
        ys.append(acc)
    return jnp.stack(ys, axis=1)  # (2, N, F)


def mix_channels(
    spec: ChannelizerSpec,
    y: jnp.ndarray,
    channel_start: int = 0,
    channel_count: Optional[int] = None,
) -> jnp.ndarray:
    """x_c[m] = sum_b y[b, m] e^{+j 2 pi c b / N} for a channel block.

    Four real (C_blk, N) @ (N, F) matmuls — MXU work, and a mesh shard can
    compute ONLY its own channel rows (channel_start/count), which is what
    makes the channel axis shardable without an all-to-all.

    ``y`` is (2, N, F) f32 from :func:`polyphase_branches`; returns
    (2, C_blk, F) f32 re/im planes.
    """
    n = spec.n_channels
    if channel_count is None:
        channel_count = n
    er_np, ei_np = _mix_matrix(spec)
    if isinstance(channel_start, int):
        er = jnp.asarray(er_np[channel_start : channel_start + channel_count])
        ei = jnp.asarray(ei_np[channel_start : channel_start + channel_count])
    else:  # traced start (e.g. a mesh axis_index): slice the constant
        er = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(er_np), channel_start, channel_count, axis=0
        )
        ei = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(ei_np), channel_start, channel_count, axis=0
        )
    yr, yi = y[0], y[1]  # (N, F)
    # Explicit f32 FMA chain, branch index ascending. Three properties the
    # earlier HIGHEST-precision matmul lacked: (a) per-OUTPUT-ROW
    # independence is syntactically manifest (a mesh shard computing only
    # its rows is bit-identical to the full mix,
    # test_mix_channels_block_equals_full); (b) the exact accumulation
    # order is replicable bit-for-bit by the fused Pallas kernel
    # (ops/pallas_channelizer.py); (c) still true f32 — no bf16 matmul
    # rounding that could flip the u8 requantize and desync from the
    # oracle.
    f_len = yr.shape[1]
    cr = jnp.zeros((er.shape[0], f_len), jnp.float32)
    ci = jnp.zeros((er.shape[0], f_len), jnp.float32)
    for b in range(n):
        cr = cr + er[:, b : b + 1] * yr[b] - ei[:, b : b + 1] * yi[b]
        ci = ci + er[:, b : b + 1] * yi[b] + ei[:, b : b + 1] * yr[b]
    return jnp.stack([cr, ci], axis=0)


def channelize(
    spec: ChannelizerSpec, hist: jnp.ndarray, frames: jnp.ndarray
) -> jnp.ndarray:
    """Split a wideband stream chunk into N critically-sampled channels.

    Args:
      spec: filter bank configuration.
      hist: (2, N, history_frames) f32 — previous chunk's last frames
        (zeros at the stream head); the caller carries
        ``frames[:, :, -history_frames:]`` forward.
      frames: (2, N, F) f32 position-major chunk
        (:func:`iq_bytes_to_frames`).

    Returns (2, N, F) f32: channel c frame m is the lowpass-decimated
    mix-down ``sum_k h[k] x[mN - k] e^{-j 2 pi c (mN - k) / N}`` where
    wideband sample 0 of the chunk is frame 0 — i.e. channel c is centered
    ``c/N`` of the wideband rate above the capture center (aliased:
    c > N/2 lands below; see :func:`channel_offsets_hz`).

    Derivation: with k = pN + b, ``e^{-j2pi c(mN-k)/N} = e^{+j2pi c b/N}``
    (the mN and pN terms vanish mod N), so
    ``x_c[m] = sum_b e^{j2pi cb/N} y_b[m]`` — a DFT across the branch axis,
    evaluated as a matmul (:func:`mix_channels`).
    """
    return mix_channels(spec, polyphase_branches(spec, hist, frames))


def requantize_u16(channels: jnp.ndarray) -> jnp.ndarray:
    """(2, C, F) re/im channels -> (C, F) staged u16 (I low, Q high byte).

    The inverse of the decoder's staged-sample convention
    (ops/frontend.py:_bits_q6_jnp_staged): each u16 packs one interleaved
    u8 IQ pair with the rtl-sdr DC offset 127.5 restored (decode.go:212).
    """
    i = jnp.clip(jnp.round(channels[0] + 127.5), 0, 255).astype(jnp.int32)
    q = jnp.clip(jnp.round(channels[1] + 127.5), 0, 255).astype(jnp.int32)
    return (i | (q << 8)).astype(jnp.uint16)


def requantize_u8(channels: jnp.ndarray) -> jnp.ndarray:
    """(C, F, 2) channels -> (C, 2F) u8 interleaved IQ (for oracle replay)."""
    u16 = requantize_u16(channels)
    lo = (u16 & 0xFF).astype(jnp.uint8)
    hi = (u16 >> 8).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(u16.shape[0], -1)


def channel_offsets_hz(spec: ChannelizerSpec, channel_rate: int) -> np.ndarray:
    """Per-channel center-frequency offset from the wideband capture center.

    Channel c sits at ``c/N`` of the wideband rate, aliased into
    [-fs/2, fs/2): offsets[c] = ((c + N/2) mod N - N/2) * channel_rate.
    With the capture centered mid-band (e.g. 915 MHz), N*channel_rate spans
    the full 902-928 MHz ISM band at chip length 72 with N >= 11.
    """
    n = spec.n_channels
    c = np.arange(n)
    return (((c + n // 2) % n) - n // 2) * channel_rate
