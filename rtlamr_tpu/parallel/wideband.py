"""Wideband multi-channel decode — the frequency-parallel receiver.

The capability the reference fundamentally cannot have (it is bound to one
rtl-sdr dongle's ~2.4 MS/s passband, misc/modes.go:14-31): ingest ONE
wideband IQ stream covering many ERT hop slabs, channelize it on device
(ops/channelizer.py), and decode every channel with the same fused window
program — wideband bytes in, packed candidates out, with no intermediate
stream ever leaving HBM.

Per super-step the jitted program:
  u8 wideband bytes -> complex -> polyphase branches -> DFT-matmul channel
  mix -> u8-grid requantize packed as staged u16 -> per-channel overlap-save
  staging -> lax.scan of the shared decode program over channels -> one
  packed result buffer.

Each channel is an independent sample stream with the reference's exact
single-receiver semantics: its own overlap-save carry, first-window zero
history, block numbering and adjacent-block digest dedup (main.go:252-292)
— held as per-channel parse states over a single shared FrontendSpec (one
compiled program serves every channel). Messages are returned as
``(channel, block, message)`` triples.

Adjacent-channel ghosts: a very strong OOK burst splatters square-envelope
sidelobe energy into the neighboring slab, where it can demodulate as the
same packet — physically real (the reference's single ~2.4 MS/s passband
spans ~12 hop channels and decodes all of them together,
misc/modes.go:27-31). ``cross_channel_dedup=True`` collapses same-digest
messages seen on different channels in the same/adjacent block to the
first (lowest-channel) copy; off by default to preserve strict
per-channel receiver semantics.

The channel axis is embarrassingly parallel (no halo), which is what makes
it the natural second mesh dimension next to time sharding — see
parallel/wideband_mesh.WidebandMeshDecoder.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..ops.channelizer import (
    ChannelizerSpec,
    channel_offsets_hz,
    iq_bytes_to_frames,
    requantize_u16,
)
from ..protocols.base import Message, Parser
from ..decoder.pipeline import WindowDecoder


class CrossChannelDeduper:
    """Optional adjacent-channel ghost dedup (module docstring): drops a
    message whose digest another channel already emitted in the same or
    adjacent block; processed in (block, channel) order so the lowest
    channel wins. The one-block horizon matches the reference's dedup
    reach (main.go:252-292)."""

    def __init__(self):
        self.seen: dict = {}

    def filter(self, msgs, on_drop=None):
        from ..protocols.base import digest as mk_digest

        out = []
        for c, b, m in sorted(msgs, key=lambda t: (t[1], t[0])):
            d = mk_digest(m)
            prev = self.seen.get(d)
            if prev is not None and prev[1] != c and b - prev[0] <= 1:
                if on_drop is not None:
                    on_drop(c)
                continue
            self.seen[d] = (b, c)
            out.append((c, b, m))
        if out:
            horizon = max(b for _, b, _ in out) - 1
            self.seen = {
                d: (b, c) for d, (b, c) in self.seen.items() if b >= horizon
            }
        return out


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 4))
def _wideband_step(chspec, spec, wb_hist, wb_new, chan_tail, firsts):
    """One fused device step: wideband bytes -> packed decode results.

    wb_hist: (2, N, history_frames) f32 — carried wideband frame tail.
    wb_new:  (N * window,) u16 packed IQ pairs (preferred — zero-copy host
             view of the interleaved bytes), or (2 * N * window,) u8.
    chan_tail: (N, halo_staged) u16 carried per-channel staged halos.
    firsts: (N,) bool — stream-first flags (all channels start together).

    Returns (packed (N, P) u8, new wb_hist, new chan_tail, staged (N, S)).
    """
    import jax.numpy as jnp

    from ..ops.channelizer import channelize
    from ..ops.frontend import decode_windows_scan, staged_geometry

    n = chspec.n_channels
    w = spec.window
    geo = staged_geometry(spec)
    hs = spec.halo_staged

    if spec.backend == "pallas":
        # Fused branches+mix+requantize kernel (ops/pallas_channelizer.py)
        # over the PACKED u16 plane layout: one u16-width transpose is the
        # whole XLA prologue (no f32 frame planes ever materialize), the
        # I/Q split happens in VMEM; same accumulation order as the jnp
        # chain below (equal up to the FMA-contraction ulp — see the
        # kernel module docstring).
        from ..ops.channelizer import (
            iq_bytes_to_planes_u16,
            planes_u16_to_frames,
        )
        from ..ops.pallas_channelizer import channelize_requantize_fused_u16

        planes = iq_bytes_to_planes_u16(chspec, wb_new)  # (N, W) u16
        u16 = channelize_requantize_fused_u16(chspec, wb_hist, planes)
        frame_tail = planes_u16_to_frames(
            chspec, planes[:, w - chspec.history_frames :]
        )
    else:
        frames = iq_bytes_to_frames(chspec, wb_new)  # (2, N, W) f32
        ch = channelize(chspec, wb_hist, frames)  # (2, N, W) f32
        u16 = requantize_u16(ch)  # (N, W) u16
        frame_tail = frames[:, :, w - chspec.history_frames :]

    staged = jnp.zeros((n, geo.staged_samples), jnp.uint16)
    staged = staged.at[:, :hs].set(chan_tail)
    staged = staged.at[:, hs : hs + w].set(u16)
    new_tail = staged[:, w : w + hs]
    packed = decode_windows_scan(spec, staged, firsts)
    return packed, frame_tail, new_tail, staged


class WidebandDecoder:
    """Channelize-and-decode pipeline over one wideband stream.

    Args:
      parsers: registered protocol parsers (shared across channels).
      n_channels: filter-bank size N; the wideband input rate must be
        ``N * data_rate * chip_length`` (each channel lands at exactly the
        rate the decoder expects, protocol/decode.go:133).
      window_blocks/max_hits/backend: per-channel decode program knobs
        (see :class:`~rtlamr_tpu.decoder.pipeline.WindowDecoder`).
      taps_per_branch/cutoff_scale: prototype filter design
        (ops/channelizer.py).
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        n_channels: int,
        window_blocks: Optional[int] = 64,
        max_hits: int = 256,
        filter_fn=None,
        backend: str = "jnp",
        taps_per_branch: int = 8,
        cutoff_scale: float = 1.0,
        cross_channel_dedup: bool = False,
    ):
        self.cross_channel_dedup = cross_channel_dedup
        self.chspec = ChannelizerSpec(
            n_channels=n_channels,
            taps_per_branch=taps_per_branch,
            cutoff_scale=cutoff_scale,
        )
        # One parse-state holder per channel; they share the (value-equal)
        # FrontendSpec, so a single compiled program serves every channel.
        self._chan = [
            WindowDecoder(
                parsers,
                window_blocks=window_blocks,
                max_hits=max_hits,
                filter_fn=filter_fn,
                backend=backend,
            )
            for _ in range(n_channels)
        ]
        self.spec = self._chan[0].spec
        self.cfg = self._chan[0].cfg
        self.reset()

    def reset(self) -> None:
        import jax.numpy as jnp

        n = self.chspec.n_channels
        for c in self._chan:
            c.reset()
        self._wb_hist = jnp.zeros(
            (2, self.chspec.n_channels, self.chspec.history_frames),
            jnp.float32,
        )
        self._chan_tail = jnp.zeros(
            (n, self.spec.halo_staged), jnp.uint16
        )
        self._first = True
        self._window_index = 0
        self._plist: List[np.ndarray] = []
        self._psize = 0
        self._inflight = None
        self._xchan = CrossChannelDeduper()

    @property
    def n_channels(self) -> int:
        return self.chspec.n_channels

    @property
    def window_bytes(self) -> int:
        """Wideband bytes consumed per super-step."""
        return 2 * self.chspec.n_channels * self.spec.window

    @property
    def wideband_sample_rate(self) -> int:
        return self.chspec.n_channels * self.cfg.sample_rate

    def channel_center_freqs(self, wide_center_hz: int) -> np.ndarray:
        """Absolute RF center frequency of each channel for a capture
        centered at ``wide_center_hz`` (misc/modes.go channel math)."""
        return wide_center_hz + channel_offsets_hz(
            self.chspec, self.cfg.sample_rate
        )

    # -- streaming ----------------------------------------------------------

    @property
    def _pending(self) -> np.ndarray:
        """Unconsumed wideband bytes (chunk list; one concatenate per
        super-step instead of one per feed call — same scheme as
        WindowDecoder._pending)."""
        if not self._plist:
            return np.zeros(0, np.uint8)
        if len(self._plist) > 1:
            self._plist = [np.concatenate(self._plist)]
        return self._plist[0]

    @_pending.setter
    def _pending(self, value: np.ndarray) -> None:
        value = np.asarray(value, np.uint8)
        self._plist = [value] if value.size else []
        self._psize = int(value.size)

    def feed(self, wb_bytes: np.ndarray) -> List[Tuple[int, int, Message]]:
        """Feed wideband IQ bytes; returns (channel, block, message).

        As with :meth:`WindowDecoder.feed`, the chunk is retained by
        reference until decoded — callers must not mutate a passed buffer
        after the call. Pass a copy when reusing read buffers.
        """
        chunk = np.asarray(wb_bytes, np.uint8)
        if chunk.size:
            self._plist.append(chunk)
            self._psize += int(chunk.size)
        out: List[Tuple[int, int, Message]] = []
        wb = self.window_bytes
        if self._psize >= wb:
            buf = self._pending
            n_win = buf.size // wb
            for i in range(n_win):
                out.extend(self._process_chunk(buf[i * wb : (i + 1) * wb]))
            self._pending = buf[n_win * wb :]
        return out

    def flush(self) -> List[Tuple[int, int, Message]]:
        """Zero-pad and decode remaining full per-channel blocks; drain."""
        bs_wide = 2 * self.chspec.n_channels * self.cfg.block_size
        full_blocks = self._pending.size // bs_wide
        out: List[Tuple[int, int, Message]] = []
        if full_blocks:
            valid = self._pending[: full_blocks * bs_wide]
            self._pending = self._pending[full_blocks * bs_wide :]
            padded = np.zeros(self.window_bytes, np.uint8)
            padded[: valid.size] = valid
            out.extend(self._process_chunk(padded, valid_blocks=full_blocks))
        out.extend(self.drain())
        return out

    def drain(self) -> List[Tuple[int, int, Message]]:
        if self._inflight is None:
            return []
        inflight, self._inflight = self._inflight, None
        return self._complete(inflight)

    def decode_capture(
        self, wb_bytes: np.ndarray
    ) -> List[Tuple[int, int, Message]]:
        self.reset()
        out = self.feed(np.asarray(wb_bytes, np.uint8))
        out.extend(self.flush())
        return out

    # -- internals ----------------------------------------------------------

    def _process_chunk(
        self, chunk: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, int, Message]]:
        import jax.numpy as jnp

        n = self.chspec.n_channels
        if isinstance(chunk, np.ndarray):
            # Zero-copy u16 view of the interleaved byte pairs: the device
            # deinterleave then runs at u16 width with the I/Q split in the
            # fused kernel (ops/channelizer.iq_bytes_to_planes_u16).
            chunk = np.ascontiguousarray(chunk).view(np.uint16)
        firsts = jnp.full(n, self._first) if self._first else jnp.zeros(
            n, bool
        )
        packed, self._wb_hist, self._chan_tail, staged = _wideband_step(
            self.chspec,
            self.spec,
            self._wb_hist,
            jnp.asarray(chunk),
            self._chan_tail,
            firsts,
        )
        meta = (staged, self._first, valid_blocks, self._window_index)
        self._first = False
        self._window_index += 1

        out: List[Tuple[int, int, Message]] = []
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            out.extend(self._complete(prev))
        self._inflight = (packed, meta)
        return out

    def _complete(self, inflight) -> List[Tuple[int, int, Message]]:
        packed, (staged, first, valid_blocks, window_index) = inflight
        host = np.asarray(packed)  # ONE fetch for all channels
        out: List[Tuple[int, int, Message]] = []
        for c in range(self.chspec.n_channels):
            thunk = (lambda s=staged, cc=c: s[cc])
            msgs = self._chan[c]._complete_window(
                host[c], (thunk, first, valid_blocks, window_index)
            )
            out.extend((c, b, m) for b, m in msgs)
        if self.cross_channel_dedup:
            out = self._xchan.filter(
                out,
                on_drop=lambda c: setattr(
                    self._chan[c].metrics,
                    "messages_dropped_dup",
                    self._chan[c].metrics.messages_dropped_dup + 1,
                ),
            )
        return out

    def metrics_snapshot(self) -> dict:
        """Aggregated counters across channels."""
        agg: dict = {}
        for c in self._chan:
            for k, v in c.metrics.snapshot().items():
                if isinstance(v, (int, float)):
                    agg[k] = agg.get(k, 0) + v
        return agg
