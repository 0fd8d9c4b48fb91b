"""Wideband decode over a 2-D (channel x time) device mesh.

Composes the two parallelism axes of SURVEY §2's inventory in one sharded
program:

- **channel** (new in this framework; the reference is bound to one slab):
  embarrassingly parallel — each mesh row owns ``C / cdev`` channels and
  computes ONLY its rows of the DFT mix (ops/channelizer.mix_channels
  slices the mix matrix by ``axis_index("c")``), so no all-to-all is
  needed. The polyphase branch stage is replicated along "c" (it is a few
  multiply-adds per wideband sample — a small duplicated cost that buys
  zero channel-axis communication).
- **time** (the overlap-save axis of parallel/mesh.py): each mesh column
  owns ``scan_windows`` consecutive windows per super-batch; the wideband
  filter history (``taps_per_branch * N`` complex samples) and the decode
  halo (PacketLength + SymbolLength u16 samples per channel) both travel
  to the right neighbor via in-program ``ppermute`` over ICI.

Per super-batch ONE program: wideband bytes -> channelize -> requantize ->
per-(channel, window) overlap-save staging -> lax.scan of the shared decode
program -> packed candidates, sharded P("c", "x"). The host fetches one
packed buffer and parses per channel in time order with the reference's
exact block/dedup semantics (per-channel states, as in
parallel/wideband.WidebandDecoder).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.channelizer import (
    ChannelizerSpec,
    iq_bytes_to_frames,
    mix_channels,
    polyphase_branches,
    requantize_u16,
)
from ..ops.frontend import (
    FrontendSpec,
    decode_core_staged,
    pack_results,
    staged_geometry,
)
from ..protocols.base import Message, Parser
from ..decoder.pipeline import WindowDecoder
from .wideband import CrossChannelDeduper


def _shard_body(
    chspec: ChannelizerSpec,
    spec: FrontendSpec,
    cdev: int,
    tdev: int,
    k: int,
    wb_loc,
    wb_hist,
    chan_tail_loc,
    firsts_loc,
):
    """Per-device body under shard_map on the ("c", "x") mesh.

    wb_loc:        (1, K*N*W) u16 packed IQ pairs — this time shard's
                   wideband samples (replicated along "c").
    wb_hist:       (2, N, history_frames) f32 replicated — previous
                   super-batch's wideband frame tail.
    chan_tail_loc: (C_loc, halo) u16 — previous super-batch's per-channel
                   decode halos.
    firsts_loc:    (C_loc, K) bool — stream-first flags.
    """
    n = chspec.n_channels
    c_loc = n // cdev
    w = spec.window
    halo = spec.halo
    hs = spec.halo_staged
    ps = spec.pad_shift
    geo = staged_geometry(spec)
    hf = chspec.history_frames
    perm_x = [(i, (i + 1) % tdev) for i in range(tdev)]
    xi = jax.lax.axis_index("x")

    # Wideband filter history from the left time-neighbor (tiny: P frames
    # x N positions of re/im over ICI); shard 0 gets the super-batch carry.
    frames = iq_bytes_to_frames(chspec, wb_loc[0])  # (2, N, K*W)
    wtail = frames[:, :, frames.shape[2] - hf :]
    left = jax.lax.ppermute(wtail, "x", perm_x)
    left = jnp.where(xi == 0, wb_hist, left)

    # Channelize: branches replicated, mix only OUR channel rows (MXU).
    y = polyphase_branches(chspec, left, frames)  # (2, N, K*W)
    ci = jax.lax.axis_index("c")
    ch = mix_channels(chspec, y, ci * c_loc, c_loc)  # (C_loc, K*W)
    u16 = requantize_u16(ch)

    # Decode halo along time: our last-window tail -> right neighbor.
    dtail = u16[:, k * w - halo :]  # (C_loc, halo)
    dleft = jax.lax.ppermute(dtail, "x", perm_x)
    dleft = jnp.where(xi == 0, chan_tail_loc, dleft)

    u16k = u16.reshape(c_loc, k, w)
    stag = jnp.zeros((c_loc, k, geo.staged_samples), jnp.uint16)
    stag = stag.at[:, :, hs : hs + w].set(u16k)
    if k > 1:
        stag = stag.at[:, 1:, ps:hs].set(u16k[:, :-1, w - halo :])
    stag = stag.at[:, 0, ps:hs].set(dleft)

    def step(_, args):
        st, fi = args
        return None, pack_results(decode_core_staged(spec, st, fi))

    _, packed = jax.lax.scan(
        step,
        None,
        (
            stag.reshape(c_loc * k, geo.staged_samples),
            firsts_loc.reshape(c_loc * k),
        ),
    )
    packed = packed.reshape(c_loc, 1, k, -1)
    return packed, wtail[None], dtail[:, None, :], stag[:, None]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _decode_superbatch_wide(
    chspec, spec, mesh, cdev, tdev, k, wb, wb_hist, chan_tail, firsts
):
    body = functools.partial(_shard_body, chspec, spec, cdev, tdev, k)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("x", None), P(), P("c", None), P("c", "x")),
        out_specs=(
            P("c", "x", None, None),  # packed (C, tdev, K, P)
            P("x", None, None, None),  # wb tails (tdev, 2, N, hist_frames)
            P("c", "x", None),  # decode tails (C, tdev, halo)
            P("c", "x", None, None),  # staged (C, tdev, K, S)
        ),
        check_vma=False,
    )(wb, wb_hist, chan_tail, firsts)


class WidebandMeshDecoder:
    """Channelize-and-decode over a (cdev x tdev) mesh.

    Message sets per channel are identical to
    :class:`~rtlamr_tpu.parallel.wideband.WidebandDecoder`; only the
    execution layout differs. ``n_channels`` must be divisible by ``cdev``
    and each time shard holds ``scan_windows`` windows per super-batch.
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        n_channels: int,
        mesh_shape: Tuple[int, int],
        devices: Optional[Sequence] = None,
        window_blocks: Optional[int] = None,
        max_hits: int = 256,
        filter_fn=None,
        backend: str = "jnp",
        scan_windows: int = 2,
        taps_per_branch: int = 8,
        cutoff_scale: float = 1.0,
        cross_channel_dedup: bool = False,
    ):
        cdev, tdev = mesh_shape
        if n_channels % cdev:
            raise ValueError("n_channels must be divisible by mesh cdev")
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < cdev * tdev:
            raise ValueError(
                f"mesh {mesh_shape} needs {cdev * tdev} devices, "
                f"have {len(devices)}"
            )
        self.mesh = Mesh(
            np.array(devices[: cdev * tdev]).reshape(cdev, tdev), ("c", "x")
        )
        self.cdev, self.tdev = cdev, tdev
        self.scan_windows = scan_windows
        self.chspec = ChannelizerSpec(
            n_channels=n_channels,
            taps_per_branch=taps_per_branch,
            cutoff_scale=cutoff_scale,
        )
        self.cross_channel_dedup = cross_channel_dedup
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
        if self.spec.window < self.spec.halo:
            raise ValueError("per-shard window must cover the halo")
        self._wb_sharding = NamedSharding(self.mesh, P("x", None))
        self._tail_sharding = NamedSharding(self.mesh, P("c", None))
        self._firsts_sharding = NamedSharding(self.mesh, P("c", "x"))
        self._replicated = NamedSharding(self.mesh, P())
        self.reset()

    def reset(self) -> None:
        n = self.chspec.n_channels
        for c in self._chan:
            c.reset()
        self._wb_hist = jax.device_put(
            np.zeros(
                (2, self.chspec.n_channels, self.chspec.history_frames),
                np.float32,
            ),
            self._replicated,
        )
        self._chan_tail = jax.device_put(
            np.zeros((n, self.spec.halo), np.uint16), self._tail_sharding
        )
        self._first = True
        self._window_index = 0
        self._xchan = CrossChannelDeduper()
        self._plist: List[np.ndarray] = []
        self._psize = 0
        #: super-batches complete synchronously (one fetch per batch), so
        #: there is never an undrained dispatch; kept for the checkpoint
        #: boundary check shared with the other decoders.
        self._inflight = None

    @property
    def n_channels(self) -> int:
        return self.chspec.n_channels

    @property
    def superbatch_bytes(self) -> int:
        """Wideband bytes consumed per super-batch."""
        return (
            2
            * self.chspec.n_channels
            * self.spec.window
            * self.tdev
            * self.scan_windows
        )

    @property
    def wideband_sample_rate(self) -> int:
        return self.chspec.n_channels * self.cfg.sample_rate

    def channel_center_freqs(self, wide_center_hz: int) -> np.ndarray:
        """Absolute RF center frequency of each channel (misc/modes.go)."""
        from ..ops.channelizer import channel_offsets_hz

        return wide_center_hz + channel_offsets_hz(
            self.chspec, self.cfg.sample_rate
        )

    # -- streaming (same surface as WidebandDecoder, super-batch granular) --

    @property
    def window_bytes(self) -> int:
        """Wideband bytes consumed per decode step (one super-batch)."""
        return self.superbatch_bytes

    @property
    def _pending(self) -> np.ndarray:
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

        The chunk is retained by reference until decoded — callers must not
        mutate a passed buffer after the call (same contract as
        WidebandDecoder.feed)."""
        chunk = np.asarray(wb_bytes, np.uint8)
        if chunk.size:
            self._plist.append(chunk)
            self._psize += int(chunk.size)
        out: List[Tuple[int, int, Message]] = []
        sb = self.superbatch_bytes
        if self._psize >= sb:
            buf = self._pending
            n_sb = buf.size // sb
            for i in range(n_sb):
                out.extend(self.decode_superbatch(buf[i * sb : (i + 1) * sb]))
            self._pending = buf[n_sb * sb :]
        return out

    def flush(self) -> List[Tuple[int, int, Message]]:
        """Zero-pad and decode remaining full per-channel blocks."""
        bs_wide = 2 * self.chspec.n_channels * self.cfg.block_size
        full_blocks = self._pending.size // bs_wide
        out: List[Tuple[int, int, Message]] = []
        if full_blocks:
            valid = self._pending[: full_blocks * bs_wide]
            self._pending = self._pending[full_blocks * bs_wide :]
            padded = np.zeros(self.superbatch_bytes, np.uint8)
            padded[: valid.size] = valid
            out.extend(
                self.decode_superbatch(padded, valid_blocks=full_blocks)
            )
        return out

    def drain(self) -> List[Tuple[int, int, Message]]:
        """Super-batches complete synchronously; nothing to drain."""
        return []

    def metrics_snapshot(self) -> dict:
        """Aggregated counters across channels."""
        agg: dict = {}
        for c in self._chan:
            for k, v in c.metrics.snapshot().items():
                if isinstance(v, (int, float)):
                    agg[k] = agg.get(k, 0) + v
        return agg

    def decode_superbatch(
        self, wb_bytes: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, int, Message]]:
        """Decode one super-batch of wideband bytes; returns
        (channel, block, message). ``valid_blocks``: per-channel count of
        valid blocks (zero-padded final batch); None = all."""
        k, tdev = self.scan_windows, self.tdev
        n = self.chspec.n_channels
        spec = self.spec
        # Zero-copy u16 view: the per-shard deinterleave runs at u16 width
        # (ops/channelizer.iq_bytes_to_planes_u16).
        wb = (
            np.ascontiguousarray(np.asarray(wb_bytes, np.uint8))
            .view(np.uint16)
            .reshape(tdev, k * n * spec.window)
        )
        firsts = np.zeros((n, tdev * k), bool)
        if self._first:
            firsts[:, 0] = True
        packed, wtails, dtails, stag = _decode_superbatch_wide(
            self.chspec,
            spec,
            self.mesh,
            self.cdev,
            tdev,
            k,
            jax.device_put(wb, self._wb_sharding),
            self._wb_hist,
            self._chan_tail,
            jax.device_put(firsts, self._firsts_sharding),
        )
        # Carries for the next super-batch (device-resident lazy slices).
        self._wb_hist = jax.device_put(wtails[-1], self._replicated)
        self._chan_tail = jax.device_put(
            dtails[:, -1], self._tail_sharding
        )

        host = np.asarray(packed)  # ONE fetch: (C, tdev, K, P)
        wb_blocks = spec.window // spec.block_size
        total_valid = (
            valid_blocks if valid_blocks is not None else tdev * k * wb_blocks
        )
        first0 = self._first
        out: List[Tuple[int, int, Message]] = []
        for xi in range(tdev):
            for kk in range(k):
                win = xi * k + kk
                win_valid = min(
                    max(total_valid - win * wb_blocks, 0), wb_blocks
                )
                if win_valid == 0:
                    continue
                for c in range(n):
                    thunk = (lambda s=stag, cc=c, x_=xi, k_=kk: s[cc, x_, k_])
                    msgs = self._chan[c]._complete_window(
                        host[c, xi, kk],
                        (
                            thunk,
                            first0 and win == 0,
                            win_valid if win_valid < wb_blocks else None,
                            self._window_index + win,
                        ),
                    )
                    out.extend((c, b, m) for b, m in msgs)
        self._window_index += tdev * k
        self._first = False
        if self.cross_channel_dedup:
            out = self._xchan.filter(out)
        return out

    def decode_capture(
        self, wb_bytes: np.ndarray
    ) -> List[Tuple[int, int, Message]]:
        """Decode a whole wideband capture (zero-padding the final batch)."""
        self.reset()
        wb = np.asarray(wb_bytes, np.uint8)
        sb = self.superbatch_bytes
        bs_wide = 2 * self.chspec.n_channels * self.cfg.block_size
        out: List[Tuple[int, int, Message]] = []
        lo = 0
        while lo + sb <= wb.size:
            out.extend(self.decode_superbatch(wb[lo : lo + sb]))
            lo += sb
        rest = wb[lo:]
        full_blocks = rest.size // bs_wide
        if full_blocks:
            padded = np.zeros(sb, np.uint8)
            padded[: full_blocks * bs_wide] = rest[: full_blocks * bs_wide]
            out.extend(
                self.decode_superbatch(padded, valid_blocks=full_blocks)
            )
        return out


def dryrun(n_devices: int) -> int:
    """Compile-and-run the full (channel x time) wideband mesh on tiny
    shapes: packets planted inside shards, exactly on the time-shard seam,
    and straddling the super-batch boundary, each on its own channel; the
    message stream must equal the single-chip WidebandDecoder's exactly.
    Returns the number of decoded messages."""
    from ..protocols import new_parser
    from ..ref import synth
    from .wideband import WidebandDecoder

    chip = 8
    n_channels = 4
    cdev = 2 if n_devices >= 2 and n_devices % 2 == 0 else 1
    tdev = n_devices // cdev
    parsers = [new_parser("scm", chip)]
    dec = WidebandMeshDecoder(
        parsers,
        n_channels=n_channels,
        mesh_shape=(cdev, tdev),
        devices=jax.devices()[:n_devices],
        window_blocks=None,
        max_hits=32,
    )
    w = dec.spec.window
    k = dec.scan_windows
    shard_span = k * w
    batch_span = tdev * shard_span
    scm_len = 96 * dec.cfg.symbol_length
    planted = [
        (0, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111001, consumption=1),
            dec.cfg.block_size // 2)),
        (2, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=333003, consumption=3), w + 64)),
        # Straddling the super-batch boundary (wideband + decode carries).
        (3, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=444004, consumption=4),
            batch_span - scm_len // 2)),
    ]
    expected = [111001, 333003, 444004]
    if tdev > 1:
        # Exactly on the first time-shard seam (in-program ppermute halo).
        planted.append(
            (1, synth.bits_to_burst(
                synth.make_scm_bits(meter_id=222002, consumption=2),
                shard_span - scm_len // 2))
        )
        expected.append(222002)
    wb = synth.render_wideband(
        2 * batch_span, planted, n_channels, chip,
        amplitude=90.0, noise=2.0, seed=41,
    )
    msgs = dec.decode_capture(wb)
    ids = sorted(m.meter_id() for _, _, m in msgs)
    assert ids == sorted(expected), (
        f"wideband dryrun decoded {ids}, expected {sorted(expected)}"
    )
    single = WidebandDecoder(
        parsers, n_channels=n_channels,
        window_blocks=None, max_hits=32,
    )
    got = [(c, b, str(m)) for c, b, m in msgs]
    want = [(c, b, str(m)) for c, b, m in single.decode_capture(wb)]
    assert sorted(got) == sorted(want), (
        f"wideband mesh diverged from single-chip:\n{got}\n{want}"
    )
    return len(msgs)
