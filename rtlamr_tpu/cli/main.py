"""rtlamr CLI — receiver lifecycle and the streaming loop.

Mirrors the reference's orchestration (main.go:59-368): flag handling and
env override, receiver construction, tuner configuration over rtl_tcp,
filter-chain assembly, the steady-state decode loop with cross-block dedup,
-single one-shot behavior, -duration time limit, and -samplefile dumping.
The three-goroutine pipeline becomes: read a chunk -> feed the window
decoder (device program) -> encode filtered, deduped messages.
"""

from __future__ import annotations

import datetime
import itertools
import os
import sys
import time
from typing import List, Optional, Sequence

import numpy as np

from .. import __version__
from ..decoder.pipeline import WindowDecoder
from ..io.capture import (
    ArraySource,
    FileSource,
    IQSource,
    RtlTcpSource,
    SampleDumper,
    SampleRing,
    StdinSource,
)
from ..io.rtltcp import RtlTcpClient
from ..protocols import new_parser
from .encoders import LogMessage, make_encoder
from .filters import FilterChain, MeterIDFilter, MeterTypeFilter, UniqueFilter
from .flags import VALID_SYMBOL_LENGTHS, FlagSet, build_flagset


def _log(*args) -> None:
    print(*args, file=sys.stderr)


def expand_msgtypes(msgtypes: set) -> List[str]:
    """"all" alone expands to scm, scm+, idm, r900 (main.go:67-73)."""
    if msgtypes == {"all"}:
        return ["scm", "scm+", "idm", "r900"]
    return sorted(msgtypes)


def build_filter_chain(fs: FlagSet) -> FilterChain:
    """Filter chain in the reference's flag.Visit order (main.go:97-114:
    lexicographic — filterid, filtertype, unique)."""
    fc = FilterChain()
    if fs["filterid"].set_explicitly:
        fc.append(MeterIDFilter(fs.value("filterid")))
    if fs["filtertype"].set_explicitly:
        fc.append(MeterTypeFilter(fs.value("filtertype")))
    if fs.value("unique"):
        fc.append(UniqueFilter())
    return fc


def _wideband_mesh_shape(channels: int, n_devices: int) -> tuple:
    """(cdev, tdev) for -channels -mesh: the largest channel-axis shard
    count that divides both the channel count and the device count (channel
    sharding is halo-free, so it is preferred), time shards on the rest."""
    for cdev in range(min(channels, n_devices), 0, -1):
        if channels % cdev == 0 and n_devices % cdev == 0:
            return cdev, n_devices // cdev
    return 1, n_devices


class Receiver:
    """Receiver lifecycle (main.go:49-133) for live and offline sources."""

    def __init__(self, fs: FlagSet):
        self.fs = fs
        chip_length = fs.value("symbollength")
        self.latency = fs.value("latency")
        if self.latency and not fs["windowblocks"].set_explicitly:
            # Latency preset: a 4-block window keeps the device program's
            # span ~7 ms of airtime at the default rate (vs ~110 ms at the
            # throughput default of 64); -windowblocks still wins when set.
            fs["windowblocks"].value = 4

        names = expand_msgtypes(fs.value("msgtype"))
        self.parsers = []
        for name in names:
            try:
                self.parsers.append(new_parser(name, chip_length))
            except ValueError as e:
                _log("message type error:", e)
                raise SystemExit(1)

        self.fc = build_filter_chain(fs)

        channels = fs.value("channels")
        if channels < 1:
            _log(f"invalid -channels value {channels} (want >= 1)")
            raise SystemExit(1)
        self.wideband = channels > 1
        if self.wideband:
            # Wideband mode: one stream at channels*samplerate, channelized
            # on device and decoded per channel (parallel/wideband.py).
            # With -mesh the 2-D (channel x time) WidebandMeshDecoder
            # spreads the same program over all local chips; message
            # streams are byte-identical to the single-chip path.
            if fs.value("mesh"):
                import jax

                from ..parallel.wideband_mesh import WidebandMeshDecoder

                n_dev = len(jax.devices())
                cdev, tdev = _wideband_mesh_shape(channels, n_dev)
                _log(
                    f"wideband mesh: {cdev} channel-shards x {tdev} "
                    f"time-shards over {cdev * tdev} devices"
                )
                self.decoder = WidebandMeshDecoder(
                    self.parsers,
                    n_channels=channels,
                    mesh_shape=(cdev, tdev),
                    window_blocks=fs.value("windowblocks"),
                    max_hits=fs.value("maxhits"),
                    filter_fn=self.fc.match,
                    backend=fs.value("backend"),
                    cross_channel_dedup=fs.value("crosschanneldedup"),
                )
            else:
                from ..parallel.wideband import WidebandDecoder

                self.decoder = WidebandDecoder(
                    self.parsers,
                    n_channels=channels,
                    window_blocks=fs.value("windowblocks"),
                    max_hits=fs.value("maxhits"),
                    filter_fn=self.fc.match,
                    backend=fs.value("backend"),
                    cross_channel_dedup=fs.value("crosschanneldedup"),
                )
        else:
            decoder_cls = WindowDecoder
            if fs.value("mesh"):
                from ..parallel.mesh import MeshDecoder

                decoder_cls = MeshDecoder
            self.decoder = decoder_cls(
                self.parsers,
                window_blocks=fs.value("windowblocks"),
                max_hits=fs.value("maxhits"),
                filter_fn=self.fc.match,
                backend=fs.value("backend"),
            )
        self.cfg = self.decoder.cfg
        self.client: Optional[RtlTcpClient] = None

    def wide_center_freq(self) -> int:
        """The wideband capture's RF center (explicit -centerfreq wins)."""
        if self.fs["centerfreq"].set_explicitly:
            return self.fs.value("centerfreq")
        return self.cfg.center_freq

    def log_channel_plan(self) -> None:
        """Startup per-channel center-frequency dump (wideband mode)."""
        freqs = self.decoder.channel_center_freqs(self.wide_center_freq())
        rate = self.decoder.wideband_sample_rate
        _log(
            f"wideband: {self.decoder.n_channels} channels at "
            f"{rate} S/s total"
        )
        for c, f in enumerate(freqs):
            _log(f"  channel {c}: {f / 1e6:.6f} MHz")

    def _use_native(self) -> bool:
        """Resolve the -ingest flag (native C++ transport vs pure Python)."""
        mode = self.fs.value("ingest")
        if mode not in ("auto", "native", "python"):
            _log(f"invalid -ingest value {mode!r} (want auto|native|python)")
            raise SystemExit(1)
        if mode == "python":
            return False
        from .. import native

        if native.available():
            return True
        if mode == "native":
            _log(f"native ingest unavailable: {native.load_error()}")
            raise SystemExit(1)
        return False

    def open_source(self) -> IQSource:
        fs = self.fs
        fromfile = fs.value("fromfile")
        if fromfile:
            if fromfile == "-":
                return StdinSource()
            if self._use_native():
                from ..native import NativeFileSource

                return NativeFileSource(fromfile)
            return FileSource(fromfile)

        cfg = self.cfg
        if self._use_native():
            from ..native import NativeRtlTcpClient

            client = NativeRtlTcpClient(fs.value("server"))
        else:
            client = RtlTcpClient(fs.value("server"))
        info = client.connect()
        self.client = client

        center_freq = (
            fs.value("centerfreq")
            if fs["centerfreq"].set_explicitly
            else cfg.center_freq
        )
        native_rate = (
            self.decoder.wideband_sample_rate if self.wideband
            else cfg.sample_rate
        )
        sample_rate = (
            fs.value("samplerate")
            if fs["samplerate"].set_explicitly
            else native_rate
        )
        client.set_center_freq(center_freq)
        client.set_sample_rate(sample_rate)

        gain_flags = ("gainbyindex", "tunergainmode", "tunergain", "agcmode")
        gain_set = any(self.fs[g].set_explicitly for g in gain_flags)
        if not gain_set:
            client.set_gain_mode(manual=False)  # auto gain (main.go:119-121)
        else:
            if fs["tunergainmode"].set_explicitly:
                client.set_gain_mode(manual=fs.value("tunergainmode"))
            if fs["tunergain"].set_explicitly:
                client.set_tuner_gain(fs.value("tunergain") * 10)
            if fs["gainbyindex"].set_explicitly:
                client.set_gain_by_index(fs.value("gainbyindex"))
            if fs["agcmode"].set_explicitly:
                client.set_agc_mode(fs.value("agcmode"))
        if fs["freqcorrection"].set_explicitly:
            client.set_freq_correction(fs.value("freqcorrection"))
        if fs["directsampling"].set_explicitly:
            client.set_direct_sampling(fs.value("directsampling"))
        if fs["offsettuning"].set_explicitly:
            client.set_offset_tuning(fs.value("offsettuning"))
        if fs["biastee"].set_explicitly:
            client.set_bias_tee(fs.value("biastee"))

        _log(f"rtl_tcp GainCount: {info.gain_count}")
        return RtlTcpSource(client)


def _enable_compile_cache() -> None:
    """Persist XLA compiles across CLI invocations.

    Remote-attached TPU transports compile slowly; the on-disk cache makes
    every run after the first start in milliseconds. Opt out with
    RTLAMR_JAX_CACHE=off; override the location with RTLAMR_JAX_CACHE=dir.
    """
    loc = os.environ.get("RTLAMR_JAX_CACHE", "")
    if loc.lower() == "off":
        return
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "rtlamr_tpu",
            "jax",
        )
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
    except Exception:
        pass  # cache is an optimization; never block the decode


def run_multihost(fs: FlagSet, out=sys.stdout) -> int:
    """Multi-host capture decode (-coordinator/-numprocs/-procid).

    Every host runs the SAME command; ``jax.distributed`` builds one global
    device mesh and each process decodes its contiguous share of every
    super-batch of the -fromfile capture through
    :class:`~rtlamr_tpu.parallel.distributed.MultiHostDecoder` (in-program
    ppermute halos, seam digest dedup — packets straddling host boundaries
    decode exactly once globally). Each process emits ITS windows' messages
    on its own stdout. Offset/Length locate each message's reference block
    directly in the -fromfile capture (offset = global block index *
    block bytes; length = one block) — the seekable-source analog of the
    reference's sample-dump coordinates (main.go:244-284,
    protocol/parse.go:105-111). ``-duration`` and ``-single`` are honored
    collectively: each super-batch, processes agree on stop via a tiny
    allgather (any deadline hit, or the -single condition met globally).
    ``-checkpoint`` resumes a pod decode: one file set per process
    (suffix ``.pN``), written on interrupt and at end of a truncated run.
    """
    import os as _os

    fromfile = fs.value("fromfile")
    if not fromfile or fromfile == "-":
        _log("-coordinator requires -fromfile (seekable capture)")
        raise SystemExit(1)
    # Flags the multi-host batch path does not implement — say so loudly
    # rather than dropping them silently.
    unsupported = ("samplefile", "channels", "latency", "mesh")
    for name in unsupported:
        if fs[name].set_explicitly:
            _log(f"-{name} is not supported in multi-host mode; ignoring")
    _enable_compile_cache()

    from ..parallel.distributed import MultiHostDecoder, initialize

    num_procs = fs.value("numprocs")
    proc_id = fs.value("procid")
    cpudev = fs.value("cpudevices")
    initialize(
        fs.value("coordinator"),
        num_procs,
        proc_id,
        cpu_devices_per_process=cpudev if cpudev > 0 else None,
    )

    chip_length = fs.value("symbollength")
    parsers = [
        new_parser(name, chip_length)
        for name in expand_msgtypes(fs.value("msgtype"))
    ]
    fc = build_filter_chain(fs)
    dec = MultiHostDecoder(
        parsers,
        window_blocks=fs.value("windowblocks"),
        max_hits=fs.value("maxhits"),
        backend=fs.value("backend"),
        filter_fn=fc.match,
    )
    _log(dec.cfg.describe())
    encoder = make_encoder(fs.value("format"), out)

    lwb = dec.local_window_bytes
    batch_bytes = num_procs * lwb
    bs2 = dec.cfg.block_size2
    file_bytes = _os.path.getsize(fromfile)
    total_blocks = file_bytes // bs2
    batch_blocks = batch_bytes // bs2

    single = fs.value("single")
    waiting_ids = set(fs.value("filterid")) if single else set()
    duration = fs.value("duration")
    deadline = time.monotonic() + duration if duration > 0 else None
    need_stop_sync = single or deadline is not None

    j0 = 0
    ckpt_path = fs.value("checkpoint")
    if ckpt_path:
        from ..decoder.checkpoint import (
            MultiHostCheckpoint,
            capture_checkpoint,
            restore_checkpoint,
        )

        if _os.path.exists(f"{ckpt_path}.p{proc_id}.meta.json"):
            ckpt = MultiHostCheckpoint.load(ckpt_path, proc_id)
            restore_checkpoint(dec, ckpt)
            j0 = ckpt.byte_offset // batch_bytes
            _log(f"resumed from checkpoint at byte {ckpt.byte_offset}")

    got_any = False  # -single without -filterid: any message stops the run

    def emit(msgs):
        nonlocal got_any
        for b, msg in msgs:
            got_any = True
            if waiting_ids:
                waiting_ids.discard(msg.meter_id())
            encoder.encode(
                LogMessage(
                    time=datetime.datetime.now(),
                    offset=b * bs2,
                    length=bs2,
                    msg=msg,
                )
            )

    def agree_stop() -> bool:
        """Collective stop decision (tiny allgather; all processes see the
        same verdict, so nobody blocks in a later collective)."""
        from jax.experimental import multihost_utils

        if deadline is not None and time.monotonic() >= deadline:
            local = True
        elif single:
            local = not waiting_ids if fs["filterid"].set_explicitly else got_any
        else:
            local = False
        if num_procs == 1:
            return local
        votes = np.asarray(
            multihost_utils.process_allgather(
                np.array([1 if local else 0], np.int32)
            )
        )
        if single and fs["filterid"].set_explicitly:
            # The -filterid meters may report on different processes:
            # gather which meters each process is still waiting for and
            # keep only those NO process has seen.
            ids = sorted(fs.value("filterid"))
            seen = np.array(
                [0 if i in waiting_ids else 1 for i in ids], np.int64
            )
            seen_all = np.asarray(
                multihost_utils.process_allgather(seen)
            ).max(axis=0)
            waiting_ids.intersection_update(
                i for i, s in zip(ids, seen_all) if not s
            )
            return bool(votes.any()) or not waiting_ids
        return bool(votes.any())

    stopped = False
    interrupted = False
    j = j0
    try:
        with open(fromfile, "rb") as f:
            while j * batch_bytes < total_blocks * bs2:
                f.seek(j * batch_bytes + proc_id * lwb)
                seg = np.frombuffer(f.read(lwb), np.uint8)
                if seg.size < lwb:
                    pad = np.zeros(lwb, np.uint8)
                    pad[: seg.size] = seg
                    seg = pad
                vb = min(total_blocks - j * batch_blocks, batch_blocks)
                emit(
                    dec.decode_superbatch_local(
                        seg, valid_blocks=vb if vb < batch_blocks else None
                    )
                )
                j += 1
                if need_stop_sync and agree_stop():
                    if deadline is not None and time.monotonic() >= deadline:
                        _log("time limit reached")
                    stopped = True
                    break
        # Complete the dispatch-ahead tail. After a -single stop the
        # reference's receiver is already cancelled (main.go:270-276), so
        # in-flight messages are not emitted.
        tail = dec.drain()
        if not (stopped and single):
            emit(tail)
    except KeyboardInterrupt:
        interrupted = True
        _log("interrupted")
        emit(dec.drain())
    if ckpt_path and (interrupted or stopped or j < -(-total_blocks // batch_blocks)):
        boundary = min(j * batch_bytes, total_blocks * bs2)
        capture_checkpoint(dec, boundary).save(ckpt_path)
        _log(f"checkpoint saved at byte {boundary}")
    if fs.value("metrics"):
        _log("metrics:", dec._local.metrics.snapshot())
    return 0


def run(fs: FlagSet, out=sys.stdout) -> int:
    from ..utils.observability import RateWatchdog, profile_trace

    if fs.value("coordinator"):
        return run_multihost(fs, out)

    _enable_compile_cache()
    receiver = Receiver(fs)
    # Startup config dump, unconditional — the reference logs the decoder
    # config at receiver construction (main.go:124, decode.go:73-90), for
    # both live and -fromfile runs.
    _log(receiver.cfg.describe())
    if receiver.wideband:
        receiver.log_channel_plan()
    dumper = SampleDumper(fs.value("samplefile"))
    encoder = make_encoder(fs.value("format"), out, fs.value("samplefile"))

    # -single bookkeeping (main.go:270-276): with -filterid, wait for one
    # message from each listed meter.
    single = fs.value("single")
    waiting_ids = set(fs.value("filterid")) if single else set()

    duration = fs.value("duration")
    deadline = time.monotonic() + duration if duration > 0 else None

    source = receiver.open_source()
    dec = receiver.decoder
    wideband = receiver.wideband
    nch = dec.n_channels if wideband else 1
    live = not fs.value("fromfile")
    ingest_rate = dec.wideband_sample_rate if wideband else dec.cfg.sample_rate
    watchdog = RateWatchdog(ingest_rate, warn=_log) if live else None

    ckpt_path = fs.value("checkpoint")
    consumed = 0
    if ckpt_path:
        from ..decoder.checkpoint import load_checkpoint, restore_checkpoint
        import os as _os

        if _os.path.exists(ckpt_path + ".meta.json"):
            ckpt = load_checkpoint(ckpt_path)
            restore_checkpoint(dec, ckpt)
            consumed = ckpt.byte_offset
            if not live:
                # Skip already-decoded capture bytes.
                skipped = 0
                while skipped < consumed:
                    part = source.read(min(1 << 20, consumed - skipped))
                    if part.size == 0:
                        break
                    skipped += part.size
            _log(f"resumed from checkpoint at byte {consumed}")

    # In wideband mode the ring (and -samplefile dumps) hold WIDEBAND
    # bytes: channel-block b of every channel comes from the same wideband
    # byte range, so one ring block = nch * block_size2 bytes.
    block_bytes = nch * dec.cfg.block_size2
    # Latency preset reads one reference block per iteration (the Go
    # receiver's own granularity, main.go:156-205) instead of the large
    # throughput-oriented chunks, so data never waits in the read buffer.
    chunk_bytes = (
        block_bytes if receiver.latency else max(block_bytes, 1 << 18)
    )
    # Rolling sample buffer simulation for Offset/Length and -samplefile
    # dumps (main.go:225-230,279-284). Blocks are retained up to the
    # dispatch-ahead decode latency (two windows) plus the ring capacity.
    ring_cap_blocks = -(-dec.cfg.buffer_length * 2 // dec.cfg.block_size2)
    ring = SampleRing(
        dumper,
        block_bytes,
        nch * dec.cfg.buffer_length * 2,
        # One decode step spans window_bytes (a super-batch for the
        # wideband mesh); blocks are retained up to two steps of
        # dispatch-ahead latency plus the ring capacity.
        max_lag_blocks=2 * (dec.window_bytes // block_bytes)
        + ring_cap_blocks
        + 4,
    )
    if consumed:
        # Resumed mid-capture: the ring walk restarts at the resume block
        # (Offset/Length of re-decoded history are not replayed).
        resumed_blocks = consumed // block_bytes
        ring._next_fed = resumed_blocks
        ring._sim_block = resumed_blocks - 1
    def _by_block(msgs):
        """Normalize decode results to block-major (block, channel, msg).

        WindowDecoder yields (block, msg); WidebandDecoder yields
        (channel, block, msg) channel-major — re-sort so the ring walk
        advances monotonically."""
        if wideband:
            return [
                (b, c, m) for c, b, m in sorted(msgs, key=lambda t: (t[1], t[0]))
            ]
        return [(b, None, m) for b, m in msgs]

    dropped_seen = 0
    stop = False
    eof = False
    try:
        with profile_trace(fs.value("profiledir") or None):
            while not stop:
                if deadline is not None and time.monotonic() >= deadline:
                    _log("time limit reached")
                    break
                try:
                    chunk = source.read(chunk_bytes)
                except (EOFError, OSError) as e:
                    # A stalled or closed stream cancels the receiver, like
                    # the reference's read-deadline path (main.go:168-181).
                    _log(f"source read: {e}")
                    chunk = np.zeros(0, np.uint8)
                if watchdog is not None:
                    watchdog.add_bytes(chunk.size)
                    dropped = source.dropped_bytes()
                    if dropped > dropped_seen:
                        _log(
                            "ingest ring overflow: "
                            f"{dropped} bytes dropped so far"
                        )
                    dropped_seen = dropped
                    if not wideband:
                        dec.metrics.extra["bytes_dropped"] = dropped
                if chunk.size == 0:
                    eof = True
                    msgs = dec.flush()
                else:
                    ring.feed(chunk)
                    msgs = dec.feed(chunk)
                    consumed += chunk.size
                    if receiver.latency:
                        # Synchronous completion: skip the one-window
                        # dispatch-ahead so results emit as soon as the
                        # window computes (throughput preset keeps it).
                        msgs = list(msgs) + list(dec.drain())
                # Messages arrive ordered by block; replay the reference's
                # per-block ring walk (main.go:225-230) so Offset/Length and
                # the post-block buffer dump match main.go:242-284 exactly.
                for block, group in itertools.groupby(
                    _by_block(msgs), key=lambda t: t[0]
                ):
                    ring.advance_to(block)
                    for _b, chan, msg in group:
                        log_msg = LogMessage(
                            time=datetime.datetime.now(),
                            offset=dumper.offset(),
                            length=ring.length,
                            msg=msg,
                            channel=chan,
                        )
                        encoder.encode(log_msg)
                        if single:
                            if not waiting_ids:
                                stop = True
                                break
                            waiting_ids.discard(msg.meter_id())
                    ring.dump()
                    if single and not waiting_ids:
                        _log("single: received messages from all meters")
                        stop = True
                    if stop:
                        break
                if chunk.size == 0:
                    break
    except KeyboardInterrupt:
        _log("interrupted")
    finally:
        if ckpt_path and not eof:  # a flushed (complete) decode needs none
            from ..decoder.checkpoint import capture_checkpoint

            # Emit anything still in the dispatch-ahead pipeline, then
            # checkpoint at the last window boundary (pending bytes are
            # re-read on resume).
            for block, group in itertools.groupby(
                _by_block(dec.drain()), key=lambda t: t[0]
            ):
                ring.advance_to(block)
                for _b, chan, msg in group:
                    encoder.encode(
                        LogMessage(
                            time=datetime.datetime.now(),
                            offset=dumper.offset(),
                            length=ring.length,
                            msg=msg,
                            channel=chan,
                        )
                    )
                ring.dump()
            boundary = consumed - int(dec._pending.size)
            dec._pending = np.zeros(0, np.uint8)
            capture_checkpoint(dec, boundary).save(ckpt_path)
            _log(f"checkpoint saved at byte {boundary}")
        if fs.value("metrics"):
            snap = (
                dec.metrics_snapshot() if wideband else dec.metrics.snapshot()
            )
            _log("metrics:", snap)
        source.close()
        dumper.close()
    return 0


def main(argv: Optional[Sequence[str]] = None) -> int:
    fs = build_flagset()
    fs.parse(list(sys.argv[1:] if argv is None else argv))
    fs.env_override(log=_log)

    if fs.value("version"):
        print(f"rtlamr_tpu {__version__}")
        return 0

    sym = fs.value("symbollength")
    if sym not in VALID_SYMBOL_LENGTHS:
        # The whitelist exists for librtlsdr sample-rate bands
        # (misc/modes.go:14-31); offline decode has no such constraint.
        if not fs.value("fromfile"):
            _log("invalid symbollength")
            return 1
        _log(
            f"symbollength {sym} outside the rtl-sdr whitelist "
            f"{VALID_SYMBOL_LENGTHS}; allowed for -fromfile decode"
        )

    fmt = fs.value("format").lower()
    if fmt not in ("plain", "csv", "json", "xml"):
        _log(f"invalid format: {fmt}")
        return 1

    return run(fs)


if __name__ == "__main__":
    sys.exit(main())
