"""Auxiliary subsystem tests: modes calculator, metrics/watchdog,
checkpoint/resume exactness (SURVEY.md §5)."""

import numpy as np
import pytest

from rtlamr_tpu.decoder import WindowDecoder
from rtlamr_tpu.decoder.checkpoint import (
    Checkpoint,
    capture_checkpoint,
    restore_checkpoint,
)
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.ref import synth
from rtlamr_tpu.utils.modes import (
    is_valid_live_chip_length,
    sample_rate_for,
    valid_chip_lengths,
)
from rtlamr_tpu.utils.observability import Metrics, RateWatchdog


def test_modes_match_reference_tool():
    # misc/modes.go:26-33: valid chip lengths are 7-9 and 28-97; the
    # -symbollength flag whitelist is the multiples-of-8 subset.
    computed = {m.chip_length for m in valid_chip_lengths()}
    assert computed == set(range(7, 10)) | set(range(28, 98))
    whitelist = {8, 32, 40, 48, 56, 64, 72, 80, 88, 96}
    assert whitelist <= computed


def test_modes_rates():
    assert sample_rate_for(72) == 2359296
    assert is_valid_live_chip_length(8)
    assert is_valid_live_chip_length(78)  # sample.bin's legacy rate
    assert not is_valid_live_chip_length(10)
    m72 = [m for m in valid_chip_lengths() if m.chip_length == 72][0]
    assert m72.channels == 12


def test_metrics_snapshot():
    m = Metrics()
    m.samples_in = 1000
    m.messages_out = 3
    snap = m.snapshot()
    assert snap["samples_in"] == 1000
    assert snap["messages_out"] == 3
    assert snap["samples_per_second"] >= 0


def test_watchdog_warns_on_slow_rate():
    warnings = []
    wd = RateWatchdog(sample_rate=1_000_000, warn=warnings.append)
    wd._last_tick -= 2.0  # force a tick
    wd.add_bytes(1000)  # 500 samples/s << 90% of 1 MS/s
    assert warnings and "not keeping up" in warnings[0]


def test_watchdog_quiet_at_full_rate():
    warnings = []
    wd = RateWatchdog(sample_rate=1_000_000, warn=warnings.append)
    wd._last_tick -= 1.5
    wd.add_bytes(2 * 1_500_000)
    assert not warnings


def make_capture(n_windows, dec):
    cfg = dec.cfg
    w = dec.spec.window
    bursts = []
    for i in range(n_windows - 1):
        bits = synth.make_scm_bits(meter_id=7000 + i, consumption=i)
        bursts.append(
            synth.bits_to_burst(bits, i * w + cfg.block_size // 2)
        )
    return synth.render_iq(n_windows * w, bursts, cfg.chip_length, noise=2.0)


def test_checkpoint_resume_bit_identical(tmp_path):
    """Decoding straight through == decode half, checkpoint, restore into a
    FRESH decoder, decode the rest."""
    mk = lambda: WindowDecoder([new_parser("scm", 8)], window_blocks=None)
    dec_full = mk()
    iq = make_capture(6, dec_full)
    want = [(b, str(m)) for b, m in dec_full.decode_capture(iq)]
    assert len(want) >= 4

    dec_a = mk()
    dec_a.reset()
    half = iq.size // 2
    wb = dec_a.window_bytes
    half -= half % wb  # window boundary
    got = [(b, str(m)) for b, m in dec_a.feed(iq[:half])]
    got += [(b, str(m)) for b, m in dec_a.drain()]
    ckpt = capture_checkpoint(dec_a, half)
    ckpt.save(str(tmp_path / "ck"))

    restored = Checkpoint.load(str(tmp_path / "ck"))
    dec_b = mk()
    restore_checkpoint(dec_b, restored)
    got += [(b, str(m)) for b, m in dec_b.feed(iq[half:])]
    got += [(b, str(m)) for b, m in dec_b.flush()]
    assert got == want


def test_checkpoint_rejects_mid_window(tmp_path):
    dec = WindowDecoder([new_parser("scm", 8)], window_blocks=None)
    dec.reset()
    dec.feed(np.zeros(100, np.uint8))
    with pytest.raises(ValueError):
        capture_checkpoint(dec, 100)


def _cli_decode(cap, ck, out):
    from rtlamr_tpu.cli.flags import build_flagset
    from rtlamr_tpu.cli.main import run

    fs = build_flagset()
    fs.parse(
        [
            "-msgtype=scm",
            "-symbollength=78",
            "-windowblocks=8",
            "-ingest=python",  # the interrupt test patches FileSource.read
            f"-fromfile={cap}",
            f"-checkpoint={ck}",
        ]
    )
    run(fs, out=out)
    # Plain no-samplefile lines are "{Time:... SCM:{...}}"; drop the
    # run-dependent timestamp, keep the message rendering.
    return [
        line.split(" ", 1)[1]
        for line in out.getvalue().strip().splitlines()
    ]


def test_cli_checkpoint_straight_through(tmp_path, sample_bin):
    """A run to EOF is complete: all 14 golden messages, no checkpoint file
    left behind (the flushed decode needs none, cli/main.py finally path)."""
    import io
    import os

    cap = tmp_path / "cap.bin"
    sample_bin.tofile(cap)
    ck = str(tmp_path / "ck")
    full = _cli_decode(cap, ck, io.StringIO())
    assert len(full) == 14
    assert not os.path.exists(ck + ".meta.json")


def test_cli_checkpoint_interrupt_resume(tmp_path, sample_bin, monkeypatch):
    """Interrupt a capture decode mid-stream (the KeyboardInterrupt finally
    path: pipeline drain + checkpoint save at the last window boundary,
    cli/main.py:292-315), then resume with the same -checkpoint (skip-read +
    ring-state fixup, cli/main.py:196-231). The concatenated output must
    equal the straight-through decode — no duplicates, no gaps."""
    import io
    import os

    from rtlamr_tpu.io.capture import FileSource

    cap = tmp_path / "cap.bin"
    sample_bin.tofile(cap)

    want = _cli_decode(cap, str(tmp_path / "ck_full"), io.StringIO())
    assert len(want) == 14

    ck = str(tmp_path / "ck")
    # Run A: first read returns a NON-window-aligned 100000 bytes (window is
    # 65536 bytes at chip 78 x 8 blocks, so 34464 bytes stay pending and the
    # checkpoint boundary lands mid-chunk); the second read is interrupted.
    orig_read = FileSource.read
    calls = {"n": 0}

    def flaky_read(self, n):
        calls["n"] += 1
        if calls["n"] == 1:
            return orig_read(self, 100000)
        raise KeyboardInterrupt

    with monkeypatch.context() as mp:
        mp.setattr(FileSource, "read", flaky_read)
        got = _cli_decode(cap, ck, io.StringIO())
    assert os.path.exists(ck + ".meta.json"), "interrupt must save a checkpoint"
    assert 0 < len(got) < 14

    # Run B: resume from the checkpoint, decode the rest to EOF.
    got += _cli_decode(cap, ck, io.StringIO())
    assert got == want


def test_mesh_checkpoint_resume_bit_identical(tmp_path):
    """MeshDecoder: decode straight through == half, checkpoint (device
    carry host-materialized), restore into a FRESH mesh decoder, rest
    (VERDICT r3 weak item 5)."""
    import jax

    from rtlamr_tpu.decoder.checkpoint import load_checkpoint
    from rtlamr_tpu.parallel.mesh import MeshDecoder

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    mk = lambda: MeshDecoder(
        [new_parser("scm", 8)],
        devices=jax.devices()[:2],
        window_blocks=None,
        scan_windows=2,
    )
    dec_full = mk()
    iq = make_capture(12, dec_full)  # 3 super-batches of 2x2 windows
    want = [(b, str(m)) for b, m in dec_full.decode_capture(iq)]
    assert len(want) >= 6

    dec_a = mk()
    dec_a.reset()
    half = iq.size // 2
    wb = dec_a.window_bytes  # one super-batch
    half -= half % wb
    got = [(b, str(m)) for b, m in dec_a.feed(iq[:half])]
    got += [(b, str(m)) for b, m in dec_a.drain()]
    ckpt = capture_checkpoint(dec_a, half)
    assert isinstance(np.asarray(ckpt.carry), np.ndarray)
    ckpt.save(str(tmp_path / "ck"))

    dec_b = mk()
    restore_checkpoint(dec_b, load_checkpoint(str(tmp_path / "ck")))
    got += [(b, str(m)) for b, m in dec_b.feed(iq[half:])]
    got += [(b, str(m)) for b, m in dec_b.flush()]
    assert got == want

    # Cross-restoring a mesh checkpoint into a plain WindowDecoder must
    # fail loudly (different carry geometry), not corrupt the stream.
    plain = WindowDecoder([new_parser("scm", 8)], window_blocks=None)
    with pytest.raises(ValueError, match="geometry mismatch"):
        restore_checkpoint(plain, load_checkpoint(str(tmp_path / "ck")))


def test_wideband_checkpoint_resume_bit_identical(tmp_path):
    """WidebandDecoder: filter history + per-channel states + ghost-dedup
    map round-trip through a checkpoint; resume is bit-identical."""
    from rtlamr_tpu.decoder.checkpoint import (
        WidebandCheckpoint,
        load_checkpoint,
    )
    from rtlamr_tpu.parallel.wideband import WidebandDecoder

    n_ch = 4
    parsers = lambda: [new_parser(p, 8) for p in ("scm", "idm", "r900")]
    mk = lambda: WidebandDecoder(
        parsers(), n_channels=n_ch, window_blocks=24,
        cross_channel_dedup=True,
    )
    dec_full = mk()
    w = dec_full.spec.window
    planted = [
        (0, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        # Straddles the checkpoint boundary on channel 1: only the carried
        # channelizer history + staged tails can recover it after restore.
        (1, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222002, consumption=2),
            2 * w - 700)),
        (2, synth.r900_burst(
            synth.make_r900_symbols(meter_id=333003), w + 5000)),
        (3, synth.bits_to_burst(
            synth.make_idm_bits(serial=444004), 2 * w + 300)),
    ]
    wb = synth.render_wideband(
        4 * w, planted, n_ch, 8, amplitude=90.0, noise=2.0, seed=7
    )
    want = [(c, b, str(m)) for c, b, m in dec_full.decode_capture(wb)]
    got_ids = {m for _, _, m in want}
    assert len(want) >= 4

    dec_a = mk()
    dec_a.reset()
    half = 2 * dec_a.window_bytes  # two super-steps
    got = [(c, b, str(m)) for c, b, m in dec_a.feed(wb[:half])]
    got += [(c, b, str(m)) for c, b, m in dec_a.drain()]
    ckpt = capture_checkpoint(dec_a, half)
    ckpt.save(str(tmp_path / "wck"))

    restored = load_checkpoint(str(tmp_path / "wck"))
    assert isinstance(restored, WidebandCheckpoint)
    dec_b = mk()
    restore_checkpoint(dec_b, restored)
    got += [(c, b, str(m)) for c, b, m in dec_b.feed(wb[half:])]
    got += [(c, b, str(m)) for c, b, m in dec_b.flush()]
    assert got == want

    # Kind mismatch is rejected.
    plain = WindowDecoder([new_parser("scm", 8)], window_blocks=None)
    with pytest.raises(ValueError, match="kind mismatch"):
        restore_checkpoint(plain, restored)


def test_wideband_mesh_checkpoint_resume_bit_identical(tmp_path):
    """WidebandMeshDecoder (2-D channel x time mesh): sharded channelizer
    history + per-channel tails + dedup states round-trip through a
    checkpoint; resume is bit-identical (VERDICT r4 item 8)."""
    import jax

    from rtlamr_tpu.decoder.checkpoint import (
        WidebandCheckpoint,
        load_checkpoint,
    )
    from rtlamr_tpu.parallel.wideband_mesh import WidebandMeshDecoder

    n_ch = 4
    parsers = lambda: [new_parser(p, 8) for p in ("scm", "r900")]
    mk = lambda: WidebandMeshDecoder(
        parsers(), n_channels=n_ch, mesh_shape=(2, 2),
        devices=jax.devices()[:4], window_blocks=None,
        cross_channel_dedup=True,
    )
    dec_full = mk()
    w = dec_full.spec.window
    sb = dec_full.superbatch_bytes  # wideband bytes per super-batch
    span = sb // (2 * n_ch)  # per-channel samples per super-batch
    planted = [
        (0, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        # Straddles the checkpoint boundary on channel 1: only the carried
        # (sharded) channelizer history + per-channel tails recover it.
        (1, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222002, consumption=2),
            span - 700)),
        (2, synth.r900_burst(
            synth.make_r900_symbols(meter_id=333003), span + 5000)),
    ]
    wb = synth.render_wideband(
        2 * span, planted, n_ch, 8, amplitude=90.0, noise=2.0, seed=9
    )
    want = [(c, b, str(m)) for c, b, m in dec_full.decode_capture(wb)]
    assert len(want) >= 3

    dec_a = mk()
    dec_a.reset()
    got = [(c, b, str(m)) for c, b, m in dec_a.feed(wb[:sb])]
    ckpt = capture_checkpoint(dec_a, sb)
    ckpt.save(str(tmp_path / "wmck"))

    restored = load_checkpoint(str(tmp_path / "wmck"))
    assert isinstance(restored, WidebandCheckpoint)
    dec_b = mk()
    restore_checkpoint(dec_b, restored)
    got += [(c, b, str(m)) for c, b, m in dec_b.feed(wb[sb:])]
    got += [(c, b, str(m)) for c, b, m in dec_b.flush()]
    assert got == want

    # A single-chip wideband checkpoint cannot restore the mesh layout
    # (carried tail width differs) — geometry is validated loudly.
    from rtlamr_tpu.parallel.wideband import WidebandDecoder

    single = WidebandDecoder(parsers(), n_channels=n_ch, window_blocks=None)
    with pytest.raises(ValueError, match="geometry mismatch"):
        restore_checkpoint(single, restored)


def test_cli_wideband_checkpoint_interrupt_resume(tmp_path, monkeypatch):
    """Wideband CLI: interrupt mid-capture, checkpoint, resume; the
    concatenated (channel-tagged) output equals straight-through."""
    import io
    import os

    from rtlamr_tpu.io.capture import FileSource
    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.ref import synth as _synth

    n_ch = 4
    parsers = [new_parser(p, 8) for p in ("scm", "idm", "r900")]
    probe = WidebandDecoder(parsers, n_channels=n_ch, window_blocks=24)
    w = probe.spec.window
    planted = [
        (0, _synth.bits_to_burst(
            _synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        (1, _synth.bits_to_burst(
            _synth.make_scm_bits(meter_id=222002, consumption=2),
            2 * w - 700)),
        (2, _synth.r900_burst(
            _synth.make_r900_symbols(meter_id=333003), w + 5000)),
    ]
    wb = _synth.render_wideband(
        4 * w, planted, n_ch, 8, amplitude=90.0, noise=2.0, seed=7
    )
    cap = tmp_path / "wb.bin"
    wb.tofile(cap)

    def cli(ck, out):
        from rtlamr_tpu.cli.flags import build_flagset
        from rtlamr_tpu.cli.main import run

        fs = build_flagset()
        fs.parse(
            [
                "-msgtype=scm,idm,r900",
                "-symbollength=8",
                "-channels=4",
                "-windowblocks=24",
                "-ingest=python",
                f"-fromfile={cap}",
                f"-checkpoint={ck}",
            ]
        )
        run(fs, out=out)
        return [
            line.split(" ", 1)[1]
            for line in out.getvalue().strip().splitlines()
        ]

    want = cli(str(tmp_path / "ck_full"), io.StringIO())
    assert len(want) >= 3

    ck = str(tmp_path / "ck")
    orig_read = FileSource.read
    calls = {"n": 0}

    def flaky_read(self, n):
        calls["n"] += 1
        if calls["n"] == 1:
            # One non-window-aligned read, then interrupt (the checkpoint
            # boundary lands mid-chunk; pending bytes are re-read on resume).
            return orig_read(self, 150000)
        raise KeyboardInterrupt

    with monkeypatch.context() as mp:
        mp.setattr(FileSource, "read", flaky_read)
        got = cli(ck, io.StringIO())
    assert os.path.exists(ck + ".meta.json")
    assert len(got) < len(want)
    got += cli(ck, io.StringIO())
    assert got == want


def test_cli_wideband_mesh_checkpoint_interrupt_resume(tmp_path, monkeypatch):
    """Wideband MESH CLI (-channels -mesh over the virtual 8-device mesh):
    interrupt mid-capture, checkpoint, resume; the concatenated output
    equals straight-through (VERDICT r4 items 7+8 composed)."""
    import io
    import os

    from rtlamr_tpu.io.capture import FileSource
    from rtlamr_tpu.parallel.wideband_mesh import WidebandMeshDecoder
    from rtlamr_tpu.ref import synth as _synth
    import jax

    n_ch = 4
    parsers = [new_parser(p, 8) for p in ("scm", "r900")]
    # Same shape the CLI will pick on the virtual 8-device mesh:
    # 4 channel-shards x 2 time-shards at -windowblocks=4.
    probe = WidebandMeshDecoder(
        parsers, n_channels=n_ch, mesh_shape=(4, 2),
        devices=jax.devices()[:8], window_blocks=4,
    )
    span = probe.superbatch_bytes // (2 * n_ch)  # per-channel samples/batch
    planted = [
        (0, _synth.bits_to_burst(
            _synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        # Straddles the checkpoint boundary (super-batch seam).
        (1, _synth.bits_to_burst(
            _synth.make_scm_bits(meter_id=222002, consumption=2),
            span - 700)),
        (2, _synth.r900_burst(
            _synth.make_r900_symbols(meter_id=333003), span + 5000)),
    ]
    wb = _synth.render_wideband(
        2 * span, planted, n_ch, 8, amplitude=90.0, noise=2.0, seed=9
    )
    cap = tmp_path / "wbm.bin"
    wb.tofile(cap)

    def cli(ck, out):
        from rtlamr_tpu.cli.flags import build_flagset
        from rtlamr_tpu.cli.main import run

        fs = build_flagset()
        fs.parse(
            [
                "-msgtype=scm,r900",
                "-symbollength=8",
                "-channels=4",
                "-mesh=true",
                "-windowblocks=4",
                "-ingest=python",
                f"-fromfile={cap}",
                f"-checkpoint={ck}",
            ]
        )
        run(fs, out=out)
        return [
            line.split(" ", 1)[1]
            for line in out.getvalue().strip().splitlines()
        ]

    want = cli(str(tmp_path / "ckm_full"), io.StringIO())
    assert len(want) >= 3

    ck = str(tmp_path / "ckm")
    orig_read = FileSource.read
    calls = {"n": 0}

    def flaky_read(self, n):
        calls["n"] += 1
        if calls["n"] == 1:
            return orig_read(self, probe.superbatch_bytes + 5000)
        raise KeyboardInterrupt

    with monkeypatch.context() as mp:
        mp.setattr(FileSource, "read", flaky_read)
        got = cli(ck, io.StringIO())
    assert os.path.exists(ck + ".meta.json")
    assert len(got) < len(want)
    got += cli(ck, io.StringIO())
    assert got == want


def test_meters_data():
    from rtlamr_tpu.data import COMMODITY_ERT_TYPES, commodity_for_ert_type, load_meters

    meters = load_meters()
    assert len(meters) >= 60  # meters.csv ships 67 rows
    assert any(m.manufacturer == "Itron" for m in meters)
    assert commodity_for_ert_type(4) == ["electric"]
    assert set(commodity_for_ert_type(12)) == {"electric", "gas"}
    assert commodity_for_ert_type(13) == ["water"]
    assert set(COMMODITY_ERT_TYPES) == {"electric", "gas", "water"}
