"""CLI end-to-end tests: flag surface, env override, encoders, filters,
-single, and the rtl_tcp live path against a fake server (the reference has
no such harness; SURVEY.md §4 notes the TCP seam makes one trivial)."""

import io
import json
import os
import socket
import struct
import threading

import numpy as np
import pytest

from rtlamr_tpu.cli.flags import build_flagset, parse_duration
from rtlamr_tpu.cli.main import main, run
from rtlamr_tpu.ref import synth

GOLDEN_ARGS = ["-msgtype=scm", "-symbollength=78", "-windowblocks=16"]


def run_cli(argv, monkeypatch=None):
    """Run the CLI in-process, capturing stdout."""
    import rtlamr_tpu.cli.main as climain

    out = io.StringIO()
    fs = build_flagset()
    fs.parse(argv)
    fs.env_override(log=lambda *a: None)
    rc = run(fs, out=out)
    return rc, out.getvalue()


@pytest.fixture(scope="module")
def sample_path():
    import pathlib

    return str(pathlib.Path(__file__).parent / "fixtures" / "sample.bin")


def test_plain_golden(sample_path):
    rc, out = run_cli(GOLDEN_ARGS + [f"-fromfile={sample_path}"])
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 14
    assert "{ID:17580293 Type: 8" in lines[0]
    assert lines[0].startswith("{Time:")
    assert "Offset" not in lines[0]  # plain w/o samplefile (flags.go:266)


def test_json_format(sample_path):
    rc, out = run_cli(GOLDEN_ARGS + ["-format=json", f"-fromfile={sample_path}"])
    lines = out.strip().splitlines()
    assert len(lines) == 14
    rec = json.loads(lines[0])
    assert rec["Type"] == "SCM"
    assert rec["Message"]["ID"] == 17580293
    assert rec["Message"]["Consumption"] == 111414
    assert set(rec) == {"Time", "Offset", "Length", "Type", "Message"}


def test_csv_format(sample_path):
    rc, out = run_cli(GOLDEN_ARGS + ["-format=csv", f"-fromfile={sample_path}"])
    lines = out.strip().splitlines()
    assert len(lines) == 14
    fields = lines[0].split(",")
    # time, offset, length, ID, Type, TamperPhy, TamperEnc, Consumption, CRC
    assert fields[3] == "17580293"
    assert fields[7] == "111414"


def test_xml_format(sample_path):
    rc, out = run_cli(GOLDEN_ARGS + ["-format=xml", f"-fromfile={sample_path}"])
    lines = out.strip().splitlines()
    assert len(lines) == 14
    assert lines[0].startswith("<LogMessage ")
    assert 'Type="SCM"' in lines[0]
    assert 'ID="17580293"' in lines[0]


def test_filterid(sample_path):
    rc, out = run_cli(
        GOLDEN_ARGS + ["-filterid=17580293", f"-fromfile={sample_path}"]
    )
    lines = out.strip().splitlines()
    assert len(lines) == 1
    assert "17580293" in lines[0]


def test_filtertype_no_match(sample_path):
    rc, out = run_cli(
        GOLDEN_ARGS + ["-filtertype=12", f"-fromfile={sample_path}"]
    )
    assert out.strip() == ""


def test_single(sample_path):
    rc, out = run_cli(GOLDEN_ARGS + ["-single", f"-fromfile={sample_path}"])
    lines = out.strip().splitlines()
    assert len(lines) == 1


def test_single_with_filterid(sample_path):
    rc, out = run_cli(
        GOLDEN_ARGS
        + ["-single", "-filterid=17580293,17578504", f"-fromfile={sample_path}"]
    )
    lines = out.strip().splitlines()
    # stops once both meters reported
    assert len(lines) == 2


def test_version(capsys):
    assert main(["-version"]) == 0
    assert "rtlamr_tpu" in capsys.readouterr().out


def test_invalid_symbollength_live():
    assert main(["-symbollength=77"]) == 1


def test_invalid_format():
    assert main(["-format=yaml", "-fromfile=x"]) == 1


def test_unknown_flag():
    with pytest.raises(SystemExit):
        build_flagset().parse(["-bogus=1"])


def test_env_override(monkeypatch, sample_path):
    monkeypatch.setenv("RTLAMR_FILTERID", "17580293")
    rc, out = run_cli(GOLDEN_ARGS + [f"-fromfile={sample_path}"])
    lines = out.strip().splitlines()
    assert len(lines) == 1


def test_env_no_override_when_set(monkeypatch, sample_path):
    monkeypatch.setenv("RTLAMR_FILTERID", "999999")
    rc, out = run_cli(
        GOLDEN_ARGS + ["-filterid=17580293", f"-fromfile={sample_path}"]
    )
    assert len(out.strip().splitlines()) == 1


def test_parse_duration():
    assert parse_duration("1h5m10s") == 3910.0
    assert parse_duration("0") == 0.0
    assert parse_duration("250ms") == 0.25
    with pytest.raises(ValueError):
        parse_duration("5 parsecs")


def test_samplefile_dump(tmp_path, sample_path):
    dump = tmp_path / "dump.bin"
    rc, out = run_cli(
        GOLDEN_ARGS + [f"-fromfile={sample_path}", f"-samplefile={dump}"]
    )
    lines = out.strip().splitlines()
    assert len(lines) == 14
    assert "Offset:" in lines[0]  # plain WITH samplefile includes offsets
    assert dump.stat().st_size > 0


# ---------------------------------------------------------------------------
# Fake rtl_tcp server


class FakeRtlTcp(threading.Thread):
    def __init__(self, iq_bytes: np.ndarray):
        super().__init__(daemon=True)
        self.iq = np.asarray(iq_bytes, np.uint8).tobytes()
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.commands = []

    def run(self):
        import time as _t

        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))  # R820T, 29 gains
        conn.settimeout(0.1)
        pos = 0
        cmd = b""
        # Keep receiving commands until the client disconnects (or a hard
        # deadline) — commands can arrive at any time relative to the IQ
        # stream, so the loop must not end just because the IQ ran out.
        deadline = _t.time() + 15.0
        try:
            while _t.time() < deadline:
                try:
                    data = conn.recv(64)
                    if not data:
                        break  # client closed (its -duration elapsed)
                    cmd += data
                    while len(cmd) >= 5:
                        self.commands.append(struct.unpack(">BI", cmd[:5]))
                        cmd = cmd[5:]
                except socket.timeout:
                    pass
                if pos < len(self.iq):
                    end = min(pos + 65536, len(self.iq))
                    conn.sendall(self.iq[pos:end])
                    pos = end
        except (BrokenPipeError, ConnectionResetError):
            pass
        finally:
            conn.close()
            self.sock.close()


# ---------------------------------------------------------------------------
# Wideband CLI (-channels N)


def _wideband_capture(n_channels=4, chip=8, window_blocks=24):
    """A 4-channel synthetic capture with one packet per channel (recipe
    from tests/test_wideband.py::_build_wideband, compacted)."""
    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser(p, chip) for p in ("scm", "scm+", "idm", "r900")]
    dec = WidebandDecoder(
        parsers, n_channels=n_channels, window_blocks=window_blocks
    )
    window = dec.spec.window
    planted = [
        (0, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        (1, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222002, consumption=2),
            window - 700)),
        (2, synth.r900_burst(
            synth.make_r900_symbols(meter_id=333003), 5000)),
        (3, synth.bits_to_burst(
            synth.make_idm_bits(serial=444004), 300)),
    ]
    wb = synth.render_wideband(
        3 * window, planted, n_channels, chip,
        amplitude=90.0, noise=2.0, seed=21,
    )
    return dec, wb


def test_cli_wideband_fromfile(tmp_path, capsys):
    """-channels=4 decodes a wideband capture through cli.main with output
    byte-exact vs the WidebandDecoder library path (VERDICT r3 item 2)."""
    dec, wb = _wideband_capture()
    want = sorted(
        (c, json.dumps(m.to_dict(), separators=(",", ":")))
        for c, _b, m in dec.decode_capture(wb)
    )
    assert want, "capture must decode to something for the test to bite"

    cap = tmp_path / "wideband.bin"
    wb.tofile(cap)
    rc, out = run_cli(
        [
            "-msgtype=all",
            "-symbollength=8",
            "-channels=4",
            "-windowblocks=24",
            "-format=json",
            f"-fromfile={cap}",
        ]
    )
    assert rc == 0
    lines = out.strip().splitlines()
    got = []
    for ln in lines:
        rec = json.loads(ln)
        # Channel sits between Length and Type in the envelope.
        assert list(rec) == ["Time", "Offset", "Length", "Channel", "Type",
                             "Message"]
        got.append(
            (rec["Channel"],
             json.dumps(rec["Message"], separators=(",", ":")))
        )
    assert sorted(got) == want

    err = capsys.readouterr().err
    assert "wideband: 4 channels" in err
    assert "channel 3:" in err  # per-channel center-frequency startup log


def test_cli_wideband_mesh_fromfile(tmp_path, capsys):
    """-channels=4 -mesh drives the 2-D (channel x time) WidebandMeshDecoder
    over the virtual 8-device mesh through cli.main, byte-exact vs the
    single-chip WidebandDecoder path (VERDICT r4 item 7)."""
    dec, wb = _wideband_capture()
    want = sorted(
        (c, json.dumps(m.to_dict(), separators=(",", ":")))
        for c, _b, m in dec.decode_capture(wb)
    )
    assert want, "capture must decode to something for the test to bite"

    cap = tmp_path / "wideband.bin"
    wb.tofile(cap)
    rc, out = run_cli(
        [
            "-msgtype=all",
            "-symbollength=8",
            "-channels=4",
            "-mesh=true",
            "-windowblocks=24",
            "-format=json",
            f"-fromfile={cap}",
        ]
    )
    assert rc == 0
    got = []
    for ln in out.strip().splitlines():
        rec = json.loads(ln)
        got.append(
            (rec["Channel"],
             json.dumps(rec["Message"], separators=(",", ":")))
        )
    assert sorted(got) == want

    err = capsys.readouterr().err
    # 4 channel shards x 2 time shards over the 8 virtual devices.
    assert "wideband mesh: 4 channel-shards x 2 time-shards" in err


def test_cli_wideband_plain_and_dedup(tmp_path):
    """Plain format carries a Channel: tag; -crosschanneldedup parses."""
    dec, wb = _wideband_capture()
    cap = tmp_path / "wideband.bin"
    wb.tofile(cap)
    rc, out = run_cli(
        [
            "-msgtype=all",
            "-symbollength=8",
            "-channels=4",
            "-windowblocks=24",
            "-crosschanneldedup=true",
            f"-fromfile={cap}",
        ]
    )
    assert rc == 0
    lines = out.strip().splitlines()
    assert lines and all("Channel:" in ln for ln in lines)


def test_usage_lists_wideband_flags():
    fs = build_flagset()
    buf = io.StringIO()
    fs.usage(out=buf)
    rtlamr_part = buf.getvalue().split("rtltcp specific:")[0]
    assert "-channels=1:" in rtlamr_part
    assert "-crosschanneldedup=False:" in rtlamr_part


def test_cli_wideband_live_tunes_wideband_rate():
    """Live wideband: the rtl_tcp tuner is set to channels*samplerate."""
    dec, wb = _wideband_capture()
    server = FakeRtlTcp(wb)
    server.start()
    rc, out = run_cli(
        [
            "-msgtype=all",
            "-symbollength=8",
            "-channels=4",
            "-windowblocks=24",
            "-format=json",
            f"-server=127.0.0.1:{server.port}",
            "-single=true",
            "-duration=12s",
        ]
    )
    lines = out.strip().splitlines()
    assert len(lines) >= 1
    assert json.loads(lines[0])["Channel"] in range(4)
    server.join(timeout=5)
    cmds = dict((c, a) for c, a in server.commands)
    assert cmds.get(0x02) == 4 * 32768 * 8  # wideband sample rate


def test_cli_mesh_fromfile(sample_path):
    """-mesh decodes the golden capture on the virtual 8-device mesh with
    output identical to the single-chip path (the capture is smaller than
    one super-batch, so this also exercises the padded flush path)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rc, out = run_cli(
        GOLDEN_ARGS + ["-mesh", "-format=json", f"-fromfile={sample_path}"]
    )
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 14
    rc2, out2 = run_cli(
        GOLDEN_ARGS + ["-format=json", f"-fromfile={sample_path}"]
    )
    strip = lambda s: [
        {k: v for k, v in json.loads(l).items() if k != "Time"}
        for l in s.strip().splitlines()
    ]
    assert strip(out) == strip(out2)


def test_latency_preset_window_sizing():
    """-latency defaults windowblocks to 4; explicit -windowblocks wins."""
    from rtlamr_tpu.cli.main import Receiver

    fs = build_flagset()
    fs.parse(["-latency", "-fromfile=x"])
    r = Receiver(fs)
    assert r.latency and fs.value("windowblocks") == 4
    assert r.decoder.spec.window == 4 * r.cfg.block_size

    fs2 = build_flagset()
    fs2.parse(["-latency", "-windowblocks=16", "-fromfile=x"])
    r2 = Receiver(fs2)
    assert fs2.value("windowblocks") == 16


def test_live_latency_preset_roundtrip():
    """Live path under -latency: block-granular reads + synchronous window
    completion still decode correctly (and -metrics exposes the
    feed_to_emit counters)."""
    bits = synth.make_scm_bits(meter_id=27182818, consumption=9)
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.base import build_decoder_config

    cfg = build_decoder_config([new_parser("scm", 72)])
    iq = synth.render_iq(
        cfg.block_size * 12,
        [synth.bits_to_burst(bits, cfg.block_size * 2)],
        72,
        noise=2.0,
        seed=6,
    )
    server = FakeRtlTcp(iq)
    server.start()
    rc, out = run_cli(
        [
            "-msgtype=scm",
            "-latency",
            f"-server=127.0.0.1:{server.port}",
            "-single=true",
            "-duration=12s",
            "-format=json",
        ]
    )
    lines = out.strip().splitlines()
    assert len(lines) >= 1
    assert json.loads(lines[0])["Message"]["ID"] == 27182818
    server.join(timeout=5)


def test_live_rtltcp_roundtrip():
    """Full live path: connect, tune, stream, decode, -duration exit."""
    bits = synth.make_scm_bits(meter_id=31415926, consumption=123)
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.base import build_decoder_config

    cfg = build_decoder_config([new_parser("scm", 72)])
    iq = synth.render_iq(
        cfg.block_size * 40,
        [synth.bits_to_burst(bits, cfg.block_size * 3)],
        72,
        noise=2.0,
        seed=5,
    )
    server = FakeRtlTcp(iq)
    server.start()
    rc, out = run_cli(
        [
            "-msgtype=scm",
            "-windowblocks=16",
            f"-server=127.0.0.1:{server.port}",
            # -single exits at the first decoded message; -duration is only a
            # safety cap (wall-clock tightness here is flaky under suite load).
            "-single=true",
            "-duration=12s",
            "-format=json",
            "-biastee=true",
            "-directsampling=true",
            "-offsettuning=true",
        ]
    )
    lines = out.strip().splitlines()
    assert len(lines) >= 1
    rec = json.loads(lines[0])
    assert rec["Message"]["ID"] == 31415926
    assert rec["Message"]["Consumption"] == 123
    server.join(timeout=5)
    # Tuner was configured: center freq + sample rate + auto gain
    cmds = dict((c, a) for c, a in server.commands)
    assert cmds.get(0x01) == 912600155  # scm center freq
    assert cmds.get(0x02) == 32768 * 72  # derived sample rate
    assert 0x03 in cmds  # gain mode set (auto)
    assert cmds.get(0x09) == 1  # direct sampling
    assert cmds.get(0x0A) == 1  # offset tuning
    assert cmds.get(0x0E) == 1  # bias tee
