"""Native (C++) ingest runtime tests.

Exercises the ctypes-bound shared library (rtlamr_tpu/native) against a fake
rtl_tcp server: greeting header parse, 5-byte command wire format, exact
byte-stream integrity through the ring buffer, deadline behavior
(main.go:168-186 semantics), stats counters, and the mmap capture reader.
Skipped wholesale when no C++ toolchain is available.
"""

from __future__ import annotations

import socket
import struct
import threading
import time

import numpy as np
import pytest

from rtlamr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native ingest: {native.load_error()}"
)


class FakeServer(threading.Thread):
    """Minimal rtl_tcp server: greeting, command capture, data replay."""

    def __init__(self, payload: bytes, chunk: int = 8192, linger: float = 0.5):
        super().__init__(daemon=True)
        self.payload = payload
        self.chunk = chunk
        self.linger = linger
        self.commands = []
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]

    def run(self):
        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        conn.settimeout(0.05)
        pos = 0
        buf = b""
        deadline = time.monotonic() + 10.0
        try:
            while time.monotonic() < deadline:
                try:
                    buf += conn.recv(64)
                    while len(buf) >= 5:
                        self.commands.append(struct.unpack(">BI", buf[:5]))
                        buf = buf[5:]
                except socket.timeout:
                    pass
                except OSError:
                    break
                if pos < len(self.payload):
                    end = min(pos + self.chunk, len(self.payload))
                    conn.sendall(self.payload[pos:end])
                    pos = end
                elif self.linger <= 0:
                    break
                else:
                    time.sleep(0.02)
                    self.linger -= 0.02
        except (BrokenPipeError, ConnectionResetError):
            pass
        finally:
            conn.close()
            self.sock.close()


def test_connect_header_and_stream_integrity():
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    srv = FakeServer(payload)
    srv.start()

    client = native.NativeRtlTcpClient(f"127.0.0.1:{srv.port}")
    info = client.connect(timeout=5.0)
    assert info.tuner_type == 5 and info.tuner_name == "R820T"
    assert info.gain_count == 29

    got = b""
    while len(got) < len(payload):
        got += client.read_samples(
            min(70_000, len(payload) - len(got)), deadline=5.0
        ).tobytes()
    assert got == payload  # exact byte stream through the ring

    total, dropped, _buffered = client.stats()
    assert total >= len(payload)
    assert dropped == 0
    client.close()


def test_command_wire_format():
    srv = FakeServer(b"\x00" * 1024, linger=1.0)
    srv.start()
    client = native.NativeRtlTcpClient(f"127.0.0.1:{srv.port}")
    client.connect(timeout=5.0)
    client.set_center_freq(912_600_155)
    client.set_sample_rate(2_359_296)
    client.set_gain_mode(manual=False)  # reference auto-gain => arg 1
    client.set_tuner_gain(496)
    client.read_samples(1024, deadline=5.0)
    time.sleep(0.3)  # let the server's recv loop drain the commands
    client.close()
    srv.join(timeout=5.0)
    assert (0x01, 912_600_155) in srv.commands
    assert (0x02, 2_359_296) in srv.commands
    assert (0x03, 1) in srv.commands
    assert (0x04, 496) in srv.commands


def test_read_deadline():
    srv = FakeServer(b"\x00" * 16, linger=5.0)
    srv.start()
    client = native.NativeRtlTcpClient(f"127.0.0.1:{srv.port}")
    client.connect(timeout=5.0)
    client.read_samples(16, deadline=5.0)
    t0 = time.monotonic()
    with pytest.raises(OSError):
        client.read_samples(1024, deadline=0.3)
    assert 0.2 < time.monotonic() - t0 < 3.0
    client.close()


def test_eof_after_close():
    srv = FakeServer(b"\x01\x02\x03\x04", linger=0.0)
    srv.start()
    client = native.NativeRtlTcpClient(f"127.0.0.1:{srv.port}")
    client.connect(timeout=5.0)
    assert client.read_samples(4, deadline=5.0).tobytes() == b"\x01\x02\x03\x04"
    with pytest.raises((EOFError, OSError)):
        # Server closed; drain returns short then EOF.
        for _ in range(50):
            client.read_samples(1024, deadline=0.2)
    client.close()


def test_file_source_mmap(tmp_path):
    data = np.arange(100_000, dtype=np.uint32).view(np.uint8)
    p = tmp_path / "cap.bin"
    data.tofile(p)
    src = native.NativeFileSource(str(p))
    assert src.size == data.size
    a = src.read(12345)
    b = src.read(400_000 - 12345)
    tail = src.read(10)
    assert tail.size == 0
    assert np.array_equal(np.concatenate([a, b]), data)
    src.seek(4)
    again = src.read(8)
    assert np.array_equal(again, data[4:12])
    src.close()


def test_file_read_staged_matches_stage_host(tmp_path):
    """The native to-staged file pop produces EXACTLY the buffers the
    Python staging path builds (carry placement, pad alignment, carry
    update), and streaming decode over them is message-identical
    (VERDICT r4 item 6)."""
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import staged_geometry
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import synth

    parsers = [new_parser("scm", 8)]
    dec = WindowDecoder(parsers, window_blocks=4, backend="jnp")
    spec = dec.spec
    geo = staged_geometry(spec)
    w, hs = spec.window, spec.halo_staged
    n_windows = 3
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111111, consumption=1),
            2 * w + 200),
        # Straddles a window boundary: recovered only through the carry the
        # native pop updates in place.
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222222, consumption=2),
            w - 96 * spec.symbol_length // 2),
    ]
    iq = synth.render_iq(n_windows * w, bursts, 8, noise=2.0, seed=5)
    p = tmp_path / "cap.bin"
    iq.tofile(p)

    want = [(b, str(m)) for b, m in dec.decode_capture(iq)]
    assert len(want) >= 2

    # Reference staging: what _process_window builds per window.
    def py_staged(i, carry):
        st = np.zeros(geo.staged_samples, np.uint16)
        st[:hs] = carry
        st[hs : hs + w] = iq[i * 2 * w : (i + 1) * 2 * w].view(np.uint16)
        return st, st[w : w + hs].copy()

    src = native.NativeFileSource(str(p))
    carry = np.zeros(hs, np.uint16)
    py_carry = np.zeros(hs, np.uint16)
    dec2 = WindowDecoder(parsers, window_blocks=4, backend="jnp")
    got = []
    for i in range(n_windows):
        staged = np.zeros(geo.staged_samples, np.uint16)
        n = src.read_staged(staged, carry, w)
        assert n == w
        expect, py_carry = py_staged(i, py_carry)
        assert np.array_equal(staged, expect), f"window {i} staged mismatch"
        assert np.array_equal(carry, py_carry), f"window {i} carry mismatch"
        got.extend((b, str(m)) for b, m in dec2.process_host_staged(staged))
    # End of capture: a partial read leaves carry untouched.
    tail = np.zeros(geo.staged_samples, np.uint16)
    carry_before = carry.copy()
    assert src.read_staged(tail, carry, w) == 0
    assert np.array_equal(carry, carry_before)
    src.close()
    got.extend((b, str(m)) for b, m in dec2.drain())
    assert got == want


def test_ring_read_staged_matches_file(tmp_path):
    """The ring-buffer to-staged pop (live rtl_tcp path) builds the same
    buffers as the file path."""
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ops.frontend import staged_geometry
    from rtlamr_tpu.protocols import new_parser

    parsers = [new_parser("scm", 8)]
    spec = WindowDecoder(parsers, window_blocks=4).spec
    geo = staged_geometry(spec)
    w, hs = spec.window, spec.halo_staged
    rng = np.random.default_rng(17)
    iq = rng.integers(0, 256, size=2 * 2 * w, dtype=np.uint8)

    srv = FakeServer(iq.tobytes())
    srv.start()
    c = native.NativeRtlTcpClient(f"127.0.0.1:{srv.port}")
    c.connect()
    carry = np.zeros(hs, np.uint16)
    bufs = []
    for i in range(2):
        staged = np.zeros(geo.staged_samples, np.uint16)
        n, timed_out = c.read_staged(staged, carry, w, deadline=5.0)
        assert n == w and not timed_out
        bufs.append(staged)
    c.close()

    py_carry = np.zeros(hs, np.uint16)
    for i, staged in enumerate(bufs):
        expect = np.zeros(geo.staged_samples, np.uint16)
        expect[:hs] = py_carry
        expect[hs : hs + w] = iq[i * 2 * w : (i + 1) * 2 * w].view(np.uint16)
        py_carry = expect[w : w + hs].copy()
        assert np.array_equal(staged, expect), f"window {i} mismatch"


def test_native_client_matches_python_client():
    """The native and pure-Python clients produce identical streams."""
    from rtlamr_tpu.io.rtltcp import RtlTcpClient

    rng = np.random.default_rng(11)
    payload = rng.integers(0, 256, size=64_000, dtype=np.uint8).tobytes()

    srv_n = FakeServer(payload)
    srv_n.start()
    cn = native.NativeRtlTcpClient(f"127.0.0.1:{srv_n.port}")
    cn.connect()
    got_native = cn.read_samples(len(payload), deadline=5.0)
    cn.close()

    srv_p = FakeServer(payload)
    srv_p.start()
    cp = RtlTcpClient(f"127.0.0.1:{srv_p.port}")
    cp.connect()
    got_python = cp.read_samples(len(payload), deadline=5.0)
    cp.close()

    assert np.array_equal(got_native, got_python)


def test_cli_live_with_native_ingest(tmp_path):
    """End-to-end: CLI decodes a planted SCM packet over the native client."""
    from rtlamr_tpu.cli.flags import build_flagset
    from rtlamr_tpu.cli.main import run as cli_run
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.protocols.base import build_decoder_config
    from rtlamr_tpu.ref import synth
    import io as _io

    cfg = build_decoder_config([new_parser("scm", 72)])
    bits = synth.make_scm_bits(meter_id=27182818, consumption=9)
    iq = synth.render_iq(
        cfg.block_size * 40,
        [synth.bits_to_burst(bits, cfg.block_size * 3)],
        72,
        noise=2.0,
        seed=13,
    )
    srv = FakeServer(iq.tobytes(), linger=3.0)
    srv.start()
    out = _io.StringIO()
    fs = build_flagset()
    fs.parse(
        [
            "-msgtype=scm",
            "-format=json",
            "-ingest=native",
            f"-server=127.0.0.1:{srv.port}",
            "-single",
            "-duration=20s",
            "-windowblocks=8",
        ]
    )
    rc = cli_run(fs, out=out)
    assert rc == 0
    assert "27182818" in out.getvalue()


def test_ring_stress_tsan(tmp_path):
    """Build the SPSC ring stress harness under ThreadSanitizer and run it:
    producer floods a tiny ring (constant drop pressure) while the consumer
    validates pair alignment, ordering, and byte conservation, and a third
    thread hammers size(). TSAN aborts nonzero on any data race."""
    import shutil
    import subprocess

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ in image")
    src = "rtlamr_tpu/native/src/ingest.cpp"
    exe = tmp_path / "ring_stress"
    build = subprocess.run(
        [gxx, "-std=c++17", "-O1", "-g", "-fsanitize=thread",
         "-DRTLAMR_RING_STRESS", src, "-o", str(exe), "-lpthread"],
        capture_output=True, cwd="/root/repo",
    )
    if build.returncode != 0 and b"tsan" in build.stderr.lower():
        pytest.skip("no TSAN runtime in image")
    assert build.returncode == 0, build.stderr.decode()
    run = subprocess.run(
        [str(exe), "1"], capture_output=True, timeout=120
    )
    assert run.returncode == 0, (run.stdout + run.stderr).decode()
    assert run.stdout.startswith(b"OK"), run.stdout.decode()
