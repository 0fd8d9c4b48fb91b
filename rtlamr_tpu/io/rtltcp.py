"""rtl_tcp client — the sample transport (reference L1, SURVEY.md §1).

Speaks the public rtl_tcp wire protocol used by the reference via the
embedded rtltcp.SDR (main.go:49-57, 89, 116-121, 168, 178): a 12-byte
"RTL0" dongle header (tuner type u32be, gain count u32be), 5-byte command
packets (u8 command + u32be argument), then an unframed stream of
interleaved u8 I/Q samples.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass
from typing import Optional

import numpy as np

# rtl_tcp command opcodes (public protocol)
CMD_SET_FREQ = 0x01
CMD_SET_SAMPLE_RATE = 0x02
CMD_SET_GAIN_MODE = 0x03
CMD_SET_GAIN = 0x04
CMD_SET_FREQ_CORRECTION = 0x05
CMD_SET_AGC_MODE = 0x08
CMD_SET_DIRECT_SAMPLING = 0x09
CMD_SET_OFFSET_TUNING = 0x0A
CMD_SET_GAIN_BY_INDEX = 0x0D
CMD_SET_BIAS_TEE = 0x0E

TUNER_TYPES = [
    "UNKNOWN",
    "E4000",
    "FC0012",
    "FC0013",
    "FC2580",
    "R820T",
    "R828D",
]


@dataclass
class DongleInfo:
    """The rtl_tcp greeting header (magic, tuner type, gain count)."""

    magic: bytes
    tuner_type: int
    gain_count: int

    @property
    def tuner_name(self) -> str:
        if 0 <= self.tuner_type < len(TUNER_TYPES):
            return TUNER_TYPES[self.tuner_type]
        return f"UNKNOWN({self.tuner_type})"


class RtlTcpClient:
    """Blocking rtl_tcp client with per-read deadlines (main.go:168)."""

    def __init__(self, server: str = "127.0.0.1:1234"):
        host, _, port = server.rpartition(":")
        self.host = host or "127.0.0.1"
        self.port = int(port)
        self.sock: Optional[socket.socket] = None
        self.info: Optional[DongleInfo] = None

    def connect(self, timeout: float = 10.0) -> DongleInfo:
        self.sock = socket.create_connection(
            (self.host, self.port), timeout=timeout
        )
        header = self._read_exact(12)
        magic, tuner_type, gain_count = struct.unpack(">4sII", header)
        if magic != b"RTL0":
            raise IOError(f"rtl_tcp: bad magic {magic!r}")
        self.info = DongleInfo(magic, tuner_type, gain_count)
        return self.info

    def close(self) -> None:
        if self.sock is not None:
            self.sock.close()
            self.sock = None

    # -- command channel ----------------------------------------------------

    def _command(self, cmd: int, arg: int) -> None:
        assert self.sock is not None, "not connected"
        self.sock.sendall(struct.pack(">BI", cmd, arg & 0xFFFFFFFF))

    def set_center_freq(self, hz: int) -> None:
        self._command(CMD_SET_FREQ, hz)

    def set_sample_rate(self, hz: int) -> None:
        self._command(CMD_SET_SAMPLE_RATE, hz)

    def set_gain_mode(self, manual: bool) -> None:
        # rtl_tcp semantics: 1 = manual gain, 0 = auto. The reference's
        # SetGainMode(true) enables AUTO gain (rtltcp maps true->0).
        self._command(CMD_SET_GAIN_MODE, 0 if manual else 1)

    def set_tuner_gain(self, tenth_db: int) -> None:
        self._command(CMD_SET_GAIN, tenth_db)

    def set_freq_correction(self, ppm: int) -> None:
        self._command(CMD_SET_FREQ_CORRECTION, ppm)

    def set_agc_mode(self, on: bool) -> None:
        self._command(CMD_SET_AGC_MODE, 1 if on else 0)

    def set_gain_by_index(self, index: int) -> None:
        self._command(CMD_SET_GAIN_BY_INDEX, index)

    def set_direct_sampling(self, on: bool) -> None:
        self._command(CMD_SET_DIRECT_SAMPLING, 1 if on else 0)

    def set_offset_tuning(self, on: bool) -> None:
        self._command(CMD_SET_OFFSET_TUNING, 1 if on else 0)

    def set_bias_tee(self, on: bool) -> None:
        self._command(CMD_SET_BIAS_TEE, 1 if on else 0)

    # -- sample stream ------------------------------------------------------

    def set_deadline(self, seconds: Optional[float]) -> None:
        assert self.sock is not None, "not connected"
        self.sock.settimeout(seconds)

    def _read_exact(self, n: int) -> bytes:
        assert self.sock is not None, "not connected"
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise EOFError("rtl_tcp: connection closed")
            buf.extend(chunk)
        return bytes(buf)

    def read_samples(self, n_bytes: int, deadline: float = 5.0) -> np.ndarray:
        """Read exactly n_bytes of u8 IQ with a deadline (main.go:168-186)."""
        self.set_deadline(deadline)
        return np.frombuffer(self._read_exact(n_bytes), dtype=np.uint8)
