"""Native (C++) sample-transport runtime, bound via ctypes.

The reference's L1 transport is the rtl_tcp client inside its Receiver
(main.go:49-57, 156-205): a blocking TCP reader feeding the decoder through
a channel. Here the transport is a C++ shared library (``src/ingest.cpp``):
a dedicated reader thread drains the socket into a ring buffer without
holding the GIL, Python pulls whole decode windows out, and a memory-mapped
reader serves capture files. Builds on demand with g++; everything degrades
gracefully to the pure-Python ``io`` module when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "ingest.cpp")
_LIB_PATH = os.path.join(_HERE, "_ingest.so")

_lib = None
_lib_err: Optional[str] = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    """Compile src/ingest.cpp -> _ingest.so. Returns an error string or None.

    Compiles to a per-pid temporary and os.rename()s into place so two
    processes building concurrently (e.g. pytest + CLI) can never dlopen a
    half-written .so — rename is atomic on POSIX.
    """
    tmp_path = f"{_LIB_PATH}.{os.getpid()}"
    cmd = [
        "g++",
        "-std=c++17",
        "-O2",
        "-fPIC",
        "-shared",
        "-pthread",
        _SRC,
        "-o",
        tmp_path,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ unavailable: {e}"
    if proc.returncode != 0:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return f"g++ failed: {proc.stderr[-2000:]}"
    os.rename(tmp_path, _LIB_PATH)
    return None


def _bind(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.rtlamr_ingest_connect.restype = c.c_int64
    lib.rtlamr_ingest_connect.argtypes = [
        c.c_char_p, c.c_int, c.c_int, c.c_int64,
        c.POINTER(c.c_uint32), c.POINTER(c.c_uint32),
    ]
    lib.rtlamr_ingest_command.restype = c.c_int
    lib.rtlamr_ingest_command.argtypes = [c.c_int64, c.c_uint8, c.c_uint32]
    lib.rtlamr_ingest_read.restype = c.c_int64
    lib.rtlamr_ingest_read.argtypes = [
        c.c_int64, c.POINTER(c.c_uint8), c.c_int64, c.c_int,
        c.POINTER(c.c_int),
    ]
    lib.rtlamr_ingest_read_staged.restype = c.c_int64
    lib.rtlamr_ingest_read_staged.argtypes = [
        c.c_int64, c.POINTER(c.c_uint16), c.POINTER(c.c_uint16),
        c.c_int64, c.c_int64, c.c_int, c.POINTER(c.c_int),
    ]
    lib.rtlamr_file_read_staged.restype = c.c_int64
    lib.rtlamr_file_read_staged.argtypes = [
        c.c_int64, c.POINTER(c.c_uint16), c.POINTER(c.c_uint16),
        c.c_int64, c.c_int64,
    ]
    lib.rtlamr_ingest_stats.restype = c.c_int
    lib.rtlamr_ingest_stats.argtypes = [
        c.c_int64, c.POINTER(c.c_uint64), c.POINTER(c.c_uint64),
        c.POINTER(c.c_uint64),
    ]
    lib.rtlamr_ingest_close.restype = c.c_int
    lib.rtlamr_ingest_close.argtypes = [c.c_int64]
    lib.rtlamr_file_open.restype = c.c_int64
    lib.rtlamr_file_open.argtypes = [c.c_char_p, c.POINTER(c.c_int64)]
    lib.rtlamr_file_read.restype = c.c_int64
    lib.rtlamr_file_read.argtypes = [c.c_int64, c.POINTER(c.c_uint8), c.c_int64]
    lib.rtlamr_file_seek.restype = c.c_int
    lib.rtlamr_file_seek.argtypes = [c.c_int64, c.c_int64]
    lib.rtlamr_file_close.restype = c.c_int
    lib.rtlamr_file_close.argtypes = [c.c_int64]


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        needs_build = not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        )
        if needs_build:
            err = _build()
            if err is not None:
                _lib_err = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
        except OSError as e:
            _lib_err = str(e)
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def load_error() -> Optional[str]:
    load()
    return _lib_err


class NativeRtlTcpClient:
    """rtl_tcp client backed by the native reader thread + ring buffer.

    Same surface as :class:`rtlamr_tpu.io.rtltcp.RtlTcpClient` so the CLI's
    Receiver can use either (selected by the -ingest flag).
    """

    #: default ring: ~27 s of IQ at the default 2.36 MS/s rate — deep enough
    #: that a multi-second device stall never drops live samples.
    RING_BYTES = 128 << 20

    def __init__(self, server: str = "127.0.0.1:1234", ring_bytes: int = 0):
        host, _, port = server.rpartition(":")
        self.host = host or "127.0.0.1"
        self.port = int(port)
        self.ring_bytes = ring_bytes or self.RING_BYTES
        self._h: Optional[int] = None
        self.info = None

    def connect(self, timeout: float = 10.0):
        from ..io.rtltcp import DongleInfo

        lib = load()
        if lib is None:
            raise OSError(f"native ingest unavailable: {_lib_err}")
        tt = ctypes.c_uint32(0)
        gc = ctypes.c_uint32(0)
        h = lib.rtlamr_ingest_connect(
            self.host.encode(),
            self.port,
            int(timeout * 1000),
            self.ring_bytes,
            ctypes.byref(tt),
            ctypes.byref(gc),
        )
        if h < 0:
            raise IOError(f"rtl_tcp connect failed (native err {h})")
        self._h = h
        self.info = DongleInfo(b"RTL0", tt.value, gc.value)
        return self.info

    def close(self) -> None:
        if self._h is not None:
            load().rtlamr_ingest_close(self._h)
            self._h = None

    # -- command channel (opcodes in io/rtltcp.py) ---------------------------

    def _command(self, cmd: int, arg: int) -> None:
        assert self._h is not None, "not connected"
        rc = load().rtlamr_ingest_command(self._h, cmd, arg & 0xFFFFFFFF)
        if rc != 0:
            raise IOError("rtl_tcp command send failed")

    def set_center_freq(self, hz: int) -> None:
        self._command(0x01, hz)

    def set_sample_rate(self, hz: int) -> None:
        self._command(0x02, hz)

    def set_gain_mode(self, manual: bool) -> None:
        # Reference semantics: SetGainMode(true) = auto (io/rtltcp.py).
        self._command(0x03, 0 if manual else 1)

    def set_tuner_gain(self, tenth_db: int) -> None:
        self._command(0x04, tenth_db)

    def set_freq_correction(self, ppm: int) -> None:
        self._command(0x05, ppm)

    def set_agc_mode(self, on: bool) -> None:
        self._command(0x08, 1 if on else 0)

    def set_gain_by_index(self, index: int) -> None:
        self._command(0x0D, index)

    def set_direct_sampling(self, on: bool) -> None:
        self._command(0x09, 1 if on else 0)

    def set_offset_tuning(self, on: bool) -> None:
        self._command(0x0A, 1 if on else 0)

    def set_bias_tee(self, on: bool) -> None:
        self._command(0x0E, 1 if on else 0)

    # -- sample stream --------------------------------------------------------

    def read_samples(self, n_bytes: int, deadline: float = 5.0) -> np.ndarray:
        """Read exactly n_bytes of u8 IQ with a deadline (main.go:168-186).

        Raises OSError on deadline, EOFError when the connection closes
        before n_bytes arrive (matching RtlTcpClient.read_samples — a short
        buffered tail at EOF is discarded just as the reference's partial
        final block is, main.go:178-186).
        """
        assert self._h is not None, "not connected"
        out = np.empty(n_bytes, np.uint8)
        timed_out = ctypes.c_int(0)
        got = load().rtlamr_ingest_read(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_bytes,
            int(deadline * 1000),
            ctypes.byref(timed_out),
        )
        if got < n_bytes:
            if timed_out.value:
                raise OSError("rtl_tcp read deadline exceeded")
            raise EOFError("rtl_tcp: connection closed")
        return out

    def read_staged(
        self,
        staged: np.ndarray,
        carry: np.ndarray,
        window: int,
        deadline: float = 5.0,
    ) -> Tuple[int, bool]:
        """Fill a StagedGeometry u16 window buffer directly from the ring.

        ``staged`` is a (staged_samples,) uint16 buffer whose tail past
        ``len(carry) + window`` the caller keeps zeroed; ``carry`` is the
        (halo_staged,) uint16 carry, updated in place on a full read. No
        per-window NumPy staging copy happens anywhere — the native reader
        writes the decode-ready layout. Returns (samples_read, timed_out);
        samples_read < window means eof/timeout (carry NOT updated; the
        partial bytes sit at staged[halo_staged:] for a fallback path).
        """
        assert self._h is not None, "not connected"
        timed_out = ctypes.c_int(0)
        got = load().rtlamr_ingest_read_staged(
            self._h,
            staged.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            carry.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            carry.size,
            window,
            int(deadline * 1000),
            ctypes.byref(timed_out),
        )
        return int(got), bool(timed_out.value)

    def stats(self) -> Tuple[int, int, int]:
        """(bytes_total, bytes_dropped, bytes_buffered)."""
        assert self._h is not None, "not connected"
        t = ctypes.c_uint64(0)
        d = ctypes.c_uint64(0)
        b = ctypes.c_uint64(0)
        load().rtlamr_ingest_stats(
            self._h, ctypes.byref(t), ctypes.byref(d), ctypes.byref(b)
        )
        return t.value, d.value, b.value


class NativeFileSource:
    """mmap-backed capture file source (drop-in for io.capture.FileSource)."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise OSError(f"native ingest unavailable: {_lib_err}")
        size = ctypes.c_int64(0)
        h = lib.rtlamr_file_open(path.encode(), ctypes.byref(size))
        if h < 0:
            raise IOError(f"cannot open {path}")
        self._h: Optional[int] = h
        self.size = size.value
        self.path = path

    def read(self, n_bytes: int) -> np.ndarray:
        assert self._h is not None, "closed"
        out = np.empty(n_bytes, np.uint8)
        got = load().rtlamr_file_read(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_bytes
        )
        return out[: max(got, 0)]

    def read_staged(
        self, staged: np.ndarray, carry: np.ndarray, window: int
    ) -> int:
        """Fill a StagedGeometry u16 window buffer from the mapped file
        (same contract as NativeRtlTcpClient.read_staged, minus the
        deadline). Returns samples read; < window means end of capture."""
        assert self._h is not None, "closed"
        return int(
            load().rtlamr_file_read_staged(
                self._h,
                staged.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                carry.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                carry.size,
                window,
            )
        )

    def seek(self, pos: int) -> None:
        assert self._h is not None, "closed"
        if load().rtlamr_file_seek(self._h, pos) != 0:
            raise IOError(f"seek({pos}) failed")

    def close(self) -> None:
        if self._h is not None:
            load().rtlamr_file_close(self._h)
            self._h = None
