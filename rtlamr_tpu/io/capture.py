"""Capture-file IQ sources and the sample-dump writer.

The reference has no offline decode mode (its only input is rtl_tcp) but
dumps raw samples to ``-samplefile`` whenever a packet is found
(main.go:279-289) so captures can be re-decoded. This module provides both
sides: file/stream sources for offline decoding and the dump writer.
"""

from __future__ import annotations

import io
import os
import sys
from typing import Iterator, Optional

import numpy as np


class IQSource:
    """Abstract source of u8 interleaved IQ bytes."""

    def read(self, n_bytes: int) -> np.ndarray:
        """Up to n_bytes of IQ; empty array at end of stream."""
        raise NotImplementedError

    def close(self) -> None:
        pass


class FileSource(IQSource):
    """Raw u8 IQ capture file (the format of -samplefile dumps)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")

    def read(self, n_bytes: int) -> np.ndarray:
        data = self._f.read(n_bytes)
        return np.frombuffer(data, dtype=np.uint8)

    def close(self) -> None:
        self._f.close()


class StdinSource(IQSource):
    """IQ piped on stdin (rtl_sdr | rtlamr-style usage)."""

    def __init__(self):
        self._f = sys.stdin.buffer

    def read(self, n_bytes: int) -> np.ndarray:
        data = self._f.read(n_bytes)
        return np.frombuffer(data or b"", dtype=np.uint8)


class ArraySource(IQSource):
    """In-memory capture (tests, bench)."""

    def __init__(self, iq: np.ndarray):
        self.iq = np.asarray(iq, dtype=np.uint8)
        self.pos = 0

    def read(self, n_bytes: int) -> np.ndarray:
        chunk = self.iq[self.pos : self.pos + n_bytes]
        self.pos += chunk.size
        return chunk


class RtlTcpSource(IQSource):
    """Live samples from an rtl_tcp server (reference L1)."""

    def __init__(self, client, deadline: float = 5.0):
        self.client = client
        self.deadline = deadline

    def read(self, n_bytes: int) -> np.ndarray:
        return self.client.read_samples(n_bytes, deadline=self.deadline)

    def close(self) -> None:
        self.client.close()


class SampleDumper:
    """-samplefile writer: raw IQ dumped when packets are found
    (main.go:279-289), with tell() for LogMessage offsets (main.go:244-246).
    """

    def __init__(self, path: Optional[str]):
        self.path = path
        self._f: Optional[io.BufferedWriter] = None
        if path and path != os.devnull:
            self._f = open(path, "wb")

    @property
    def active(self) -> bool:
        return self._f is not None

    def offset(self) -> int:
        return self._f.tell() if self._f else 0

    def write(self, iq: np.ndarray) -> None:
        if self._f:
            self._f.write(np.asarray(iq, np.uint8).tobytes())

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None
