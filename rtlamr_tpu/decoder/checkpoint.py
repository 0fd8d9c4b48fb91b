"""Stream-position checkpoint / resume for long offline captures.

The reference keeps no decoder state worth checkpointing (SURVEY.md §5.4);
its decode state is at most BufferLength samples of history. For multi-hour
captures on TPU, that observation becomes the checkpoint design: a resume
point is just (byte offset of the next window, global block index, the
carry samples, and the dedup digest sets). Writing one is cheap and
restoring is exact — decode continues bit-identically.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..protocols.base import Digest
from .pipeline import WindowDecoder


@dataclass
class Checkpoint:
    """Exact resume point of a WindowDecoder stream."""

    byte_offset: int  # capture bytes fully consumed (window-granular)
    window_index: int
    last_block: int
    first: bool
    carry: np.ndarray  # (halo_staged,) u16 staged samples
    prev_digests: List[Tuple]  # serialized Digest tuples

    def save(self, path: str) -> None:
        meta = {
            "byte_offset": self.byte_offset,
            "window_index": self.window_index,
            "last_block": self.last_block,
            "first": self.first,
            "prev_digests": [
                [d[0], d[1], d[2], d[3].hex()] for d in self.prev_digests
            ],
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        self.carry.tofile(path + ".carry.bin")

    @classmethod
    def load(cls, path: str) -> "Checkpoint":
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        carry = np.fromfile(path + ".carry.bin", dtype=np.uint16)
        digests = [
            (t, mt, mid, bytes.fromhex(ck))
            for t, mt, mid, ck in meta["prev_digests"]
        ]
        return cls(
            byte_offset=meta["byte_offset"],
            window_index=meta["window_index"],
            last_block=meta["last_block"],
            first=meta["first"],
            carry=carry,
            prev_digests=digests,
        )


def capture_checkpoint(dec: WindowDecoder, byte_offset: int) -> Checkpoint:
    """Snapshot a decoder at a window boundary (no pending bytes)."""
    if dec._pending.size:
        raise ValueError(
            "checkpoint only at window boundaries: "
            f"{dec._pending.size} pending bytes"
        )
    if dec._inflight is not None:
        raise ValueError(
            "checkpoint with an undrained window in flight; call drain() "
            "and emit its messages first"
        )
    return Checkpoint(
        byte_offset=byte_offset,
        window_index=dec._window_index,
        last_block=dec._last_block,
        first=dec._first,
        carry=dec._carry.copy(),
        prev_digests=[tuple(d) for d in dec._deduper.prev],
    )


def restore_checkpoint(dec: WindowDecoder, ckpt: Checkpoint) -> None:
    """Restore a decoder to a checkpoint; decode continues bit-identically."""
    dec.reset()
    dec._window_index = ckpt.window_index
    dec._last_block = ckpt.last_block
    dec._first = ckpt.first
    dec._carry = np.asarray(ckpt.carry, np.uint16).copy()
    dec._deduper.prev = {Digest(*d) for d in ckpt.prev_digests}
