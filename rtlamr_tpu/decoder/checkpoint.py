"""Stream-position checkpoint / resume for long offline captures.

The reference keeps no decoder state worth checkpointing (SURVEY.md §5.4);
its decode state is at most BufferLength samples of history. For multi-hour
captures on TPU, that observation becomes the checkpoint design: a resume
point is just (byte offset of the next window, global block index, the
carry samples, and the dedup digest sets). Writing one is cheap and
restoring is exact — decode continues bit-identically.

Three decoder families are covered:

- :class:`~rtlamr_tpu.decoder.pipeline.WindowDecoder` — carry is the
  ``(halo_staged,)`` u16 staged tail.
- :class:`~rtlamr_tpu.parallel.mesh.MeshDecoder` — same stream semantics,
  but the carry is the ``(halo,)`` u16 super-batch tail and may live on
  device (lazy slice); it is host-materialized into the checkpoint.
- :class:`~rtlamr_tpu.parallel.wideband.WidebandDecoder` — per-channel
  dedup states plus the channelizer filter history (``_wb_hist``) and the
  per-channel staged tails (``_chan_tail``).

``capture_checkpoint`` / ``restore_checkpoint`` dispatch on decoder type;
``load_checkpoint`` reads back whichever kind a file holds.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..protocols.base import Digest
from .pipeline import WindowDecoder


def _ser_digests(digests) -> List[List]:
    return [[d[0], d[1], d[2], d[3].hex()] for d in digests]


def _de_digests(rows) -> List[Tuple]:
    return [(t, mt, mid, bytes.fromhex(ck)) for t, mt, mid, ck in rows]


@dataclass
class Checkpoint:
    """Exact resume point of a WindowDecoder / MeshDecoder stream."""

    byte_offset: int  # capture bytes fully consumed (window-granular)
    window_index: int
    last_block: int
    first: bool
    carry: np.ndarray  # (halo_staged,) u16 staged samples ((halo,) for mesh)
    prev_digests: List[Tuple]  # serialized Digest tuples

    def save(self, path: str) -> None:
        meta = {
            "kind": "window",
            "byte_offset": self.byte_offset,
            "window_index": self.window_index,
            "last_block": self.last_block,
            "first": self.first,
            "prev_digests": _ser_digests(self.prev_digests),
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        self.carry.tofile(path + ".carry.bin")

    @classmethod
    def load(cls, path: str) -> "Checkpoint":
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        carry = np.fromfile(path + ".carry.bin", dtype=np.uint16)
        return cls(
            byte_offset=meta["byte_offset"],
            window_index=meta["window_index"],
            last_block=meta["last_block"],
            first=meta["first"],
            carry=carry,
            prev_digests=_de_digests(meta["prev_digests"]),
        )


@dataclass
class WidebandCheckpoint:
    """Exact resume point of a WidebandDecoder stream."""

    byte_offset: int  # wideband bytes fully consumed (super-step-granular)
    window_index: int
    first: bool
    wb_hist: np.ndarray  # (2, N, history_frames) f32 channelizer history
    chan_tail: np.ndarray  # (N, halo_staged) u16 per-channel staged tails
    chan_last_block: List[int]
    chan_prev_digests: List[List[Tuple]]
    xchan_seen: List[Tuple]  # (digest..., block, channel) ghost-dedup rows

    def save(self, path: str) -> None:
        meta = {
            "kind": "wideband",
            "byte_offset": self.byte_offset,
            "window_index": self.window_index,
            "first": self.first,
            "chan_last_block": self.chan_last_block,
            "chan_prev_digests": [
                _ser_digests(d) for d in self.chan_prev_digests
            ],
            "xchan_seen": [
                [t, mt, mid, ck.hex(), b, c]
                for (t, mt, mid, ck), b, c in self.xchan_seen
            ],
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        np.savez(
            path + ".carry.npz",
            wb_hist=self.wb_hist,
            chan_tail=self.chan_tail,
        )

    @classmethod
    def load(cls, path: str) -> "WidebandCheckpoint":
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        arrs = np.load(path + ".carry.npz")
        return cls(
            byte_offset=meta["byte_offset"],
            window_index=meta["window_index"],
            first=meta["first"],
            wb_hist=arrs["wb_hist"],
            chan_tail=arrs["chan_tail"],
            chan_last_block=list(meta["chan_last_block"]),
            chan_prev_digests=[
                _de_digests(d) for d in meta["chan_prev_digests"]
            ],
            xchan_seen=[
                ((t, mt, mid, bytes.fromhex(ck)), b, c)
                for t, mt, mid, ck, b, c in meta["xchan_seen"]
            ],
        )


def load_checkpoint(path: str):
    """Load whichever checkpoint kind ``path`` holds."""
    with open(path + ".meta.json") as f:
        kind = json.load(f).get("kind", "window")
    if kind == "wideband":
        return WidebandCheckpoint.load(path)
    return Checkpoint.load(path)


def _require_boundary(dec) -> None:
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


def capture_checkpoint(dec, byte_offset: int):
    """Snapshot a decoder at a window boundary (no pending bytes)."""
    from ..parallel.wideband import WidebandDecoder

    if isinstance(dec, WidebandDecoder):
        _require_boundary(dec)
        return WidebandCheckpoint(
            byte_offset=byte_offset,
            window_index=dec._window_index,
            first=dec._first,
            wb_hist=np.asarray(dec._wb_hist, np.float32).copy(),
            chan_tail=np.asarray(dec._chan_tail, np.uint16).copy(),
            chan_last_block=[c._last_block for c in dec._chan],
            chan_prev_digests=[
                [tuple(d) for d in c._deduper.prev] for c in dec._chan
            ],
            xchan_seen=[
                (tuple(d), b, c) for d, (b, c) in dec._xchan.seen.items()
            ],
        )
    _require_boundary(dec)
    carry = np.asarray(dec._carry, np.uint16)
    if carry.ndim == 2:
        # MeshDecoder's sharded (n, halo) carry: row 0 is the stream tail.
        carry = carry[0]
    return Checkpoint(
        byte_offset=byte_offset,
        window_index=dec._window_index,
        last_block=dec._last_block,
        first=dec._first,
        carry=carry.copy(),
        prev_digests=[tuple(d) for d in dec._deduper.prev],
    )


def restore_checkpoint(dec, ckpt) -> None:
    """Restore a decoder to a checkpoint; decode continues bit-identically."""
    from ..parallel.wideband import WidebandDecoder

    if isinstance(ckpt, WidebandCheckpoint) != isinstance(
        dec, WidebandDecoder
    ):
        raise ValueError(
            f"checkpoint kind mismatch: {type(ckpt).__name__} cannot "
            f"restore a {type(dec).__name__}"
        )
    dec.reset()
    if isinstance(ckpt, WidebandCheckpoint):
        import jax.numpy as jnp

        n = dec.n_channels
        if ckpt.chan_tail.shape != (n, dec.spec.halo_staged) or len(
            ckpt.chan_last_block
        ) != n:
            raise ValueError(
                "checkpoint geometry mismatch: saved for "
                f"{ckpt.chan_tail.shape[0]} channels x "
                f"{ckpt.chan_tail.shape[1]} tail samples, decoder wants "
                f"({n}, {dec.spec.halo_staged})"
            )
        want_hist = np.asarray(dec._wb_hist).shape
        if ckpt.wb_hist.shape != want_hist:
            raise ValueError(
                "checkpoint geometry mismatch: channelizer history has "
                f"{ckpt.wb_hist.shape}, decoder wants {want_hist} "
                "(different taps_per_branch?)"
            )
        dec._window_index = ckpt.window_index
        dec._first = ckpt.first
        dec._wb_hist = jnp.asarray(ckpt.wb_hist, jnp.float32)
        dec._chan_tail = jnp.asarray(ckpt.chan_tail, jnp.uint16)
        for c, chan in enumerate(dec._chan):
            chan._last_block = ckpt.chan_last_block[c]
            chan._deduper.prev = {
                Digest(*d) for d in ckpt.chan_prev_digests[c]
            }
        dec._xchan.seen = {
            Digest(*d): (b, c) for d, b, c in ckpt.xchan_seen
        }
        return
    expect = np.asarray(dec._carry).shape  # post-reset host zeros
    carry = np.asarray(ckpt.carry, np.uint16)
    if len(expect) == 2:
        # MeshDecoder: saved carry is the (halo,) stream tail -> row 0.
        if carry.shape != expect[1:]:
            raise ValueError(
                f"checkpoint geometry mismatch: carry has {carry.shape}, "
                f"mesh decoder wants {expect[1:]} per shard row "
                "(different decoder type or window?)"
            )
        full = np.zeros(expect, np.uint16)
        full[0] = carry
        carry = full
    elif carry.shape != expect:
        raise ValueError(
            f"checkpoint geometry mismatch: carry has {carry.shape}, "
            f"decoder wants {expect} (different decoder type or window?)"
        )
    dec._window_index = ckpt.window_index
    dec._last_block = ckpt.last_block
    dec._first = ckpt.first
    dec._carry = carry.copy()
    dec._deduper.prev = {Digest(*d) for d in ckpt.prev_digests}
