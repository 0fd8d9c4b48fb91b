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
- :class:`~rtlamr_tpu.parallel.wideband_mesh.WidebandMeshDecoder` — same
  checkpoint kind as the single-chip wideband path (the sharded carries are
  host-materialized; the tail width is ``halo`` instead of ``halo_staged``).
- :class:`~rtlamr_tpu.parallel.distributed.MultiHostDecoder` — one
  checkpoint file set PER PROCESS (suffix ``.pN``): local carry rows, the
  local dedup/parse state, and the cross-super-batch seam tail digests.

``capture_checkpoint`` / ``restore_checkpoint`` dispatch on decoder type;
``load_checkpoint`` reads back whichever single-file kind a path holds
(multi-host files are per-process: ``MultiHostCheckpoint.load(path, pid)``).
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


@dataclass
class MultiHostCheckpoint:
    """Per-process resume point of a MultiHostDecoder stream.

    Every process saves its OWN file set (suffix ``.pN``) holding its local
    carry rows and parse/dedup state; on resume each process loads its file
    and the sharded carry is reassembled from process-local data — no
    process ever holds global state (matching the decoder's design,
    parallel/distributed.py).
    """

    byte_offset: int  # GLOBAL capture bytes consumed (super-batch granular)
    window_index: int
    first: bool
    last_block: int
    carry_local: Optional[np.ndarray]  # (n_local, halo) u16 local carry rows
    prev_digests: List[Tuple]
    #: (block, [8-byte digest hashes]) of the global stream tail block —
    #: the cross-super-batch seam dedup state (distributed.py _seam_dedup).
    prev_batch_tail: Optional[Tuple[int, List[bytes]]]
    num_processes: int
    process_id: int
    n_global: int
    scan_windows: int
    window: int

    def _paths(self, path: str) -> Tuple[str, str]:
        base = f"{path}.p{self.process_id}"
        return base + ".meta.json", base + ".carry.bin"

    def save(self, path: str) -> None:
        meta_path, carry_path = self._paths(path)
        tail = self.prev_batch_tail
        meta = {
            "kind": "multihost",
            "byte_offset": self.byte_offset,
            "window_index": self.window_index,
            "first": self.first,
            "last_block": self.last_block,
            "prev_digests": _ser_digests(self.prev_digests),
            "prev_batch_tail": (
                None if tail is None else [tail[0], [h.hex() for h in tail[1]]]
            ),
            "num_processes": self.num_processes,
            "process_id": self.process_id,
            "n_global": self.n_global,
            "scan_windows": self.scan_windows,
            "window": self.window,
            "has_carry": self.carry_local is not None,
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        if self.carry_local is not None:
            self.carry_local.tofile(carry_path)

    @classmethod
    def load(cls, path: str, process_id: int) -> "MultiHostCheckpoint":
        base = f"{path}.p{process_id}"
        with open(base + ".meta.json") as f:
            meta = json.load(f)
        tail = meta["prev_batch_tail"]
        carry = None
        if meta["has_carry"]:
            carry = np.fromfile(base + ".carry.bin", dtype=np.uint16)
        return cls(
            byte_offset=meta["byte_offset"],
            window_index=meta["window_index"],
            first=meta["first"],
            last_block=meta["last_block"],
            carry_local=carry,
            prev_digests=_de_digests(meta["prev_digests"]),
            prev_batch_tail=(
                None
                if tail is None
                else (tail[0], [bytes.fromhex(h) for h in tail[1]])
            ),
            num_processes=meta["num_processes"],
            process_id=meta["process_id"],
            n_global=meta["n_global"],
            scan_windows=meta["scan_windows"],
            window=meta["window"],
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
    from ..parallel.distributed import MultiHostDecoder
    from ..parallel.wideband import WidebandDecoder
    from ..parallel.wideband_mesh import WidebandMeshDecoder

    if isinstance(dec, (WidebandDecoder, WidebandMeshDecoder)):
        # Same checkpoint kind for both wideband execution layouts; the
        # carried tail width differs ((N, halo_staged) single-chip vs
        # (N, halo) mesh) and restore validates it against the decoder.
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
    if isinstance(dec, MultiHostDecoder):
        if dec._inflight is not None:
            raise ValueError(
                "checkpoint with an undrained super-batch in flight; call "
                "drain() and emit its messages first"
            )
        carry_local = None
        if dec._carry is not None:
            halo = dec.spec.halo
            base = dec.process_id * dec.n_local
            carry_local = np.zeros((dec.n_local, halo), np.uint16)
            for sh in dec._carry.addressable_shards:
                r = (sh.index[0].start or 0) - base
                carry_local[r] = np.asarray(sh.data).reshape(-1, halo)[0]
        tail = dec._prev_batch_tail
        return MultiHostCheckpoint(
            byte_offset=byte_offset,
            window_index=dec._window_index,
            first=dec._first,
            last_block=dec._local._last_block,
            carry_local=carry_local,
            prev_digests=[tuple(d) for d in dec._local._deduper.prev],
            prev_batch_tail=(
                None if tail is None else (tail[0], sorted(tail[1]))
            ),
            num_processes=dec.num_processes,
            process_id=dec.process_id,
            n_global=dec.n_global,
            scan_windows=dec.scan_windows,
            window=dec.spec.window,
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
    from ..parallel.distributed import MultiHostDecoder
    from ..parallel.wideband import WidebandDecoder
    from ..parallel.wideband_mesh import WidebandMeshDecoder

    if isinstance(ckpt, MultiHostCheckpoint) != isinstance(
        dec, MultiHostDecoder
    ) or isinstance(ckpt, WidebandCheckpoint) != isinstance(
        dec, (WidebandDecoder, WidebandMeshDecoder)
    ):
        raise ValueError(
            f"checkpoint kind mismatch: {type(ckpt).__name__} cannot "
            f"restore a {type(dec).__name__}"
        )
    dec.reset()
    if isinstance(ckpt, MultiHostCheckpoint):
        import jax

        if (
            ckpt.num_processes != dec.num_processes
            or ckpt.n_global != dec.n_global
            or ckpt.process_id != dec.process_id
            or ckpt.scan_windows != dec.scan_windows
            or ckpt.window != dec.spec.window
        ):
            raise ValueError(
                "checkpoint topology mismatch: saved for "
                f"{ckpt.num_processes} procs x {ckpt.n_global} devices "
                f"(proc {ckpt.process_id}, K={ckpt.scan_windows}, "
                f"window={ckpt.window}), decoder is "
                f"{dec.num_processes} x {dec.n_global} (proc "
                f"{dec.process_id}, K={dec.scan_windows}, "
                f"window={dec.spec.window})"
            )
        dec._window_index = ckpt.window_index
        dec._first = ckpt.first
        dec._local._last_block = ckpt.last_block
        dec._local._deduper.prev = {Digest(*d) for d in ckpt.prev_digests}
        tail = ckpt.prev_batch_tail
        dec._prev_batch_tail = None if tail is None else (tail[0], set(tail[1]))
        if ckpt.carry_local is not None:
            rows = ckpt.carry_local.reshape(dec.n_local, dec.spec.halo)
            dec._carry = jax.make_array_from_process_local_data(
                dec._carry_sharding, rows, (dec.n_global, dec.spec.halo)
            )
        return
    if isinstance(ckpt, WidebandCheckpoint):
        import jax.numpy as jnp

        n = dec.n_channels
        is_mesh = isinstance(dec, WidebandMeshDecoder)
        tail_width = dec.spec.halo if is_mesh else dec.spec.halo_staged
        if ckpt.chan_tail.shape != (n, tail_width) or len(
            ckpt.chan_last_block
        ) != n:
            raise ValueError(
                "checkpoint geometry mismatch: saved for "
                f"{ckpt.chan_tail.shape[0]} channels x "
                f"{ckpt.chan_tail.shape[1]} tail samples, decoder wants "
                f"({n}, {tail_width})"
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
        if is_mesh:
            import jax

            dec._wb_hist = jax.device_put(
                ckpt.wb_hist.astype(np.float32), dec._replicated
            )
            dec._chan_tail = jax.device_put(
                ckpt.chan_tail.astype(np.uint16), dec._tail_sharding
            )
        else:
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
