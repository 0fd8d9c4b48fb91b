"""Single-chip streaming window pipeline.

Replaces the reference's three-goroutine per-block loop (main.go:135-296)
with: accumulate IQ into a large window -> one jitted device program
(ops/frontend.decode_window) -> host-side parsing of the compacted
candidates with the reference's per-block ordering, digest dedup and filter
semantics. The window is a whole number of reference block sizes so the
block-granular dedup behavior (main.go:252-292) is preserved exactly.

Between windows only the last ``halo = PacketLength + SymbolLength`` samples
carry over (overlap-save) — the same halo a shard fetches from its left
neighbor in the multi-chip path (parallel/).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.frontend import FrontendSpec, make_frontend_spec
from ..utils.observability import Metrics
from ..protocols.base import (
    DecoderConfig,
    Message,
    Parser,
    build_decoder_config,
    digest as mk_digest,
)
from ..protocols.r900 import PAYLOAD_SYMBOLS
from .dedup import BlockDeduper

FilterFn = Callable[[Message], bool]


class WindowDecoder:
    """Streaming decoder over fixed-size sample windows.

    Args:
      parsers: registered protocol parsers (registration order is the
        deterministic message order within a block).
      window_blocks: reference blocks per device window. Larger windows
        amortize launch/transfer overhead; dedup semantics are
        window-size-invariant.
      max_hits: device-side hit compaction capacity per preamble group per
        window; overflow falls back to an exact NumPy path for that window.
      filter_fn: optional message filter applied before dedup, matching the
        reference's FilterChain position (main.go:237).
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        window_blocks: Optional[int] = 64,
        max_hits: int = 256,
        filter_fn: Optional[FilterFn] = None,
        backend: str = "jnp",
    ):
        self.parsers = list(parsers)
        self.cfg: DecoderConfig = build_decoder_config(self.parsers)
        if window_blocks is None:
            # Minimum window that covers the halo (required by the mesh path).
            halo = self.cfg.packet_length + self.cfg.symbol_length
            window_blocks = -(-halo // self.cfg.block_size)
        self.spec: FrontendSpec = make_frontend_spec(
            self.cfg, window_blocks, max_hits, backend=backend
        )
        self.filter_fn = filter_fn
        self.metrics = Metrics()
        # Group index -> parsers, aligned with spec.groups order.
        self._group_parsers = [
            self.cfg.preamble_groups[g.preamble] for g in self.spec.groups
        ]
        self.reset()

    # -- streaming state ----------------------------------------------------

    def reset(self) -> None:
        # Carry between windows: the last halo_staged SAMPLES (u16 = one
        # interleaved IQ byte pair each) of the previous window's stream.
        self._carry = np.zeros(self.spec.halo_staged, np.uint16)
        self._first = True
        self._window_index = 0
        self._deduper = BlockDeduper()
        self._last_block = -1
        self._plist: List[np.ndarray] = []
        self._psize = 0
        #: one-deep dispatch-ahead pipeline: (device buffer, meta) of the
        #: window whose results have not been fetched yet. Overlaps
        #: host->device transfer and compute of window i+1 with the
        #: device->host fetch and host parse of window i.
        self._inflight = None
        #: window_index -> monotonic dispatch time; consumed at completion
        #: to expose the feed->emit latency (metrics feed_to_emit_ms_*).
        self._dispatch_times: Dict[int, float] = {}

    @property
    def window_bytes(self) -> int:
        return 2 * self.spec.window

    @property
    def _pending(self) -> np.ndarray:
        """Unconsumed IQ bytes. Stored as a chunk list so the live path's
        many small feed() calls don't re-copy the whole pending buffer per
        chunk (O(window) memcpy per window instead of O(window^2/chunk));
        materialized on access for checkpointing and the CLI."""
        if not self._plist:
            return np.zeros(0, np.uint8)
        if len(self._plist) > 1:
            self._plist = [np.concatenate(self._plist)]
        return self._plist[0]

    @_pending.setter
    def _pending(self, value: np.ndarray) -> None:
        value = np.asarray(value, np.uint8)
        self._plist = [value] if value.size else []
        self._psize = int(value.size)

    # -- capture / streaming APIs ------------------------------------------

    def feed(self, iq_bytes: np.ndarray) -> List[Tuple[int, Message]]:
        """Feed arbitrary-length IQ bytes; decode any completed windows.

        The chunk is retained by reference until the window containing it is
        decoded (``np.asarray`` does not copy) — callers must not mutate a
        passed buffer after the call. Pass a copy when reusing read buffers.
        """
        chunk = np.asarray(iq_bytes, np.uint8)
        if chunk.size:
            self._plist.append(chunk)
            self._psize += int(chunk.size)
        out: List[Tuple[int, Message]] = []
        wb = self.window_bytes
        if self._psize >= wb:
            buf = self._pending  # one concatenate for all buffered chunks
            n_win = buf.size // wb
            for i in range(n_win):
                out.extend(self._process_window(buf[i * wb : (i + 1) * wb]))
            self._pending = buf[n_win * wb :]
        return out

    def flush(self) -> List[Tuple[int, Message]]:
        """Decode remaining full blocks (zero-padding the final window) and
        drain the dispatch-ahead pipeline."""
        bs2 = 2 * self.cfg.block_size
        full_blocks = self._pending.size // bs2
        out: List[Tuple[int, Message]] = []
        if full_blocks:
            valid = self._pending[: full_blocks * bs2]
            self._pending = self._pending[full_blocks * bs2 :]
            padded = np.zeros(self.window_bytes, np.uint8)
            padded[: valid.size] = valid
            out.extend(self._process_window(padded, valid_blocks=full_blocks))
        out.extend(self.drain())
        return out

    def drain(self) -> List[Tuple[int, Message]]:
        if self._inflight is None:
            return []
        inflight, self._inflight = self._inflight, None
        return self._complete_inflight(inflight)

    def _complete_inflight(self, inflight) -> List[Tuple[int, Message]]:
        if isinstance(inflight[1], list):  # batched (decode_staged_batch)
            return self._complete_batch(*inflight)
        return self._complete_window(*inflight)

    def decode_staged(
        self, staged: Sequence, drain: bool = True
    ) -> List[Tuple[int, Message]]:
        """Decode windows already staged in device memory.

        ``staged[i]`` is a device array of ``spec.staged_samples`` uint16 in
        the StagedGeometry layout (as produced by slicing a device-resident
        staged capture at window boundaries). Skips per-window host->device
        transfers entirely; used for HBM-resident captures and benching.
        """
        from ..ops.frontend import decode_window_staged_packed

        spec = self.spec
        out: List[Tuple[int, Message]] = []
        for iq_full in staged:
            buf = decode_window_staged_packed(
                spec, iq_full, self._first_scalar(self._first)
            )
            meta = (iq_full, self._first, None, self._window_index)
            self._first = False
            self._window_index += 1
            if self._inflight is not None:
                prev, self._inflight = self._inflight, None
                out.extend(self._complete_inflight(prev))
            self._inflight = (buf, meta)
        if drain:
            out.extend(self.drain())
        return out

    def decode_staged_batch(
        self, staged_batch, drain: bool = True
    ) -> List[Tuple[int, Message]]:
        """Decode a (K, staged_samples) u16 device batch in ONE program.

        The scan-batched program (ops/frontend.decode_windows_scan) pays the
        transport's fixed per-execution sync cost once per K windows. Keeps
        the one-deep dispatch-ahead pipeline across batches: batch i+1's
        device compute overlaps batch i's fetch + host parse.
        """
        import jax.numpy as jnp

        from ..ops.frontend import decode_windows_scan

        spec = self.spec
        k = int(staged_batch.shape[0])
        firsts_host = [self._first] + [False] * (k - 1)
        packed = decode_windows_scan(
            spec, staged_batch, jnp.asarray(firsts_host)
        )
        metas = [
            (staged_batch, i, firsts_host[i], None, self._window_index + i)
            for i in range(k)
        ]
        self._first = False
        self._window_index += k

        out: List[Tuple[int, Message]] = []
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            out.extend(self._complete_inflight(prev))
        self._inflight = (packed, metas)
        if drain:
            out.extend(self.drain())
        return out

    def _complete_batch(self, packed, metas) -> List[Tuple[int, Message]]:
        host = np.asarray(packed)  # ONE fetch for the whole batch
        out: List[Tuple[int, Message]] = []
        for i, meta in enumerate(metas):
            staged_batch, k, first, valid_blocks, window_index = meta
            # Lazy slice: only materialized if this window overflows and
            # needs the escalation re-decode.
            thunk = (lambda sb=staged_batch, kk=k: sb[kk])
            out.extend(
                self._complete_window(
                    host[i], (thunk, first, valid_blocks, window_index)
                )
            )
        return out

    def decode_capture(
        self, iq_bytes: np.ndarray, dedup: bool = True
    ) -> List[Tuple[int, Message]]:
        """Decode a whole capture; returns (block_index, message) pairs."""
        self.reset()
        self._dedup_enabled = dedup
        try:
            out = self.feed(np.asarray(iq_bytes, np.uint8))
            out.extend(self.flush())
        finally:
            self._dedup_enabled = True
        return out

    _dedup_enabled: bool = True

    # -- internals ----------------------------------------------------------

    _first_cache: Optional[Dict[bool, object]] = None

    def _first_scalar(self, first: bool):
        """Cached device-resident bool scalars (avoids a tiny host->device
        transfer per window on high-latency transports)."""
        if self._first_cache is None:
            import jax.numpy as jnp

            self._first_cache = {
                True: jnp.asarray(True),
                False: jnp.asarray(False),
            }
        return self._first_cache[first]

    def _process_window(
        self, window_bytes: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, Message]]:
        """Dispatch this window to the device; fetch+parse the previous one.

        Device dispatch is asynchronous, so the previous window's transfer
        and compute overlap with this call's host work. Results therefore
        arrive with one-window latency; flush() drains the tail.
        """
        from ..ops.frontend import staged_geometry

        spec = self.spec
        geo = staged_geometry(spec)
        hs, w = spec.halo_staged, spec.window
        staged = np.zeros(geo.staged_samples, np.uint16)
        staged[:hs] = self._carry
        staged[hs : hs + w] = np.ascontiguousarray(window_bytes).view(np.uint16)
        return self.process_host_staged(staged, valid_blocks)

    def process_host_staged(
        self, staged: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, Message]]:
        """Dispatch one externally staged u16 window buffer.

        ``staged`` is a (staged_samples,) uint16 buffer in the
        StagedGeometry layout with the carry already in place — e.g. built
        zero-copy by the native transport's ``read_staged``
        (rtlamr_tpu.native), which writes decode-ready buffers directly
        from the socket ring / mmap. The buffer is retained by reference
        until this window's results are fetched (one window of
        dispatch-ahead), so callers must rotate >= 2 buffers. self._carry
        is refreshed from the buffer so checkpoint/resume stays exact.
        """
        import jax.numpy as jnp

        from ..ops.frontend import decode_window_staged_packed

        spec = self.spec
        hs, w = spec.halo_staged, spec.window
        buf = decode_window_staged_packed(
            spec, jnp.asarray(staged), self._first_scalar(self._first)
        )
        meta = (staged, self._first, valid_blocks, self._window_index)
        import time as _time

        self._dispatch_times[self._window_index] = _time.monotonic()
        self._carry = staged[w : w + hs].copy()
        self._first = False
        self._window_index += 1

        msgs: List[Tuple[int, Message]] = []
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            msgs = self._complete_inflight(prev)
        self._inflight = (buf, meta)
        return msgs

    def _complete_window(self, buf, meta) -> List[Tuple[int, Message]]:
        from ..ops.frontend import unpack_results

        staged, first, valid_blocks, window_index = meta
        t0 = self._dispatch_times.pop(window_index, None)
        if t0 is not None:
            import time as _time

            ms = (_time.monotonic() - t0) * 1e3
            ex = self.metrics.extra
            ex["feed_to_emit_ms_last"] = round(ms, 2)
            ex["feed_to_emit_ms_max"] = round(
                max(ms, ex.get("feed_to_emit_ms_max", 0.0)), 2
            )
        spec = self.spec
        res = unpack_results(spec, np.asarray(buf))
        if self._overflowed(res, spec):
            # Escalate: re-decode this window with a high-capacity program
            # variant (compiled lazily, cached); exact host path last.
            if callable(staged):  # lazy batch slice (decode_staged_batch)
                staged = staged()
            self.metrics.hit_overflows += 1
            big = self._big_spec()
            import jax.numpy as jnp

            from ..ops.frontend import decode_window_staged_packed

            big_buf = decode_window_staged_packed(
                big, jnp.asarray(staged), self._first_scalar(first)
            )
            res = unpack_results(big, np.asarray(big_buf))
            if self._overflowed(res, big):
                res = self._window_results_numpy(np.asarray(staged), first)
        msgs = self._parse_window(res, valid_blocks, window_index)
        self.metrics.windows_decoded += 1
        self.metrics.samples_in += spec.window
        return msgs

    def _overflowed(self, res: Dict[str, object], spec=None) -> bool:
        """True when device compaction capacity was exceeded: raw hits past
        the gather capacity, or distinct candidates past the output slots."""
        spec = spec or self.spec
        counts = np.asarray(res["counts"])
        return bool(
            (counts[:, 0] > spec.gather_hits).any()
            or (counts[:, 1] > spec.max_hits).any()
        )

    def _big_spec(self) -> FrontendSpec:
        """High-capacity program variant for hit-dense windows."""
        import dataclasses

        if not hasattr(self, "_big_spec_cache"):
            w = self.spec.window
            gather = min(1 << 16, w)
            self._big_spec_cache = dataclasses.replace(
                self.spec,
                max_hits=min(4096, w),
                gather_hits=gather,
                # Slice capacity == gather capacity: the pre-slice plateau
                # collapse can't overflow in the escalation variant.
                slice_hits=gather,
                # Row capacity == gather capacity: a row overflow here
                # implies >gather raw hits, so the same overflow check
                # falls through to the exact host path.
                gather_rows=min(gather, w // 128),
            )
        return self._big_spec_cache

    def _parse_window(
        self,
        res: Dict[str, object],
        valid_blocks: Optional[int],
        window_index: int,
    ) -> List[Tuple[int, Message]]:
        """Two-phase host parse.

        Phase A (vectorized, whole window): per preamble group — batched
        checksum pre-filter, per-block exact-duplicate collapse, then each
        parser's :meth:`~rtlamr_tpu.protocols.base.Parser.parse_batch` over
        the surviving candidate MATRIX (batched CRC/RS + batched bitfield
        extraction; dataclasses built only for emitted rows).

        Phase B (ordered, per block): the reference's emission semantics —
        blocks ascending, parsers in registration order within a group,
        candidates ascending within a parser; FilterChain then digest dedup
        per block (main.go:235-292).

        Duplicate collapse note: preamble hits form plateaus of adjacent
        positions slicing identical packets; the reference processes each
        and dedups via its per-parser seen map (scm/scm.go:62-74) —
        collapsing exact duplicates per block first is equivalent (first
        occurrence kept, ascending order preserved). The dedup key is the
        4-ary symbols for R900 groups (r900/r900.go:209), the packed
        packet bytes otherwise.
        """
        spec = self.spec
        bs = spec.block_size
        wb = spec.window // bs
        if valid_blocks is None:
            valid_blocks = wb
        window_block0 = window_index * wb

        # Phase A.
        group_parsed = {}  # g -> (b_arr, [per-parser {row: Message}])
        for g, gspec in enumerate(spec.groups):
            count = int(np.asarray(res["counts"])[g][1])
            full = np.asarray(res["idx"][g])
            cap = min(count, full.shape[0])
            idx = full[:cap]
            if idx.size == 0:
                continue
            data = np.asarray(res["bytes"][g])[:cap]
            syms = (
                np.asarray(res["symbols"][g])[:cap]
                if g in res["symbols"]
                else None
            )
            pvalid = (
                np.asarray(res["pvalid"][g])[:cap]
                if "pvalid" in res
                else None
            )
            b_arr = idx // bs
            keep = b_arr < valid_blocks
            if not keep.any():
                continue
            idx, b_arr, data = idx[keep], b_arr[keep], data[keep]
            if syms is not None:
                syms = syms[keep]
            # Checksum pre-filter (crc/crc.go:49-55, r900.go:215-221): the
            # device program already computed each parser's verdict per
            # surviving row (ops/frontend pvalid bitmask) — unpack it
            # instead of recomputing the CRC/RS on host. The exact NumPy
            # fallback path carries no pvalid, and groups without device
            # validators keep the vectorized host check.
            if (
                pvalid is not None
                and spec.device_validate
                and gspec.validators is not None
            ):
                pvalid = pvalid[keep]
                masks = [
                    ((pvalid >> j) & 1).astype(bool)
                    for j in range(len(self._group_parsers[g]))
                ]
            else:
                masks = [
                    p.valid_mask(data, syms) for p in self._group_parsers[g]
                ]
            valid = np.zeros(idx.shape[0], dtype=bool)
            for m in masks:
                valid |= m
            if not valid.any():
                continue
            b_arr, data = b_arr[valid], data[valid]
            masks = [m[valid] for m in masks]
            if syms is not None:
                syms = syms[valid]
            # Per-block first-occurrence duplicate collapse (see docstring).
            # The scalar path dedups per PARSER at the parser's own packet
            # width (scm/scm.go:62-74: seen keys are that parser's packed
            # bytes) — replicate exactly: one first-occurrence mask per
            # distinct key width in the group, the union of kept rows
            # survives, and each parser's valid mask is ANDed with the mask
            # for ITS width. (Every current group is width-uniform, but a
            # mixed-width group would otherwise under-collapse for the
            # shorter parser.)
            key_mat = syms if gspec.wants_r900 else data
            widths = sorted(
                {
                    key_mat.shape[1]
                    if gspec.wants_r900
                    else (p.cfg.packet_symbols + 7) >> 3
                    for p in self._group_parsers[g]
                }
            )
            fo_by_width: Dict[int, np.ndarray] = {}
            n_cand = key_mat.shape[0]
            b_bytes = b_arr.astype("<u4")[:, None].view(np.uint8)
            for width in widths:
                # Vectorized (block, key-row) first-occurrence mask: prepend
                # the block index bytes to each key row and dedup the raw
                # records as fixed-size void scalars — np.unique's
                # return_index is documented to give FIRST occurrences, so
                # ascending order (the reference's seen-map semantics,
                # scm/scm.go:62-74) is preserved with no per-row Python.
                rec = np.ascontiguousarray(
                    np.concatenate([b_bytes, key_mat[:, :width]], axis=1)
                )
                v = rec.view(f"V{rec.shape[1]}").ravel()
                fo = np.zeros(n_cand, dtype=bool)
                fo[np.unique(v, return_index=True)[1]] = True
                fo_by_width[width] = fo
            union = np.zeros(key_mat.shape[0], dtype=bool)
            for fo in fo_by_width.values():
                union |= fo
            rows_keep = np.nonzero(union)[0]
            b_arr, data = b_arr[rows_keep], data[rows_keep]
            parser_masks = []
            for p, m in zip(self._group_parsers[g], masks):
                width = (
                    key_mat.shape[1]
                    if gspec.wants_r900
                    else (p.cfg.packet_symbols + 7) >> 3
                )
                parser_masks.append(
                    (m & fo_by_width[width])[rows_keep]
                )
            if syms is not None:
                syms = syms[rows_keep]
            group_parsed[g] = (
                b_arr,
                [
                    p.parse_batch(data, syms, valid=m)
                    for p, m in zip(self._group_parsers[g], parser_masks)
                ],
            )

        # Phase B.
        out: List[Tuple[int, Message]] = []
        blocks = sorted(
            {int(b) for b_arr, _ in group_parsed.values() for b in b_arr}
        )
        # Per-group block -> (lo, hi) contiguous candidate ranges, built
        # once vectorized (b_arr ascends) instead of two searchsorted
        # calls per (block, group) pair.
        group_ranges: Dict[int, Dict[int, Tuple[int, int]]] = {}
        for g, (b_arr, _parsed) in group_parsed.items():
            ub, starts = np.unique(b_arr, return_index=True)
            ends = np.append(starts[1:], b_arr.size)
            group_ranges[g] = dict(
                zip(ub.tolist(), zip(starts.tolist(), ends.tolist()))
            )
        for b in blocks:
            global_block = window_block0 + b
            if global_block > self._last_block + 1:
                # Intervening empty blocks cleared the prev digest set
                # (each empty block swaps in an empty next, main.go:292).
                self._deduper.prev = set()
            self._deduper.start_block()
            for g in group_parsed:
                rng = group_ranges[g].get(b)
                if rng is None:
                    continue
                lo, hi = rng
                _b_arr, parsed = group_parsed[g]
                for per_parser in parsed:
                    for r in range(lo, hi):
                        msg = per_parser.get(r)
                        if msg is None:
                            continue
                        if self.filter_fn is not None and not self.filter_fn(msg):
                            self.metrics.messages_dropped_filter += 1
                            continue
                        if self._dedup_enabled and not self._deduper.check(
                            mk_digest(msg)
                        ):
                            self.metrics.messages_dropped_dup += 1
                            continue
                        self.metrics.messages_out += 1
                        out.append((global_block, msg))
            self._deduper.end_block()
            self._last_block = global_block
        return out

    def _window_results_numpy(
        self, staged: np.ndarray, first: bool
    ) -> Dict[str, object]:
        """Exact NumPy mirror of ops/frontend.decode_window without the
        hit-capacity cap; used when a window overflows max_hits. ``staged``
        is the u16 StagedGeometry buffer (I low byte, Q high byte)."""
        spec = self.spec
        cl, sl, pl, w = (
            spec.chip_length,
            spec.symbol_length,
            spec.packet_length,
            spec.window,
        )
        ps = spec.pad_shift
        v = staged.astype(np.int64)
        di = 255 - 2 * (v & 255)
        dq = 255 - 2 * (v >> 8)
        mag = di * di + dq * dq
        if first:
            mag[: spec.halo_staged] = 0
        cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(mag)])
        lp = w + pl - sl
        f = (
            2 * cs[ps + cl : ps + cl + lp]
            - cs[ps : ps + lp]
            - cs[ps + sl : ps + sl + lp]
        )
        bits = (f >= 0).astype(np.uint8)
        if first:
            bits[:pl] = 0

        q6 = None
        if spec.wants_r900:
            lq = w + pl - 2 * sl
            c = [
                cs[ps + sl + i * cl : ps + sl + i * cl + lq] for i in range(5)
            ]
            a0 = 2 * c[2] - c[4] - c[0]
            a1 = 2 * c[1] - 2 * c[2] + 2 * c[3] - c[4] - c[0]
            a2 = 2 * c[1] - 2 * c[3] + c[4] - c[0]
            mags = np.stack([np.abs(a0), np.abs(a1), np.abs(a2)])
            argmax = np.argmax(mags, axis=0)
            chosen = np.take_along_axis(
                np.stack([a0, a1, a2]), argmax[None, :], axis=0
            )[0]
            q6 = (argmax + np.where(chosen > 0, 3, 0)).astype(np.uint8)

        counts, idxs, byte_mats, symbol_mats = [], [], [], {}
        for g, group in enumerate(spec.groups):
            acc = np.ones(w, dtype=bool)
            for k, bit in enumerate(group.bits):
                acc &= bits[k * sl : k * sl + w] == bit
            hit_idx = np.nonzero(acc)[0].astype(np.int32)
            counts.append(len(hit_idx))
            idxs.append(hit_idx)
            s_g = group.packet_symbols
            nbytes = (s_g + 7) >> 3
            pkt_bits = np.zeros((len(hit_idx), nbytes * 8), np.uint8)
            for i, q in enumerate(hit_idx):
                pkt_bits[i, :s_g] = bits[q : q + s_g * sl : sl]
            byte_mats.append(np.packbits(pkt_bits, axis=-1))
            if group.wants_r900:
                base = spec.preamble_length - sl
                sym = np.zeros((len(hit_idx), PAYLOAD_SYMBOLS), np.uint8)
                for i, q in enumerate(hit_idx):
                    start = q + base
                    sym[i] = q6[start : start + PAYLOAD_SYMBOLS * 4 * cl : 4 * cl]
                symbol_mats[g] = sym
        # Disable the cap for this result set ((G, 2) raw/unique counts).
        counts_arr = np.stack(
            [np.asarray(counts, np.int32), np.asarray(counts, np.int32)],
            axis=1,
        )
        return {
            "counts": counts_arr,
            "idx": idxs,
            "bytes": byte_mats,
            "symbols": symbol_mats,
            "_uncapped": True,
        }
