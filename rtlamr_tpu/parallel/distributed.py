"""Multi-host (multi-process) decode over a global device mesh.

SURVEY.md §5.8's build target: ``jax.distributed`` initialization, one mesh
over {hosts x chips}, halo exchange over ICI between chips of one host and
DCN between hosts, digest dedup at the gather point. The reference's seat
for this is its TCP transport (main.go:49-57) — a single-host design; this
module is the new multi-host execution engine around the same decode
semantics.

Execution model (SPMD, one process per host):

- Every process calls :func:`initialize` (``jax.distributed.initialize``),
  after which ``jax.devices()`` is the GLOBAL device list and all processes
  execute the same program on a 1-D time mesh over all chips.
- A super-batch is ``n_global_devices * scan_windows`` windows; each
  process stages only its LOCAL shard — ``local_device_count * K`` windows
  of raw IQ — and contributes it via
  ``jax.make_array_from_process_local_data``. No process ever holds the
  global sample stream.
- The decode program is the same sharded scan as the single-host mesh
  (parallel/mesh._decode_superbatch): halos interior to a shard are staged
  locally, the one cross-shard halo travels in-program over ``ppermute`` —
  XLA routes hops crossing a process boundary over DCN, in-host hops over
  ICI.
- The carry between super-batches (tail of the stream, known only to the
  LAST process) is broadcast host-side
  (``multihost_utils.broadcast_one_to_all``) — 2*(PacketLength +
  SymbolLength) bytes once per n_global*K windows.
- Each process fetches and parses only its addressable result shards
  (global window order is preserved: process p owns the contiguous window
  run of its devices). Cross-process dedup: the reference's digest dedup
  looks exactly one block back (main.go:252-292), so only a process's
  FIRST block can hold a duplicate of its left neighbor's LAST block;
  per-block digest sets of the boundary blocks are allgathered
  (``process_allgather``) and duplicates dropped at the seam.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..protocols.base import Message, Parser, digest as mk_digest


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX (call before any other JAX use).

    ``cpu_devices_per_process`` simulates a pod on CPU hosts (the SURVEY §4
    test posture: multi-process CPU JAX, no pod required); leave None on
    real TPU hosts where the runtime discovers local chips.
    """
    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


class MultiHostDecoder:
    """Time-sharded decoder over the global {hosts x chips} mesh.

    Each process feeds its own contiguous segment of the sample stream via
    :meth:`decode_superbatch_local` and receives the messages decoded from
    its windows, already seam-deduplicated against the left neighbor.
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        window_blocks: Optional[int] = 64,
        max_hits: int = 256,
        backend: str = "jnp",
        scan_windows: int = 2,
    ):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ..decoder.pipeline import WindowDecoder
        from ..ops.frontend import staged_geometry

        self.process_id = jax.process_index()
        self.num_processes = jax.process_count()
        devices = jax.devices()  # global, ordered by process
        self.n_global = len(devices)
        self.n_local = jax.local_device_count()
        self.scan_windows = scan_windows
        # A local WindowDecoder supplies spec/parse/dedup machinery; its
        # device path is unused here.
        self._local = WindowDecoder(
            parsers,
            window_blocks=window_blocks,
            max_hits=max_hits,
            backend=backend,
        )
        self.spec = self._local.spec
        self.cfg = self._local.cfg
        if self.spec.window < self.spec.halo:
            raise ValueError("per-shard window must cover the halo")
        self.mesh = Mesh(np.array(devices), ("x",))
        self._sharding = NamedSharding(self.mesh, P("x", None, None))
        self._firsts_sharding = NamedSharding(self.mesh, P("x", None))
        self._replicated = NamedSharding(self.mesh, P())
        self.reset()

    def reset(self) -> None:
        self._local.reset()
        self._carry = np.zeros(self.spec.halo, np.uint16)
        self._first = True
        self._window_index = 0
        # Left neighbor's current-batch tail (escalation re-decode halo for
        # this process's first window); allgathered fresh each super-batch.
        self._left_tail = np.zeros(self.spec.halo, np.uint16)
        # (block, digest set) of the LAST process's last block of the
        # previous super-batch — the global predecessor of process 0's first
        # block of the next batch (cross-super-batch seam dedup).
        self._prev_batch_tail: Optional[Tuple[int, set]] = None

    @property
    def local_window_bytes(self) -> int:
        """Bytes of raw IQ this process contributes per super-batch."""
        return 2 * self.spec.window * self.n_local * self.scan_windows

    def decode_superbatch_local(
        self, iq_local: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, Message]]:
        """Decode one super-batch; returns THIS process's messages.

        ``iq_local``: this process's ``local_window_bytes`` of raw
        interleaved IQ (its contiguous segment of the global stream).
        ``valid_blocks``: global count of valid blocks in the super-batch
        (for a zero-padded final batch); None = all.
        """
        import jax
        from jax.experimental import multihost_utils

        from .mesh import _decode_superbatch, stage_superbatch

        spec = self.spec
        n, k = self.n_global, self.scan_windows
        p = self.process_id
        sb_local = stage_superbatch(spec, iq_local, self.n_local, k)
        sb = jax.make_array_from_process_local_data(
            self._sharding, sb_local, (n, k, spec.staged_samples)
        )
        firsts = np.zeros((self.n_local, k), bool)
        if p == 0:
            firsts[0, 0] = self._first
        firsts_g = jax.make_array_from_process_local_data(
            self._firsts_sharding, firsts, (n, k)
        )
        packed = _decode_superbatch(
            spec,
            self.mesh,
            n,
            sb,
            jax.device_put(self._carry, self._replicated),
            firsts_g,
        )

        # Boundary halos: every process's last-window tail, allgathered
        # (num_processes * 2*halo bytes — tiny). tails[-1] is the next
        # super-batch's carry (the global stream tail); tails[p-1] is the
        # TRUE halo of process p's first window, used by the escalation
        # re-decode so interior process seams never under-read (the device
        # path gets the same samples via ppermute).
        hs_, w_, halo_ = spec.halo_staged, spec.window, spec.halo
        local_tail = sb_local[-1, -1, hs_ + w_ - halo_ : hs_ + w_]
        tails = np.asarray(multihost_utils.process_allgather(local_tail))

        # Fetch only the addressable shards: global shard row -> (K, P).
        shard_bufs: Dict[int, np.ndarray] = {}
        for sh in packed.addressable_shards:
            shard_bufs[sh.index[0].start or 0] = np.asarray(sh.data)[0]

        wb = spec.window // spec.block_size
        total_valid = valid_blocks if valid_blocks is not None else n * k * wb
        first_global_window = self._window_index
        carry_prev = self._carry
        self._left_tail = tails[p - 1] if p > 0 else carry_prev

        msgs: List[Tuple[int, Message]] = []
        for s_global in sorted(shard_bufs):
            buf = shard_bufs[s_global]  # (K, P)
            for kk in range(k):
                win = s_global * k + kk
                win_valid = min(max(total_valid - win * wb, 0), wb)
                if win_valid == 0:
                    continue
                thunk = functools.partial(
                    _local_staged_window,
                    spec,
                    sb_local,
                    s_global - p * self.n_local,
                    kk,
                    self._left_tail,
                )
                msgs.extend(
                    self._local._complete_window(
                        buf[kk],
                        (
                            thunk,
                            bool(p == 0 and win == 0 and self._first),
                            win_valid if win_valid < wb else None,
                            first_global_window + win,
                        ),
                    )
                )
        self._window_index += n * k
        self._first = False

        # Carry: the stream tail lives on the LAST process (tails[-1]).
        self._carry = tails[-1]

        return self._seam_dedup(msgs)

    # -- cross-process seam dedup -------------------------------------------

    #: base digest capacity per boundary block in the fixed-size exchange;
    #: a boundary block with more messages triggers a LOUD second allgather
    #: round at the exact needed capacity (never silent truncation).
    SEAM_DIGEST_CAP = 64

    def _seam_dedup(
        self, msgs: List[Tuple[int, Message]]
    ) -> List[Tuple[int, Message]]:
        """Drop this process's first-block messages that duplicate the
        global predecessor block (digest dedup across the host seam).

        The reference's dedup window is exactly one block (prev/next digest
        maps, main.go:252-260, 292), so only adjacent blocks interact; the
        in-process BlockDeduper already handled everything else. Two seams
        remain: (a) process p's first block vs process p-1's last block of
        the SAME super-batch, and (b) process 0's first block of super-batch
        j+1 vs the LAST process's last block of super-batch j — carried in
        ``self._prev_batch_tail`` across calls.
        """
        from jax.experimental import multihost_utils

        if self.num_processes == 1:
            return msgs

        first_b = msgs[0][0] if msgs else -1
        last_b = msgs[-1][0] if msgs else -1
        my_first = [
            bytes(_digest_hash(mk_digest(m))) for blk, m in msgs if blk == first_b
        ]
        my_last = [
            bytes(_digest_hash(mk_digest(m))) for blk, m in msgs if blk == last_b
        ]

        def exchange(cap: int) -> np.ndarray:
            """Allgather [first_block, last_block, n_first, n_last] + the
            digest hashes of both boundary blocks, ``cap`` slots each."""
            enc = np.zeros((2, cap, 8), np.uint8)
            for row, ds in ((0, my_first), (1, my_last)):
                for i, d in enumerate(ds[:cap]):
                    enc[row, i] = np.frombuffer(d, np.uint8)
            header = np.array(
                [first_b, last_b, len(my_first), len(my_last)], np.int64
            )
            return np.asarray(
                multihost_utils.process_allgather(
                    np.concatenate([header.view(np.uint8), enc.reshape(-1)])
                )
            )  # (num_processes, 32 + 2*cap*8)

        cap = self.SEAM_DIGEST_CAP
        both = exchange(cap)
        counts = both[:, :32].view(np.int64)[:, 2:4]
        need = int(counts.max()) if counts.size else 0
        if need > cap:
            # A boundary block overflowed the base capacity: every process
            # sees the same allgathered counts and agrees to a second round
            # at the exact size. Surfaced via metrics (no silent truncation).
            self._local.metrics.extra["seam_digest_overflows"] = (
                self._local.metrics.extra.get("seam_digest_overflows", 0) + 1
            )
            cap = need
            both = exchange(cap)

        def unpack(row: np.ndarray) -> Tuple[int, int, set, set]:
            hdr = row[:32].view(np.int64)
            digs = row[32:].reshape(2, cap, 8)
            sets = []
            for r, n_d in ((0, int(hdr[2])), (1, int(hdr[3]))):
                sets.append({bytes(digs[r, i]) for i in range(n_d)})
            return int(hdr[0]), int(hdr[1]), sets[0], sets[1]

        # Predecessor of my first block: left neighbor in-batch, or the
        # previous batch's global tail for process 0.
        p = self.process_id
        if p == 0:
            pred = self._prev_batch_tail
        else:
            _, l_last, _, l_last_digs = unpack(both[p - 1])
            pred = (l_last, l_last_digs) if l_last >= 0 else None

        # Remember the global tail of THIS batch for the next call.
        _, t_last, _, t_last_digs = unpack(both[-1])
        self._prev_batch_tail = (
            (t_last, t_last_digs) if t_last >= 0 else None
        )

        if not msgs or pred is None:
            return msgs
        pred_block, pred_digests = pred
        if first_b != pred_block + 1:
            return msgs  # not adjacent: no dedup (empty block clears prev)
        out = []
        for blk, m in msgs:
            if blk == first_b and bytes(
                _digest_hash(mk_digest(m))
            ) in pred_digests:
                self._local.metrics.messages_dropped_dup += 1
                continue
            out.append((blk, m))
        return out


def _digest_hash(d) -> np.ndarray:
    """Stable 8-byte hash of a message digest tuple (for the fixed-size
    cross-process exchange; the in-process path compares exact digests)."""
    import hashlib

    h = hashlib.blake2b(repr(d).encode(), digest_size=8).digest()
    return np.frombuffer(h, np.uint8)


def _local_staged_window(spec, sb_local, s_local, k, left_halo):
    """Escalation re-decode source for a LOCAL shard window.

    ``left_halo`` is the TRUE halo of this process's first window: the
    previous super-batch's carry for process 0, the left neighbor's
    allgathered last-window tail for interior processes — so the escalation
    path sees exactly the samples the device path received via ppermute."""
    from .mesh import _staged_window

    return _staged_window(spec, sb_local, s_local, k, left_halo)
