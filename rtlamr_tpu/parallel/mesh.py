"""Multi-chip time-sharded decode over a jax.sharding.Mesh.

The parallelism design (new — the reference is a single-process CLI,
SURVEY.md §2 "parallelism-strategy inventory"):

- **Time-block data parallelism**: a super-batch of ``n_devices * K``
  windows is sharded along the time axis; device ``s`` decodes the
  contiguous run of windows ``[s*K, (s+1)*K)`` with one ``lax.scan`` —
  one program dispatch and ONE packed device->host fetch per
  ``n_devices * K`` windows.
- **Halo exchange**: every window needs the previous
  ``PacketLength + SymbolLength`` samples (the reference's history buffers,
  decode.go:144-146). Halos interior to a shard's run are filled at staging
  time from the shard's own samples; the single cross-shard halo (window
  ``s*K`` needs the tail of window ``s*K - 1``) is exchanged **in-program**
  via ``jax.lax.ppermute`` — one hop over ICI, no host round-trip, and the
  design carries to multi-host meshes where neighbor samples live on
  another host (DCN). Shard 0 receives the previous super-batch's carry
  (replicated small array); zeros on the stream's first batch (the
  reference's zeroed start buffers).
- **Protocol parallelism**: all registered preambles are correlated in the
  same program (decode_core), matching the reference's per-parser fan-out
  (decode.go:177-188) without separate workers.
- **Global dedup at the gather point**: per-shard compacted candidates are
  fetched and parsed in global window order, so the reference's
  adjacent-block digest dedup (main.go:252-292) applies unchanged across
  shard boundaries.

Throughput engine properties (mirrors WindowDecoder.decode_staged_batch):
the super-batch program is dispatched asynchronously and completed one
batch behind (dispatch-ahead), overlapping device compute of batch i+1
with the fetch + host parse of batch i; per-window capacity overflow
escalates to a high-capacity single-window program, then to the exact
NumPy path, reconstructing the staged window (halo included) on demand.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.frontend import (
    FrontendSpec,
    decode_core_staged,
    pack_results,
    staged_geometry,
)
from ..protocols.base import Message, Parser
from ..decoder.pipeline import WindowDecoder


def _shard_body(spec: FrontendSpec, n_devices: int, sb_local, carry_local,
                firsts_local):
    """Per-shard body under shard_map.

    sb_local:     (1, K, S) u16 — this shard's K staged windows. Window 0's
                  halo region [pad_shift, halo_staged) is zero-staged and
                  filled here from the left neighbor.
    carry_local:  (1, halo) u16 — this shard's row of the (n, halo) sharded
                  carry; only shard 0's row is meaningful (the previous
                  super-batch's global stream tail). Keeping the carry
                  sharded means NO broadcast between batches: row 0 is
                  produced on shard 0 (see left_recv) and consumed there.
    firsts_local: (1, K) bool — stream-global first-window flags.

    Returns (packed (1, K, P), left_recv (1, halo)): left_recv is the tail
    this shard RECEIVED from its left neighbor over the ppermute — row p is
    the true halo of shard p's first window (used by the host escalation
    re-decode without any extra exchange), and row 0 (shard n-1's stream
    tail, delivered by the (n-1)->0 wrap hop) is the NEXT super-batch's
    carry, already resident on shard 0.
    """
    k = sb_local.shape[1]
    halo = spec.halo
    hs = spec.halo_staged
    w = spec.window

    # Tail of this shard's last window: the halo its right neighbor needs.
    tail = jax.lax.dynamic_slice(sb_local[0, k - 1], (hs + w - halo,), (halo,))
    left_recv = jax.lax.ppermute(
        tail, "x", [(i, (i + 1) % n_devices) for i in range(n_devices)]
    )
    my = jax.lax.axis_index("x")
    # Shard 0's left neighbor is the previous super-batch's carry.
    left = jnp.where(my == 0, carry_local[0], left_recv)
    first_win = jax.lax.dynamic_update_slice(
        sb_local[0, 0], left, (spec.pad_shift,)
    )
    windows = sb_local[0].at[0].set(first_win)

    def step(_, xs):
        st, fi = xs
        return None, pack_results(decode_core_staged(spec, st, fi))

    _, packed = jax.lax.scan(step, None, (windows, firsts_local[0]))
    return packed[None], left_recv[None]  # (1, K, P), (1, halo)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _decode_superbatch(spec: FrontendSpec, mesh: Mesh, n_devices: int,
                       sb_sharded, carry, firsts):
    body = functools.partial(_shard_body, spec, n_devices)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("x", None, None), P("x", None), P("x", None)),
        out_specs=(P("x", None, None), P("x", None)),
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # skip the static vma checker (shardings are still enforced).
        check_vma=False,
    )(sb_sharded, carry, firsts)


def stage_superbatch(
    spec: FrontendSpec, iq_bytes: np.ndarray, n: int, k: int
) -> np.ndarray:
    """Stage ``n*k`` windows of raw interleaved IQ into (n, k, S) u16.

    Each window's own samples land at [halo_staged, halo_staged + window);
    halos interior to a shard's run (window k>=1) are copied from the
    previous window's tail; window 0's halo region stays zero — it is
    filled in-program by the ppermute exchange (or the carry).
    """
    geo = staged_geometry(spec)
    w = spec.window
    halo = spec.halo
    ps, hs = spec.pad_shift, spec.halo_staged
    u16 = (
        np.ascontiguousarray(np.asarray(iq_bytes, np.uint8))
        .view(np.uint16)
        .reshape(n, k, w)
    )
    sb = np.zeros((n, k, geo.staged_samples), np.uint16)
    sb[:, :, hs : hs + w] = u16
    if k > 1:
        sb[:, 1:, ps:hs] = u16[:, :-1, w - halo :]
    return sb


class MeshDecoder(WindowDecoder):
    """Time-sharded decoder over an n-device mesh.

    Decode semantics (message sets, block indices, dedup) are identical to
    :class:`WindowDecoder`; only the execution layout differs: each device
    program processes ``n_devices * scan_windows`` windows at once.
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        devices: Optional[Sequence] = None,
        window_blocks: Optional[int] = 64,
        max_hits: int = 256,
        filter_fn=None,
        backend: str = "jnp",
        scan_windows: int = 2,
    ):
        devices = list(devices if devices is not None else jax.devices())
        self.mesh = Mesh(np.array(devices), ("x",))
        self.n_devices = len(devices)
        self.scan_windows = scan_windows
        super().__init__(
            parsers,
            window_blocks=window_blocks,
            max_hits=max_hits,
            filter_fn=filter_fn,
            backend=backend,
        )
        if self.spec.window < self.spec.halo:
            raise ValueError(
                "per-shard window must cover the halo: need window_blocks >= "
                f"{-(-self.spec.halo // self.spec.block_size)} "
                f"(window {self.spec.window} < halo {self.spec.halo})"
            )
        self._sharding = NamedSharding(self.mesh, P("x", None, None))
        self._firsts_sharding = NamedSharding(self.mesh, P("x", None))
        self._carry_sharding = NamedSharding(self.mesh, P("x", None))
        self._replicated = NamedSharding(self.mesh, P())
        self.reset()

    def reset(self) -> None:
        super().reset()
        # Carry between super-batches: the last halo samples of the stream
        # in the staged u16 encoding, held SHARDED (n, halo) — only row 0
        # is meaningful; after the first batch it is the program's
        # left_recv output, produced and consumed on shard 0 with no
        # broadcast or host round-trip between batches.
        self._carry = np.zeros((self.n_devices, self.spec.halo), np.uint16)

    _firsts_cache: Optional[Dict[bool, object]] = None

    def _firsts_dev(self, first: bool):
        """Cached sharded (n, K) first-window flag arrays (only window 0 of
        the stream's first batch is ever True)."""
        if self._firsts_cache is None:
            n, k = self.n_devices, self.scan_windows
            t = np.zeros((n, k), bool)
            t[0, 0] = True
            self._firsts_cache = {
                True: jax.device_put(t, self._firsts_sharding),
                False: jax.device_put(
                    np.zeros((n, k), bool), self._firsts_sharding
                ),
            }
        return self._firsts_cache[first]

    @property
    def window_bytes(self) -> int:  # feed() granularity: one super-batch
        return 2 * self.spec.window * self.n_devices * self.scan_windows

    # -- batched decode over the mesh ---------------------------------------

    def _process_window(
        self, super_bytes: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, Message]]:
        """Dispatch one super-batch; fetch + parse the previous one."""
        spec = self.spec
        n, k = self.n_devices, self.scan_windows
        sb = stage_superbatch(spec, super_bytes, n, k)
        sb_dev = jax.device_put(sb, self._sharding)
        return self.decode_superbatch_staged(
            sb_dev, valid_blocks=valid_blocks, drain=False, _host_sb=sb
        )

    def decode_superbatch_staged(
        self,
        sb_dev,
        valid_blocks: Optional[int] = None,
        drain: bool = True,
        _host_sb: Optional[np.ndarray] = None,
    ) -> List[Tuple[int, Message]]:
        """Decode an (n, K, S) staged device batch already on the mesh.

        ``sb_dev`` must be sharded P("x", None, None) with window 0 of each
        shard's run carrying a zero halo region (see :func:`stage_superbatch`).
        Used by bench_mesh.py with HBM-resident batches; ``_process_window``
        routes the streaming path here.
        """
        spec = self.spec
        n, k = self.n_devices, self.scan_windows
        carry_in = self._carry
        if isinstance(carry_in, np.ndarray):
            carry_in = jax.device_put(carry_in, self._carry_sharding)
        packed, carry_next = _decode_superbatch(
            spec,
            self.mesh,
            n,
            sb_dev,
            carry_in,
            self._firsts_dev(self._first),
        )
        first0 = self._first

        wb = spec.window // spec.block_size
        total_valid = valid_blocks if valid_blocks is not None else n * k * wb
        src = _host_sb if _host_sb is not None else sb_dev
        carry_prev = self._carry
        metas = []
        for s in range(n):
            for kk in range(k):
                win = s * k + kk
                win_valid = min(max(total_valid - win * wb, 0), wb)
                if win_valid == 0:
                    continue
                thunk = functools.partial(
                    _staged_window, spec, src, s, kk, carry_prev
                )
                metas.append(
                    (
                        thunk,
                        first0 and win == 0,
                        win_valid if win_valid < wb else None,
                        self._window_index + win,
                        (s, kk),
                    )
                )
        self._window_index += n * k
        self._first = False
        # Next carry: the program's left_recv output, already sharded with
        # row 0 (the global stream tail) resident on shard 0 — no host
        # round-trip and no broadcast between batches.
        self._carry = carry_next

        out: List[Tuple[int, Message]] = []
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            out.extend(self._complete_inflight(prev))
        self._inflight = ("mesh", packed, metas)
        if drain:
            out.extend(self.drain())
        return out

    def _complete_inflight(self, inflight) -> List[Tuple[int, Message]]:
        if inflight[0] == "mesh":
            return self._complete_mesh_batch(inflight[1], inflight[2])
        return super()._complete_inflight(inflight)

    def _complete_mesh_batch(self, packed, metas) -> List[Tuple[int, Message]]:
        host = np.asarray(packed)  # ONE fetch: (n, K, P)
        out: List[Tuple[int, Message]] = []
        for thunk, first, win_valid, window_index, (s, kk) in metas:
            out.extend(
                self._complete_window(
                    host[s, kk], (thunk, first, win_valid, window_index)
                )
            )
        return out


def _staged_window(
    spec: FrontendSpec, sb, s: int, k: int, carry_host: np.ndarray
) -> np.ndarray:
    """Reconstruct window (s, k)'s staged buffer WITH its halo filled.

    Only called on capacity overflow (escalation re-decode): ``sb`` may be
    the host staging array or the device batch (fetched lazily). The k==0
    halo — zero in the staged layout — is filled from the left neighbor's
    tail, or the carry for shard 0.
    """
    win = np.asarray(sb[s, k]).copy()
    if k == 0:
        halo = spec.halo
        hs, w = spec.halo_staged, spec.window
        if s == 0:
            # carry_host may be a device array (device-resident path) and,
            # since the sharded-carry scheme, (n, halo) with row 0 live.
            left = np.asarray(carry_host)
            if left.ndim == 2:
                left = left[0]
        else:
            left = np.asarray(
                sb[s - 1, sb.shape[1] - 1, hs + w - halo : hs + w]
            )
        win[spec.pad_shift : hs] = left
    return win


def dryrun(n_devices: int, window_blocks: Optional[int] = None) -> int:
    """Compile-and-run the full sharded decode on tiny shapes.

    Used by the driver's multi-chip dry run: builds an n-device mesh (CPU
    devices under --xla_force_host_platform_device_count), decodes a noisy
    all-protocol capture with packets planted inside shards, exactly on the
    shard boundary, and on the super-batch boundary, checks the message set
    (including exactly-once boundary recovery) against the NumPy oracle,
    and returns the number of decoded messages.
    """
    from ..protocols import new_parser
    from ..ref import ReferenceDecoder, synth

    chip_length = 8  # smallest supported => tiniest shapes (flags.go:127)
    names = ("scm", "idm", "r900")
    parsers = [new_parser(n, chip_length) for n in names]
    dec = MeshDecoder(
        parsers,
        devices=jax.devices()[:n_devices],
        window_blocks=window_blocks,
        max_hits=32,
    )
    cfg = dec.cfg
    w = dec.spec.window
    k = dec.scan_windows
    shard_span = k * w  # samples per shard's contiguous run
    super_span = n_devices * shard_span
    scm_packet_len = 96 * cfg.symbol_length

    # Non-overlapping burst offsets (IDM is 736 symbols long):
    sl = cfg.symbol_length
    o_scm = cfg.block_size // 4
    o_idm = o_scm + 96 * sl + 2 * sl
    o_r900 = o_idm + 736 * sl + 2 * sl
    bursts = [
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=123456, consumption=42), o_scm
        ),
        synth.bits_to_burst(synth.make_idm_bits(serial=777777), o_idm),
        synth.r900_burst(synth.make_r900_symbols(meter_id=424242), o_r900),
    ]
    expected = [123456, 424242, 777777]
    if n_devices > 1:
        # Exactly on the first shard boundary: must be found once and once
        # only (halo exchange + digest dedup).
        bursts.append(
            synth.bits_to_burst(
                synth.make_scm_bits(meter_id=654321, consumption=7),
                shard_span - scm_packet_len // 2,
            )
        )
        expected.append(654321)
    # Straddling the super-batch boundary: exercises the carry.
    bursts.append(
        synth.bits_to_burst(
            synth.make_scm_bits(meter_id=13579, consumption=9),
            super_span - scm_packet_len // 2,
        )
    )
    expected.append(13579)
    iq = synth.render_iq(2 * super_span, bursts, chip_length, noise=2.0, seed=31)

    msgs = dec.decode_capture(iq)
    ids = sorted(m.meter_id() for _, m in msgs)
    assert ids == sorted(expected), f"mesh dryrun decoded {ids}, expected {sorted(expected)}"

    # Full conformance: identical (block, message) stream to the oracle.
    oracle = ReferenceDecoder(
        [new_parser(n, chip_length) for n in names], arithmetic="int"
    ).decode_capture(iq)
    got = [(b, str(m)) for b, m in msgs]
    want = [(b, str(m)) for b, m in oracle]
    assert got == want, f"mesh dryrun diverged from oracle:\n{got}\n{want}"
    return len(msgs)
