"""Multi-chip time-sharded decode over a jax.sharding.Mesh.

The parallelism design (new — the reference is a single-process CLI,
SURVEY.md §2 "parallelism-strategy inventory"):

- **Time-block data parallelism**: a super-window of ``n_devices * W``
  samples is sharded along the time axis; each device decodes one
  ``W``-sample window.
- **Halo exchange**: every window needs the previous
  ``PacketLength + SymbolLength`` samples (the reference's history buffers,
  decode.go:144-146). Each shard sends its tail to its right neighbor via
  ``jax.lax.ppermute`` — one hop over ICI, no host round-trip. Shard 0 of
  the first super-window zero-fills (the reference's zeroed start buffers);
  shard 0 of later super-windows receives the carry from the previous
  super-window (replicated small array).
- **Protocol parallelism**: all registered preambles are correlated in the
  same program (decode_core), matching the reference's per-parser fan-out
  (decode.go:177-188) without separate workers.
- **Global dedup at the gather point**: per-shard compacted candidates are
  gathered to host and parsed in shard order, so the reference's
  adjacent-block digest dedup (main.go:252-292) applies unchanged across
  shard boundaries.
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
    decode_core,
    make_frontend_spec,
    pack_results,
    unpack_results,
)
from ..protocols.base import Message, Parser
from ..decoder.pipeline import WindowDecoder


def _shard_body(
    spec: FrontendSpec, n_devices: int, iq_local, carry, first
):
    """Per-shard body under shard_map.

    iq_local: (1, 2W) u8 — this shard's window samples.
    carry:    (2*halo,) u8 replicated — tail of the previous super-window.
    first:    scalar bool replicated — stream-global first super-window.
    """
    iq = iq_local[0]
    halo2 = 2 * spec.halo
    tail = jax.lax.dynamic_slice(iq, (iq.shape[0] - halo2,), (halo2,))
    # Right-shift around the ring: shard i receives shard i-1's tail.
    left = jax.lax.ppermute(
        tail, "x", [(i, (i + 1) % n_devices) for i in range(n_devices)]
    )
    my = jax.lax.axis_index("x")
    # Shard 0's left neighbor is the previous super-window's carry.
    left = jnp.where(my == 0, carry, left)
    shard_first = jnp.logical_and(first, my == 0)
    out = decode_core(spec, jnp.concatenate([left, iq]), shard_first)
    # One packed buffer per shard: a single gather/transfer to host.
    return pack_results(out)[None]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _decode_superwindow(spec: FrontendSpec, mesh: Mesh, n_devices: int,
                        iq_sharded, carry, first):
    body = functools.partial(_shard_body, spec, n_devices)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("x", None), P(), P()),
        out_specs=P("x"),
    )(iq_sharded, carry, first)


class MeshDecoder(WindowDecoder):
    """Time-sharded decoder over an n-device mesh.

    Decode semantics (message sets, block indices, dedup) are identical to
    :class:`WindowDecoder`; only the execution layout differs: each device
    step processes ``n_devices`` windows at once.
    """

    def __init__(
        self,
        parsers: Sequence[Parser],
        devices: Optional[Sequence] = None,
        window_blocks: Optional[int] = 64,
        max_hits: int = 256,
        filter_fn=None,
        backend: str = "jnp",
    ):
        devices = list(devices if devices is not None else jax.devices())
        self.mesh = Mesh(np.array(devices), ("x",))
        self.n_devices = len(devices)
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
        self._sharding = NamedSharding(self.mesh, P("x", None))
        self.reset()

    def reset(self) -> None:
        super().reset()
        # The mesh path carries raw u8 halo bytes (the shard body stages on
        # device via decode_core), unlike WindowDecoder's staged u16 carry.
        self._carry = np.zeros(2 * self.spec.halo, np.uint8)

    @property
    def window_bytes(self) -> int:  # feed() granularity: one super-window
        return 2 * self.spec.window * self.n_devices

    def _process_window(
        self, super_bytes: np.ndarray, valid_blocks: Optional[int] = None
    ) -> List[Tuple[int, Message]]:
        """Decode one super-window (n_devices windows) and parse in order."""
        spec = self.spec
        n = self.n_devices
        w2 = 2 * spec.window
        iq_shards = np.asarray(super_bytes, np.uint8).reshape(n, w2)
        iq_dev = jax.device_put(iq_shards, self._sharding)
        packed = np.asarray(
            _decode_superwindow(
                spec,
                self.mesh,
                n,
                iq_dev,
                jnp.asarray(self._carry),
                jnp.asarray(self._first),
            )
        )

        wb_blocks = spec.window // spec.block_size
        total_valid = (
            valid_blocks if valid_blocks is not None else n * wb_blocks
        )
        msgs: List[Tuple[int, Message]] = []
        for shard in range(n):
            shard_res = unpack_results(spec, packed[shard])
            shard_valid = min(
                max(total_valid - shard * wb_blocks, 0), wb_blocks
            )
            if shard_valid == 0:
                break
            if self._overflowed(shard_res):
                self.metrics.hit_overflows += 1
                iq_full = np.concatenate(
                    [
                        self._carry
                        if shard == 0
                        else iq_shards[shard - 1, -2 * spec.halo :],
                        iq_shards[shard],
                    ]
                )
                from ..ops.frontend import stage_host

                shard_res = self._window_results_numpy(
                    stage_host(spec, iq_full), self._first and shard == 0
                )
            msgs.extend(
                self._parse_window(shard_res, shard_valid, self._window_index)
            )
            self._window_index += 1
            self.metrics.windows_decoded += 1
            self.metrics.samples_in += spec.window
        self._carry = iq_shards[-1, -2 * spec.halo :].copy()
        self._first = False
        return msgs


def dryrun(n_devices: int, window_blocks: Optional[int] = None) -> int:
    """Compile-and-run the full sharded decode on tiny shapes.

    Used by the driver's multi-chip dry run: builds an n-device mesh (CPU
    devices under --xla_force_host_platform_device_count), runs one
    super-window step end-to-end, and returns the number of decoded
    messages (sanity: a planted packet on a shard boundary is found once).
    """
    from ..protocols import new_parser
    from ..ref import synth

    chip_length = 8  # smallest supported => tiniest shapes (flags.go:127)
    parsers = [new_parser(n, chip_length) for n in ("scm", "idm", "r900")]
    dec = MeshDecoder(
        parsers,
        devices=jax.devices()[:n_devices],
        window_blocks=window_blocks,
        max_hits=32,
    )
    cfg = dec.cfg
    w = dec.spec.window
    scm_packet_len = 96 * cfg.symbol_length
    # One packet inside shard 0, one exactly straddling the 0/1 boundary.
    bits = synth.make_scm_bits(meter_id=123456, consumption=42)
    bursts = [synth.bits_to_burst(bits, cfg.block_size // 4)]
    if n_devices > 1:
        bits2 = synth.make_scm_bits(meter_id=654321, consumption=7)
        bursts.append(synth.bits_to_burst(bits2, w - scm_packet_len // 2))
    iq = synth.render_iq(n_devices * w, bursts, chip_length)
    msgs = dec.decode_capture(iq)
    ids = sorted(m.meter_id() for _, m in msgs)
    expected = [123456] if n_devices == 1 else [123456, 654321]
    assert ids == expected, f"mesh dryrun decoded {ids}, expected {expected}"
    return len(msgs)
