"""TPU whole-stream DSP frontend (jnp reference implementation).

This is the device compute path replacing the reference's per-block scalar
loops (protocol/decode.go:163-375, r900/r900.go:82-150) with one jitted
program over a large window of samples. The per-block buffer-shift scheme of
the reference is algebraically equivalent to a whole-stream formulation with
a left halo (overlap-save):

- Let ``mag[t]`` be the magnitude stream and ``P`` the reference's Quantized
  buffer laid out over time ("padded bit stream"). A window covering search
  positions ``[s*W, (s+1)*W)`` of ``P`` needs mag samples
  ``[s*W - PacketLength - SymbolLength, (s+1)*W)`` — i.e. a left halo of
  ``H = PacketLength + SymbolLength`` samples and nothing to the right.
- ``Ploc[q]`` (the window's slice of P) is the Manchester bit decision over
  ``mag_local[q .. q+SymbolLength)``; preamble search reads ``Ploc`` at
  stride SymbolLength; packet slicing reads up to
  ``W - 1 + PacketLength - SymbolLength``.
- The R900 6-ary stream with the same index convention is
  ``Q6loc[j] = quantize6(mag_local[j+SymbolLength .. j+SymbolLength+4*CL))``
  and payload symbol m of a hit at q is
  ``Q6loc[q + PreambleLength - SymbolLength + m*4*CL]``
  (r900/r900.go:187-193; the -SymbolLength is the coordinate offset between
  the two quantized buffers).

Exact integer arithmetic: the magnitude LUT scaled by 255^2 is the integer
``(255-2v)^2`` (decode.go:209-216), so every matched-filter output is an
exact integer. The cumulative sum is computed in int32 with wrap-around;
all filter outputs are linear combinations of cumsum values whose
coefficients sum to zero, so the wrap cancels and results are exact
(|f| < 2^31). Bit decisions are therefore deterministic — no float
accumulation-order concerns anywhere in the hot path.

The first window of a stream has no history; the reference's buffers start
zeroed (decode.go:144-145), replicated by masking the halo magnitude to zero
and forcing the first PacketLength bit positions to 0.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..protocols.base import DecoderConfig
from ..protocols.r900 import PAYLOAD_SYMBOLS

#: Lane width of the TPU vector unit; 1D streams are viewed as (rows, 128).
LANES = 128
#: Staged-buffer alignment in samples. The staged halo is rounded up to this
#: so every Pallas tile's DMA starts on an (8, 128)-aligned row boundary.
ALIGN = 1024


@dataclass(frozen=True)
class GroupSpec:
    """Static per-preamble-group metadata baked into the jitted program."""

    preamble: str
    bits: Tuple[int, ...]
    packet_symbols: int
    wants_r900: bool
    #: per-parser device validity descriptors (protocols.base.DeviceValidator,
    #: OR across parsers); None when any parser in the group can't validate
    #: on device, disabling the pre-compaction checksum filter.
    validators: Optional[Tuple[object, ...]] = None


@dataclass(frozen=True)
class FrontendSpec:
    """Static configuration of a decode window program."""

    chip_length: int
    symbol_length: int
    preamble_length: int
    packet_length: int
    block_size: int
    window: int  # W: search positions per window; multiple of block_size
    #: escalation threshold on distinct candidates per group per window
    #: (also sizes gather_hits/slice_hits via make_frontend_spec); a window
    #: with more unique candidates re-decodes under the high-capacity
    #: program variant (decoder/pipeline._big_spec).
    max_hits: int
    groups: Tuple[GroupSpec, ...]
    wants_r900: bool
    #: "jnp" (pure XLA) or "pallas" (fused stencil kernel for bits/q6)
    backend: str = "jnp"
    #: run the per-group checksum gates (CRC-16 / R900 RS, SURVEY §2 C9/C10)
    #: inside the window program so only valid candidates occupy result
    #: slots. Semantics-free: parsers re-validate survivors on host, and
    #: dropping checksum-failing candidates cannot change the message set
    #: (duplicates of an invalid candidate are equally invalid).
    device_validate: bool = True
    #: internal gather capacity before duplicate collapse. Preamble hits form
    #: plateaus of adjacent positions slicing identical packets; the device
    #: collapses same-block adjacent duplicates (semantics-safe: the host
    #: parsers' per-block seen maps would drop them anyway, scm/scm.go:62-74)
    #: and compacts the survivors to max_hits output slots.
    gather_hits: int = 4096
    #: row capacity of the two-level hit compaction: hit positions are found
    #: by locating the (w/128, 128)-tiled mask rows containing any hit (a
    #: layout-friendly reduction + small nonzero), then running the exact
    #: nonzero only over those gathered rows. Windows touching more rows than
    #: this escalate exactly like gather_hits overflow.
    gather_rows: int = 1024
    #: capacity of the expensive per-candidate content gathers (packed bytes
    #: / R900 symbols). Raw hits are first collapsed by the exact pre-slice
    #: plateau test (see :func:`_edge_span_streams`) — adjacent hits with
    #: PROVEN identical content keep only their first position — so the
    #: content gathers, checksum gates and output compaction all run at this
    #: much smaller capacity. Overflow escalates exactly like gather_hits.
    slice_hits: int = 512
    #: rows (of 128 samples) per Pallas tile; also fixes the staged-buffer
    #: geometry shared by both backends (see :func:`staged_geometry`).
    tile_rows: int = 1024

    @property
    def halo(self) -> int:
        return self.packet_length + self.symbol_length

    @property
    def total_samples(self) -> int:
        return self.halo + self.window

    @property
    def pad_shift(self) -> int:
        """Left padding that aligns the staged halo to ALIGN samples."""
        return -self.halo % ALIGN

    @property
    def halo_staged(self) -> int:
        return self.halo + self.pad_shift

    @property
    def staged_samples(self) -> int:
        """Length (in samples == u16 elements) of a staged window buffer."""
        return staged_geometry(self).staged_samples


class StagedGeometry(NamedTuple):
    """Static layout of the staged u16 window buffer and the Pallas grid.

    The staged buffer holds ``staged_samples`` u16 elements (one interleaved
    IQ byte-pair each, little-endian: I in the low byte). Index ``s`` holds
    the stream sample ``window_start - halo_staged + s``; indices past
    ``halo_staged + window`` are zero tail padding so every tile's
    fixed-size DMA stays in bounds. Contents of ``[0, pad_shift)`` are never
    read (every stencil read is offset by ``pad_shift``).
    """

    lp: int  # bit-stream positions needed (window + packet - symbol)
    lq: int  # R900 6-ary stream positions needed
    pre_reach: int  # deepest bit offset read by the correlation bank
    r_out: int  # output rows per tile
    r_bits: int  # rows of the extended bit stream computed per tile
    r_in: int  # input rows DMA'd per tile
    n_tiles: int
    staged_rows: int
    staged_samples: int


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def staged_geometry(spec: "FrontendSpec") -> StagedGeometry:
    sl = spec.symbol_length
    cl = spec.chip_length
    w = spec.window
    lp = w + spec.packet_length - sl
    lq = w + spec.packet_length - 2 * sl
    max_pre_bits = max(len(g.bits) for g in spec.groups)
    pre_reach = (max_pre_bits - 1) * sl

    r_out = min(spec.tile_rows, _round_up(-(-lp // LANES), 8))
    n_tiles = -(-lp // (r_out * LANES))
    r_bits = r_out + -(-pre_reach // LANES) + 1
    # Deepest staged-sample read past a tile's first output position:
    # correlation bits (via the Manchester stencil) and the R900 bank.
    need = max(
        r_bits * LANES + sl + spec.pad_shift,
        r_out * LANES + sl + 4 * cl + spec.pad_shift,
    )
    r_in = _round_up(-(-need // LANES) + 1, 8)
    staged_rows = (n_tiles - 1) * r_out + r_in
    # The staged buffer must also hold the full live content.
    staged_rows = max(staged_rows, -(-(spec.halo_staged + w) // LANES))
    staged_rows = _round_up(staged_rows, 8)
    return StagedGeometry(
        lp=lp,
        lq=lq,
        pre_reach=pre_reach,
        r_out=r_out,
        r_bits=r_bits,
        r_in=r_in,
        n_tiles=n_tiles,
        staged_rows=staged_rows,
        staged_samples=staged_rows * LANES,
    )


def stage_iq(spec: FrontendSpec, iq: jnp.ndarray) -> jnp.ndarray:
    """Traceable u8 interleaved IQ -> staged u16 buffer.

    ``iq`` is ``(2 * total_samples,)`` uint8 covering stream samples
    ``[window_start - halo, window_start + window)``; it lands at staged
    offset ``pad_shift``. The pad region is never read. Hosts with the bytes
    already in memory should instead build the staged buffer directly with
    ``np.ndarray.view(np.uint16)`` (zero-copy) — this helper exists for
    callers holding device arrays (mesh shards, conformance tests).
    """
    geo = staged_geometry(spec)
    u16 = jax.lax.bitcast_convert_type(iq.reshape(-1, 2), jnp.uint16)
    out = jnp.zeros(geo.staged_samples, jnp.uint16)
    return jax.lax.dynamic_update_slice(out, u16, (spec.pad_shift,))


def stage_host(spec: FrontendSpec, iq: np.ndarray) -> np.ndarray:
    """Host-side staging: u8 interleaved IQ bytes -> staged u16 buffer."""
    geo = staged_geometry(spec)
    iq = np.ascontiguousarray(np.asarray(iq, np.uint8))
    out = np.zeros(geo.staged_samples, np.uint16)
    u16 = iq.view(np.uint16)
    out[spec.pad_shift : spec.pad_shift + u16.size] = u16
    return out


def make_frontend_spec(
    cfg: DecoderConfig,
    window_blocks: int,
    max_hits: int = 256,
    backend: str = "jnp",
    device_validate: bool = True,
) -> FrontendSpec:
    groups = []
    wants_any = False
    for preamble, parsers in cfg.preamble_groups.items():
        wants = any(p.wants_r900_symbols for p in parsers)
        wants_any = wants_any or wants
        vals = tuple(p.device_validator() for p in parsers)
        groups.append(
            GroupSpec(
                preamble=preamble,
                bits=tuple(int(c) for c in preamble),
                packet_symbols=cfg.group_packet_symbols(preamble),
                wants_r900=wants,
                validators=None if any(v is None for v in vals) else vals,
            )
        )
    window = window_blocks * cfg.block_size
    # Preamble hits form plateaus ~ChipLength positions wide per packet, so
    # the raw-hit gather needs ~CL x the distinct-candidate capacity. The
    # compaction sorts and slicing gathers cost proportionally to this
    # STATIC capacity (SEARCH_TUNING.json: 9.2 -> 6.0 ms/window going
    # 4096 -> 2048 at the bench shapes), so keep it as tight as the
    # escalation path allows: the all-protocol bench density (51 msgs over
    # ~20 candidates/group/window) peaks at ~1400 raw hits per group.
    gather_hits = min(max(4 * max_hits, 2048), window)
    lp_rows = -(-(window + cfg.packet_length) // LANES)
    return FrontendSpec(
        chip_length=cfg.chip_length,
        symbol_length=cfg.symbol_length,
        preamble_length=cfg.preamble_length,
        packet_length=cfg.packet_length,
        block_size=cfg.block_size,
        window=window,
        max_hits=max_hits,
        groups=tuple(groups),
        wants_r900=wants_any,
        backend=backend,
        device_validate=device_validate,
        # The slicing gather's cost is proportional to this static capacity
        # (whether slots are used or not), so keep it tight; overflow
        # escalates to a larger program variant, then to the exact host path.
        gather_hits=gather_hits,
        # Post-collapse content-gather capacity. Occupancy after the exact
        # plateau collapse is the number of DISTINCT candidate contents per
        # group per window (measured <=160 at the all-protocol bench
        # density, vs ~1400 raw plateau hits), so max_hits+128 leaves >2x
        # margin while cutting the dominant gather cost ~5x vs gathering at
        # gather_hits; overflow escalates exactly.
        slice_hits=min(max(max_hits + 128, 384), gather_hits),
        # Preamble plateaus cluster in few 128-sample rows (~2 rows per
        # packet; 180-197 rows at the 51-msg/window bench density), so row
        # capacity can sit well under gather_hits — but with 2x margin
        # (384) since the level-1/2 sorts are near-free (SEARCH_TUNING
        # probe2: lax.sort <= 0.16 ms at every relevant length); overflow
        # escalates to the high-capacity variant like any other overflow.
        gather_rows=min(max(3 * gather_hits // 16, 384), window // 128),
        # 512 rows (65,536 positions) per Pallas tile: the largest tile whose
        # int32 stencil temporaries fit Mosaic's 16MB scoped-VMEM stack.
        tile_rows=min(512, _round_up(lp_rows, 8)),
    )


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """[0, cumsum(x)] in wrap-around int32 (exactness per module docstring)."""
    return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(x)])


def decode_core(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """Traceable decode of one window of IQ samples.

    Called under jit directly (single chip) or inside shard_map per shard
    (parallel/mesh.py), where ``iq`` is the shard's halo + local window.

    Args:
      spec: static window program configuration.
      iq: (2 * (halo + window),) uint8 interleaved IQ. The first 2*halo bytes
        are the left halo (the tail of the previous window's samples);
        arbitrary for the stream's first window.
      first: scalar bool — True for the stream's first window (zero history).

    Returns a dict per preamble group index g (rows at the slice capacity
    k = min(slice_hits, gather_hits); the host compacts via ``keep``):
      counts[g]: (2,) int32 [raw hits, surviving candidates]
      idx[g]:    (k,) int32 ascending hit positions in [0, window),
                 window as fill
      keep[g]:   (k,) u8 survivor mask (valid, checksum-passing, deduped)
      bytes[g]:  (k, ceil(S_g/8)) uint8 MSB-first packed packet symbols
      symbols[g] (R900 groups only): (k, 42) uint8 4-ary payload symbols
    """
    return decode_core_staged(spec, stage_iq(spec, iq), first)


def decode_core_staged(spec: FrontendSpec, staged: jnp.ndarray, first):
    """decode_core over a pre-staged u16 buffer (see :class:`StagedGeometry`)."""
    bits, q6, mask2d = frontend_stage_staged(spec, staged, first)
    return search_slice(spec, bits, q6, mask2d)


def frontend_stage_staged(spec: FrontendSpec, staged: jnp.ndarray, first):
    """Stencil stage: magnitude -> matched filters -> quantized streams ->
    preamble correlation bank.

    Returns (bits, q6, mask2d): bits is the window's slice of the padded bit
    stream P (length >= window + PacketLength - SymbolLength); q6 is the R900
    6-ary stream on the same index convention (or None); mask2d is the
    (window/128, 128) u8 per-position preamble-hit bitmask (bit g = group g).
    """
    if spec.backend == "pallas":
        from .pallas_frontend import frontend_pallas_staged

        return frontend_pallas_staged(spec, staged, first)
    bits, q6 = _bits_q6_jnp_staged(spec, staged, first)
    return bits, q6, _masks_jnp(spec, bits)


def frontend_stage(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """:func:`frontend_stage_staged` over u8 interleaved IQ (compat)."""
    return frontend_stage_staged(spec, stage_iq(spec, iq), first)


def bits_q6(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """Quantized streams only (compatibility/testing helper)."""
    bits, q6, _ = frontend_stage(spec, iq, first)
    return bits, q6


def _masks_jnp(spec: FrontendSpec, bits: jnp.ndarray) -> jnp.ndarray:
    """Preamble correlation bank in plain XLA (decode.go:255-348).

    mask bit g at search position q is set iff every preamble bit of group g
    matches ``bits`` at stride SymbolLength starting at q. The reference's
    two-stage byte elimination is a scalar-CPU optimization with an identical
    result.
    """
    sl = spec.symbol_length
    w = spec.window
    mask = jnp.zeros(w, jnp.uint8)
    for g, group in enumerate(spec.groups):
        acc = jnp.ones(w, dtype=jnp.bool_)
        for k, bit in enumerate(group.bits):
            seg = jax.lax.dynamic_slice(bits, (k * sl,), (w,))
            acc = jnp.logical_and(acc, seg == bit)
        mask = mask | jnp.where(acc, jnp.uint8(1 << g), jnp.uint8(0))
    return mask.reshape(w // 128, 128)


def bits_q6_jnp(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """Quantized streams from u8 interleaved IQ (compat/testing wrapper)."""
    return _bits_q6_jnp_staged(spec, stage_iq(spec, iq), first)


def _bits_q6_jnp_staged(spec: FrontendSpec, staged: jnp.ndarray, first):
    cl = spec.chip_length
    sl = spec.symbol_length
    pl = spec.packet_length
    ps = spec.pad_shift
    geo = staged_geometry(spec)

    # Exact-integer squared magnitude (255-2i)^2 + (255-2q)^2 — equals
    # 255^2 * (lut[i] + lut[q]) of decode.go:209-225 exactly. The staged u16
    # element packs one interleaved byte pair (I low, Q high).
    v = staged.astype(jnp.int32)
    di = 255 - 2 * (v & 255)
    dq = 255 - 2 * (v >> 8)
    mag = di * di + dq * dq
    # First window: reference history buffers start zeroed (decode.go:144).
    pos = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 0)
    mag = jnp.where(jnp.logical_and(first, pos < spec.halo_staged), 0, mag)

    cs = _cumsum0(mag)

    # Manchester matched filter + 1-bit quantize (decode.go:229-245):
    # f[q] = 2*cs[q+CL] - cs[q] - cs[q+SL]; bit = f >= 0. Every staged read
    # is offset by pad_shift (bit q maps to staged sample q + pad_shift).
    lp = geo.lp  # P positions needed: search [0, w) + slice lookahead
    f = (
        2 * jax.lax.dynamic_slice(cs, (ps + cl,), (lp,))
        - jax.lax.dynamic_slice(cs, (ps,), (lp,))
        - jax.lax.dynamic_slice(cs, (ps + sl,), (lp,))
    )
    bits = (f >= 0).astype(jnp.uint8)
    # Force the initial PacketLength zero bits of the stream (decode.go:145).
    bpos = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 0)
    bits = jnp.where(jnp.logical_and(first, bpos < pl), jnp.uint8(0), bits)

    # R900 4-ary filter bank + 6-ary quantize (r900/r900.go:96-149), on the
    # same window-start index convention (offset +SL into local magnitude).
    q6 = None
    if spec.wants_r900:
        lq = geo.lq
        c = [
            jax.lax.dynamic_slice(cs, (ps + sl + i * cl,), (lq,))
            for i in range(5)
        ]
        a0 = 2 * c[2] - c[4] - c[0]  # 1100
        a1 = 2 * c[1] - 2 * c[2] + 2 * c[3] - c[4] - c[0]  # 1010
        a2 = 2 * c[1] - 2 * c[3] + c[4] - c[0]  # 1001
        mags = jnp.stack([jnp.abs(a0), jnp.abs(a1), jnp.abs(a2)])
        argmax = jnp.argmax(mags, axis=0)  # first max == strict-> chain
        chosen = jnp.take_along_axis(
            jnp.stack([a0, a1, a2]), argmax[None, :], axis=0
        )[0]
        q6 = (argmax + jnp.where(chosen > 0, 3, 0)).astype(jnp.uint8)
    return bits, q6


def _strided_matrix(
    stream: jnp.ndarray, stride: int, max_length: int
) -> jnp.ndarray:
    """(stride, n_rows) view where stream[c*stride + r] = mat[r, c].

    Positions at a fixed stride live in one column of
    ``stream.reshape(-1, stride)``; after a transpose each strided read is a
    contiguous row segment. Built ONCE per (stream, stride) and shared by
    every preamble group's slice gather — the transpose is the expensive
    part, the per-group gathers are cheap.
    """
    n_rows = -(-int(stream.shape[0]) // stride) + max_length + 1
    padded = jnp.zeros(n_rows * stride, stream.dtype)
    padded = jax.lax.dynamic_update_slice(padded, stream, (0,))
    return padded.reshape(n_rows, stride).T  # (stride, n_rows)


def _strided_rows_from(
    mat: jnp.ndarray, starts: jnp.ndarray, stride: int, length: int
) -> jnp.ndarray:
    """rows[i, j] = stream[starts[i] + j*stride] over a prebuilt
    :func:`_strided_matrix`, as one flat gather of k*length scalars."""
    r = (starts % stride).astype(jnp.int32)
    c = (starts // stride).astype(jnp.int32)
    ncols = mat.shape[1]
    flat = (
        r[:, None] * ncols
        + c[:, None]
        + jnp.arange(length, dtype=jnp.int32)[None, :]
    )
    return jnp.take(mat.reshape(-1), flat)


def _strided_rows(
    stream: jnp.ndarray, starts: jnp.ndarray, stride: int, length: int
) -> jnp.ndarray:
    """One-shot helper: build the strided matrix and gather (tests/tools)."""
    return _strided_rows_from(
        _strided_matrix(stream, stride, length), starts, stride, length
    )


def _packed_strided_matrix(
    stream: jnp.ndarray, stride: int, max_bytes: int, mat=None
) -> jnp.ndarray:
    """P8[r, c] = MSB-first byte of stream[(c+k)*stride + r], k<8.

    Dense byte pre-pack of the strided matrix (VPU shifts over contiguous
    rows — nearly free). Packet byte b of a hit at (r, c0) is P8[r, c0+8b],
    so the per-hit gather moves nbytes packed bytes instead of 8*nbytes
    raw bits. Pass ``mat`` to reuse a prebuilt strided matrix.
    """
    if mat is None:
        mat = _strided_matrix(stream, stride, 8 * max_bytes + 8)  # (stride, C)
    c = mat.shape[1]
    c8 = -(-c // 8) * 8
    pad = jnp.zeros((mat.shape[0], c8 + 8), mat.dtype)
    pad = jax.lax.dynamic_update_slice(pad, mat, (0, 0))
    p8 = jnp.zeros((mat.shape[0], c8), jnp.uint8)
    for j in range(8):
        p8 = p8 | (pad[:, j : j + c8] << (7 - j))
    return p8


def _packed_rows_from(
    p8: jnp.ndarray, starts: jnp.ndarray, stride: int, nbytes: int
) -> jnp.ndarray:
    """bytes[i, b] = MSB-first packed stream[starts[i] + (8b+k)*stride].

    One flat gather of k*nbytes scalars (TPU gathers pay per element AND
    per slice; a single take beats k vmapped dynamic_slices).
    """
    r = (starts % stride).astype(jnp.int32)
    c = (starts // stride).astype(jnp.int32)
    ncols = p8.shape[1]
    flat = (
        r[:, None] * ncols
        + c[:, None]
        + 8 * jnp.arange(nbytes, dtype=jnp.int32)[None, :]
    )
    return jnp.take(p8.reshape(-1), flat)


# ---------------------------------------------------------------------------
# Device-side batched checksum gates (SURVEY §2 C9/C10 build targets).
#
# The CRC fold is the bitwise MSB-first formulation — exactly the table CRC
# of crc/crc.go:34-55 with the 256-entry lookup replaced by 8 pure-VPU
# shift/xor steps per byte (no gathers; the batch axis carries the
# vectorization). The GF(32) constant-multiply of the RS syndrome Horner
# fold (r900/gf/gf.go:152-172) is GF(2)-linear in the 5-bit accumulator, so
# multiply-by-alpha^(29+i) becomes 5 masked XORs against precomputed basis
# images — again gather-free.


def _crc16_batch_jnp(data: jnp.ndarray, init: int, poly: int) -> jnp.ndarray:
    """CRC-16 over each row of an (N, L) uint8 matrix -> (N,) int32."""
    cols = data.T.astype(jnp.int32)  # (L, N): lanes advance in lockstep

    def step(crc, byte):
        crc = crc ^ (byte << 8)
        for _ in range(8):
            crc = ((crc << 1) & 0xFFFF) ^ jnp.where(
                (crc & 0x8000) != 0, poly, 0
            )
        return crc, None

    crc0 = jnp.full(cols.shape[1], init, jnp.int32)
    crc, _ = jax.lax.scan(step, crc0, cols)
    return crc


@functools.lru_cache(maxsize=None)
def _r900_rs_basis() -> np.ndarray:
    """B[i, j] = alpha^(29+i) * 2^j in GF(32) — the linear-map images of the
    syndrome fold's constant multipliers (r900/r900.go:215-221)."""
    from ..utils.gf import r900_field

    f = r900_field()
    b = np.zeros((5, 5), np.int32)
    for i in range(5):
        m = f.exp_((29 + i) % f.order)
        for j in range(5):
            b[i, j] = f.mul(m, 1 << j)
    return b


def _r900_rs_valid_jnp(syms: jnp.ndarray) -> jnp.ndarray:
    """(N, 42) 6-ary payload digits -> (N,) bool: base-6 pairs in range and
    all five GF(32) RS syndromes zero (r900/r900.go:199-221)."""
    n = syms.shape[0]
    d = syms.astype(jnp.int32).reshape(n, 21, 2)
    sym = d[:, :, 0] * 6 + d[:, :, 1]  # (N, 21) 5-bit symbols
    in_range = jnp.all(sym <= 31, axis=1)
    sym = sym & 31
    # Codeword: data at [0:16], zeros at [16:26], parity at [26:31].
    cw = jnp.concatenate(
        [sym[:, :16], jnp.zeros((n, 10), jnp.int32), sym[:, 16:21]], axis=1
    )
    basis = jnp.asarray(_r900_rs_basis())  # (5 parities, 5 bits)
    syn = jnp.broadcast_to(cw[:, :1], (n, 5))

    def step(syn, v):
        acc = jnp.zeros_like(syn)
        for j in range(5):
            acc = acc ^ (((syn >> j) & 1) * basis[None, :, j])
        return acc ^ v[:, None], None

    syn, _ = jax.lax.scan(step, syn, cw.T[1:])
    return in_range & jnp.all(syn == 0, axis=1)


def _device_parser_masks(
    group: GroupSpec, packed: jnp.ndarray, syms
) -> List[jnp.ndarray]:
    """Per-parser validity masks — each an AND of CRC gates plus the
    optional RS gate (mirrors Parser.valid_mask batched on host). Shipped
    to the host as a bitmask so the host parse never recomputes CRCs."""
    n = packed.shape[0]
    out = []
    for v in group.validators:
        ok = jnp.ones(n, jnp.bool_)
        for c in v.crcs:
            data = (
                packed[:, c.ranges[0][0] : c.ranges[0][1]]
                if len(c.ranges) == 1
                else jnp.concatenate(
                    [packed[:, a:b] for a, b in c.ranges], axis=1
                )
            )
            ok = ok & (_crc16_batch_jnp(data, c.init, c.poly) == c.residue)
        if v.rs:
            ok = ok & _r900_rs_valid_jnp(syms)
        out.append(ok)
    return out


def _device_valid_mask(
    group: GroupSpec, packed: jnp.ndarray, syms
) -> jnp.ndarray:
    """OR over the group's parser validators."""
    masks = _device_parser_masks(group, packed, syms)
    valid = masks[0]
    for m in masks[1:]:
        valid = valid | m
    return valid


def _compact_true_positions(
    mask: jnp.ndarray, size: int, fill: int
) -> jnp.ndarray:
    """Ascending positions of True entries, padded with ``fill``.

    Drop-in for ``jnp.nonzero(mask, size=size, fill_value=fill)[0]`` —
    identical results, different lowering: jnp.nonzero's
    cumsum(bincount(cumsum)) path lowers to a serialized scatter-add on
    TPU (measured ~8.7 ms/window across search_slice's four compactions at
    the bench shapes); a single ascending sort of where(mask, iota, n) is
    pure vector work and ~40x cheaper.
    """
    n = mask.shape[0]
    big = jnp.int32(n)
    pos = jnp.where(
        mask, jax.lax.broadcasted_iota(jnp.int32, (n,), 0), big
    )
    pos = jax.lax.sort(pos)
    if size <= n:
        pos = pos[:size]
    else:
        pos = jnp.concatenate(
            [pos, jnp.full(size - n, big, jnp.int32)]
        )
    return jnp.where(pos < n, pos, fill)


def _shift_or_true(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x[q + k] with True padding past the end (conservative: positions
    whose span reaches past the stream never collapse)."""
    n = x.shape[0]
    if k >= n:
        return jnp.ones(n, jnp.bool_)
    return jnp.concatenate([x[k:], jnp.ones(k, jnp.bool_)])


def _edge_span_streams(
    stream: jnp.ndarray, stride: int, spans: Sequence[int]
) -> Dict[int, jnp.ndarray]:
    """Per-position content-equality streams via doubling OR-convolution.

    For each requested span S, returns ``eq_S`` with ``eq_S[q]`` True iff
    the content sliced at stride ``stride`` from position ``q`` is PROVEN
    identical to the content sliced from ``q + 1`` -- i.e. no sample-
    adjacent edge (``stream[p] != stream[p+1]``) exists at any of the S
    strided read positions {q + m*stride : m < S}.

    The dense formulation works on the natural 1-D (rows, 128) layout with
    contiguous shifts only: ``o_k[q] = OR(edge[q + m*stride], m < k)``
    doubles as ``o_2k[q] = o_k[q] | o_k[q + k*stride]``, and an arbitrary S
    composes from its binary decomposition -- O(log S) full-stream OR
    passes, then one flat gather per candidate set. Replaces a strided-
    matrix prefix-sum index whose build + 4-gather queries measured ~4x
    slower on this chip.
    """
    edge = jnp.concatenate(
        [stream[1:] != stream[:-1], jnp.ones(1, jnp.bool_)]
    )
    partials = {1: edge}
    k = 1
    while 2 * k <= max(spans):
        partials[2 * k] = partials[k] | _shift_or_true(
            partials[k], k * stride
        )
        k *= 2
    out: Dict[int, jnp.ndarray] = {}
    for s in spans:
        acc = None
        off = 0
        rem = s
        for bit in reversed(range(s.bit_length())):
            p2 = 1 << bit
            if rem >= p2:
                part = _shift_or_true(partials[p2], off * stride)
                acc = part if acc is None else acc | part
                off += p2
                rem -= p2
        out[s] = jnp.logical_not(acc)
    return out


def search_slice(spec: FrontendSpec, bits: jnp.ndarray, q6, mask2d):
    """Hit compaction and packet slicing over the quantized streams.

    ``mask2d`` is the per-position preamble-hit bitmask from
    :func:`frontend_stage`. Hits are located with a two-level compaction
    tuned to the TPU's (8, 128) tiled layout: a lane-axis reduction finds
    the rows containing any hit (cheap, layout-friendly), a small nonzero
    compacts those row indices, and the exact per-position nonzero runs only
    over the gathered rows — never over the full window.
    """
    cl = spec.chip_length
    sl = spec.symbol_length
    w = spec.window
    k_cap = spec.max_hits
    k_gather = spec.gather_hits
    n_rows_cap = spec.gather_rows
    rm = w // 128

    # Level 1: rows of the (w/128, 128) mask containing any hit (any group).
    row_any = jnp.any(mask2d != 0, axis=1)
    n_rows = jnp.sum(row_any, dtype=jnp.int32)
    rows_overflow = n_rows > n_rows_cap
    rows_idx = _compact_true_positions(row_any, n_rows_cap, rm)
    row_valid = rows_idx < rm
    safe_rows = jnp.where(row_valid, rows_idx, 0).astype(jnp.int32)
    sub = jnp.take(mask2d, safe_rows, axis=0)  # (n_rows_cap, 128) u8
    sub = jnp.where(row_valid[:, None], sub, jnp.uint8(0))
    flat_sub = sub.reshape(-1)
    flat_pos = (
        safe_rows[:, None] * 128 + jnp.arange(128, dtype=jnp.int32)[None, :]
    ).reshape(-1)

    counts: List[jnp.ndarray] = []
    idxs: List[jnp.ndarray] = []
    keeps: List[jnp.ndarray] = []
    pvalids: List[jnp.ndarray] = []
    byte_mats: List[jnp.ndarray] = []
    symbol_mats: Dict[int, jnp.ndarray] = {}

    # Shared strided views: every group slices ``bits`` at stride SL (and
    # R900 groups slice ``q6`` at 4*CL); built once, pre-packed to bytes so
    # the per-hit gather moves nbytes instead of 8*nbytes elements.
    max_bytes = max((g.packet_symbols + 7) >> 3 for g in spec.groups)
    bit_mat = _strided_matrix(bits, sl, 8 * max_bytes + 8)
    pack_mat = _packed_strided_matrix(bits, sl, max_bytes, mat=bit_mat)
    q6_mat = (
        _strided_matrix(q6, 4 * cl, PAYLOAD_SYMBOLS)
        if spec.wants_r900
        else None
    )

    # Level 2: ONE exact nonzero over the gathered rows finds positions with
    # any group's hit; per-group membership is then resolved on the small
    # compacted set instead of one big nonzero per group. The combined
    # capacity covers the SUM across groups (hits can coincide per group
    # but not per position byte).
    k_any = min(len(spec.groups) * k_gather, n_rows_cap * 128)
    any_hits = _compact_true_positions(
        flat_sub != 0, k_any, flat_pos.shape[0]
    )
    any_valid = any_hits < flat_pos.shape[0]
    safe_any = jnp.where(any_valid, any_hits, 0)
    any_idx = jnp.where(
        any_valid, jnp.take(flat_pos, safe_any), w
    ).astype(jnp.int32)
    any_mask = jnp.where(any_valid, jnp.take(flat_sub, safe_any), jnp.uint8(0))
    total_any = jnp.sum((mask2d != 0).astype(jnp.int32))
    any_overflow = jnp.logical_or(rows_overflow, total_any > k_any)

    # Content-equality streams supporting the exact pre-slice plateau
    # collapse: two consecutive search positions slice identical content
    # iff no sample-adjacent bit (symbol) edge exists at any of their
    # strided read positions — precomputed densely by doubling
    # OR-convolution, then one flat gather per group, all BEFORE the
    # expensive content gathers so those run at slice_hits capacity.
    k_slice = min(spec.slice_hits, k_gather)
    bit_spans = sorted(
        {g.packet_symbols for g in spec.groups if not g.wants_r900}
    )
    eq_bits = _edge_span_streams(bits, sl, bit_spans) if bit_spans else {}
    eq_q6 = (
        _edge_span_streams(q6, 4 * cl, [PAYLOAD_SYMBOLS])
        if spec.wants_r900
        else {}
    )

    for g, group in enumerate(spec.groups):
        raw_count = jnp.sum(
            (mask2d >> g) & 1, dtype=jnp.int32
        )  # exact total matches
        # Row/combined-gather overflow reports as gather overflow so the
        # caller escalates.
        raw_count = jnp.where(
            any_overflow, jnp.int32(k_gather + 1), raw_count
        )
        # This group's hits, compacted from the combined set (small nonzero;
        # a per-group count above k_gather is already reported via the exact
        # raw_count popcount and escalated by the caller).
        gsel = (any_mask >> g) & 1
        ghits = _compact_true_positions(gsel != 0, k_gather, k_any)
        gvalid = ghits < k_any
        safe_g = jnp.where(gvalid, ghits, 0)
        hit_idx = jnp.where(gvalid, jnp.take(any_idx, safe_g), w).astype(
            jnp.int32
        )
        valid = jnp.logical_and(gvalid, hit_idx < w)

        s_g = group.packet_symbols
        nbytes = (s_g + 7) >> 3

        # Pre-slice plateau collapse: drop a hit at q when the previous hit
        # sits at q-1 in the same block AND the edge query PROVES their
        # sliced contents identical (the host parsers' per-block seen maps
        # would drop the duplicate anyway, scm/scm.go:62-74). Conservative:
        # unproven equality keeps the candidate; overflow past slice_hits
        # escalates exactly like a gather overflow.
        prev_q = jnp.maximum(hit_idx - 1, 0)
        if group.wants_r900:
            # Clipped takes past the stream end read the True-padded edge
            # tail -> eq False (conservative, never a wrong collapse).
            eq = jnp.take(
                eq_q6[PAYLOAD_SYMBOLS],
                prev_q + (spec.preamble_length - sl),
            )
        else:
            eq = jnp.take(eq_bits[s_g], prev_q)
        adj = jnp.concatenate(
            [jnp.zeros(1, jnp.bool_), hit_idx[1:] == hit_idx[:-1] + 1]
        )
        sameblk = jnp.concatenate(
            [
                jnp.zeros(1, jnp.bool_),
                hit_idx[1:] // spec.block_size
                == hit_idx[:-1] // spec.block_size,
            ]
        )
        pre_keep = jnp.logical_and(
            valid, jnp.logical_not(adj & sameblk & eq)
        )
        pre_count = jnp.sum(pre_keep, dtype=jnp.int32)
        raw_count = jnp.where(
            pre_count > k_slice, jnp.int32(k_gather + 1), raw_count
        )
        s_pos = _compact_true_positions(pre_keep, k_slice, k_gather)
        s_valid = s_pos < k_gather
        safe_s = jnp.where(s_valid, s_pos, 0).astype(jnp.int32)
        slice_idx = jnp.where(
            s_valid, jnp.take(hit_idx, safe_s), w
        ).astype(jnp.int32)
        valid = jnp.logical_and(s_valid, slice_idx < w)
        safe_idx = jnp.where(valid, slice_idx, 0)

        # Bit slice at stride SL (decode.go:353-375), gathered as pre-packed
        # MSB-first bytes; mask the stray low bits of a partial final byte.
        s_pad = nbytes * 8
        packed = _packed_rows_from(pack_mat, safe_idx, sl, nbytes)
        if s_g != s_pad:
            tail_mask = jnp.uint8((0xFF << (s_pad - s_g)) & 0xFF)
            packed = packed.at[:, -1].set(packed[:, -1] & tail_mask)

        syms = None
        if group.wants_r900:
            # 42 payload symbols at stride 4*CL from the 6-ary stream
            # starting at hit + PreambleLength - SymbolLength
            # (r900/r900.go:187-193).
            base = spec.preamble_length - sl
            syms = _strided_rows_from(
                q6_mat, safe_idx + base, 4 * cl, PAYLOAD_SYMBOLS
            )

        # Checksum gate on device (crc/crc.go:49-55, r900/r900.go:215-221):
        # only candidates some parser could turn into a message occupy
        # output slots, and the PER-PARSER verdicts ship to the host as a
        # bitmask (bit j = parser j of the group accepts the row) so the
        # host parse never recomputes a CRC. Dropping checksum-failing
        # candidates is semantics-free: duplicates of an invalid candidate
        # are equally invalid.
        pv = jnp.zeros(packed.shape[0], jnp.uint8)
        if spec.device_validate and group.validators is not None:
            pmasks = _device_parser_masks(group, packed, syms)
            any_ok = pmasks[0]
            for m in pmasks[1:]:
                any_ok = any_ok | m
            valid = jnp.logical_and(valid, any_ok)
            for j, m in enumerate(pmasks):
                pv = pv | (m.astype(jnp.uint8) << j)

        # Collapse remaining same-block duplicates by gathered content
        # (consecutive survivors may still carry identical packets — e.g.
        # two plateaus of the same transmission within one block). The
        # surviving rows are NOT re-compacted on device: the packed result
        # carries all k_slice rows plus this keep mask, and the host (which
        # fetches the buffer anyway) selects the survivors — dropping one
        # full sort + three takes per group from the device program.
        key = syms if group.wants_r900 else packed
        block_of = safe_idx // spec.block_size
        same_prev = jnp.all(key[1:] == key[:-1], axis=-1)
        same_prev = jnp.logical_and(same_prev, block_of[1:] == block_of[:-1])
        dup = jnp.concatenate([jnp.zeros(1, jnp.bool_), same_prev])
        keep = jnp.logical_and(valid, jnp.logical_not(dup))
        unique_count = jnp.sum(keep, dtype=jnp.int32)

        counts.append(jnp.stack([raw_count, unique_count]))
        idxs.append(slice_idx)
        keeps.append(keep.astype(jnp.uint8))
        pvalids.append(pv)
        byte_mats.append(packed)
        if group.wants_r900:
            symbol_mats[g] = syms

    return {
        "counts": jnp.stack(counts),  # (G, 2): raw hits, unique candidates
        "idx": idxs,  # (k_slice,) positions, w as fill
        "keep": keeps,  # (k_slice,) u8 survivor masks
        "pvalid": pvalids,  # (k_slice,) u8 per-parser validity bitmasks
        "bytes": byte_mats,  # (k_slice, nbytes) per group
        "symbols": symbol_mats,
    }


@functools.partial(jax.jit, static_argnums=(0,))
def decode_window(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """Jitted single-chip window decode (see :func:`decode_core`)."""
    return decode_core(spec, iq, first)


@functools.partial(jax.jit, static_argnums=(0,))
def decode_window_staged(spec: FrontendSpec, staged: jnp.ndarray, first):
    """Jitted window decode over a pre-staged u16 buffer."""
    return decode_core_staged(spec, staged, first)


# ---------------------------------------------------------------------------
# Result packing: device->host transfers have per-array latency (severe over
# remote-relay transports), so the device flattens all outputs into ONE u8
# buffer and the host unpacks views.


def result_layout(spec: FrontendSpec) -> List[Tuple[str, int, int]]:
    """(name, byte_offset, byte_size) entries of the packed result buffer.

    Rows are carried at the slice capacity with a per-group keep mask; the
    host compacts survivors after the (latency-bound, size-insensitive)
    fetch — see search_slice."""
    k = min(spec.slice_hits, spec.gather_hits)
    layout = []
    off = 0

    def add(name, size):
        nonlocal off
        layout.append((name, off, size))
        off += size

    add("counts", 4 * len(spec.groups) * 2)
    for g, group in enumerate(spec.groups):
        add(f"idx{g}", 4 * k)
    for g, group in enumerate(spec.groups):
        add(f"keep{g}", k)
    for g, group in enumerate(spec.groups):
        add(f"pvalid{g}", k)
    for g, group in enumerate(spec.groups):
        nbytes = (group.packet_symbols + 7) >> 3
        add(f"bytes{g}", k * nbytes)
    for g, group in enumerate(spec.groups):
        if group.wants_r900:
            add(f"symbols{g}", k * PAYLOAD_SYMBOLS)
    add("_total", 0)
    return layout


def _as_u8(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint8:
        return x.reshape(-1)
    assert x.dtype == jnp.int32
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)


def pack_results(res: Dict[str, object]) -> jnp.ndarray:
    """Flatten a decode_core result dict into one uint8 buffer (traceable)."""
    parts = [_as_u8(res["counts"])]
    parts += [_as_u8(x) for x in res["idx"]]
    parts += [_as_u8(x) for x in res["keep"]]
    parts += [_as_u8(x) for x in res["pvalid"]]
    parts += [_as_u8(x) for x in res["bytes"]]
    parts += [_as_u8(res["symbols"][g]) for g in sorted(res["symbols"])]
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnums=(0,))
def decode_window_packed(spec: FrontendSpec, iq: jnp.ndarray, first: jnp.ndarray):
    """decode_core with all outputs flattened into one uint8 buffer."""
    return pack_results(decode_core(spec, iq, first))


@functools.partial(jax.jit, static_argnums=(0,))
def decode_windows_scan(spec: FrontendSpec, staged_batch, firsts):
    """Decode K staged windows in ONE device program via lax.scan.

    staged_batch: (K, staged_samples) u16; firsts: (K,) bool. Returns the
    (K, P) packed result matrix. One program dispatch + one host fetch per
    K windows — the fixed per-execution sync latency of the transport is
    paid once per batch instead of once per window.
    """

    def body(_, xs):
        st, fi = xs
        return None, pack_results(decode_core_staged(spec, st, fi))

    _, packed = jax.lax.scan(body, None, (staged_batch, firsts))
    return packed


@functools.partial(jax.jit, static_argnums=(0,))
def decode_window_staged_packed(spec: FrontendSpec, staged, first):
    """Staged-input decode with all outputs flattened into one u8 buffer.

    The production hot path: the host stages raw interleaved IQ bytes with a
    zero-copy ``view(np.uint16)`` into the StagedGeometry layout, so the
    device program starts directly at the fused stencil kernel with no
    deinterleave/pad prologue.
    """
    return pack_results(decode_core_staged(spec, staged, first))


def unpack_results(spec: FrontendSpec, buf: np.ndarray) -> Dict[str, object]:
    """Host-side unpack of the single result buffer into the dict layout.

    Applies each group's keep mask (the device-side compaction moved here —
    the fetch is latency-bound, so carrying the masked-out rows is free):
    the returned per-group arrays hold exactly ``counts[g, 1]`` surviving
    candidates in ascending position order."""
    buf = np.asarray(buf, np.uint8)
    k = min(spec.slice_hits, spec.gather_hits)
    out: Dict[str, object] = {
        "idx": [], "pvalid": [], "bytes": [], "symbols": {}
    }
    keeps: List[np.ndarray] = []
    for name, off, size in result_layout(spec):
        view = buf[off : off + size]
        if name == "counts":
            out["counts"] = view.view(np.int32).reshape(len(spec.groups), 2)
        elif name.startswith("idx"):
            out["idx"].append(view.view(np.int32))
        elif name.startswith("keep"):
            keeps.append(view.astype(bool))
        elif name.startswith("pvalid"):
            out["pvalid"].append(view)
        elif name.startswith("bytes"):
            g = len(out["bytes"])
            nbytes = (spec.groups[g].packet_symbols + 7) >> 3
            out["bytes"].append(view.reshape(k, nbytes))
        elif name.startswith("symbols"):
            g = int(name[len("symbols") :])
            out["symbols"][g] = view.reshape(k, PAYLOAD_SYMBOLS)
    for g, mask in enumerate(keeps):
        out["idx"][g] = out["idx"][g][mask]
        out["pvalid"][g] = out["pvalid"][g][mask]
        out["bytes"][g] = out["bytes"][g][mask]
        if g in out["symbols"]:
            out["symbols"][g] = out["symbols"][g][mask]
    return out


def run_window(
    spec: FrontendSpec, iq: np.ndarray, first: bool
) -> Dict[str, object]:
    """Host wrapper: zero-copy staging, single packed transfer, NumPy results."""
    buf = decode_window_staged_packed(
        spec, jnp.asarray(stage_host(spec, iq)), jnp.asarray(first)
    )
    return unpack_results(spec, np.asarray(buf))
