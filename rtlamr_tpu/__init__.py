"""rtlamr_tpu — a TPU-native ERT smart-meter receiver.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Go
reference ``bemasher/rtlamr`` (see SURVEY.md): an rtl_tcp / capture-file
receiver for 900 MHz ISM-band ERT meter messages (SCM, SCM+, IDM, NetIDM,
R900, R900BCD).

Architecture (TPU-first, not a translation):

- ``protocols/``  pure-data protocol descriptors, message dataclasses and the
  parser registry (reference: protocol/parse.go, scm/, scmplus/, idm/,
  netidm/, r900/, r900bcd/).
- ``utils/``      CRC-16 (reference: crc/crc.go), GF(2^m) + Reed-Solomon
  syndrome (reference: r900/gf/gf.go), bit packing.
- ``ref/``        a NumPy scalar oracle decoder mirroring the Go per-block
  semantics bit-for-bit, plus a synthetic IQ generator for fixtures.
- ``ops/``        the device compute path: whole-stream exact-int32 frontend
  (magnitude, Manchester matched filter, preamble correlation bank, bit
  slicing, R900 4-ary filter bank) in jnp with fused Pallas kernels for the
  hot loops (reference: protocol/decode.go, r900/r900.go:82-150).
- ``decoder/``    the single-chip window pipeline: jitted frontend + host
  parsing, digest dedup, filters (reference: main.go:135-296).
- ``parallel/``   shard_map over a device mesh: time-sharded decode with
  overlap-save halos (new design; the reference is single-process).
- ``io/``         rtl_tcp TCP client and capture-file reader (reference:
  github.com/bemasher/rtltcp usage in main.go).
- ``cli/``        the full rtlamr flag surface, env override, encoders
  (reference: flags.go, main.go).
"""

__version__ = "0.1.0"
