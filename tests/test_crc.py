"""CRC-16 tests mirroring the reference property test (crc/crc_test.go:22-41):
appending the computed checksum makes the full-buffer checksum zero, for the
IBM/BCH/CCITT parameter sets, plus batch-vs-scalar agreement and the
residue-targeted tail solver used by the synthesizer."""

import numpy as np
import pytest

from rtlamr_tpu.utils.crc import CRC, crc16, crc16_batch
from rtlamr_tpu.ref.synth import solve_crc_tail

PARAMS = [
    ("IBM", 0x0000, 0x8005, 0x0000),
    ("BCH", 0x0000, 0x6F63, 0x0000),
    ("CCITT", 0xFFFF, 0x1021, 0x1D0F),
]


@pytest.mark.parametrize("name,init,poly,residue", PARAMS)
def test_identity_property(name, init, poly, residue):
    rng = np.random.default_rng(42)
    for _ in range(64):
        n = int(rng.integers(1, 128))
        buf = rng.integers(0, 256, n).astype(np.uint8)
        crc = crc16(buf, init, poly)
        full = np.concatenate([buf, np.array([crc >> 8, crc & 0xFF], np.uint8)])
        assert crc16(full, init, poly) == 0, name


@pytest.mark.parametrize("name,init,poly,residue", PARAMS)
def test_batch_matches_scalar(name, init, poly, residue):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, (32, 92)).astype(np.uint8)
    batch = crc16_batch(data, init, poly)
    for i in range(32):
        assert batch[i] == crc16(data[i], init, poly)


@pytest.mark.parametrize("name,init,poly,residue", PARAMS)
def test_solve_crc_tail_hits_residue(name, init, poly, residue):
    crc = CRC(name, init, poly, residue)
    rng = np.random.default_rng(3)
    for _ in range(16):
        prefix = rng.integers(0, 256, int(rng.integers(1, 64))).astype(np.uint8)
        tail = solve_crc_tail(crc, prefix)
        full = np.concatenate([prefix, np.frombuffer(tail, np.uint8)])
        assert crc16(full, init, poly) == residue


def test_ccitt_known_residue_scheme():
    # The SCM+/IDM scheme: transmitted CRC makes the checksum over
    # payload||crc equal 0x1D0F (scmplus/scmplus.go:77).
    crc = CRC("CCITT", 0xFFFF, 0x1021, 0x1D0F)
    payload = np.arange(14, dtype=np.uint8)
    tail = solve_crc_tail(crc, payload)
    # classic result: tail equals the ones-complement of the plain checksum
    plain = crc.checksum(payload)
    assert int.from_bytes(tail, "big") == (~plain) & 0xFFFF
