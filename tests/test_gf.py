"""GF(32) / Reed-Solomon tests (reference r900/gf/gf.go semantics)."""

import numpy as np
import pytest

from rtlamr_tpu.utils.gf import GF, r900_field, rs_syndromes_batch
from rtlamr_tpu.ref.synth import solve_r900_parity


def test_field_tables_roundtrip():
    f = r900_field()
    for x in range(1, 32):
        assert f.exp_(f.log_(x)) == x
    assert f.log_(0) == -1
    assert f.exp_(-1) == 0


def test_mul_properties():
    f = r900_field()
    rng = np.random.default_rng(0)
    for _ in range(200):
        x, y, z = (int(v) for v in rng.integers(0, 32, 3))
        assert f.mul(x, y) == f.mul(y, x)
        assert f.mul(x, f.mul(y, z)) == f.mul(f.mul(x, y), z)
        assert f.mul(x, 1) == x
        assert f.mul(x, 0) == 0
        if x:
            assert f.mul(x, f.inv(x)) == 1


def test_invalid_field_params():
    with pytest.raises(ValueError):
        GF(32, 36, 2)  # reducible polynomial
    with pytest.raises(ValueError):
        GF(300, 301, 2)  # invalid order


def test_mul_table_matches_scalar():
    f = r900_field()
    for x in range(32):
        for y in range(32):
            assert f.mul_table[x, y] == f.mul(x, y)


def test_parity_solver_zeroes_syndromes():
    rng = np.random.default_rng(5)
    for _ in range(20):
        data = rng.integers(0, 32, 16).astype(np.uint8)
        parity = solve_r900_parity(data)
        codeword = np.zeros(31, dtype=np.uint8)
        codeword[:16] = data
        codeword[26:] = parity
        f = r900_field()
        assert not f.syndrome(codeword, 5, 29).any()


def test_batch_syndromes_match_scalar():
    rng = np.random.default_rng(9)
    msgs = rng.integers(0, 32, (16, 31)).astype(np.uint8)
    batch = rs_syndromes_batch(msgs, 5, 29)
    f = r900_field()
    for i in range(16):
        np.testing.assert_array_equal(batch[i], f.syndrome(msgs[i], 5, 29))


def test_corrupted_codeword_detected():
    data = np.arange(16, dtype=np.uint8) % 32
    parity = solve_r900_parity(data)
    codeword = np.zeros(31, dtype=np.uint8)
    codeword[:16] = data
    codeword[26:] = parity
    codeword[3] ^= 5
    assert r900_field().syndrome(codeword, 5, 29).any()
