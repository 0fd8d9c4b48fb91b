"""Randomized conformance: for random mixes of protocols, chip lengths,
offsets, noise and amplitudes, the TPU window pipeline must produce exactly
the oracle's message stream (the north star's bit-exactness requirement,
BASELINE.md)."""

import numpy as np
import pytest

from rtlamr_tpu.decoder import WindowDecoder
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.protocols.base import build_decoder_config
from rtlamr_tpu.ref import ReferenceDecoder, synth

PROTOS = ["scm", "scm+", "idm", "netidm", "r900", "r900bcd"]


def random_capture(rng, names, chip_length):
    parsers = [new_parser(n, chip_length) for n in names]
    cfg = build_decoder_config(parsers)
    n_blocks = int(rng.integers(20, 60))
    total = n_blocks * cfg.block_size
    bursts = []
    n_packets = int(rng.integers(1, 6))
    for _ in range(n_packets):
        kind = names[int(rng.integers(len(names)))]
        offset = int(rng.integers(0, max(1, total - cfg.packet_length)))
        if kind == "scm":
            bits = synth.make_scm_bits(
                meter_id=int(rng.integers(1, 1 << 26)),
                meter_type=int(rng.integers(16)),
                consumption=int(rng.integers(1 << 24)),
            )
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "scm+":
            bits = synth.make_scmplus_bits(
                endpoint_id=int(rng.integers(1, 1 << 32)),
                endpoint_type=int(rng.integers(256)),
                consumption=int(rng.integers(1 << 32)),
            )
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "idm":
            bits = synth.make_idm_bits(
                serial=int(rng.integers(1, 1 << 32)),
                intervals=[int(v) for v in rng.integers(0, 512, 47)],
            )
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "netidm":
            bits = synth.make_netidm_bits(serial=int(rng.integers(1, 1 << 32)))
            bursts.append(synth.bits_to_burst(bits, offset))
        else:
            digits = synth.make_r900_symbols(
                meter_id=int(rng.integers(1, 1 << 32)),
                consumption=int(rng.integers(1 << 24)),
            )
            bursts.append(synth.r900_burst(digits, offset))
    hi = int(rng.integers(170, 255))
    noise = float(rng.uniform(0, 8))
    return synth.render_iq(
        total, bursts, chip_length, hi=hi, noise=noise,
        seed=int(rng.integers(1 << 30)),
    )


@pytest.mark.parametrize("seed", range(10))
def test_random_capture_conformance(seed):
    rng = np.random.default_rng(1000 + seed)
    chip_length = int(rng.choice([8, 32, 56, 72]))
    k = int(rng.integers(1, len(PROTOS) + 1))
    names = list(rng.choice(PROTOS, size=k, replace=False))
    iq = random_capture(rng, names, chip_length)

    oracle = ReferenceDecoder(
        [new_parser(n, chip_length) for n in names], arithmetic="int"
    )
    want = [(b, str(m)) for b, m in oracle.decode_capture(iq)]

    wb = int(rng.choice([2, 8, 32]))
    dec = WindowDecoder(
        [new_parser(n, chip_length) for n in names],
        window_blocks=max(wb, -(-(oracle.cfg.packet_length + oracle.cfg.symbol_length) // oracle.cfg.block_size)),
        max_hits=int(rng.choice([16, 256])),
    )
    got = [(b, str(m)) for b, m in dec.decode_capture(iq)]
    assert got == want, f"seed={seed} names={names} cl={chip_length}"
