"""Float32-vs-int arithmetic divergence measurement.

The Go reference quantizes float32 matched-filter sums with signbit
(protocol/decode.go:233-243, r900/r900.go:96-149); the TPU path uses the
exact-integer reformulation (ops/frontend.py module docstring). The two can
disagree only on near-tie samples where |f| is below the f32 cumsum rounding
error. This suite measures whether those bit-level near-ties ever change the
DECODED MESSAGE SET — the unit the north star's bit-exactness is defined
over (BASELINE.md) — across randomized noisy captures at a sweep of SNRs,
and asserts the divergence stays at zero on the pinned seeds.

tools/divergence.py runs the same comparison at a much larger scale and
records the measured rate; see its module docstring for the analysis.
"""

import numpy as np
import pytest

from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.ref import ReferenceDecoder, synth

from test_fuzz_conformance import PROTOS, random_capture


def message_stream(parsers, iq, arithmetic):
    dec = ReferenceDecoder(parsers, arithmetic=arithmetic)
    return [(b, str(m)) for b, m in dec.decode_capture(iq)]


@pytest.mark.parametrize("seed", range(8))
def test_f32_vs_int_message_sets(seed):
    """Random protocol mixes / chip lengths / SNRs: float32 oracle == int
    oracle on decoded message streams."""
    rng = np.random.default_rng(7000 + seed)
    chip_length = int(rng.choice([8, 32, 72]))
    k = int(rng.integers(1, len(PROTOS) + 1))
    names = list(rng.choice(PROTOS, size=k, replace=False))
    iq = random_capture(rng, names, chip_length)

    want = message_stream(
        [new_parser(n, chip_length) for n in names], iq, "float32"
    )
    got = message_stream(
        [new_parser(n, chip_length) for n in names], iq, "int"
    )
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_q6_census_zero_message_impact(seed):
    """R900 6-ary near-tie census (r900/r900.go:133-143 strict-> argmax):
    count per-symbol f32-vs-int disagreements on pinned noisy captures and
    assert they never change the decoded R900 message stream."""
    from tools.divergence import q6_divergence

    rng = np.random.default_rng(8100 + seed)
    chip_length = int(rng.choice([8, 32]))
    iq = random_capture(rng, ["r900", "r900bcd"], chip_length)

    diff, total = q6_divergence(iq, chip_length)
    assert total > 0
    want = message_stream([new_parser("r900", chip_length)], iq, "float32")
    got = message_stream([new_parser("r900", chip_length)], iq, "int")
    assert got == want, f"q6 near-ties {diff}/{total} changed the message set"


@pytest.mark.parametrize("noise", [0.5, 4.0, 12.0, 25.0, 45.0])
def test_f32_vs_int_noise_sweep(noise):
    """SNR sweep around the decode threshold: near-tie bits are most likely
    when noise makes |f| small, so sweep from clean to undecodable."""
    chip_length = 8
    names = ["scm", "idm", "r900"]
    parsers = [new_parser(n, chip_length) for n in names]
    from rtlamr_tpu.protocols.base import build_decoder_config

    cfg = build_decoder_config(parsers)
    rng = np.random.default_rng(int(noise * 100))
    diverged = 0
    for trial in range(4):
        total = 24 * cfg.block_size
        bursts = [
            synth.bits_to_burst(
                synth.make_scm_bits(
                    meter_id=int(rng.integers(1, 1 << 26)),
                    consumption=int(rng.integers(1 << 24)),
                ),
                int(rng.integers(0, total - cfg.packet_length)),
            ),
            synth.r900_burst(
                synth.make_r900_symbols(meter_id=int(rng.integers(1, 1 << 32))),
                int(rng.integers(0, total - cfg.packet_length)),
            ),
        ]
        iq = synth.render_iq(
            total,
            bursts,
            chip_length,
            noise=noise,
            seed=int(rng.integers(1 << 30)),
        )
        f32 = message_stream(
            [new_parser(n, chip_length) for n in names], iq, "float32"
        )
        i64 = message_stream(
            [new_parser(n, chip_length) for n in names], iq, "int"
        )
        if f32 != i64:
            diverged += 1
    assert diverged == 0, f"{diverged}/4 captures diverged at noise={noise}"
