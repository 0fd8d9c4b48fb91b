"""Pallas fused-kernel parity tests (interpreter mode on CPU; the same
kernel compiles via Mosaic on TPU). Every output bit/symbol must equal the
jnp reference stage (SURVEY.md §7.3: each kernel gets a parity test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtlamr_tpu.ops.frontend import bits_q6_jnp, make_frontend_spec
from rtlamr_tpu.ops.pallas_frontend import bits_q6_pallas
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.protocols.base import build_decoder_config
from rtlamr_tpu.ref import synth


def spec_for(names, chip_length, wb, backend="jnp"):
    cfg = build_decoder_config([new_parser(n, chip_length) for n in names])
    return make_frontend_spec(cfg, wb, 64, backend=backend)


@pytest.mark.parametrize("chip_length", [8, 72])
def test_bits_q6_parity_random(chip_length):
    spec = spec_for(["scm", "idm", "r900"], chip_length, wb=2)
    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, 2 * spec.total_samples).astype(np.uint8)
    for first in (True, False):
        bj, qj = bits_q6_jnp(spec, jnp.asarray(iq), jnp.asarray(first))
        bp, qp = bits_q6_pallas(spec, jnp.asarray(iq), jnp.asarray(first))
        np.testing.assert_array_equal(np.asarray(bj), np.asarray(bp))
        np.testing.assert_array_equal(np.asarray(qj), np.asarray(qp))


def test_bits_q6_parity_packet():
    spec = spec_for(["scm", "r900"], 8, wb=8)
    bits = synth.make_scm_bits(meter_id=777, consumption=1)
    iq = synth.render_iq(
        spec.total_samples,
        [synth.bits_to_burst(bits, spec.halo + 100)],
        8,
        noise=2.0,
        seed=4,
    )
    bj, qj = bits_q6_jnp(spec, jnp.asarray(iq), jnp.asarray(False))
    bp, qp = bits_q6_pallas(spec, jnp.asarray(iq), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(bj), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(qj), np.asarray(qp))


def test_pallas_backend_pipeline_end_to_end(sample_bin):
    """Full pipeline with backend='pallas' matches the oracle's messages."""
    from rtlamr_tpu.decoder import WindowDecoder
    from rtlamr_tpu.ref import ReferenceDecoder

    parsers = [new_parser("scm", 78)]
    dec = WindowDecoder(parsers, window_blocks=16)
    dec.spec = make_frontend_spec(dec.cfg, 16, 256, backend="pallas")
    got = [(b, str(m)) for b, m in dec.decode_capture(sample_bin)]
    want = [
        (b, str(m))
        for b, m in ReferenceDecoder(
            [new_parser("scm", 78)], arithmetic="int"
        ).decode_capture(sample_bin)
    ]
    assert got == want
    assert len(got) == 14
