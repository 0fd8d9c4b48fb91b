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


def _assert_requant_parity(got, want):
    """Equal up to XLA FMA contraction: compilers may fuse a*b+c at higher
    internal precision (notably with --xla_allow_excess_precision), so two
    separately compiled f32 chains can differ by 1 ulp exactly at a
    requantize .5 boundary -> +-1 u8 LSB on a vanishing fraction of
    samples. Require <=0.01% mismatches, every one within +-1 LSB per
    byte."""
    import numpy as np

    got, want = np.asarray(got), np.asarray(want)
    mism = got != want
    rate = mism.mean()
    assert rate <= 1e-4, f"mismatch rate {rate}"
    if mism.any():
        gi, wi = (got & 255).astype(int), (want & 255).astype(int)
        gq, wq = (got >> 8).astype(int), (want >> 8).astype(int)
        assert np.abs(gi - wi).max() <= 1
        assert np.abs(gq - wq).max() <= 1


def test_channelizer_fused_kernel_parity():
    """Fused Pallas channelizer (branches+mix+requantize in one pass)
    reproduces the jnp reference chain element-for-element (up to the FMA
    contraction ulp at .5 rounding boundaries — see _assert_requant_parity)
    on random data, both streaming steps (zero and carried history)."""
    import jax.numpy as jnp
    import numpy as np

    from rtlamr_tpu.ops.channelizer import (
        ChannelizerSpec,
        channelize,
        iq_bytes_to_frames,
        requantize_u16,
    )
    from rtlamr_tpu.ops.pallas_channelizer import channelize_requantize_fused

    spec = ChannelizerSpec(n_channels=12)
    rng = np.random.default_rng(4)
    f = 3 * 512 * 128 + 5 * 128  # multiple tiles + ragged tail
    wb = rng.integers(0, 256, 2 * 12 * f, dtype=np.uint8)
    frames = iq_bytes_to_frames(spec, jnp.asarray(wb))
    hist = jnp.zeros((2, 12, spec.history_frames), jnp.float32)

    want = np.asarray(requantize_u16(channelize(spec, hist, frames)))
    got = np.asarray(channelize_requantize_fused(spec, hist, frames))
    _assert_requant_parity(got, want)

    # Second streaming step with a real carried history tail.
    hist2 = frames[:, :, f - spec.history_frames :]
    wb2 = rng.integers(0, 256, 2 * 12 * f, dtype=np.uint8)
    frames2 = iq_bytes_to_frames(spec, jnp.asarray(wb2))
    want2 = np.asarray(requantize_u16(channelize(spec, hist2, frames2)))
    got2 = np.asarray(channelize_requantize_fused(spec, hist2, frames2))
    _assert_requant_parity(got2, want2)


def test_wideband_pallas_backend_matches_jnp():
    """WidebandDecoder(backend=pallas) — the fused channelizer + Pallas
    decode stencil — produces the identical message stream to backend=jnp
    on a synthetic multi-protocol wideband capture."""
    import numpy as np

    from rtlamr_tpu.parallel.wideband import WidebandDecoder
    from rtlamr_tpu.protocols import new_parser
    from rtlamr_tpu.ref import synth

    parsers = lambda: [new_parser(p, 8) for p in ("scm", "idm", "r900")]
    mk = lambda be: WidebandDecoder(
        parsers(), n_channels=4, window_blocks=24, backend=be
    )
    dec_j = mk("jnp")
    w = dec_j.spec.window
    planted = [
        (0, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=111001, consumption=1), 3000)),
        (1, synth.bits_to_burst(
            synth.make_scm_bits(meter_id=222002, consumption=2),
            w - 700)),
        (2, synth.r900_burst(
            synth.make_r900_symbols(meter_id=333003), 5000)),
        (3, synth.bits_to_burst(
            synth.make_idm_bits(serial=444004), 300)),
    ]
    wb = synth.render_wideband(
        3 * w, planted, 4, 8, amplitude=90.0, noise=2.0, seed=21
    )
    want = [(c, b, str(m)) for c, b, m in dec_j.decode_capture(wb)]
    got = [(c, b, str(m)) for c, b, m in mk("pallas").decode_capture(wb)]
    assert got == want and len(want) >= 4
