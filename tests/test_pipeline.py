"""TPU window-pipeline conformance: the jitted whole-stream frontend +
host parsing must reproduce the NumPy oracle's message sets (SURVEY.md §7.4:
minimum end-to-end slice is SCM on sample.bin, bit-exact, 1 chip)."""

import numpy as np
import pytest

from rtlamr_tpu.decoder import WindowDecoder
from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.ref import ReferenceDecoder, synth


def parsers_for(names, chip_length=72):
    return [new_parser(n, chip_length) for n in names]


def oracle_msgs(names, iq, chip_length=72):
    dec = ReferenceDecoder(parsers_for(names, chip_length), arithmetic="int")
    return [(b, str(m)) for b, m in dec.decode_capture(iq)]


def tpu_msgs(names, iq, chip_length=72, **kw):
    dec = WindowDecoder(parsers_for(names, chip_length), **kw)
    return [(b, str(m)) for b, m in dec.decode_capture(iq)]


def test_sample_bin_matches_oracle(sample_bin):
    got = tpu_msgs(["scm"], sample_bin, chip_length=78, window_blocks=16)
    want = oracle_msgs(["scm"], sample_bin, chip_length=78)
    assert got == want
    assert len(got) == 14


def test_sample_bin_window_size_invariance(sample_bin):
    want = oracle_msgs(["scm"], sample_bin, chip_length=78)
    for wb in (1, 4, 32, 128):
        got = tpu_msgs(["scm"], sample_bin, chip_length=78, window_blocks=wb)
        assert got == want, f"window_blocks={wb}"


def synth_capture(names, chip_length=72, noise=3.0):
    """A multi-protocol capture with bursts spread over many blocks."""
    parsers = parsers_for(names, chip_length)
    from rtlamr_tpu.protocols.base import build_decoder_config

    cfg = build_decoder_config(parsers)
    gap = cfg.packet_length + 3 * cfg.block_size
    bursts = []
    offset = cfg.block_size // 2
    specs = []
    for i in range(6):
        kind = names[i % len(names)]
        if kind == "scm":
            bits = synth.make_scm_bits(meter_id=100000 + i, consumption=i * 7)
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "scm+":
            bits = synth.make_scmplus_bits(endpoint_id=200000 + i, consumption=i)
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "idm":
            bits = synth.make_idm_bits(serial=300000 + i)
            bursts.append(synth.bits_to_burst(bits, offset))
        elif kind == "netidm":
            bits = synth.make_netidm_bits(serial=400000 + i)
            bursts.append(synth.bits_to_burst(bits, offset))
        else:
            digits = synth.make_r900_symbols(meter_id=500000 + i, consumption=i)
            bursts.append(synth.r900_burst(digits, offset))
        offset += gap
    total = ((offset + cfg.packet_length) // cfg.block_size + 2) * cfg.block_size
    return synth.render_iq(total, bursts, chip_length, noise=noise, seed=11)


@pytest.mark.parametrize(
    "names",
    [
        ["scm"],
        ["scm+"],
        ["idm", "netidm"],
        ["r900", "r900bcd"],
        ["scm", "scm+", "idm", "r900"],
    ],
)
def test_synthetic_matches_oracle(names):
    iq = synth_capture(names)
    got = tpu_msgs(names, iq, window_blocks=8)
    want = oracle_msgs(names, iq)
    assert got == want
    assert len(want) > 0


def test_block_boundary_packet_once():
    """A packet straddling a window boundary is decoded exactly once
    (overlap-save halo + digest dedup)."""
    names = ["scm"]
    parsers = parsers_for(names)
    from rtlamr_tpu.protocols.base import build_decoder_config

    cfg = build_decoder_config(parsers)
    wb = 4
    window_samples = wb * cfg.block_size
    # Packet centered exactly on the first window boundary.
    bits = synth.make_scm_bits(meter_id=777777, consumption=99)
    offset = window_samples - cfg.packet_length // 2
    total = 3 * window_samples
    iq = synth.render_iq(total, [synth.bits_to_burst(bits, offset)], 72)
    got = tpu_msgs(names, iq, window_blocks=wb)
    assert len(got) == 1
    want = oracle_msgs(names, iq)
    assert got == want


def test_streaming_feed_matches_capture(sample_bin):
    parsers = parsers_for(["scm"], 78)
    dec = WindowDecoder(parsers, window_blocks=8)
    dec.reset()
    out = []
    # Feed in uneven chunks.
    rng = np.random.default_rng(0)
    pos = 0
    while pos < sample_bin.size:
        n = int(rng.integers(1000, 50000))
        out.extend(dec.feed(sample_bin[pos : pos + n]))
        pos += n
    out.extend(dec.flush())
    got = [(b, str(m)) for b, m in out]
    want = oracle_msgs(["scm"], sample_bin, chip_length=78)
    assert got == want


def test_overflow_fallback_path():
    """More hits than max_hits triggers the exact NumPy fallback."""
    iq = synth_capture(["scm"], noise=0.0)
    got = tpu_msgs(["scm"], iq, window_blocks=8, max_hits=4)
    want = oracle_msgs(["scm"], iq)
    assert got == want


def test_staged_batch_matches_sequential(sample_bin):
    """decode_staged_batch (one scan program per K windows) produces exactly
    the per-window decode_staged stream, including dedup across windows."""
    import jax
    import jax.numpy as jnp

    from rtlamr_tpu.ops.frontend import staged_geometry

    parsers = parsers_for(["scm"], 78)
    dec = WindowDecoder(parsers, window_blocks=4)
    spec = dec.spec
    geo = staged_geometry(spec)
    w = spec.window
    k = 4
    full = np.zeros((k - 1) * w + geo.staged_samples, np.uint16)
    u16 = sample_bin[: 2 * (spec.halo + k * w)].view(np.uint16)
    full[spec.pad_shift : spec.pad_shift + u16.size] = u16
    batch = np.stack([full[i * w : i * w + geo.staged_samples] for i in range(k)])
    batch_dev = jnp.asarray(batch)

    dec.reset()
    dec._first = False
    got_batch = [
        (b, str(m)) for b, m in dec.decode_staged_batch(batch_dev)
    ]

    dec.reset()
    dec._first = False
    got_seq = [
        (b, str(m))
        for b, m in dec.decode_staged([batch_dev[i] for i in range(k)])
    ]
    assert got_batch == got_seq
    assert got_batch  # the golden capture yields messages in these windows
