"""Oracle decoder tests: known-answer synthetic captures for all six
protocols (SURVEY.md §4 item 2) and the golden sample.bin SCM capture."""

import numpy as np
import pytest

from rtlamr_tpu.protocols import new_parser
from rtlamr_tpu.ref.decoder import ReferenceDecoder
from rtlamr_tpu.ref import synth


def build(names, chip_length=72, arithmetic="float32"):
    parsers = [new_parser(n, chip_length) for n in names]
    return ReferenceDecoder(parsers, arithmetic=arithmetic)


def capture_for(dec, bursts, n_blocks=None, noise=0.0):
    cfg = dec.cfg
    if n_blocks is None:
        last = max(b.offset + b.chips.size * cfg.chip_length for b in bursts)
        n_blocks = (last + cfg.packet_length) // cfg.block_size + 2
    total = n_blocks * cfg.block_size
    return synth.render_iq(
        total, bursts, cfg.chip_length, noise=noise, seed=1
    )


@pytest.mark.parametrize("arithmetic", ["float32", "int"])
def test_scm_roundtrip(arithmetic):
    dec = build(["scm"], arithmetic=arithmetic)
    bits = synth.make_scm_bits(
        meter_id=12345678, meter_type=7, tamper_phy=2, tamper_enc=1,
        consumption=424242,
    )
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=10000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    m = msgs[0]
    assert m.msg_type() == "SCM"
    assert m.ID == 12345678
    assert m.Type == 7
    assert m.TamperPhy == 2
    assert m.TamperEnc == 1
    assert m.Consumption == 424242


@pytest.mark.parametrize("chip_length", [8, 32, 72, 96])
def test_scm_all_chip_lengths(chip_length):
    dec = build(["scm"], chip_length=chip_length)
    bits = synth.make_scm_bits(meter_id=987654, consumption=77)
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=5000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    assert msgs[0].ID == 987654
    assert msgs[0].Consumption == 77


def test_scmplus_roundtrip():
    dec = build(["scm+"])
    bits = synth.make_scmplus_bits(
        endpoint_id=55443322, endpoint_type=0x9C, consumption=123456,
        tamper=0x0102,
    )
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=20000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    m = msgs[0]
    assert m.msg_type() == "SCM+"
    assert m.EndpointID == 55443322
    assert m.EndpointType == 0x9C
    assert m.Consumption == 123456
    assert m.Tamper == 0x0102
    assert m.ProtocolID == 0x1E
    assert m.FrameSync == 0x16A3


def test_idm_roundtrip():
    dec = build(["idm"])
    intervals = [(3 * i + 1) % 512 for i in range(47)]
    bits = synth.make_idm_bits(
        serial=1550000123, ert_type=7, consumption=99999,
        interval_count=42, intervals=intervals,
    )
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=30000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    m = msgs[0]
    assert m.msg_type() == "IDM"
    assert m.ERTSerialNumber == 1550000123
    assert m.ERTType == 7
    assert m.LastConsumptionCount == 99999
    assert m.ConsumptionIntervalCount == 42
    assert list(m.DifferentialConsumptionIntervals) == intervals
    assert m.Preamble == 0x555516A3


def test_netidm_roundtrip():
    dec = build(["netidm"])
    bits = synth.make_netidm_bits(
        serial=987001234, ert_type=8, last_consumption=111222,
        last_generation=333444, last_consumption_net=555666,
    )
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=12000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    m = msgs[0]
    assert m.msg_type() == "NetIDM"
    assert m.ERTSerialNumber == 987001234
    assert m.LastConsumption == 111222
    assert m.LastGeneration == 333444
    assert m.LastConsumptionNet == 555666


@pytest.mark.parametrize("arithmetic", ["float32", "int"])
def test_r900_roundtrip(arithmetic):
    dec = build(["r900"], arithmetic=arithmetic)
    digits = synth.make_r900_symbols(
        meter_id=1234567890, unkn1=0x1C, consumption=424242, leak=3,
    )
    iq = capture_for(dec, [synth.r900_burst(digits, offset=15000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    m = msgs[0]
    assert m.msg_type() == "R900"
    assert m.ID == 1234567890
    assert m.Unkn1 == 0x1C
    assert m.Consumption == 424242
    assert m.Leak == 3


def test_r900bcd_roundtrip():
    dec = build(["r900bcd"])
    # consumption 0x123456 -> BCD 123456
    digits = synth.make_r900_symbols(meter_id=1234567890, consumption=0x123456)
    iq = capture_for(dec, [synth.r900_burst(digits, offset=15000)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    assert msgs[0].msg_type() == "R900BCD"
    assert msgs[0].Consumption == 123456


def test_all_protocols_together():
    dec = build(["scm", "scm+", "idm", "r900"])
    cfg = dec.cfg
    gap = cfg.packet_length + cfg.block_size
    bursts = [
        synth.bits_to_burst(synth.make_scm_bits(meter_id=111111), offset=gap),
        synth.bits_to_burst(
            synth.make_scmplus_bits(endpoint_id=222222), offset=2 * gap
        ),
        synth.bits_to_burst(synth.make_idm_bits(serial=333333), offset=3 * gap),
        synth.r900_burst(
            synth.make_r900_symbols(meter_id=1222333444), offset=4 * gap
        ),
    ]
    iq = capture_for(dec, bursts)
    msgs = [m for _, m in dec.decode_capture(iq)]
    types = sorted(m.msg_type() for m in msgs)
    assert types == ["IDM", "R900", "SCM", "SCM+"]


def test_block_straddling_packet_deduped():
    """A packet crossing a block boundary is decoded once (digest dedup,
    main.go:252-260)."""
    dec = build(["scm"])
    cfg = dec.cfg
    # Put the packet right on the first block boundary.
    offset = cfg.block_size - cfg.preamble_length // 2
    bits = synth.make_scm_bits(meter_id=424242, consumption=1)
    iq = capture_for(dec, [synth.bits_to_burst(bits, offset=offset)])
    msgs = [m for _, m in dec.decode_capture(iq)]
    assert len(msgs) == 1
    assert msgs[0].ID == 424242


def test_noise_only_capture_empty():
    dec = build(["scm", "scm+", "idm", "r900"])
    iq = synth.render_iq(
        dec.cfg.block_size * 4, [], dec.cfg.chip_length, noise=20.0, seed=3
    )
    assert dec.decode_capture(iq) == []


# The golden capture was recorded at chip length 78 (the doc figure scripts
# use a 78-sample filter kernel, reference assets/quantize.py:11); at that
# rate it contains 14 decodable SCM messages.
SAMPLE_BIN_CHIP_LENGTH = 78
SAMPLE_BIN_GOLDEN = [
    (4, 17580293, 111414),
    (8, 17578504, 243171),
    (13, 17479804, 798754),
    (17, 17564085, 102314),
    (23, 17563920, 101614),
    (27, 17565073, 1657255),
    (32, 58418772, 102814),
    (37, 17565099, 101614),
    (41, 17561667, 61799),
    (46, 17569243, 101714),
    (51, 31553606, 7120),
    (55, 17556728, 110714),
    (59, 17556726, 1407059),
    (68, 20240556, 3907400),
]


def test_sample_bin_golden_scm(sample_bin):
    """The reference golden capture decodes to a known SCM message set
    (assets/sample.bin; SURVEY.md §2 C21)."""
    dec = build(["scm"], chip_length=SAMPLE_BIN_CHIP_LENGTH)
    got = [(b, m.ID, m.Consumption) for b, m in dec.decode_capture(sample_bin)]
    assert got == SAMPLE_BIN_GOLDEN


def test_sample_bin_int_matches_float32(sample_bin):
    """Exact-int arithmetic decodes the same message set as the Go-f32
    emulation on the golden capture."""
    msgs_f = [
        (b, str(m))
        for b, m in build(
            ["scm"], chip_length=SAMPLE_BIN_CHIP_LENGTH
        ).decode_capture(sample_bin)
    ]
    msgs_i = [
        (b, str(m))
        for b, m in build(
            ["scm"], chip_length=SAMPLE_BIN_CHIP_LENGTH, arithmetic="int"
        ).decode_capture(sample_bin)
    ]
    assert msgs_f == msgs_i
    assert len(msgs_f) == 14
