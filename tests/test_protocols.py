"""Protocol-layer unit tests: config merge/derivation rules, registry,
message string/record formats, digest identity (reference parse.go,
decode.go:100-160)."""

import numpy as np
import pytest

from rtlamr_tpu.protocols import (
    build_decoder_config,
    digest,
    new_parser,
    next_power_of_2,
    register_parser,
)
from rtlamr_tpu.protocols.scm import SCM
from rtlamr_tpu.protocols.scmplus import SCMPlus
from rtlamr_tpu.protocols.r900 import R900
from rtlamr_tpu.protocols.r900bcd import bcd_consumption


def test_config_derivation_scm_72():
    """Default SCM run derived sizes (SURVEY.md §3.3)."""
    cfg = build_decoder_config([new_parser("scm", 72)])
    assert cfg.symbol_length == 144
    assert cfg.sample_rate == 2359296
    assert cfg.preamble_length == 3024
    assert cfg.block_size == 4096
    assert cfg.block_size2 == 8192
    assert cfg.packet_length == 13824
    assert cfg.buffer_length == 17920


def test_config_merge_all():
    """Merged config with scm+idm+r900 (SURVEY.md §3.3)."""
    parsers = [new_parser(n, 72) for n in ("scm", "scm+", "idm", "r900")]
    cfg = build_decoder_config(parsers)
    assert cfg.preamble_symbols == 32
    assert cfg.packet_symbols == 736
    assert cfg.block_size == 8192
    assert cfg.packet_length == 105984
    assert cfg.buffer_length == 114176
    # center freq: last writer wins (decode.go:105)
    assert cfg.center_freq == 912380000  # r900 registered last


def test_idm_netidm_share_preamble_group():
    parsers = [new_parser(n, 72) for n in ("idm", "netidm")]
    cfg = build_decoder_config(parsers)
    assert len(cfg.preamble_groups) == 1
    assert len(next(iter(cfg.preamble_groups.values()))) == 2


def test_next_power_of_2():
    assert next_power_of_2(3024) == 4096
    assert next_power_of_2(4096) == 4096
    assert next_power_of_2(4097) == 8192


def test_registry_duplicate_rejected():
    with pytest.raises(ValueError):
        register_parser("scm", lambda cl: None)


def test_scm_string_format():
    m = SCM(ID=12345678, Type=7, TamperPhy=2, TamperEnc=1,
            Consumption=424242, ChecksumVal=0xBEEF)
    assert str(m) == (
        "{ID:12345678 Type: 7 Tamper:{Phy:02 Enc:01} "
        "Consumption:  424242 CRC:0xBEEF}"
    )
    assert m.record() == [
        "12345678", "7", "0x2", "0x1", "424242", "0xbeef",
    ]
    assert m.checksum() == b"\xbe\xef"


def test_scmplus_string_format():
    m = SCMPlus(FrameSync=0x16A3, ProtocolID=0x1E, EndpointType=0x9C,
                EndpointID=55443322, Consumption=123456, Tamper=0x0102,
                PacketCRC=0xABCD)
    assert str(m) == (
        "{ProtocolID:0x1E EndpointType:0x9C EndpointID:  55443322 "
        "Consumption:    123456 Tamper:0x0102 PacketCRC:0xABCD}"
    )
    assert m.meter_id() == 55443322
    assert m.meter_type() == 0x9C


def test_r900_string_format():
    m = R900(ID=1234567890, Unkn1=0x1C, NoUse=5, BackFlow=1,
             Consumption=424242, Unkn3=2, Leak=3, LeakNow=1,
             checksum_symbols=b"\x01\x02\x03\x04\x05")
    assert str(m) == (
        "{ID:1234567890 Unkn1:0x1C NoUse: 5 BackFlow:1 "
        "Consumption:  424242 Unkn3:0x02 Leak: 3 LeakNow:1}"
    )
    assert m.checksum() == b"\x01\x02\x03\x04\x05"
    assert m.meter_type() == 0x1C  # R900 MeterType is Unkn1 (r900.go:270)


def test_digest_identity():
    a = SCM(ID=1, Type=2, TamperPhy=0, TamperEnc=0, Consumption=3,
            ChecksumVal=4)
    b = SCM(ID=1, Type=2, TamperPhy=3, TamperEnc=1, Consumption=9,
            ChecksumVal=4)
    # digest is (msgtype, metertype, meterid, checksum) — parse.go:87-101
    assert digest(a) == digest(b)


def test_bcd_consumption():
    assert bcd_consumption(0x123456) == 123456
    assert bcd_consumption(0x1A2B) == 0  # non-decimal hex digits -> 0
    assert bcd_consumption(0) == 0
    assert bcd_consumption(0x99999999) == 99999999


def test_r900bcd_msgtype():
    p = new_parser("r900bcd", 72)
    assert p.cfg.protocol == "r900bcd"
    assert p.wants_r900_symbols
