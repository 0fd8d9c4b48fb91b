"""Output-surface conformance: production encoders vs committed fixtures.

The fixtures in ``fixtures/golden_output/`` were derived independently from
the Go encoder semantics (see DERIVATION.md there for the per-field
citations) by ``tools/scratch/gen_golden_output.py``, which does NOT import
the production encoders — so this test is a genuine two-implementation
cross-check, not a self-comparison. Any encoder change that alters a byte
of the rendered plain/CSV/JSON/XML output fails here.
"""

import datetime
import io
import pathlib

import pytest

from rtlamr_tpu.cli.encoders import LogMessage, make_encoder
from rtlamr_tpu.protocols.idm import IDM
from rtlamr_tpu.protocols.netidm import NetIDM
from rtlamr_tpu.protocols.r900 import R900
from rtlamr_tpu.protocols.r900bcd import R900BCD
from rtlamr_tpu.protocols.scm import SCM
from rtlamr_tpu.protocols.scmplus import SCMPlus

GOLDEN = pathlib.Path(__file__).parent / "fixtures" / "golden_output"

# The fixed envelope the fixtures were generated for.
TIME = datetime.datetime(2020, 7, 14, 12, 34, 56, 789012)
OFFSET = 1234
LENGTH = 49152

MESSAGES = {
    "scm": SCM(
        ID=17580293,
        Type=8,
        TamperPhy=2,
        TamperEnc=1,
        Consumption=111414,
        ChecksumVal=0xD19E,
    ),
    "scmplus": SCMPlus(
        FrameSync=0x16A3,
        ProtocolID=0x1E,
        EndpointType=0xAB,
        EndpointID=40404040,
        Consumption=12345678,
        Tamper=0x0102,
        PacketCRC=0xBEEF,
    ),
    "idm": IDM(
        Preamble=0x555516A3,
        PacketTypeID=0x1C,
        PacketLength=0x5C,
        HammingCode=0xC6,
        ApplicationVersion=0x04,
        ERTType=0x07,
        ERTSerialNumber=123456789,
        ConsumptionIntervalCount=42,
        ModuleProgrammingState=0x9F,
        TamperCounters=b"ABC123",
        AsynchronousCounters=0x0203,
        PowerOutageFlags=b"XYZ789",
        LastConsumptionCount=9876543,
        DifferentialConsumptionIntervals=tuple(range(1, 48)),
        TransmitTimeOffset=1234,
        SerialNumberCRC=0xCAFE,
        PacketCRC=0xF00D,
    ),
    "netidm": NetIDM(
        Preamble=0x555516A3,
        ProtocolID=0x1C,
        PacketLength=0x5C,
        HammingCode=0xC6,
        ApplicationVersion=0x04,
        ERTType=0x07,
        ERTSerialNumber=987654321,
        ConsumptionIntervalCount=11,
        ProgrammingState=0x9F,
        LastGeneration=112233,
        LastConsumption=445566,
        LastConsumptionNet=778899,
        DifferentialConsumptionIntervals=tuple(range(100, 127)),
        TransmitTimeOffset=777,
        SerialNumberCRC=0x1234,
        PacketCRC=0x5678,
    ),
    "r900": R900(
        ID=1550406067,
        Unkn1=0xA3,
        NoUse=9,
        BackFlow=1,
        Consumption=1234567,
        Unkn3=0x02,
        Leak=3,
        LeakNow=2,
    ),
    "r900bcd": R900BCD(
        ID=1550406067,
        Unkn1=0xA3,
        NoUse=9,
        BackFlow=1,
        Consumption=123456,  # BCD-decoded from raw 0x123456
        Unkn3=0x02,
        Leak=3,
        LeakNow=2,
    ),
}

FORMATS = ["plain", "csv", "json", "xml"]


@pytest.mark.parametrize("proto", sorted(MESSAGES))
@pytest.mark.parametrize("fmt", FORMATS)
def test_encoder_matches_golden(proto, fmt):
    want = (GOLDEN / f"{proto}.{fmt}.txt").read_text()
    out = io.StringIO()
    # plain fixtures use the -samplefile form (Offset/Length printed,
    # flags.go:261-272) — pass a non-devnull sample filename.
    enc = make_encoder(fmt, out, sample_filename="dump.bin")
    enc.encode(LogMessage(time=TIME, offset=OFFSET, length=LENGTH, msg=MESSAGES[proto]))
    assert out.getvalue() == want


def test_xml_escape_bytes_go_parity():
    """Go xml.EscapeText semantics over raw []byte chardata.

    Ground truth is the stdlib pair encoding/xml.EscapeText (entity table +
    isInCharacterRange + U+FFFD substitution) and unicode/utf8.DecodeRune
    (one byte consumed per invalid sequence). Real IDM TamperCounters /
    PowerOutageFlags are arbitrary bytes, so these paths all occur live.
    """
    from rtlamr_tpu.cli.encoders import _xml_escape_bytes

    R = "�"
    cases = [
        (b"ABC123", "ABC123"),  # printable ASCII unchanged
        (b"a&b<c>d\"e'f", "a&amp;b&lt;c&gt;d&#34;e&#39;f"),  # entity table
        (b"\t\n\r", "&#x9;&#xA;&#xD;"),  # whitespace NCR forms
        (b"\x00\x08\x0b\x0c\x0e\x1f", R * 6),  # C0 controls out of range
        (b"\x7f", "\x7f"),  # DEL is inside the XML Char range
        (b"\x80\xbf\xc0\xc1\xf5\xff", R * 6),  # never-valid UTF-8 bytes
        (b"\xc3\xa9", "\xe9"),  # valid 2-byte rune passes
        (b"\xe2\x82\xac", "€"),  # valid 3-byte rune passes
        (b"\xf0\x9f\x98\x80", "\U0001f600"),  # valid 4-byte rune passes
        (b"\xe0\xa0", R * 2),  # truncated: Go consumes 1 byte per error
        (b"\xed\xa0\x80", R * 3),  # surrogate encoding: each byte an error
        (b"\xef\xbf\xbd", R),  # genuinely-encoded U+FFFD passes as itself
        (b"\xef\xb7\x90", "﷐"),  # U+FDD0: inside 0x20..0xD7FF, passes
    ]
    for raw, want in cases:
        assert _xml_escape_bytes(raw) == want, raw

    # U+FFFE/U+FFFF are above 0xFFFD and outside the Char range.
    assert _xml_escape_bytes("￿".encode()) == R


def test_xml_encoder_raw_tamper_bytes():
    """End-to-end: IDM XML with control/invalid tamper bytes is valid XML."""
    import xml.etree.ElementTree as ET

    msg = IDM(
        Preamble=0x555516A3,
        PacketTypeID=0x1C,
        PacketLength=0x5C,
        HammingCode=0xC6,
        ApplicationVersion=0x04,
        ERTType=0x07,
        ERTSerialNumber=123456789,
        ConsumptionIntervalCount=42,
        ModuleProgrammingState=0x9F,
        TamperCounters=b"\x00\x01\xffA&",
        AsynchronousCounters=0x0203,
        PowerOutageFlags=b"\x80<ok>\x1f",
        LastConsumptionCount=9876543,
        DifferentialConsumptionIntervals=tuple(range(1, 48)),
        TransmitTimeOffset=1234,
        SerialNumberCRC=0xCAFE,
        PacketCRC=0xF00D,
    )
    out = io.StringIO()
    enc = make_encoder("xml", out)
    enc.encode(LogMessage(time=TIME, offset=OFFSET, length=LENGTH, msg=msg))
    rendered = out.getvalue()
    root = ET.fromstring(rendered)  # must parse as XML
    R = "�"
    assert root.find("Message/TamperCounters").text == R * 2 + R + "A&"
    assert root.find("Message/PowerOutageFlags").text == R + "<ok>" + R


def test_plain_no_samplefile_drops_offset():
    """StringNoOffset form (parse.go:119-121) when no -samplefile is set."""
    out = io.StringIO()
    enc = make_encoder("plain", out)
    enc.encode(
        LogMessage(time=TIME, offset=OFFSET, length=LENGTH, msg=MESSAGES["scm"])
    )
    want = (GOLDEN / "scm.plain.txt").read_text()
    assert out.getvalue() == want.replace(f" Offset:{OFFSET} Length:{LENGTH}", "")
