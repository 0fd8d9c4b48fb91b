"""One-off generator for tests/fixtures/golden_output/*.

Derives the expected plain/CSV/JSON/XML rendering of one LogMessage per
protocol DIRECTLY from the Go encoder semantics (cited per section below),
deliberately WITHOUT importing rtlamr_tpu's encoders — the committed
fixtures are an independent second implementation, so the production
encoders are tested against them rather than against themselves.

Field-level derivations are documented in
tests/fixtures/golden_output/DERIVATION.md. Re-run only if the fixture
inventory changes: python tools/scratch/gen_golden_output.py
"""

from __future__ import annotations

import base64
import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "golden_output",
)

# Fixed LogMessage envelope: protocol/parse.go:105-111.
# Time format TimeFormat = "2006-01-02T15:04:05.000" (parse.go:13) for plain;
# RFC3339Nano (trailing fraction zeros trimmed) for CSV/JSON/XML.
PLAIN_TIME = "2020-07-14T12:34:56.789"
RFC_TIME = "2020-07-14T12:34:56.789012Z"
OFFSET = 1234
LENGTH = 49152


def plain(msg_type: str, body: str) -> str:
    # LogMessage.String (parse.go:113-117), the -samplefile form.
    return f"{{Time:{PLAIN_TIME} Offset:{OFFSET} Length:{LENGTH} {msg_type}:{body}}}"


def csv_line(record: list) -> str:
    # LogMessage.Record (parse.go:123-129) through csv/csv.go:27-38; no
    # field needs quoting, encoding/csv default LF terminator.
    return ",".join([RFC_TIME, str(OFFSET), str(LENGTH)] + record)


def json_line(msg_type: str, message: dict) -> str:
    # flags.go:147 json.NewEncoder; embedded interface field marshals under
    # its type name "Message" (encoding/json anonymous-interface rule).
    return json.dumps(
        {
            "Time": RFC_TIME,
            "Offset": OFFSET,
            "Length": LENGTH,
            "Type": msg_type,
            "Message": message,
        },
        separators=(",", ":"),
    )


def xml_line(msg_type: str, message_xml: str) -> str:
    # flags.go:149 xml.NewEncoder via NewLineEncoder (flags.go:161-169).
    # LogMessage Time/Offset/Length/Type are xml:",attr" (parse.go:106-109);
    # the embedded Message interface is an anonymous NON-struct field, so it
    # marshals as a child element named "Message".
    return (
        f'<LogMessage Time="{RFC_TIME}" Offset="{OFFSET}" Length="{LENGTH}" '
        f'Type="{msg_type}">{message_xml}</LogMessage>'
    )


def attrs_xml(pairs: list) -> str:
    inner = " ".join(f'{k}="{v}"' for k, v in pairs)
    return f"<Message {inner}></Message>"


def elems_xml(pairs: list) -> str:
    parts = []
    for k, v in pairs:
        if isinstance(v, (list, tuple)):
            parts.extend(f"<{k}>{x}</{k}>" for x in v)
        else:
            parts.append(f"<{k}>{v}</{k}>")
    return f"<Message>{''.join(parts)}</Message>"


FIXTURES = {}

# --- SCM (scm/scm.go) -------------------------------------------------------
ID, TYP, PHY, ENC, CONS, CRC = 17580293, 8, 2, 1, 111414, 0xD19E
FIXTURES["scm"] = {
    # String (scm.go:139-143): {ID:%8d Type:%2d Tamper:{Phy:%02X Enc:%02X}
    # Consumption:%8d CRC:0x%04X}
    "plain": plain(
        "SCM",
        f"{{ID:{ID:8d} Type:{TYP:2d} Tamper:{{Phy:{PHY:02X} Enc:{ENC:02X}}} "
        f"Consumption:{CONS:8d} CRC:0x{CRC:04X}}}",
    ),
    # Record (scm.go:145-153): decimal ID/Type/Consumption, 0x+lowercase-hex
    # tampers and checksum (strconv.FormatUint base 16).
    "csv": csv_line(
        [str(ID), str(TYP), f"0x{PHY:x}", f"0x{ENC:x}", str(CONS), f"0x{CRC:x}"]
    ),
    # struct field order scm.go:94-100; no json tags -> field names.
    "json": json_line(
        "SCM",
        {
            "ID": ID,
            "Type": TYP,
            "TamperPhy": PHY,
            "TamperEnc": ENC,
            "Consumption": CONS,
            "ChecksumVal": CRC,
        },
    ),
    # every field xml:",attr"; ChecksumVal renamed xml:"Checksum,attr"
    # (scm.go:100).
    "xml": xml_line(
        "SCM",
        attrs_xml(
            [
                ("ID", ID),
                ("Type", TYP),
                ("TamperPhy", PHY),
                ("TamperEnc", ENC),
                ("Consumption", CONS),
                ("Checksum", CRC),
            ]
        ),
    ),
}

# --- SCM+ (scmplus/scmplus.go) ---------------------------------------------
FS, PID, ET, EID, CONS, TAMP, CRC = 0x16A3, 0x1E, 0xAB, 40404040, 12345678, 0x0102, 0xBEEF
FIXTURES["scmplus"] = {
    # String (scmplus.go:129-139): FrameSync not printed.
    "plain": plain(
        "SCM+",
        f"{{ProtocolID:0x{PID:02X} EndpointType:0x{ET:02X} "
        f"EndpointID:{EID:10d} Consumption:{CONS:10d} "
        f"Tamper:0x{TAMP:04X} PacketCRC:0x{CRC:04X}}}",
    ),
    # Record (scmplus.go:140-151).
    "csv": csv_line(
        [
            f"0x{FS:x}",
            f"0x{PID:x}",
            f"0x{ET:x}",
            str(EID),
            str(CONS),
            f"0x{TAMP:x}",
            f"0x{CRC:x}",
        ]
    ),
    # struct order scmplus.go:95-102. The PacketCRC tag
    # `xml:"Checksum,attr",json:"Checksum"` is malformed as a Go struct tag
    # (comma between pairs, not a space): reflect.StructTag.Get("json")
    # finds no `json` key, so JSON keeps "PacketCRC"; Get("xml") still
    # resolves, so XML renames to Checksum.
    "json": json_line(
        "SCM+",
        {
            "FrameSync": FS,
            "ProtocolID": PID,
            "EndpointType": ET,
            "EndpointID": EID,
            "Consumption": CONS,
            "Tamper": TAMP,
            "PacketCRC": CRC,
        },
    ),
    "xml": xml_line(
        "SCM+",
        attrs_xml(
            [
                ("FrameSync", FS),
                ("ProtocolID", PID),
                ("EndpointType", ET),
                ("EndpointID", EID),
                ("Consumption", CONS),
                ("Tamper", TAMP),
                ("Checksum", CRC),
            ]
        ),
    ),
}

# --- IDM (idm/idm.go) -------------------------------------------------------
PRE, PTID, PLEN, HAM, AV, ERTT = 0x555516A3, 0x1C, 0x5C, 0xC6, 0x04, 0x07
SER, CIC, MPS = 123456789, 42, 0x9F
TAMPERS = b"ABC123"  # printable so raw-chardata XML is unambiguous
ASYNC = 0x0203
OUTAGE = b"XYZ789"
LCC = 9876543
INTERVALS = list(range(1, 48))  # 47 x 9-bit
TTO, SNCRC, PCRC = 1234, 0xCAFE, 0xF00D
FIXTURES["idm"] = {
    # String (idm.go:177-199): "{" + space-joined "Name:value" fields + "}".
    # %02X on a []byte hex-encodes the bytes uppercase; % 10d space-pads the
    # serial; the [47]uint16 array prints Go-style "[1 2 ... 47]".
    "plain": plain(
        "IDM",
        "{"
        + " ".join(
            [
                f"Preamble:0x{PRE:08X}",
                f"PacketTypeID:0x{PTID:02X}",
                f"PacketLength:0x{PLEN:02X}",
                f"HammingCode:0x{HAM:02X}",
                f"ApplicationVersion:0x{AV:02X}",
                f"ERTType:0x{ERTT:02X}",
                f"ERTSerialNumber:{SER: 10d}",
                f"ConsumptionIntervalCount:{CIC}",
                f"ModuleProgrammingState:0x{MPS:02X}",
                f"TamperCounters:{TAMPERS.hex().upper()}",
                f"AsynchronousCounters:0x{ASYNC:02X}",
                f"PowerOutageFlags:{OUTAGE.hex().upper()}",
                f"LastConsumptionCount:{LCC}",
                "DifferentialConsumptionIntervals:["
                + " ".join(str(v) for v in INTERVALS)
                + "]",
                f"TransmitTimeOffset:{TTO}",
                f"SerialNumberCRC:0x{SNCRC:04X}",
                f"PacketCRC:0x{PCRC:04X}",
            ]
        )
        + "}",
    ),
    # Record (idm.go:201-221): Interval.Record flattens to 47 decimal fields.
    "csv": csv_line(
        [
            f"0x{PRE:08X}",
            f"0x{PTID:02X}",
            f"0x{PLEN:02X}",
            f"0x{HAM:02X}",
            f"0x{AV:02X}",
            f"0x{ERTT:02X}",
            str(SER),
            str(CIC),
            f"0x{MPS:02X}",
            TAMPERS.hex().upper(),
            f"0x{ASYNC:02X}",
            OUTAGE.hex().upper(),
            str(LCC),
        ]
        + [str(v) for v in INTERVALS]
        + [str(TTO), f"0x{SNCRC:04X}", f"0x{PCRC:04X}"]
    ),
    # struct order idm.go:101-119; []byte fields marshal as base64 strings
    # (encoding/json), the [47]uint16 array as a number array.
    "json": json_line(
        "IDM",
        {
            "Preamble": PRE,
            "PacketTypeID": PTID,
            "PacketLength": PLEN,
            "HammingCode": HAM,
            "ApplicationVersion": AV,
            "ERTType": ERTT,
            "ERTSerialNumber": SER,
            "ConsumptionIntervalCount": CIC,
            "ModuleProgrammingState": MPS,
            "TamperCounters": base64.b64encode(TAMPERS).decode(),
            "AsynchronousCounters": ASYNC,
            "PowerOutageFlags": base64.b64encode(OUTAGE).decode(),
            "LastConsumptionCount": LCC,
            "DifferentialConsumptionIntervals": INTERVALS,
            "TransmitTimeOffset": TTO,
            "SerialNumberCRC": SNCRC,
            "PacketCRC": PCRC,
        },
    ),
    # The IDM struct carries no xml tags (idm.go:101-119): every field
    # marshals as a child element; []byte as raw character data
    # (encoding/xml marshalSimple); the array repeats its element name.
    "xml": xml_line(
        "IDM",
        elems_xml(
            [
                ("Preamble", PRE),
                ("PacketTypeID", PTID),
                ("PacketLength", PLEN),
                ("HammingCode", HAM),
                ("ApplicationVersion", AV),
                ("ERTType", ERTT),
                ("ERTSerialNumber", SER),
                ("ConsumptionIntervalCount", CIC),
                ("ModuleProgrammingState", MPS),
                ("TamperCounters", TAMPERS.decode()),
                ("AsynchronousCounters", ASYNC),
                ("PowerOutageFlags", OUTAGE.decode()),
                ("LastConsumptionCount", LCC),
                ("DifferentialConsumptionIntervals", INTERVALS),
                ("TransmitTimeOffset", TTO),
                ("SerialNumberCRC", SNCRC),
                ("PacketCRC", PCRC),
            ]
        ),
    ),
}

# --- NetIDM (netidm/netidm.go) ---------------------------------------------
PRE, PID, PLEN, HAM, AV, ERTT = 0x555516A3, 0x1C, 0x5C, 0xC6, 0x04, 0x07
SER, CIC, PS = 987654321, 11, 0x9F
LGEN, LCONS, LNET = 112233, 445566, 778899
NINTERVALS = list(range(100, 127))  # 27 x 14-bit
TTO, SNCRC, PCRC = 777, 0x1234, 0x5678
FIXTURES["netidm"] = {
    # String (netidm.go:190-211); same shape as IDM with the NetIDM interior
    # (LastGeneration before LastConsumption, netidm.go:202-204).
    "plain": plain(
        "NetIDM",
        "{"
        + " ".join(
            [
                f"Preamble:0x{PRE:08X}",
                f"ProtocolID:0x{PID:02X}",
                f"PacketLength:0x{PLEN:02X}",
                f"HammingCode:0x{HAM:02X}",
                f"ApplicationVersion:0x{AV:02X}",
                f"ERTType:0x{ERTT:02X}",
                f"ERTSerialNumber:{SER: 10d}",
                f"ConsumptionIntervalCount:{CIC}",
                f"ProgrammingState:0x{PS:02X}",
                f"LastGeneration:{LGEN}",
                f"LastConsumption:{LCONS}",
                f"LastConsumptionNet:{LNET}",
                "DifferentialConsumptionIntervals:["
                + " ".join(str(v) for v in NINTERVALS)
                + "]",
                f"TransmitTimeOffset:{TTO}",
                f"SerialNumberCRC:0x{SNCRC:04X}",
                f"PacketCRC:0x{PCRC:04X}",
            ]
        )
        + "}",
    ),
    # Record (netidm.go:213-231).
    "csv": csv_line(
        [
            f"0x{PRE:08X}",
            f"0x{PID:02X}",
            f"0x{PLEN:02X}",
            f"0x{HAM:02X}",
            f"0x{AV:02X}",
            f"0x{ERTT:02X}",
            str(SER),
            str(CIC),
            f"0x{PS:02X}",
            str(LGEN),
            str(LCONS),
            str(LNET),
        ]
        + [str(v) for v in NINTERVALS]
        + [str(TTO), f"0x{SNCRC:04X}", f"0x{PCRC:04X}"]
    ),
    # struct order netidm.go:114-131.
    "json": json_line(
        "NetIDM",
        {
            "Preamble": PRE,
            "ProtocolID": PID,
            "PacketLength": PLEN,
            "HammingCode": HAM,
            "ApplicationVersion": AV,
            "ERTType": ERTT,
            "ERTSerialNumber": SER,
            "ConsumptionIntervalCount": CIC,
            "ProgrammingState": PS,
            "LastGeneration": LGEN,
            "LastConsumption": LCONS,
            "LastConsumptionNet": LNET,
            "DifferentialConsumptionIntervals": NINTERVALS,
            "TransmitTimeOffset": TTO,
            "SerialNumberCRC": SNCRC,
            "PacketCRC": PCRC,
        },
    ),
    # Untagged struct -> child elements (netidm.go:114-131).
    "xml": xml_line(
        "NetIDM",
        elems_xml(
            [
                ("Preamble", PRE),
                ("ProtocolID", PID),
                ("PacketLength", PLEN),
                ("HammingCode", HAM),
                ("ApplicationVersion", AV),
                ("ERTType", ERTT),
                ("ERTSerialNumber", SER),
                ("ConsumptionIntervalCount", CIC),
                ("ProgrammingState", PS),
                ("LastGeneration", LGEN),
                ("LastConsumption", LCONS),
                ("LastConsumptionNet", LNET),
                ("DifferentialConsumptionIntervals", NINTERVALS),
                ("TransmitTimeOffset", TTO),
                ("SerialNumberCRC", SNCRC),
                ("PacketCRC", PCRC),
            ]
        ),
    ),
}

# --- R900 / R900BCD (r900/r900.go, r900bcd/r900bcd.go) ---------------------
RID, U1, NOUSE, BF, CONS, U3, LEAK, LNOW = 1550406067, 0xA3, 9, 1, 1234567, 0x02, 3, 2


def r900_fix(msg_type: str, consumption: int) -> dict:
    return {
        # String (r900.go:278-290).
        "plain": plain(
            msg_type,
            f"{{ID:{RID:10d} Unkn1:0x{U1:02X} NoUse:{NOUSE:2d} "
            f"BackFlow:{BF:1d} Consumption:{consumption:8d} "
            f"Unkn3:0x{U3:02X} Leak:{LEAK:2d} LeakNow:{LNOW:1d}}}",
        ),
        # Record (r900.go:292-302): all decimal.
        "csv": csv_line(
            [
                str(RID),
                str(U1),
                str(NOUSE),
                str(BF),
                str(consumption),
                str(U3),
                str(LEAK),
                str(LNOW),
            ]
        ),
        # struct order r900.go:250-258; the unexported checksum field is not
        # marshaled. R900BCD embeds the R900 STRUCT (r900bcd.go:40-42), so
        # its fields are promoted/flattened in both JSON and XML.
        "json": json_line(
            msg_type,
            {
                "ID": RID,
                "Unkn1": U1,
                "NoUse": NOUSE,
                "BackFlow": BF,
                "Consumption": consumption,
                "Unkn3": U3,
                "Leak": LEAK,
                "LeakNow": LNOW,
            },
        ),
        # every exported field xml:",attr" (r900.go:251-258).
        "xml": xml_line(
            msg_type,
            attrs_xml(
                [
                    ("ID", RID),
                    ("Unkn1", U1),
                    ("NoUse", NOUSE),
                    ("BackFlow", BF),
                    ("Consumption", consumption),
                    ("Unkn3", U3),
                    ("Leak", LEAK),
                    ("LeakNow", LNOW),
                ]
            ),
        ),
    }


FIXTURES["r900"] = r900_fix("R900", CONS)
# BCD reinterpretation (r900bcd.go:62-66): hex-format 0x{789012:x} = "c0a94"
# has hex letters -> ParseUint(..., 10, 32) errors -> 0 is kept. Use a
# consumption whose hex digits are all decimal: 0x12D687 -> hex "12d687" has
# a letter too; pick raw 0x00123456 = 1193046 whose hex string "123456"
# parses to decimal 123456.
FIXTURES["r900bcd"] = r900_fix("R900BCD", 123456)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for proto, fmts in FIXTURES.items():
        for fmt, line in fmts.items():
            path = os.path.join(OUT, f"{proto}.{fmt}.txt")
            with open(path, "w") as f:
                f.write(line + "\n")
            print(path)


if __name__ == "__main__":
    main()
