"""NetIDM — Net Meter Interval Data Message (reference: netidm/netidm.go).

Shares the IDM preamble and framing (netidm/netidm.go:57-71) and both CRC
checks (:88-98), but the interior differs: LastConsumption / LastGeneration
are 3-byte integers (:144-145), LastConsumptionNet is a u32 (:146), and there
are 27 x 14-bit differential intervals starting at bit 304 (:148-154).
Because the preamble is identical to IDM's, both parsers run over the same
sliced packets (decode.go:124,177-188).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..utils.bits import bitfield
from .base import Candidate, Digest, Message, PacketConfig, register_parser
from .idm import IDMParser, PACKET_BYTES, PACKET_SYMBOLS, PREAMBLE


def packet_config(chip_length: int) -> PacketConfig:
    return PacketConfig(
        protocol="netidm",
        preamble=PREAMBLE,
        data_rate=32768,
        chip_length=chip_length,
        preamble_symbols=32,
        packet_symbols=PACKET_SYMBOLS,
        center_freq=912600155,
    )


@dataclass
class NetIDM(Message):
    Preamble: int
    ProtocolID: int
    PacketLength: int
    HammingCode: int
    ApplicationVersion: int
    ERTType: int
    ERTSerialNumber: int
    ConsumptionIntervalCount: int
    ProgrammingState: int
    LastGeneration: int
    LastConsumption: int
    LastConsumptionNet: int
    DifferentialConsumptionIntervals: tuple  # 27 x 14-bit
    TransmitTimeOffset: int
    SerialNumberCRC: int
    PacketCRC: int

    #: The Go struct is untagged (netidm/netidm.go:114-131), so
    #: encoding/xml marshals every field as a child element of <Message>.
    XML_STYLE = "elements"

    def msg_type(self) -> str:
        return "NetIDM"

    def meter_id(self) -> int:
        return self.ERTSerialNumber

    def meter_type(self) -> int:
        return self.ERTType

    def checksum(self) -> bytes:
        return self.PacketCRC.to_bytes(2, "big")

    def __str__(self) -> str:
        intervals = "[" + " ".join(
            str(v) for v in self.DifferentialConsumptionIntervals
        ) + "]"
        fields = [
            f"Preamble:0x{self.Preamble:08X}",
            f"ProtocolID:0x{self.ProtocolID:02X}",
            f"PacketLength:0x{self.PacketLength:02X}",
            f"HammingCode:0x{self.HammingCode:02X}",
            f"ApplicationVersion:0x{self.ApplicationVersion:02X}",
            f"ERTType:0x{self.ERTType:02X}",
            f"ERTSerialNumber:{self.ERTSerialNumber: 10d}",
            f"ConsumptionIntervalCount:{self.ConsumptionIntervalCount}",
            f"ProgrammingState:0x{self.ProgrammingState:02X}",
            f"LastGeneration:{self.LastGeneration}",
            f"LastConsumption:{self.LastConsumption}",
            f"LastConsumptionNet:{self.LastConsumptionNet}",
            f"DifferentialConsumptionIntervals:{intervals}",
            f"TransmitTimeOffset:{self.TransmitTimeOffset}",
            f"SerialNumberCRC:0x{self.SerialNumberCRC:04X}",
            f"PacketCRC:0x{self.PacketCRC:04X}",
        ]
        return "{" + " ".join(fields) + "}"

    def record(self) -> List[str]:
        r = [
            f"0x{self.Preamble:08X}",
            f"0x{self.ProtocolID:02X}",
            f"0x{self.PacketLength:02X}",
            f"0x{self.HammingCode:02X}",
            f"0x{self.ApplicationVersion:02X}",
            f"0x{self.ERTType:02X}",
            str(self.ERTSerialNumber),
            str(self.ConsumptionIntervalCount),
            f"0x{self.ProgrammingState:02X}",
            str(self.LastGeneration),
            str(self.LastConsumption),
            str(self.LastConsumptionNet),
        ]
        r += [str(v) for v in self.DifferentialConsumptionIntervals]
        r += [
            str(self.TransmitTimeOffset),
            f"0x{self.SerialNumberCRC:04X}",
            f"0x{self.PacketCRC:04X}",
        ]
        return r

    def to_dict(self) -> dict:
        return {
            "Preamble": self.Preamble,
            "ProtocolID": self.ProtocolID,
            "PacketLength": self.PacketLength,
            "HammingCode": self.HammingCode,
            "ApplicationVersion": self.ApplicationVersion,
            "ERTType": self.ERTType,
            "ERTSerialNumber": self.ERTSerialNumber,
            "ConsumptionIntervalCount": self.ConsumptionIntervalCount,
            "ProgrammingState": self.ProgrammingState,
            "LastGeneration": self.LastGeneration,
            "LastConsumption": self.LastConsumption,
            "LastConsumptionNet": self.LastConsumptionNet,
            "DifferentialConsumptionIntervals": list(
                self.DifferentialConsumptionIntervals
            ),
            "TransmitTimeOffset": self.TransmitTimeOffset,
            "SerialNumberCRC": self.SerialNumberCRC,
            "PacketCRC": self.PacketCRC,
        }


def parse_netidm(bits: np.ndarray, data: np.ndarray) -> NetIDM:
    """Extract NetIDM fields (netidm/netidm.go:133-161)."""
    b = bytes(np.asarray(data, dtype=np.uint8)[:PACKET_BYTES])
    from ..utils.bits import bitfields_strided

    intervals = tuple(int(v) for v in bitfields_strided(bits, 304, 14, 27))
    return NetIDM(
        Preamble=int.from_bytes(b[0:4], "big"),
        ProtocolID=b[4],
        PacketLength=b[5],
        HammingCode=b[6],
        ApplicationVersion=b[7],
        ERTType=b[8] & 0x0F,
        ERTSerialNumber=int.from_bytes(b[9:13], "big"),
        ConsumptionIntervalCount=b[13],
        ProgrammingState=b[14],
        LastConsumption=int.from_bytes(b[25:28], "big"),
        LastGeneration=int.from_bytes(b[28:31], "big"),
        LastConsumptionNet=int.from_bytes(b[34:38], "big"),
        DifferentialConsumptionIntervals=intervals,
        TransmitTimeOffset=int.from_bytes(b[86:88], "big"),
        SerialNumberCRC=int.from_bytes(b[88:90], "big"),
        PacketCRC=int.from_bytes(b[90:92], "big"),
    )


class NetIDMParser(IDMParser):
    """Same framing and CRC checks as IDM, different interior."""

    msg_name = "netidm"

    def __init__(self, chip_length: int):
        super().__init__(chip_length)
        self.cfg = packet_config(chip_length)

    def _extract(self, cand: Candidate, data: np.ndarray) -> Message:
        return parse_netidm(cand.bit_array(PACKET_SYMBOLS), data)

    #: 27x14-bit intervals from bit 304 (netidm.go:148-154)
    _INTERVALS = (304, 14, 27)

    def _build_rows(self, rows, d, intervals):
        """Per-row message construction from whole-column Python lists
        (netidm/netidm.go:133-161)."""
        import functools

        be = functools.partial(self._be_cols, d.astype(np.int64))
        pre, sn = be(0, 4), be(9, 13)
        lc, lg, lcn = be(25, 28), be(28, 31), be(34, 38)
        tto, scrc, pcrc = be(86, 88), be(88, 90), be(90, 92)
        pid, plen = d[:, 4].tolist(), d[:, 5].tolist()
        ham, av = d[:, 6].tolist(), d[:, 7].tolist()
        ert = (d[:, 8] & 0x0F).tolist()
        cic, ps = d[:, 13].tolist(), d[:, 14].tolist()
        ivals = intervals.tolist()
        out = {}
        for j, r in enumerate(rows.tolist()):
            m = NetIDM(
                Preamble=pre[j],
                ProtocolID=pid[j],
                PacketLength=plen[j],
                HammingCode=ham[j],
                ApplicationVersion=av[j],
                ERTType=ert[j],
                ERTSerialNumber=sn[j],
                ConsumptionIntervalCount=cic[j],
                ProgrammingState=ps[j],
                LastConsumption=lc[j],
                LastGeneration=lg[j],
                LastConsumptionNet=lcn[j],
                DifferentialConsumptionIntervals=tuple(ivals[j]),
                TransmitTimeOffset=tto[j],
                SerialNumberCRC=scrc[j],
                PacketCRC=pcrc[j],
            )
            m._digest = Digest(
                "NetIDM", ert[j], sn[j], pcrc[j].to_bytes(2, "big")
            )
            out[r] = m
        return out


register_parser("netidm", NetIDMParser)
