"""R900BCD — R900 with BCD-coded consumption (reference: r900bcd/r900bcd.go).

Wraps the R900 parser and reinterprets Consumption as binary-coded decimal:
the value is hex-formatted and re-parsed base-10 (r900bcd/r900bcd.go:62-66).
Go's ParseUint returns 0 on a syntax error (hex digits a-f present), which is
replicated here.
"""

from __future__ import annotations

from dataclasses import dataclass

from .base import Message, register_parser
from .r900 import R900, R900Parser, packet_config as r900_packet_config


def bcd_consumption(consumption: int) -> int:
    """Hex-format then parse base-10; 0 if non-decimal digits appear."""
    hex_str = f"{consumption:x}"
    if not hex_str.isdigit():
        return 0
    return int(hex_str)


@dataclass
class R900BCD(R900):
    _TYPE = "R900BCD"


class R900BCDParser(R900Parser):
    def __init__(self, chip_length: int):
        super().__init__(chip_length)
        cfg = r900_packet_config(chip_length)
        self.cfg = type(cfg)(
            protocol="r900bcd",
            preamble=cfg.preamble,
            data_rate=cfg.data_rate,
            chip_length=cfg.chip_length,
            preamble_symbols=cfg.preamble_symbols,
            packet_symbols=cfg.packet_symbols,
            center_freq=cfg.center_freq,
        )

    def _wrap(self, msg: R900) -> Message:
        return R900BCD(
            ID=msg.ID,
            Unkn1=msg.Unkn1,
            NoUse=msg.NoUse,
            BackFlow=msg.BackFlow,
            Consumption=bcd_consumption(msg.Consumption),
            Unkn3=msg.Unkn3,
            Leak=msg.Leak,
            LeakNow=msg.LeakNow,
            checksum_symbols=msg.checksum_symbols,
        )


register_parser("r900bcd", R900BCDParser)
