"""Output encoders and LogMessage (reference: flags.go:141-170,261-272,
protocol/parse.go:105-129, csv/csv.go).

The reference wraps every emitted message in a LogMessage carrying the
timestamp, the sample-dump offset/length and the message type, then encodes
as plain text, CSV, JSON, or XML.
"""

from __future__ import annotations

import datetime
import io
import json
import os
import sys
from dataclasses import dataclass
from typing import List, Optional, TextIO
from xml.sax.saxutils import quoteattr

from ..protocols.base import Message

# Go's protocol.TimeFormat "2006-01-02T15:04:05.000" (parse.go:13)
_PLAIN_TIME = "%Y-%m-%dT%H:%M:%S"


def _plain_time(t: datetime.datetime) -> str:
    return t.strftime(_PLAIN_TIME) + f".{t.microsecond // 1000:03d}"


def _rfc3339nano(t: datetime.datetime) -> str:
    """Go time.Time RFC3339Nano rendering (trailing zeros trimmed)."""
    base = t.strftime("%Y-%m-%dT%H:%M:%S")
    frac = f"{t.microsecond * 1000:09d}".rstrip("0")
    if frac:
        base += "." + frac
    if t.tzinfo is None:
        return base + "Z"
    off = t.utcoffset() or datetime.timedelta()
    if off == datetime.timedelta():
        return base + "Z"
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return base + f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"


@dataclass
class LogMessage:
    """A message with time and sample-dump position (parse.go:105-111)."""

    time: datetime.datetime
    offset: int
    length: int
    msg: Message

    @property
    def type(self) -> str:
        return self.msg.msg_type()

    def __str__(self) -> str:  # parse.go:113-117
        return (
            f"{{Time:{_plain_time(self.time)} Offset:{self.offset} "
            f"Length:{self.length} {self.type}:{self.msg}}}"
        )

    def string_no_offset(self) -> str:  # parse.go:119-121
        return f"{{Time:{_plain_time(self.time)} {self.type}:{self.msg}}}"

    def record(self) -> List[str]:  # parse.go:123-129
        return [
            _rfc3339nano(self.time),
            str(self.offset),
            str(self.length),
            *self.msg.record(),
        ]

    def to_dict(self) -> dict:
        return {
            "Time": _rfc3339nano(self.time),
            "Offset": self.offset,
            "Length": self.length,
            "Type": self.type,
            "Message": self.msg.to_dict(),
        }


class Encoder:
    def encode(self, log_msg: LogMessage) -> None:
        raise NotImplementedError


class PlainEncoder(Encoder):
    """Default plain text; omits Offset/Length unless a samplefile is in
    use (flags.go:261-272)."""

    def __init__(self, out: TextIO = sys.stdout, sample_filename: str = os.devnull):
        self.out = out
        self.sample_filename = sample_filename

    def encode(self, log_msg: LogMessage) -> None:
        if self.sample_filename == os.devnull:
            print(log_msg.string_no_offset(), file=self.out)
        else:
            print(str(log_msg), file=self.out)


class CSVEncoder(Encoder):
    """CSV of LogMessage.record() (csv/csv.go:27-38)."""

    def __init__(self, out: TextIO = sys.stdout):
        import csv as _csv

        self.writer = _csv.writer(out, lineterminator="\n")

    def encode(self, log_msg: LogMessage) -> None:
        self.writer.writerow(log_msg.record())


class JSONEncoder(Encoder):
    """One JSON object per line, Go-encoder field layout (flags.go:148)."""

    def __init__(self, out: TextIO = sys.stdout):
        self.out = out

    def encode(self, log_msg: LogMessage) -> None:
        json.dump(log_msg.to_dict(), self.out, separators=(",", ":"))
        self.out.write("\n")


class XMLEncoder(Encoder):
    """XML with a newline after each message (flags.go:150,162-170).

    Message fields are attributes (the reference tags every field
    ``xml:",attr"``); list-valued fields become child elements.
    """

    def __init__(self, out: TextIO = sys.stdout):
        self.out = out

    def encode(self, log_msg: LogMessage) -> None:
        attrs = [
            f"Time={quoteattr(_rfc3339nano(log_msg.time))}",
            f"Offset={quoteattr(str(log_msg.offset))}",
            f"Length={quoteattr(str(log_msg.length))}",
            f"Type={quoteattr(log_msg.type)}",
        ]
        fields = log_msg.msg.to_dict()
        # Per-message XML attribute renames from the reference's struct tags
        # (e.g. ChecksumVal -> Checksum, scm/scm.go:100; PacketCRC ->
        # Checksum, scmplus/scmplus.go:102). JSON keeps the field names (the
        # reference structs carry no effective json tags).
        renames = getattr(log_msg.msg, "XML_RENAMES", {})
        children = []
        for key, value in fields.items():
            key = renames.get(key, key)
            if isinstance(value, (list, tuple)):
                inner = "".join(f"<Value>{v}</Value>" for v in value)
                children.append(f"<{key}>{inner}</{key}>")
            else:
                attrs.append(f"{key}={quoteattr(str(value))}")
        body = "".join(children)
        name = "LogMessage"
        if body:
            self.out.write(f"<{name} {' '.join(attrs)}>{body}</{name}>\n")
        else:
            self.out.write(f"<{name} {' '.join(attrs)}></{name}>\n")


def make_encoder(
    fmt: str, out: TextIO = sys.stdout, sample_filename: str = os.devnull
) -> Encoder:
    """Encoder selection (flags.go:141-152)."""
    fmt = fmt.lower()
    if fmt == "plain":
        return PlainEncoder(out, sample_filename)
    if fmt == "csv":
        return CSVEncoder(out)
    if fmt == "json":
        return JSONEncoder(out)
    if fmt == "xml":
        return XMLEncoder(out)
    raise ValueError(f"invalid format: {fmt!r}")
