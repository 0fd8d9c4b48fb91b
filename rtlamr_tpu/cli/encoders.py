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
    """A message with time and sample-dump position (parse.go:105-111).

    ``channel`` is the TPU-native wideband extension: the channelizer bank
    index the message decoded on (``-channels N``). It is ``None`` in
    single-channel mode, where every rendering below is byte-identical to
    the reference's output surface; when set, each encoder adds one
    Channel field in its natural position.
    """

    time: datetime.datetime
    offset: int
    length: int
    msg: Message
    channel: Optional[int] = None

    @property
    def type(self) -> str:
        return self.msg.msg_type()

    def _chan_plain(self) -> str:
        return "" if self.channel is None else f"Channel:{self.channel} "

    def __str__(self) -> str:  # parse.go:113-117
        return (
            f"{{Time:{_plain_time(self.time)} Offset:{self.offset} "
            f"Length:{self.length} {self._chan_plain()}{self.type}:{self.msg}}}"
        )

    def string_no_offset(self) -> str:  # parse.go:119-121
        return (
            f"{{Time:{_plain_time(self.time)} "
            f"{self._chan_plain()}{self.type}:{self.msg}}}"
        )

    def record(self) -> List[str]:  # parse.go:123-129
        rec = [
            _rfc3339nano(self.time),
            str(self.offset),
            str(self.length),
        ]
        if self.channel is not None:
            rec.append(str(self.channel))
        rec.extend(self.msg.record())
        return rec

    def to_dict(self) -> dict:
        d = {
            "Time": _rfc3339nano(self.time),
            "Offset": self.offset,
            "Length": self.length,
        }
        if self.channel is not None:
            d["Channel"] = self.channel
        d["Type"] = self.type
        d["Message"] = self.msg.to_dict()
        return d


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


#: Go xml.EscapeText entity choices (encoding/xml/xml.go escTab..escAmp):
#: numeric-character-reference forms for quotes and whitespace, named
#: entities for &, <, >.
_XML_ESCAPES = {
    '"': "&#34;",
    "'": "&#39;",
    "&": "&amp;",
    "<": "&lt;",
    ">": "&gt;",
    "\t": "&#x9;",
    "\n": "&#xA;",
    "\r": "&#xD;",
}


def _in_xml_char_range(r: int) -> bool:
    """Go xml.isInCharacterRange: the XML 1.0 Char production."""
    return (
        r in (0x09, 0x0A, 0x0D)
        or 0x20 <= r <= 0xD7FF
        or 0xE000 <= r <= 0xFFFD
        or 0x10000 <= r <= 0x10FFFF
    )


def _decode_rune(b: bytes, i: int):
    """Mirror Go utf8.DecodeRune over b[i:]: (rune, width).

    Any invalid or truncated sequence yields (0xFFFD, 1) — Go consumes
    exactly one byte per error, unlike Python's 'replace' codec which
    consumes maximal subparts.
    """
    b0 = b[i]
    if b0 < 0x80:
        return b0, 1
    if b0 < 0xC2 or b0 > 0xF4:
        return 0xFFFD, 1
    if b0 < 0xE0:
        n, lo, hi = 2, 0x80, 0xBF
    elif b0 < 0xF0:
        n = 3
        if b0 == 0xE0:
            lo, hi = 0xA0, 0xBF
        elif b0 == 0xED:
            lo, hi = 0x80, 0x9F
        else:
            lo, hi = 0x80, 0xBF
    else:
        n = 4
        if b0 == 0xF0:
            lo, hi = 0x90, 0xBF
        elif b0 == 0xF4:
            lo, hi = 0x80, 0x8F
        else:
            lo, hi = 0x80, 0xBF
    if i + n > len(b) or not (lo <= b[i + 1] <= hi):
        return 0xFFFD, 1
    for k in range(2, n):
        if not (0x80 <= b[i + k] <= 0xBF):
            return 0xFFFD, 1
    if n == 2:
        r = ((b0 & 0x1F) << 6) | (b[i + 1] & 0x3F)
    elif n == 3:
        r = ((b0 & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | (b[i + 2] & 0x3F)
    else:
        r = (
            ((b0 & 0x07) << 18)
            | ((b[i + 1] & 0x3F) << 12)
            | ((b[i + 2] & 0x3F) << 6)
            | (b[i + 3] & 0x3F)
        )
    return r, n


def _xml_escape(s: str) -> str:
    """Escape like Go's xml.EscapeText: the entity table, plus U+FFFD for
    any rune outside the XML character range (Go gets strings as valid
    UTF-8, so no byte-level decoding is needed here)."""
    out = []
    for c in s:
        esc = _XML_ESCAPES.get(c)
        if esc is not None:
            out.append(esc)
        elif _in_xml_char_range(ord(c)):
            out.append(c)
        else:
            out.append("�")
    return "".join(out)


def _xml_escape_bytes(b: bytes) -> str:
    """Go xml.EscapeText over raw []byte chardata (IDM TamperCounters /
    PowerOutageFlags): UTF-8 rune iteration with each invalid byte
    rendered as U+FFFD and valid runes filtered by the XML char range."""
    out = []
    i = 0
    while i < len(b):
        r, w = _decode_rune(b, i)
        i += w
        c = chr(r)
        esc = _XML_ESCAPES.get(c)
        if esc is not None:
            out.append(esc)
        elif _in_xml_char_range(r):
            # Covers genuine decode errors too: they decode to U+FFFD,
            # which is itself inside the XML char range and renders as
            # the replacement character either way.
            out.append(c)
        else:
            out.append("�")
    return "".join(out)


class XMLEncoder(Encoder):
    """XML with a newline after each message (flags.go:150,162-170).

    Go's encoding/xml renders the LogMessage as
    ``<LogMessage Time=.. Offset=.. Length=.. Type=..><Message ...>`` — the
    embedded ``Message`` interface (parse.go:110) is an anonymous NON-struct
    field, so it is not flattened; it marshals as a child element named
    after the field ("Message", the interface type name). Inside it:

    - structs whose fields are all tagged ``xml:",attr"`` (SCM, SCM+, R900,
      R900BCD via embedding) put every field on the element as an attribute
      with tag renames applied;
    - untagged structs (IDM, NetIDM) marshal each field as a child element;
      ``[]byte`` fields are written as raw character data and array fields
      repeat the element once per entry (encoding/xml marshalSimple /
      slice handling).
    """

    def __init__(self, out: TextIO = sys.stdout):
        self.out = out

    def encode(self, log_msg: LogMessage) -> None:
        attrs = [
            f'Time="{_xml_escape(_rfc3339nano(log_msg.time))}"',
            f'Offset="{log_msg.offset}"',
            f'Length="{log_msg.length}"',
        ]
        if log_msg.channel is not None:
            attrs.append(f'Channel="{log_msg.channel}"')
        attrs.append(f'Type="{_xml_escape(log_msg.type)}"')
        msg = log_msg.msg
        items = msg.xml_items()
        if msg.XML_STYLE == "attrs":
            msg_attrs = " ".join(
                f'{k}="{_xml_escape(str(v))}"' for k, v in items
            )
            body = f"<Message {msg_attrs}></Message>"
        else:
            parts = []
            for key, value in items:
                if isinstance(value, bytes):
                    parts.append(f"<{key}>{_xml_escape_bytes(value)}</{key}>")
                elif isinstance(value, (list, tuple)):
                    parts.extend(f"<{key}>{v}</{key}>" for v in value)
                else:
                    parts.append(f"<{key}>{_xml_escape(str(value))}</{key}>")
            body = f"<Message>{''.join(parts)}</Message>"
        self.out.write(f"<LogMessage {' '.join(attrs)}>{body}</LogMessage>\n")


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
