"""Message filters (reference: flags.go:226-259, protocol/parse.go:131-155)."""

from __future__ import annotations

from typing import Dict, List, Set

from ..protocols.base import Message


class MessageFilter:
    def filter(self, msg: Message) -> bool:
        raise NotImplementedError


class FilterChain(List[MessageFilter]):
    """Applies filters in order; empty chain matches all (parse.go:139-151)."""

    def match(self, msg: Message) -> bool:
        return all(f.filter(msg) for f in self)


class MeterIDFilter(MessageFilter):
    """-filterid: only listed meter IDs (flags.go:226-232)."""

    def __init__(self, ids: Set[int]):
        self.ids = set(ids)

    def filter(self, msg: Message) -> bool:
        return msg.meter_id() in self.ids


class MeterTypeFilter(MessageFilter):
    """-filtertype: only listed meter types (flags.go:234-240)."""

    def __init__(self, types: Set[int]):
        self.types = set(types)

    def filter(self, msg: Message) -> bool:
        return msg.meter_type() in self.types


class UniqueFilter(MessageFilter):
    """-unique: suppress a meter's message when its checksum equals the last
    one seen from that meter (flags.go:242-259)."""

    def __init__(self):
        self.last: Dict[int, bytes] = {}

    def filter(self, msg: Message) -> bool:
        checksum = bytes(msg.checksum())
        mid = msg.meter_id()
        if self.last.get(mid) == checksum:
            return False
        self.last[mid] = checksum
        return True
