"""Positioned parse-error tracking.

Mirrors the reference's bounded error list surface
(/root/reference/Sources/ParseErrorList.swift:10-50,
/root/reference/Sources/ParseError.swift, Parser.swift:69-90): tracking
is off by default (``max_size == 0``); when enabled, up to ``max_size``
errors are recorded as (char position, message). The numeric
``arena.errors`` counter (tokenizer error count, used by the
``parse_metrics`` driver query) is unchanged by tracking.
"""

from __future__ import annotations

from typing import NamedTuple


class ParseError(NamedTuple):
    pos: int          # char offset into the decoded input
    msg: str


class ParseErrorList(list):
    """Bounded error list; ``max_size == 0`` disables tracking
    (reference ParseErrorList.noTracking)."""

    __slots__ = ("max_size",)

    def __init__(self, max_size: int = 0) -> None:
        super().__init__()
        self.max_size = max_size

    @classmethod
    def tracking(cls, max_size: int = 16) -> "ParseErrorList":
        return cls(max_size)

    @classmethod
    def no_tracking(cls) -> "ParseErrorList":
        return cls(0)

    def can_add(self) -> bool:
        return len(self) < self.max_size

    def add(self, pos: int, msg: str) -> None:
        if self.can_add():
            self.append(ParseError(pos, msg))
