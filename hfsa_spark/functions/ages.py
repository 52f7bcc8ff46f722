"""Age-string parsing for the user-usage report's ``--fa`` filter
(reference UserUsageReportCommand.AgeConverter,
/root/reference tool/.../UserUsageReportCommand.java:48-80):
``(\\d+)([yYdDhHmM])?`` → milliseconds; y = 365 days; bare digits → the
number itself is treated per the reference's converter (unit-less ⇒ 0 ms
per SURVEY.md §2.4 F5 — every existing file passes the default filter).
"""

from __future__ import annotations

import re

_AGE_RE = re.compile(r"^(\d+)([yYdDhHmM])?$")

_UNIT_MS = {
    "y": 365 * 24 * 3600 * 1000,
    "d": 24 * 3600 * 1000,
    "h": 3600 * 1000,
    "m": 60 * 1000,
}


def parse_age_ms(text: str | None) -> int:
    """Parse an age spec like '2y', '30d', '12h', '45m' into milliseconds.

    ``None`` / empty / unit-less digits → 0 (default: no age restriction —
    filter ``mtime < now - 0`` passes every existing file).
    """
    if not text:
        return 0
    m = _AGE_RE.match(text.strip())
    if not m:
        raise ValueError(f"cannot parse age: {text!r}")
    if m.group(2) is None:
        return 0
    return int(m.group(1)) * _UNIT_MS[m.group(2).lower()]
