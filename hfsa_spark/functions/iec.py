"""IEC binary (1024-based) size formatting and parsing
(reference IECBinary, /root/reference lib/.../util/IECBinary.java:25-58;
rounding edge pinned by IECBinaryTest.java:40-41: 1535 → "1 KiB",
1536 → "2 KiB" — i.e. ``%.0f`` half-up rounding of value/1024^k).

Display concern → driver-side Python (sinks + CLI parsing), not Spark.
"""

from __future__ import annotations

import re

_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]


def format_iec(size: int) -> str:
    """Format bytes with the largest unit where the *rounded* value is a
    whole number of that unit, using round-half-up at .5 like Java's
    ``String.format("%.0f")`` on a positive value."""
    size = int(size)
    if size < 0:
        raise ValueError("negative size")
    value = float(size)
    unit = 0
    while unit + 1 < len(_UNITS) and value >= 1024:
        value /= 1024.0
        unit += 1
    # Java %.0f uses HALF_UP for positive values
    rounded = int(value + 0.5)
    return f"{rounded} {_UNITS[unit]}"


_PARSE_RE = re.compile(r"^\s*(\d+)\s*([KMGTPE]i?B|B)?\s*$", re.IGNORECASE)


def parse_iec(text: str) -> int:
    """Parse '123', '123 KiB', '3MiB' (case-insensitive, no fractions) into
    bytes (IECBinary.parse, IECBinary.java:40-58)."""
    m = _PARSE_RE.match(text)
    if not m:
        raise ValueError(f"cannot parse IEC size: {text!r}")
    n = int(m.group(1))
    unit = (m.group(2) or "B").upper()
    unit = unit if unit == "B" else unit[0] + "IB"
    exponent = {"B": 0, "KIB": 1, "MIB": 2, "GIB": 3, "TIB": 4, "PIB": 5, "EIB": 6}[unit]
    return n * (1024**exponent)
