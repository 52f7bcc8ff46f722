"""Property-based tests (hypothesis) for the scalar expression library —
pure-Python halves only, so they run in milliseconds without Spark.

The Spark-expression halves are pinned to these Python oracles by the
equivalence tests in test_functions.py; together: property-verified Python
oracle + oracle-verified Spark expression.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from hfsa_spark.functions.ages import parse_age_ms
from hfsa_spark.functions.buckets import bucket_borders, bucket_py
from hfsa_spark.functions.iec import format_iec, parse_iec
from hfsa_spark.functions.perms import mode_octal_py, mode_rwx_py

SIZES = st.integers(min_value=0, max_value=2**62)


@given(SIZES)
def test_bucket_monotone_and_bounded(size):
    b = bucket_py(size)
    assert 0 <= b <= 45
    # bucket borders bracket the size: border[b-1] < size <= ... semantics
    borders = bucket_borders(b + 1)
    if b >= 1:
        assert size > 0
        assert size >= 1 or b == 1
    if b >= 2:
        assert size >= 1024 * 1024


@given(SIZES, SIZES)
def test_bucket_monotonic_pairwise(a, b):
    if a <= b:
        assert bucket_py(a) <= bucket_py(b)


@given(st.integers(min_value=2, max_value=45))
def test_bucket_border_is_exclusive_upper(k):
    """border[k] is the upper border of bucket k: the border value itself
    opens bucket k+1, values just below stay at (or within float-fuzz of)
    bucket k. The fuzz is intentional: the reference computes buckets with
    a double log ((int)(Math.log(mb)/Math.log(2)), SizeBucket.java:62-64),
    and at sizes ≥ ~2^49 the IEEE rounding of log(2^n - 1) can land on n —
    we replicate Java's arithmetic, not exact integer math."""
    borders = bucket_borders(46)
    assert bucket_py(borders[k]) == k + 1
    below = bucket_py(borders[k] - 1)
    assert below in (k, k + 1)
    if borders[k] < 2**48:  # exact regime: no fuzz below half a petabyte
        assert below == k


@given(st.integers(min_value=0, max_value=2**60))
def test_iec_parse_of_exact_units_roundtrips(v):
    # formatting then parsing returns a value within the rounding unit
    s = format_iec(v)
    parsed = parse_iec(s)
    num, unit = s.split(" ")
    unit_bytes = parse_iec(f"1 {unit}") if unit != "B" else 1
    assert abs(parsed - v) <= unit_bytes // 2


@given(st.integers(min_value=0, max_value=2**16 - 1))
def test_mode_octal_matches_format(mode):
    assert mode_octal_py(mode) == f"{mode & 0o7777:04o}"


@given(st.integers(min_value=0, max_value=2**16 - 1))
def test_rwx_shape(mode):
    s = mode_rwx_py(mode)
    assert len(s) == 9
    assert all(c in "rwxtT-" for c in s)
    # owner read bit maps to position 0
    assert (s[0] == "r") == bool(mode & 0o400)


@given(st.integers(min_value=0, max_value=10**6), st.sampled_from("ydhm"))
def test_age_parse_units(n, unit):
    ms = parse_age_ms(f"{n}{unit}")
    per = {"y": 365 * 86400000, "d": 86400000, "h": 3600000, "m": 60000}[unit]
    assert ms == n * per


@given(st.integers(min_value=0, max_value=10**9))
def test_age_unitless_is_zero(n):
    assert parse_age_ms(str(n)) == 0
