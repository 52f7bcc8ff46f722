"""Exponential file-size histogram bucketing (reference SizeBucket,
/root/reference lib/.../util/SizeBucket.java:45-116; borders asserted by
SizeBucketTest.java:77-83).

Semantics (derived from the reference's golden histograms, FIXTURES.md §2):

* bucket 0: size == 0
* bucket 1: 0 < size < 1 MiB
* bucket 2: 1 MiB <= size < 2 MiB
* bucket k (k >= 3): 2 MiB * 2^(k-3) <= size < 2 MiB * 2^(k-2)
  i.e. ``k = int(log2(size / 2 MiB)) + 3``

Printed upper borders are 0, 1 MiB, 2 MiB, 4 MiB, 8 MiB, … (doubling).

Float parity: the reference computes the bucket with a double ``log`` ratio;
``log(x)/log(2)`` is exact at every power-of-two boundary representable in a
double (verified for 2^0..2^54 in tests), so a JVM-side ``FLOOR(LOG(x)/LOG(2))``
expression matches Java's ``(int)(Math.log(x)/Math.log(2))`` for positive
sizes. We keep the whole computation as a Catalyst expression — no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_MIB = 1048576
_TWO_MIB = 2 * _MIB
_LN2 = math.log(2.0)


def size_bucket(size: Column | str) -> Column:
    """Column expression mapping a byte size to its exponential bucket index."""
    c = F.col(size) if isinstance(size, str) else size
    return (
        F.when(c <= 0, F.lit(0))
        .when(c < _MIB, F.lit(1))
        .when(c < _TWO_MIB, F.lit(2))
        .otherwise((F.floor(F.log(c.cast("double") / float(_TWO_MIB)) / F.lit(_LN2)) + 3))
        .cast("int")
    )


def bucket_py(size: int) -> int:
    """Pure-Python reference implementation (test oracle + sink formatting)."""
    if size <= 0:
        return 0
    if size < _MIB:
        return 1
    if size < _TWO_MIB:
        return 2
    return int(math.log(size / _TWO_MIB) / _LN2) + 3


def bucket_borders(num_buckets: int) -> list[int]:
    """Upper borders (bytes) for the first ``num_buckets`` buckets:
    0, 1 MiB, 2 MiB, 4 MiB, … — doubling from bucket 2 onward
    (SizeBucket.java borders; SizeBucketTest.java:77-83)."""
    borders = []
    for k in range(num_buckets):
        if k == 0:
            borders.append(0)
        else:
            borders.append(_MIB * (1 << (k - 1)))
    return borders


def max_bucket_for(size: int) -> int:
    """Number of buckets needed to hold ``size`` (dynamic growth — the
    reference grows its bucket array to the max observed bucket,
    SizeBucket.java:108-116)."""
    return bucket_py(size) + 1


# Upper bound on bucket count: 2^63-1 bytes lands in bucket
# int(log2(2^63/2^21)) + 3 = 45, so 46 buckets cover any legal size.
MAX_BUCKETS = 46
