"""Property-based checks (hypothesis) for the session-4 operators: each
property is the operator's defining inequality/invariant, checked on
randomized small inputs through the REAL Spark path (bounded example
counts keep the suite fast)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_FAST
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
def test_ewma_bounded_by_window_extremes(spark, values):
    """EWMA is a convex combination: min(window) ≤ smooth ≤ max(window),
    with floor slack of 1 cent on the lower edge."""
    from hfsa_spark.operators.events import ewma_smooth

    rows = [(i, 1, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, value double"
    ).selectExpr("event_id", "user_id", "to_timestamp(ts) as ts", "value")
    got = {r["event_id"]: r for r in ewma_smooth(df, horizon=4).collect()}
    cents = [math.floor(v * 100) for v in values]
    for i in range(len(values)):
        window = cents[max(0, i - 3) : i + 1]
        assert min(window) - 1 <= got[i]["smooth_cents"] <= max(window)


@_FAST
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
    st.sampled_from("abcdefgh"),
)
def test_count_min_one_sided(spark, values, probe):
    """CM estimates never undercount, for any stream and a tiny width."""
    from hfsa_spark.operators.sketches import count_min_estimate

    df = spark.createDataFrame([(v,) for v in values], "tok string")
    got = {
        r["value"]: r
        for r in count_min_estimate(df, "tok", [probe], depth=3, width=4).collect()
    }
    r = got[probe]
    assert r["exact"] == values.count(probe)
    assert r["est"] >= r["exact"]


@_FAST
@given(st.lists(st.integers(min_value=0, max_value=4_000_000), min_size=1, max_size=8))
def test_materialize_mixture_multiplicity(spark, factors):
    """Each row is emitted floor(f) or ceil(f) times (stochastic
    rounding), and the expansion is deterministic across runs."""
    from hfsa_spark.operators.sampling import materialize_mixture

    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(factors)], "doc_id bigint, repeat_micro bigint"
    )
    rows = materialize_mixture(df).collect()
    by = {}
    for r in rows:
        by[r["doc_id"]] = by.get(r["doc_id"], 0) + 1
    for i, f in enumerate(factors):
        lo, hi = f // 1_000_000, -(-f // 1_000_000)
        assert lo <= by.get(i, 0) <= max(hi, lo)
    again = sorted((r["doc_id"], r["epoch_idx"]) for r in materialize_mixture(df).collect())
    assert again == sorted((r["doc_id"], r["epoch_idx"]) for r in rows)
