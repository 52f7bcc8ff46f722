"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine expresses sessionization as lag + cumulative-sum windows
(streaming/snapshots.py::sessionize_events); that formulation needs the
whole history per key. This module is the *incremental* form: per-key state
(the open session) lives in the state store, each micro-batch folds its
events into it, and only CLOSED sessions are emitted — the state size is
O(#active keys), independent of stream length, which is what makes it run
forever at scale.

Scale notes:
* state is partitioned by the grouping key across executors (the shuffle
  before the stateful operator is keyed on it) — hot keys shard no further,
  same caveat as any keyed stream;
* Arrow batches move whole key-groups into Python; the per-batch Python
  cost is one sort + one linear fold per key;
* the streaming twin is equivalence-tested against the batch form in
  tests/test_streaming_stateful.py (closed sessions match exactly), the
  same serial-vs-parallel determinism contract the reference pins for its
  visitors (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint,"
    " n_events bigint, sum_value double"
)
_STATE_SCHEMA = "session_start bigint, last_ts bigint, n_events bigint, sum_value double"


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization over a *streaming* DataFrame with explicit
    per-user state. Emits one row per closed session (a session closes when
    a later event arrives more than ``gap_seconds`` after its last event);
    the open session per user stays in state.

    Requires events within a key to arrive in non-decreasing micro-batch
    order (each micro-batch is sorted internally; late events belong to
    watermark-based variants).
    """

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if state.exists:
            session_start, last_ts, n_events, sum_value = state.get
        else:
            session_start = None
            last_ts = n_events = sum_value = 0

        closed: list[tuple[int, int, int, int, float]] = []
        for ts, value in zip(batch[ts_col], batch[value_col]):
            ts = int(ts)
            if session_start is not None and ts - last_ts > gap_seconds:
                closed.append((user, session_start, last_ts, n_events, sum_value))
                session_start = None
            if session_start is None:
                session_start, n_events, sum_value = ts, 0, 0.0
            last_ts = ts
            n_events += 1
            sum_value += float(value)
        state.update((session_start, last_ts, n_events, sum_value))

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, cents bigint, smooth_cents bigint,"
    " spike boolean"
)


def stateful_ewma(
    events: DataFrame,
    horizon: int = 8,
    spike_cents: int = 20000,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``operators/events.ewma_smooth``: per-key EWMA
    smoothing + spike flags with a horizon-deep ring of recent cents as
    the ONLY state — O(horizon · #keys), independent of stream length.
    Emits one row per event as it arrives. Same integer-exact truncated
    half-life arithmetic as the batch form, so the two are equivalence-
    testable row-for-row (tests/test_streaming_stateful.py).

    Same in-order-arrival contract as :func:`stateful_sessionize`
    (micro-batches sorted internally on (ts, event_id))."""

    state_schema = "recent array<bigint>"

    def fold(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        (user,) = key
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            [ts_col, id_col]
        )
        (recent,) = state.get if state.exists else ([],)
        recent = list(recent)
        out: list[tuple[int, int, int, int, bool]] = []
        for eid, value in zip(batch[id_col], batch[value_col]):
            cents = math.floor(float(value) * 100)
            recent.append(cents)
            if len(recent) > horizon:
                recent.pop(0)
            num = den = 0
            for i, c in enumerate(reversed(recent)):  # i=0 newest
                wt = 1 << (horizon - 1 - i)
                num += c * wt
                den += wt
            smooth = math.floor(num / den)
            out.append(
                (int(eid), int(user), cents, smooth, abs(cents - smooth) > spike_cents)
            )
        state.update((recent,))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "cents", "smooth_cents", "spike"]
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
