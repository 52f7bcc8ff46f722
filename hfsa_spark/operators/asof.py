"""As-of (temporal point-in-time) join — a custom operator Spark's built-in
join strategies don't offer directly.

For each left row, attach the right row with the greatest timestamp ≤ the
left timestamp (direction='backward'; 'forward' = smallest ≥) within the
same key group. The classic implementations are a range join (explodes to
O(|L|·|R|) candidates per key before pruning) or a per-key merge — this one
is the **union + running-window** formulation:

    tag sides → unionByName → window(partitionBy=keys, orderBy=(ts, side))
    → last(value, ignorenulls=True) → keep left rows

which costs exactly ONE shuffle keyed on the join keys (the sort inside the
window is Spark's normal shuffle sort), never materializes candidate pairs,
and streams each key group once. Ties (equal ts) resolve as "right row
visible to the left row" — the right side sorts first — matching SQL ASOF
JOIN (`l.ts >= r.ts`) semantics, which DuckDB implements natively (the
oracle for the gate query).

Scale: shuffle volume = |L| + |R| rows of (keys, ts, carried columns); a
single hot key serializes its own window — salt the key with a coarse time
bucket if one entity dominates (each bucket then needs the previous
bucket's tail broadcast — not implemented here; AQE handles moderate skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """All left columns, plus ``<vc><suffix>`` for each right value column
    and ``<ts_col><suffix>`` = the matched right timestamp (null when no
    right row qualifies). ``tolerance_seconds`` additionally nulls matches
    further than the tolerance from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_cols = by_cols or []
    value_cols = value_cols or [c for c in right.columns if c not in by_cols + [ts_col]]

    # All carried right columns ride in ONE struct that is non-null for
    # every right row (even when individual value columns are null), so
    # last(ignorenulls=True) picks the nearest right ROW atomically —
    # per-column fills could otherwise stitch values from different right
    # rows when a value column is genuinely null (ASOF JOIN row semantics).
    rtype = dict(right.dtypes)
    fields = [(f"{vc}{suffix}", rtype[vc], vc) for vc in value_cols]
    fields.append((f"{ts_col}{suffix}", rtype[ts_col], ts_col))
    carried = [n for n, _, _ in fields]
    struct_ddl = "struct<" + ",".join(f"`{n}`:{t}" for n, t, _ in fields) + ">"

    l_tagged = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_ddl).alias("__asof"),
    )
    left_only = [c for c in left.columns if c not in by_cols + [ts_col]]
    ltype = dict(left.dtypes)
    r_tagged = right.select(
        *by_cols,
        F.col(ts_col),
        *[F.lit(None).cast(ltype[c]).alias(c) for c in left_only],
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(src).alias(n) for n, _, src in fields]
        ).alias("__asof"),
    )
    u = l_tagged.unionByName(r_tagged)

    order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c != "__asof"],
        F.last("__asof", ignorenulls=True).over(w).alias("__asof"),
    )
    out = (
        filled.filter(F.col("__side") == 1)
        .select(
            *[c for c in filled.columns if c not in ("__side", "__asof")],
            *[F.col("__asof").getField(n).alias(n) for n in carried],
        )
    )

    if tolerance_seconds is not None:
        lag = F.abs(
            F.col(ts_col).cast("double") - F.col(f"{ts_col}{suffix}").cast("double")
        )
        keep = F.col(f"{ts_col}{suffix}").isNotNull() & (lag <= tolerance_seconds)
        out = out.select(
            *[c for c in out.columns if c not in carried],
            *[F.when(keep, F.col(c)).alias(c) for c in carried],
        )
    return out
