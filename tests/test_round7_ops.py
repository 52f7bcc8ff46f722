"""Round-7 behavior pins: winsorize NULL-group semantics (the q204
oracle's null-safe band join must track the operator if the documents
fixture ever grows NULL langs)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F


def test_winsorize_null_group_is_a_real_group(spark):
    """A NULL group key forms its OWN percentile band (eqNullSafe band
    join): null-lang rows clip against the null-group band, never get
    NULL bands, and never drop from the output."""
    from hfsa_spark.operators.features import winsorize

    rows = [
        (1, "en", 10.0), (2, "en", 20.0), (3, "en", 30.0), (4, "en", 40.0),
        (5, None, 100.0), (6, None, 200.0), (7, None, 300.0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, v double")
    out = winsorize(df, "v", group_col="lang", p_lo=0.25, p_hi=0.75)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 7  # no rows dropped
    # the NULL group's band comes from ITS values (100..300), not en's
    assert got[5]["lo"] == 150.0 and got[5]["hi"] == 250.0
    assert got[5]["v_wins"] == 150.0 and got[5]["clipped_lo"]
    assert got[7]["v_wins"] == 250.0 and got[7]["clipped_hi"]
    # en rows keep their own band
    assert got[1]["lo"] == 17.5 and got[1]["hi"] == 32.5


def test_winsorize_oracle_form_matches_on_null_groups(spark):
    """The q204 oracle SHAPE (LEFT JOIN ... IS NOT DISTINCT FROM) run in
    DuckDB over a null-lang fixture must equal the Spark operator row
    for row — pinning the gate against a fixture change."""
    from hfsa_spark.operators.features import winsorize

    rows = [
        (1, "en", 10.0), (2, "en", 20.0), (3, "en", 30.0), (4, "en", 40.0),
        (5, None, 100.0), (6, None, 200.0), (7, None, 300.0),
        (8, "fr", 7.0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, v double")
    got = (
        winsorize(df, "v", group_col="lang", p_lo=0.25, p_hi=0.75)
        .orderBy("doc_id")
        .toPandas()
    )

    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame(rows, columns=["doc_id", "lang", "v"])
    )
    exp = con.sql("""
        WITH bands AS (
            SELECT lang,
                   quantile_cont(v, 0.25) AS lo,
                   quantile_cont(v, 0.75) AS hi
            FROM docs GROUP BY lang)
        SELECT d.doc_id, d.lang, d.v,
               LEAST(GREATEST(d.v, b.lo), b.hi) AS v_wins,
               (d.v < b.lo) AS clipped_lo,
               (d.v > b.hi) AS clipped_hi,
               b.lo, b.hi
        FROM docs d LEFT JOIN bands b
          ON d.lang IS NOT DISTINCT FROM b.lang
        ORDER BY d.doc_id
    """).df()
    assert list(got.columns) == list(exp.columns)
    for col in got.columns:
        assert list(got[col].fillna("∅")) == list(exp[col].fillna("∅")), col
