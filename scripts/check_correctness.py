"""Local twin of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet tables, compare
row count + sorted values. Usage:

    python scripts/check_correctness.py [--json out.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import math

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from hfsa_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    issues = []
    if len(a) != len(b):
        issues.append(f"row count {len(a)} vs {len(b)}")
        return issues
    if sorted(a.columns) != sorted(b.columns):
        issues.append(f"columns {sorted(a.columns)} vs {sorted(b.columns)}")
        return issues
    a, b = normalize(a.copy()), normalize(b.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = all(
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av.astype(float), bv.astype(float))
            )
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            diff_idx = next(
                i for i in range(len(av)) if str(av.iloc[i]) != str(bv.iloc[i])
            )
            issues.append(
                f"col {c} differs at row {diff_idx}: spark={av.iloc[diff_idx]!r} "
                f"oracle={bv.iloc[diff_idx]!r}"
            )
    return issues


def _py_oracle_q134(con: "duckdb.DuckDBPyConnection", sf_dir: str) -> pd.DataFrame:
    """Python-side oracle for q134_compression_ratio: DuckDB has no zlib,
    but zlib.compress is deterministic for a fixed (input, level, library
    build), so the expected table is computable exactly (VERDICT r9
    next-round #3 — the one query that had only a rows-only gate)."""
    import math
    import zlib

    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).df()
    n_bytes, n_comp, ratio = [], [], []
    for t in docs["text"]:
        raw = (t or "").encode("utf-8")
        n_bytes.append(len(raw))
        n_comp.append(len(zlib.compress(raw, 6)) if raw else 0)
        # mirror the query's arithmetic exactly (text.py ratio_micro:
        # floor(double(n_comp) * 1e6 / double(n_bytes))): the double
        # quotient can round up across an integer boundary, so exact
        # integer // here could disagree by one (ADVICE r10)
        ratio.append(math.floor(n_comp[-1] * 1e6 / n_bytes[-1]) if raw else None)
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_bytes": pd.Series(n_bytes, dtype="int64"),
            "n_compressed": pd.Series(n_comp, dtype="int64"),
            "ratio_micro": pd.Series(ratio, dtype="Int64"),
        }
    )


# queries whose oracle is deterministic Python rather than SQL (the DRIVER
# still records these rows-only — it only runs oracle_sql() — but the
# committed local artifact carries full value-level verification)
PYTHON_ORACLES = {"q134_compression_ratio": _py_oracle_q134}


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = report[name] = {
            "pass": False, "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            rec["err"] = f"spark error: {ex}"[:500]
            failures += 1
            continue
        if name not in oracles and name not in PYTHON_ORACLES:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            rec["pass"] = True
            rec["err"] = "rows-only (no oracle)"
            continue
        try:
            if name in PYTHON_ORACLES:
                odf = PYTHON_ORACLES[name](con, sf_dir)
                rec["oracle"] = "python"
            else:
                odf = con.sql(oracles[name]).df()
            rec["oracle_rows"] = len(odf)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            rec["err"] = f"oracle error: {ex}"[:500]
            failures += 1
            continue
        issues = compare(sdf, odf)
        if issues:
            failures += 1
            rec["err"] = "; ".join(issues)[:500]
            print(f"FAIL  {name}: {'; '.join(issues)}")
        else:
            rec["pass"] = True
            print(f"ok    {name}: {len(sdf)} rows")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": report}, fh, indent=1)
        print(f"wrote {json_path}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
