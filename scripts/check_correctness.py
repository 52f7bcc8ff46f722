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
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            rec["pass"] = True
            rec["err"] = "rows-only (no oracle)"
            continue
        try:
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
