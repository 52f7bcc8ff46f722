"""Extract write layout: the range-partitioned write must scale writers
with data volume, not top-dir count — a giant top dir splits across files
while small dirs don't fragment."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def test_skewed_top_dir_splits_small_dirs_dont_fragment(spark, tmp_path):
    from hfsa_spark.extract import generated_namespace
    from hfsa_spark.extract.pathmat import write_inodes

    ns = generated_namespace(spark, max_depth=3, max_width=2, files_per_dir_factor=5)
    out = str(tmp_path / "skew_ns")
    write_inodes(ns, out)

    # partition pruning layout intact
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{out}/top_dir=*"))
    assert len(dirs) == 27  # 26 letter dirs + the root inode's partition

    # every partition dir holds at least one parquet file and no sliver
    # explosion: with 64 range tasks over 26 dirs, each dir gets a handful
    # of contiguous-range files, not one per task
    for d in glob.glob(f"{out}/top_dir=*"):
        files = glob.glob(f"{d}/*.parquet")
        assert 1 <= len(files) <= 8, d

    # reading back with a subtree filter prunes to the one partition
    from hfsa_spark.plans import explain_str

    df = spark.read.parquet(out).filter(F.col("top_dir") == "a")
    assert "PartitionFilters" in explain_str(df)

    # row-group sortedness: within one file, full_path is non-decreasing
    import pyarrow.parquet as pq

    f = glob.glob(f"{out}/top_dir=a/*.parquet")[0]
    paths = pq.read_table(f, columns=["full_path"])["full_path"].to_pylist()
    assert paths == sorted(paths)
