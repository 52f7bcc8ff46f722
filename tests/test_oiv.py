"""OIV Delimited ingestion test: a realistic `hdfs oiv -p Delimited` dump
(tab-separated, header, dirs print 0 for BlocksCount/FileSize, permission
carries the type char) round-trips into the inodes schema and feeds the
report operators."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F

from hfsa_spark.extract.oiv import read_oiv_delimited

_DUMP = textwrap.dedent(
    """\
    Path\tReplication\tModificationTime\tAccessTime\tPreferredBlockSize\tBlocksCount\tFileSize\tNSQUOTA\tDSQUOTA\tPermission\tUserName\tGroupName
    /\t0\t2017-07-08 09:20\t1970-01-01 01:00\t0\t0\t0\t9223372036854775807\t-1\tdrwxr-xr-x\tmm\tsupergroup
    /data\t0\t2017-07-08 09:20\t1970-01-01 01:00\t0\t0\t0\t-1\t-1\tdrwxr-xr-x\tmm\tsupergroup
    /data/a.bin\t3\t2017-07-08 09:21\t2017-07-08 09:21\t134217728\t2\t170000000\t0\t0\t-rw-r--r--\tmm\tsupergroup
    /data/b.bin\t1\t2017-07-08 09:22\t2017-07-08 09:22\t134217728\t1\t2048\t0\t0\t-rw-r--r--\troot\troot
    /link\t0\t2017-07-08 09:23\t2017-07-08 09:23\t0\t0\t0\t0\t0\tlrwxrwxrwx\tmm\tsupergroup
    """
)


def test_oiv_round_trip(spark, tmp_path):
    dump = tmp_path / "dump.tsv"
    dump.write_text(_DUMP)
    df = read_oiv_delimited(spark, str(dump))
    rows = {r["full_path"]: r for r in df.collect()}

    assert rows["/"]["type"] == "DIRECTORY" and rows["/"]["depth"] == 0
    assert rows["/data"]["type"] == "DIRECTORY"
    assert rows["/data/a.bin"]["type"] == "FILE"
    assert rows["/link"]["type"] == "SYMLINK"

    a = rows["/data/a.bin"]
    assert a["path"] == "/data" and a["depth"] == 2
    assert a["file_size"] == 170000000
    assert a["consumed_size"] == 3 * 170000000
    assert a["mode"] == 0o644
    assert a["user"] == "mm" and a["group"] == "supergroup"

    # edge set is consistent: parent_id of a child == id of its parent
    assert a["parent_id"] == rows["/data"]["id"]

    # feeds the report operators
    from hfsa_spark.operators.summary import summary_report

    rep = summary_report(df)
    overall = rep.overall.collect()[0]
    assert overall["sum_files"] == 2
    assert overall["sum_directories"] == 2
    assert overall["sum_symlinks"] == 1
