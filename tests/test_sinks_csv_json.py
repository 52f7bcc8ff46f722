"""csv + json sink tests mirroring the reference's export assertions
(CsvExportTest.java:12-89, JsonExportTest.java:11-66) over fsi_small."""

from __future__ import annotations

import json

from hfsa_spark.operators.inodeinfo import inode_info
from hfsa_spark.operators.pathreport import path_report
from hfsa_spark.operators.smallfiles import small_files_report
from hfsa_spark.operators.summary import summary_report
from hfsa_spark.operators.userusage import user_usage_report
from hfsa_spark.sinks import (
    inode_info_csv,
    inode_info_json,
    path_report_csv,
    path_report_json,
    small_files_csv,
    small_files_json,
    summary_csv,
    summary_json,
    user_usage_csv,
    user_usage_json,
)

PATH_CSV_GOLDEN = """Path,Type,Permission
/,d,mm:supergroup:rwxr-xr-x
/test1,d,mm:supergroup:rwxr-xr-x
/test2,d,mm:supergroup:rwxr-xr-x
/test3,d,mm:supergroup:rwxr-xr-x
/test3/foo,d,mm:supergroup:rwxr-xr-x
/test3/foo/bar,d,mm:supergroup:rwxr-xr-x
/test3/foo/bar/test_20MiB.img,-,mm:nobody:rw-r--r--
/test3/foo/bar/test_2MiB.img,-,mm:supergroup:rw-r--r--
/test3/foo/bar/test_40MiB.img,-,mm:supergroup:rw-r--r--
/test3/foo/bar/test_4MiB.img,-,mm:supergroup:rw-r--r--
/test3/foo/bar/test_5MiB.img,-,mm:supergroup:rw-r--r--
/test3/foo/bar/test_80MiB.img,-,mm:supergroup:rw-r--r--
/test3/foo/test_1KiB.img,-,root:root:rw-r--r--
/test3/foo/test_20MiB.img,-,mm:supergroup:rw-r--r--
/test3/test.img,-,mm:supergroup:rw-r--r--
/test3/test_160MiB.img,-,foo:nobody:rw-r--r--
/test_2KiB.img,-,mm:supergroup:rw-r--r--
/user,d,mm:supergroup:rwxr-xr-x
/user/mm,d,mm:supergroup:rwxr-xr-x
"""


def test_summary_csv(small):
    out = summary_csv(summary_report(small))
    assert out.startswith(
        "Type,Name,Directories,Symlinks,Files,Size,Blocks,Size Buckets (0B to 256MiB+)\n"
    )
    assert "Overall,/,8,0,11," in out
    assert "Group,supergroup,8,0,8," in out
    assert "User,mm,8,0,9," in out
    # Arrays.toString of the 18-slot internal array, csv-quoted
    overall_line = [l for l in out.splitlines() if l.startswith("Overall")][0]
    assert overall_line.count(",") >= 18
    assert '"[0, 2, 1, 2, 1, 0, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0]"' in overall_line


def test_small_files_csv(small):
    out = small_files_csv(small_files_report(small))
    assert out.startswith("Type,Name,Path,Small Files\n")
    assert "Overall,/,,3" in out
    assert "User,mm,,2" in out
    # raw (un-rolled) per-dir counts: mm's 2 small files live in / and /test3
    assert "Hotspot,mm,/,1" in out
    assert "Hotspot,mm,/test3,1" in out


def test_path_csv_golden(small):
    assert path_report_csv(path_report(small).listing) == PATH_CSV_GOLDEN


def test_inode_csv(small):
    out = inode_info_csv(inode_info(small, [16385]))
    assert out.startswith("ID,Name,Type\n")
    assert "16385,,DIRECTORY" in out


def test_summary_json(small):
    out = summary_json(summary_report(small))
    assert '"dirPath": "/"' in out
    assert '"overallStats": {' in out
    assert '"sumFiles":' in out and '"sumDirectories":' in out
    doc = json.loads(out)
    assert doc["overallStats"]["sumFiles"] == 11
    # per-stat trimmed buckets: [{"0 B": n}, {"1 MiB": n}, ...]
    assert doc["overallStats"]["fileSizeBuckets"][0] == {"0 B": 0}
    assert doc["overallStats"]["fileSizeBuckets"][1] == {"1 MiB": 2}
    assert len(doc["overallStats"]["fileSizeBuckets"]) == 10
    # root's only file is 1 KiB -> its own histogram is 2 buckets long
    assert len(doc["userStats"]["root"]["fileSizeBuckets"]) == 2


def test_small_files_json(small):
    out = small_files_json(small_files_report(small))
    assert '"sumOverallSmallFiles":' in out
    assert '"userToReport": {' in out
    doc = json.loads(out)
    assert doc["sumOverallSmallFiles"] == 3
    assert doc["userToReport"]["mm"]["sumSmallFiles"] == 2


def test_user_usage_json(small):
    rolled = user_usage_report(small, user="mm", now_ms=1600000000000, limit=None)
    doc = json.loads(user_usage_json(rolled))
    assert doc["pathToSize"]["/test3/foo/bar"] == 158224384


def test_user_usage_csv(small):
    rolled = user_usage_report(small, user="mm", now_ms=1600000000000, limit=None)
    out = user_usage_csv(rolled)
    assert out.startswith("Path,Size\n")
    assert "/test3/foo/bar,158224384" in out


def test_path_json(small):
    out = path_report_json(path_report(small))
    assert '"results": [' in out
    assert '"fileCount":' in out and '"dirCount":' in out
    doc = json.loads(out)
    assert doc["fileCount"] == 11 and doc["dirCount"] == 8


def test_inode_json(small):
    out = inode_info_json(inode_info(small, [16385]))
    assert '"id": 16385' in out
    assert '"name":' in out
    assert '"type": "directory"' in out


def test_inode_json_atime_quirk(small):
    # file atime reported as mtime (JsonUtil.java:41)
    out = inode_info_json(inode_info(small, ["/test_2KiB.img"]))
    doc = json.loads(out)
    assert doc["atime"] == doc["mtime"]
