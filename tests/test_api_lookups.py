"""Point-lookup API parity (SURVEY.md §2.3 L3-L6) on the fsi_small tree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfsa_spark.api import FsImageAnalytics


@pytest.fixture(scope="module")
def api(small):
    return FsImageAnalytics(small)


def test_num_children(api):
    assert api.num_children("/") == 5  # test1 test2 test3 user test_2KiB.img
    assert api.num_children("/test3") == 3
    assert api.num_children("/test3/foo") == 3
    assert api.num_children("/user") == 1
    assert api.num_children("/user/mm") == 0


def test_has_inode_with_normalization(api):
    assert api.has_inode("/test3/foo/bar")
    assert api.has_inode("/test3//foo/")  # '//' collapse + trailing slash
    assert not api.has_inode("/nope")


def test_child_directories_predicate(api):
    dirs = {r["name"] for r in api.child_directories("/").collect()}
    assert dirs == {"test1", "test2", "test3", "user"}
    mm_only = api.child_directories("/test3", predicate=F.col("user") == "mm")
    assert {r["name"] for r in mm_only.collect()} == {"foo"}


def test_file_inodes_in_directory_errors(api):
    files = {r["name"] for r in api.file_inodes_in_directory("/test3").collect()}
    assert files == {"test.img", "test_160MiB.img"}
    with pytest.raises(NotADirectoryError):
        api.file_inodes_in_directory("/test_2KiB.img")
    with pytest.raises(FileNotFoundError):
        api.file_inodes_in_directory("/missing")
