"""Golden-aggregate tests for the five reports against the fsi_small /
fsi_small_h3_2 fixtures — ports of the reference's end-to-end tool tests
(SURVEY.md §5 layer 3: SummaryReportCommandTest, SmallFilesReportCommandTest,
UserUsageReportCommandTest, PathReportCommandTest, InodeInfoCommandTest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfsa_spark.api import FsImageAnalytics
from hfsa_spark.operators.summary import summary_report, SummarySort
from hfsa_spark.operators.smallfiles import small_files_report
from hfsa_spark.operators.userusage import user_usage_report
from hfsa_spark.operators.pathreport import path_report
from hfsa_spark.operators.inodeinfo import inode_info

MIB = 1 << 20
NOW_MS = 1500000000000  # injected 'now' (2017-07-14) > all fixture mtimes


def _trim(buckets):
    out = list(buckets)
    while out and out[-1] == 0:
        out.pop()
    return out


class TestSummary:
    """SummaryReportCommandTest.java:28-95 golden values."""

    def test_overall(self, small):
        rep = summary_report(small)
        row = rep.overall.head()
        assert row["num_groups"] == 3
        assert row["num_users"] == 3
        assert row["sum_directories"] == 8
        assert row["sum_symlinks"] == 0
        assert row["sum_files"] == 11
        assert row["sum_file_size"] == 348019712  # displays as 331 MB
        assert row["sum_blocks"] == 12
        assert _trim(row["size_buckets"]) == [0, 2, 1, 2, 1, 0, 2, 1, 1, 1]

    def test_by_group(self, small):
        rep = summary_report(small)
        rows = {r["group"]: r for r in rep.by_group.collect()}
        assert set(rows) == {"root", "supergroup", "nobody"}
        assert rows["root"]["sum_files"] == 1
        assert rows["root"]["sum_file_size"] == 1024
        assert rows["supergroup"]["sum_directories"] == 8
        assert rows["supergroup"]["sum_files"] == 8
        assert rows["supergroup"]["sum_blocks"] == 8
        assert _trim(rows["supergroup"]["size_buckets"]) == [0, 1, 1, 2, 1, 0, 1, 1, 1]
        assert rows["nobody"]["sum_files"] == 2
        assert rows["nobody"]["sum_blocks"] == 3
        assert _trim(rows["nobody"]["size_buckets"]) == [0, 0, 0, 0, 0, 0, 1, 0, 0, 1]

    def test_by_user_sorted_by_filesize_asc(self, small):
        rep = summary_report(small, sort=SummarySort.FILE_SIZE)
        rows = rep.by_user.collect()
        assert [r["user"] for r in rows] == ["root", "foo", "mm"]
        assert rows[0]["sum_file_size"] == 1024
        assert rows[1]["sum_file_size"] == 167772160
        assert rows[2]["sum_file_size"] == 180246528
        assert rows[2]["sum_directories"] == 8
        assert rows[2]["sum_blocks"] == 9

    def test_user_filter_substring_post_agg(self, small):
        """F1: substring match on user rows only — overall/group unaffected
        (SummaryReportCommand.java:285-293). Pattern 'oo' must match 'foo'
        and 'root' (substring semantics: 'oo' in both)."""
        rep = summary_report(small, user_filter="oo")
        users = {r["user"] for r in rep.by_user.collect()}
        assert users == {"foo", "root"}
        assert rep.overall.head()["sum_files"] == 11  # unchanged
        assert rep.by_group.count() == 3  # unchanged

    def test_subtree(self, small):
        rep = summary_report(small, dir="/test3")
        row = rep.overall.head()
        assert row["sum_files"] == 10
        assert row["sum_directories"] == 3  # /test3, /test3/foo, /test3/foo/bar

    def test_empty_image(self, spark):
        from hfsa_spark.extract.fixtures import empty_image

        rep = summary_report(empty_image(spark))
        row = rep.overall.head()
        assert row["sum_files"] == 0
        assert row["sum_directories"] == 1
        assert rep.by_user.count() == 1  # root dir owner


class TestSmallFiles:
    """SmallFilesReportCommandTest.java:25-55 golden values (FIXTURES.md §2):
    limit 2 MiB → overall 3; rollup /→3, /test3→2, /test3/foo→1;
    users mm=2 (66.7%), root=1 (33.3%)."""

    def test_overall_and_rollup(self, small):
        rep = small_files_report(small)
        assert rep.overall.head()["small_files_total"] == 3
        hot = {r["path"]: r["count"] for r in rep.path_hotspots.collect()}
        assert hot == {"/": 3, "/test3": 2, "/test3/foo": 1}

    def test_strictly_less_than_limit(self, small):
        """F4: a file of exactly 2 MiB is NOT small (< not <=,
        SmallFilesReportCommand.java:288)."""
        rep = small_files_report(small, limit_bytes=2 * MIB)
        # /test3/foo/bar/test_2MiB.img (exactly 2 MiB) must not count
        paths = {r["path"] for r in rep.path_hotspots.collect()}
        assert "/test3/foo/bar" not in paths

    def test_user_summary_pct(self, small):
        rep = small_files_report(small)
        rows = {r["user"]: r for r in rep.user_summary.collect()}
        assert rows["mm"]["count"] == 2
        assert rows["root"]["count"] == 1
        assert abs(rows["mm"]["pct_of_total"] - 200.0 / 3) < 1e-9
        assert abs(rows["root"]["pct_of_total"] - 100.0 / 3) < 1e-9

    def test_user_filter_full_match_pre_agg(self, small):
        """F2: FULL-match regex during aggregation; 'oo' matches nothing
        ('foo' requires ^foo$), overall stays unfiltered."""
        rep = small_files_report(small, user_filter="oo")
        assert rep.user_summary.count() == 0
        assert rep.overall.head()["small_files_total"] == 3
        rep2 = small_files_report(small, user_filter="ro+t")
        assert {r["user"] for r in rep2.user_summary.collect()} == {"root"}

    def test_bigger_limit(self, small):
        rep = small_files_report(small, limit_bytes=3 * MIB)
        # adds the exactly-2MiB file under /test3/foo/bar
        assert rep.overall.head()["small_files_total"] == 4
        hot = {r["path"]: r["count"] for r in rep.path_hotspots.collect()}
        assert hot["/test3/foo/bar"] == 1
        assert hot["/"] == 4

    def test_user_hotspots_ranked(self, small):
        rep = small_files_report(small)
        rows = rep.user_hotspots.collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user"], []).append((r["path"], r["count"]))
        # mm's small files: /test_2KiB.img (path /), /test3/test.img (path /test3)
        assert ("/", 2) in by_user["mm"]
        assert ("/test3", 1) in by_user["mm"]
        assert ("/", 1) in by_user["root"]


class TestUserUsage:
    """UserUsageReportCommandTest.java:26-65 golden values (FIXTURES.md §2):
    user=mm → /→172 MiB, /test3→172 MiB, /test3/foo→171 MiB,
    /test3/foo/bar→151 MiB (displayed; raw sums asserted here)."""

    def test_rollup_mm(self, small):
        got = {
            r["path"]: r["sum_size"]
            for r in user_usage_report(small, "mm", NOW_MS).collect()
        }
        # mm files by parent dir:
        # / : 2048; /test3: 1048576; /test3/foo: 20971520
        # /test3/foo/bar: 20971520+2097152+41943040+4145152+5181440+83886080
        bar = 20971520 + 2097152 + 41943040 + 4145152 + 5181440 + 83886080
        assert got["/test3/foo/bar"] == bar
        assert got["/test3/foo"] == bar + 20971520
        assert got["/test3"] == bar + 20971520 + 1048576
        assert got["/"] == bar + 20971520 + 1048576 + 2048
        # display parity (userusage uses rounded IEC format, unlike summary's
        # truncating MB column): golden /→172 MiB, /test3/foo→171, bar→151
        from hfsa_spark.functions.iec import format_iec

        assert format_iec(got["/"]) == "172 MiB"
        assert format_iec(got["/test3/foo"]) == "171 MiB"
        assert format_iec(bar) == "151 MiB"

    def test_case_insensitive_user(self, small):
        a = user_usage_report(small, "MM", NOW_MS).collect()
        b = user_usage_report(small, "mm", NOW_MS).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_age_filter(self, small):
        """F5: mtime < now - age. With now just after the 2017-07-08 file's
        mtime, a 7d age excludes it but keeps the June files."""
        july8 = 1499493600000  # /test_2KiB.img mtime ≈ 2017-07-08T08:00+02:00
        now = july8 + 86400_000  # July 9
        got = {
            r["path"]: r["sum_size"]
            for r in user_usage_report(small, "mm", now, age_ms=7 * 86400_000).collect()
        }
        assert got["/"] == 180246528 - 2048  # 2KiB file excluded

    def test_start_dir(self, small):
        got = {
            r["path"]: r["sum_size"]
            for r in user_usage_report(small, "mm", NOW_MS, dir="/test3/foo").collect()
        }
        # ancestor keys above the start dir still accumulate (aggregatePaths
        # rolls every visited file up to root), but only visited files count
        assert got["/"] == 180246528 - 2048 - 1048576
        bar = 20971520 + 2097152 + 41943040 + 4145152 + 5181440 + 83886080
        assert got["/test3/foo/bar"] == bar

    def test_limit(self, small):
        assert user_usage_report(small, "mm", NOW_MS, limit=2).count() == 2


class TestPathReport:
    """PathReportCommandTest.java:25-53 semantics."""

    def test_counts_include_root(self, small):
        rep = path_report(small)
        row = rep.counts.head()
        assert row["file_count"] == 11
        assert row["dir_count"] == 8  # root included (test :33)
        assert row["symlink_count"] == 0

    def test_listing_ordered_dedup(self, small):
        rep = path_report(small, dirs=["/test3", "/test3/foo"])
        paths = [r["full_path"] for r in rep.listing.collect()]
        assert paths == sorted(paths)
        assert len(paths) == len(set(paths))  # overlapping dirs dedup'd
        assert "/test3" in paths  # start dir itself listed

    def test_user_regex_full_match(self, small):
        rep = path_report(small, user_filter="fo.")
        rows = rep.listing.collect()
        assert {r["user"] for r in rows} == {"foo"}
        assert rep.counts.head()["file_count"] == 1

    def test_permission_column(self, small):
        rep = path_report(small, user_filter="foo")
        assert rep.listing.head()["permission"] == "foo:nobody:0644"


class TestInodeInfo:
    """InodeInfoCommandTest.java:25-82 semantics: id-or-path dispatch."""

    def test_by_id_and_path(self, small):
        out = inode_info(small, [16402, "/test3/test.img"])
        rows = {r["ref"]: r for r in out.collect()}
        assert rows["16402"]["full_path"] == "/test3/test_160MiB.img"
        assert rows["16402"]["mtime"] == 1497734744886
        assert rows["16402"]["atime"] == 1497734743534
        assert rows["/test3/test.img"]["file_size"] == 1048576

    def test_block_detail(self, small):
        out = inode_info(small, [16402]).head()
        assert out["num_blocks"] == 2
        assert [b["num_bytes"] for b in out["blocks"]] == [134217728, 33554432]

    def test_missing_ref_absent(self, small):
        out = inode_info(small, ["/nope", 99999])
        assert out.count() == 0

    def test_path_normalization(self, small):
        out = inode_info(small, ["//test3//test.img"])
        assert out.count() == 1


class TestApiFacade:
    """FsImageData API parity (FsImageLoaderTest.java assertions)."""

    def test_h32_totals(self, small_h32):
        rep = summary_report(small_h32)
        row = rep.overall.head()
        assert row["sum_directories"] == 14
        assert row["sum_files"] == 16
        assert row["sum_file_size"] == 356417536  # FsImageLoaderTest.java:192

    def test_h32_subtree_test3(self, small_h32):
        """Subtree /test3: 3 dirs, 10 files, Σ 348,025,856
        (FsImageLoaderTest.java:245-250)."""
        rep = summary_report(small_h32, dir="/test3")
        row = rep.overall.head()
        assert row["sum_directories"] == 3
        assert row["sum_files"] == 10
        assert row["sum_file_size"] == 348025856

    def test_point_lookups(self, small_h32):
        api = FsImageAnalytics(small_h32)
        assert api.has_inode("/datalake/asset2/test_2MiB.img")
        assert api.has_inode("//datalake//asset2/")  # normalization
        assert not api.has_inode("/nope")
        assert api.inode_by_id(16402).head()["full_path"] == "/test3/test_160MiB.img"

    def test_child_directories_with_predicate(self, small_h32):
        """FsImageLoaderTest.java:304-317."""
        api = FsImageAnalytics(small_h32)
        kids = sorted(r["full_path"] for r in api.child_directories("/datalake").collect())
        assert kids == ["/datalake/asset1", "/datalake/asset2", "/datalake/asset3"]
        filtered = api.child_directories("/datalake/", F.col("name").contains("2"))
        assert [r["full_path"] for r in filtered.collect()] == ["/datalake/asset2"]

    def test_file_inodes_in_directory(self, small_h32):
        api = FsImageAnalytics(small_h32)
        files = {r["name"] for r in api.file_inodes_in_directory("/datalake/asset2").collect()}
        assert files == {"test_1KiB.img", "test_2MiB.img"}

    def test_num_children(self, small_h32):
        api = FsImageAnalytics(small_h32)
        assert api.num_children("/datalake") == 3  # FsImageLoaderTest.java:233
        # dirMap degree counts files too: 5 dirs + /test_2KiB.img
        assert api.num_children("/") == 6

    def test_replication_changes(self, small_h32):
        """FsImageLoaderTest.java:220-231: 40MiB repl=1, 80MiB repl=3,
        4MiB repl=5."""
        api = FsImageAnalytics(small_h32)
        repl = {
            r["name"]: r["replication"]
            for r in api.file_inodes_in_directory("/test3/foo/bar").collect()
        }
        assert repl["test_40MiB.img"] == 1
        assert repl["test_80MiB.img"] == 3
        assert repl["test_4MiB.img"] == 5

    def test_visit_mapinpandas(self, small):
        """U1: visitor parity via Arrow-batched mapInPandas."""
        api = FsImageAnalytics(small)

        def only_files(batch):
            out = batch[batch["type"] == "FILE"][["full_path", "file_size"]]
            return out

        got = api.visit(only_files, "full_path string, file_size long", "/test3/foo/bar")
        assert got.count() == 6
        assert got.agg(F.sum("file_size")).head()[0] == (
            20971520 + 2097152 + 41943040 + 4145152 + 5181440 + 83886080
        )

    def test_errors(self, small):
        import pytest

        api = FsImageAnalytics(small)
        with pytest.raises(ValueError):
            api.inode_by_path("relative/path")
        with pytest.raises(FileNotFoundError):
            api.file_inodes_in_directory("/nope")
        with pytest.raises(NotADirectoryError):
            api.file_inodes_in_directory("/test_2KiB.img")
