"""Library-parity facade (SURVEY.md §2.3 L1-L6, §2.11 U1-U3).

The reference's public library API is ``FsImageData`` (point lookups,
/root/reference lib/.../core/FsImageData.java) + ``FsVisitor`` (arbitrary
per-inode callbacks, lib/.../core/FsVisitor.java:21-45). Here the DataFrame
itself is the API; this facade provides the same entry points as thin
wrappers, with ``visit`` as the ``mapInPandas`` escape hatch for row-wise
user logic (Arrow-batched — never row-at-a-time Python).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import normalize_path, subtree_predicate


class FsImageAnalytics:
    """Query surface over the canonical ``inodes`` DataFrame."""

    def __init__(self, inodes: DataFrame):
        self._inodes = inodes

    def inodes(self) -> DataFrame:
        return self._inodes

    # -- point lookups (FsImageData.java) --

    def inode_by_id(self, inode_id: int) -> DataFrame:
        """L1 — FsImageLoader.java:173-198 (binary search → pruned scan)."""
        return self._inodes.filter(F.col("id") == inode_id)

    def inode_by_path(self, path: str) -> DataFrame:
        """L2 — FsImageData.getINodeFromPath (:77-118) with '//' collapse and
        trailing-slash strip (:321-336)."""
        if not path.startswith("/"):
            raise ValueError(f"path must be absolute: {path!r}")
        return self._inodes.filter(F.col("full_path") == normalize_path(path))

    def has_inode(self, path: str) -> bool:
        """L3 — FsImageData.java:128-136."""
        return not self.inode_by_path(path).isEmpty()

    def file_inodes_in_directory(self, path: str) -> DataFrame:
        """L4 — getFileINodesInDirectory (:46-64): direct FILE children.
        Raises if ``path`` is not a directory (reference parity)."""
        p = normalize_path(path)
        self._require_dir(p)
        return self._inodes.filter((F.col("path") == p) & (F.col("type") == "FILE"))

    def child_directories(self, path: str, predicate: Column | None = None) -> DataFrame:
        """L5 — getChildDirectories (:145-175), optional child predicate (U3)."""
        p = normalize_path(path)
        # exclude the dir itself: the root row carries path '/', so a plain
        # path filter would list '/' as its own child
        out = self._inodes.filter(
            (F.col("path") == p) & (F.col("type") == "DIRECTORY") & (F.col("full_path") != p)
        )
        if predicate is not None:
            out = out.filter(predicate)
        return out

    def num_children(self, path: str) -> int:
        """L6 — dirMap degree query (:186-199)."""
        p = normalize_path(path)
        return self._inodes.filter(F.col("path") == p if p != "/" else (F.col("path") == "/") & (F.col("full_path") != "/")).count()

    def _require_dir(self, p: str) -> None:
        row = self._inodes.filter(F.col("full_path") == p).select("type").head()
        if row is None:
            raise FileNotFoundError(p)
        if row["type"] != "DIRECTORY":
            raise NotADirectoryError(p)

    # -- the five reports (tool parity, one call each) --

    def summary(self, dir: str = "/", **kw):
        from hfsa_spark.operators.summary import summary_report

        return summary_report(self._inodes, dir=dir, **kw)

    def small_files(self, dir: str = "/", **kw):
        from hfsa_spark.operators.smallfiles import small_files_report

        return small_files_report(self._inodes, dir=dir, **kw)

    def user_usage(self, user: str, now_ms: int, **kw) -> DataFrame:
        from hfsa_spark.operators.userusage import user_usage_report

        return user_usage_report(self._inodes, user=user, now_ms=now_ms, **kw)

    def path_report(self, dirs: list[str] | None = None, **kw):
        from hfsa_spark.operators.pathreport import path_report

        return path_report(self._inodes, dirs=dirs, **kw)

    def inode_info(self, refs: list) -> DataFrame:
        from hfsa_spark.operators.inodeinfo import inode_info

        return inode_info(self._inodes, refs)

    # -- subtree scan + visitor escape hatch --

    def subtree(self, path: str = "/") -> DataFrame:
        """T1/T3 — the subtree scan that replaces tree traversal; includes
        the start dir itself (FsVisitor.java:114-132)."""
        return self._inodes.filter(subtree_predicate("full_path", path))

    def visit(
        self,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema,
        path: str = "/",
    ) -> DataFrame:
        """U1 — FsVisitor parity: arbitrary per-inode logic, executed as an
        Arrow-batched ``mapInPandas`` over the subtree scan. ``fn`` receives
        pandas batches of inode rows and yields result batches of ``schema``."""

        def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                out = fn(batch)
                if out is not None and len(out):
                    yield out

        return self.subtree(path).mapInPandas(runner, schema=schema)
