"""Report operators (SURVEY.md §2) — each a declarative DataFrame builder
over the canonical ``inodes`` table, plus the beyond-reference training-data
pipeline operators (dedup, similarity, text, multimodal)."""

from hfsa_spark.operators.rollup import ancestor_rollup
from hfsa_spark.operators.summary import summary_report
from hfsa_spark.operators.smallfiles import small_files_report
from hfsa_spark.operators.userusage import user_usage_report
from hfsa_spark.operators.pathreport import path_report
from hfsa_spark.operators.inodeinfo import inode_info

__all__ = [
    "ancestor_rollup",
    "summary_report",
    "small_files_report",
    "user_usage_report",
    "path_report",
    "inode_info",
]
