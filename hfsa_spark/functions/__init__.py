"""Reusable Column-expression helpers (SURVEY.md §2.9 scalar functions and
§2.6 A2/A4 building blocks). Everything here is a pure JVM-side expression —
no Python UDFs in the hot path — so it stays inside whole-stage codegen.
"""

from hfsa_spark.functions.buckets import (
    size_bucket,
    bucket_borders,
    max_bucket_for,
)
from hfsa_spark.functions.paths import (
    normalize_path_expr,
    normalize_path,
    ancestors,
    path_concat,
    top_dir,
    subtree_predicate,
)
from hfsa_spark.functions.sizes import (
    file_size_from_blocks,
    consumed_size,
    effective_replication,
    storage_policy_name,
    EC_POLICIES,
)
from hfsa_spark.functions.iec import format_iec, parse_iec
from hfsa_spark.functions.perms import mode_octal, permission_triple, mode_rwx
from hfsa_spark.functions.ages import parse_age_ms

__all__ = [
    "size_bucket",
    "bucket_borders",
    "max_bucket_for",
    "normalize_path_expr",
    "normalize_path",
    "ancestors",
    "path_concat",
    "top_dir",
    "subtree_predicate",
    "file_size_from_blocks",
    "consumed_size",
    "effective_replication",
    "storage_policy_name",
    "EC_POLICIES",
    "format_iec",
    "parse_iec",
    "mode_octal",
    "permission_triple",
    "mode_rwx",
    "parse_age_ms",
]
