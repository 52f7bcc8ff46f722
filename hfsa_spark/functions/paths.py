"""Path expressions: normalization, concatenation, ancestor expansion,
subtree predicates (reference FsImageData.normalizePath
/root/reference lib/.../core/FsImageData.java:321-336; path concat
FsVisitor.java:140-145; ancestor rollup SmallFilesReportCommand.java:317-334).

All are pure Catalyst expressions (higher-order functions), so ancestor
expansion — the one aggregation pattern Spark lacks built-in (SURVEY.md §4
item 2) — stays JVM-side: explode-of-prefixes + re-aggregate, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_path_expr(p: Column | str) -> Column:
    """Collapse ``//+`` to ``/`` and strip the trailing slash (except root).

    Mirrors FsImageData.normalizePath (FsImageData.java:321-336); semantics
    pinned by FsImageLoaderTest.java:418-425.
    """
    c = F.col(p) if isinstance(p, str) else p
    collapsed = F.regexp_replace(c, "/{2,}", "/")
    return F.when(
        (F.length(collapsed) > 1) & collapsed.endswith("/"),
        collapsed.substr(F.lit(1), F.length(collapsed) - 1),
    ).otherwise(collapsed)


def normalize_path(p: str) -> str:
    """Driver-side twin of :func:`normalize_path_expr` (CLI argument prep)."""
    import re

    out = re.sub("/{2,}", "/", p)
    if len(out) > 1 and out.endswith("/"):
        out = out[:-1]
    return out


def path_concat(parent: Column | str, name: Column | str) -> Column:
    """``parent + '/' + name`` with the root special-case avoiding ``//``
    (FsVisitor.java:140-145, PathReportCommand.java:114-115)."""
    p = F.col(parent) if isinstance(parent, str) else parent
    n = F.col(name) if isinstance(name, str) else name
    return F.when(p == "/", F.concat(F.lit("/"), n)).otherwise(F.concat(p, F.lit("/"), n))


def ancestors(p: Column | str) -> Column:
    """Array of every ancestor prefix of an absolute path, *including the
    path itself and the root* — the key set the reference's
    ``aggregatePaths`` adds each path's stats into
    (SmallFilesReportCommand.java:317-334, UserUsageReportCommand.java:216-233).

    ``/a/b`` → ``['/', '/a', '/a/b']``;  ``/`` → ``['/']``.

    Usage (ancestor rollup A4)::

        df.withColumn("anc", F.explode(ancestors("path")))\
          .groupBy("anc").agg(F.sum("cnt"))
    """
    c = F.col(p) if isinstance(p, str) else p
    parts = F.split(c, "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.when(i == 1, F.lit("/")).otherwise(
            F.array_join(F.slice(parts, F.lit(1), i), "/")
        ),
    )
    return F.array_distinct(prefixes)


def top_dir(full_path: Column | str) -> Column:
    """First path segment (`/a/b/c` → `a`, root → ``''``) — the recommended
    extract-time partition column (SURVEY.md §4: partition-by-top-dir makes
    subtree queries partition-prunable)."""
    c = F.col(full_path) if isinstance(full_path, str) else full_path
    return F.split(c, "/").getItem(1)


def subtree_predicate(full_path: Column | str, start_dir: str) -> Column:
    """Predicate selecting a subtree rooted at ``start_dir`` — the start dir
    itself is included, matching the visitor which fires ``onDirectory`` for
    the start dir (FsVisitor.java:114-132, SURVEY.md §2 T3)."""
    c = F.col(full_path) if isinstance(full_path, str) else full_path
    d = normalize_path(start_dir)
    if d == "/":
        return F.lit(True)
    return (c == d) | c.startswith(d + "/")
