"""Extract layer: raw inode records → the canonical ``inodes`` DataFrame.

The reference performs binary fsimage parsing + in-memory indexing on every
run (/root/reference lib/.../core/FsImageLoader.java:286-313). Spark-first,
that work happens ONCE at extract time (path materialization, permission
decode, derived size columns) and lands in parquet partitioned by top-level
directory, after which every report is a scan with pushdown.
"""

from hfsa_spark.extract.pathmat import materialize_paths, finalize_inodes
from hfsa_spark.extract.fixtures import (
    fsi_small,
    fsi_small_h3_2,
    empty_image,
    generated_namespace,
)
from hfsa_spark.extract.oiv import read_oiv_delimited

__all__ = [
    "materialize_paths",
    "finalize_inodes",
    "fsi_small",
    "fsi_small_h3_2",
    "empty_image",
    "generated_namespace",
    "read_oiv_delimited",
]
