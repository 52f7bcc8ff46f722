"""The canonical ``inodes`` DataFrame schema (SURVEY.md §1.3, FIXTURES.md §1).

One flat row per namespace inode with the path pre-materialized, replacing the
reference's three in-memory structures (sorted protobuf byte[][] repository,
parent→children dirMap, string table — /root/reference lib/.../core/
FsImageLoader.java:105-147,315-376) with a single columnar table. Paths are
materialized at extract time so every tree traversal in the reference becomes
a plain scan with a pushed-down predicate.
"""

from __future__ import annotations

from pyspark.sql import types as T

ROOT_INODE_ID = 16385  # Hadoop INodeId.ROOT_INODE_ID (FsImageLoader.java:118,194)

# Default preferred block size used by fixtures (128 MiB).
DEFAULT_BLOCK_SIZE = 134217728

BLOCK_STRUCT = T.StructType(
    [
        T.StructField("block_id", T.LongType()),
        T.StructField("gen_stamp", T.LongType()),
        T.StructField("num_bytes", T.LongType()),
    ]
)

INODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),  # NULL for root
        T.StructField("name", T.StringType(), False),  # '' for root
        T.StructField("type", T.StringType(), False),  # FILE | DIRECTORY | SYMLINK
        T.StructField("path", T.StringType(), False),  # abs path of PARENT dir
        T.StructField("full_path", T.StringType(), False),  # path + '/' + name
        T.StructField("depth", T.IntegerType(), False),  # root = 0
        T.StructField("user", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("mode", T.IntegerType(), False),  # 16-bit POSIX bits
        T.StructField("mtime", T.LongType(), False),  # epoch millis
        T.StructField("atime", T.LongType(), False),
        T.StructField("replication", T.IntegerType(), False),  # 0 for non-files
        T.StructField("preferred_block_size", T.LongType(), False),
        T.StructField("storage_policy_id", T.IntegerType(), False),
        T.StructField("ec_policy_id", T.IntegerType(), False),  # 0 = none
        T.StructField("ns_quota", T.LongType(), False),  # -1 = unset
        T.StructField("ds_quota", T.LongType(), False),
        T.StructField("symlink_target", T.StringType(), True),
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT), True),
        T.StructField("file_size", T.LongType(), False),  # Σ blocks.num_bytes
        T.StructField("consumed_size", T.LongType(), False),  # repl/EC aware
        T.StructField("num_blocks", T.IntegerType(), False),
    ]
)

INODES_DDL = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in INODES_SCHEMA.fields)
