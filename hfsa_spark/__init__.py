"""hfsa_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of marcelmay/hfsa (HDFS FSImage Analyzer).

Design stance (SURVEY.md §7): extract once → a flat ``inodes`` DataFrame with
materialized paths → every report is a short declarative DataFrame/SQL query
that Catalyst optimizes (predicate pushdown, column pruning, broadcast joins,
AQE). The reference's loader/visitor machinery collapses into one ETL job;
reports are 10–30 lines of DataFrame code each.

Reference parity citations use ``file:line`` within /root/reference (the
Java implementation of marcelmay/hfsa).
"""

from hfsa_spark.schema import INODES_SCHEMA, INODES_DDL
from hfsa_spark.session import get_spark
from hfsa_spark.api import FsImageAnalytics

__version__ = "0.1.0"

__all__ = [
    "INODES_SCHEMA",
    "INODES_DDL",
    "get_spark",
    "FsImageAnalytics",
    "__version__",
]
