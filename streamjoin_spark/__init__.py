"""streamjoin_spark — a PySpark-native incremental analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of
LeoneGarage/StreamJoin (incremental stream-stream joins and aggregations
without watermarks, state in storage not in Spark state stores), plus a
batch twin for every operator and a suite of large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Storage substrate: a versioned-parquet changelog (``ChangeTable``) standing
in for Delta CDF — same ``_change_type`` / ``_commit_version`` data model,
swappable for Delta/Iceberg on a real cluster.
"""

from .columns import ColumnRef, Expr, lit
from .session import get_spark
from .streams import Stream, prune

__all__ = ["Stream", "prune", "get_spark", "ColumnRef", "Expr", "lit"]
__version__ = "0.1.0"
