"""Incremental execution of join/agg pipelines (Structured Streaming path).

Implemented in the streaming milestone; builders import lazily so the batch
twin works standalone.
"""

from __future__ import annotations


class IncrementalJoinWriter:
    def __init__(self, builder, path, partition_by=(), foreach_batch=None):
        raise NotImplementedError("incremental join writer lands with the streaming milestone")


class IncrementalAggWriter:
    def __init__(self, builder, path):
        raise NotImplementedError("incremental agg writer lands with the streaming milestone")
