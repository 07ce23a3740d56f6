"""Python DataSource V2 WRITER (Spark 4, SPARK-44076): sharded JSONL
sink with an atomic manifest.

The write-side complement of sources/pyds_finwire.py's reader: a
user-defined sink that plugs into ``df.write.format("jsonl_manifest")``
— per-partition shard files written on executors, one
``WriterCommitMessage`` per task carrying (shard, row count), and a
driver-side ``commit()`` that publishes ``_MANIFEST.json`` only after
every task succeeded (the manifest IS the commit point: readers that
honor it never observe a partial write; ``abort()`` removes orphan
shards). Use this shape when emitting a format Spark has no writer for
(feature-store pushes, custom index files); scale comes from one shard
per partition with no driver data movement — only the tiny commit
messages travel.

Local-mode note: shards land on the shared local filesystem; a cluster
deployment points ``path`` at shared storage and writes through a
task-attempt temp name + rename for idempotent retries.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class ShardCommit(WriterCommitMessage):
    shard: str
    n_rows: int


class JsonlManifestDataSource(DataSource):
    """``df.write.format("jsonl_manifest").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":  # noqa: ARG002
        return JsonlManifestWriter(self.options)


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self._path = options["path"]

    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        os.makedirs(self._path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        shard = os.path.join(self._path, f"shard-{pid:05d}.jsonl")
        n = 0
        with open(shard, "w", encoding="utf-8") as fh:
            for row in iterator:
                # json.dumps of Python floats is shortest-roundtrip repr,
                # so doubles survive write -> spark.read.json exactly
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return ShardCommit(shard=shard, n_rows=n)

    def commit(self, messages) -> None:
        manifest = {
            "shards": sorted(
                (
                    {"shard": os.path.basename(m.shard), "n_rows": m.n_rows}
                    for m in messages
                    if m is not None
                ),
                key=lambda s: s["shard"],
            ),
            "n_total": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self._path, "._MANIFEST.json.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self._path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.shard):
                os.remove(m.shard)
