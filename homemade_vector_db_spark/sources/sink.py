"""Python DataSource WRITER (Spark 4): an audit/stats sink.

Completes the DSv2-in-Python surface next to the `fake_docs` reader
(sources/generator.py): `stats_sink` is a write-path data source whose
per-task writers emit (row count, order-insensitive checksum) commit
messages and whose driver-side commit() folds them into one JSON
manifest — the canonical "audit sink" used to validate a pipeline's
output cardinality/content without materializing a second copy.

Contract points exercised (the parts that matter on a real cluster):
- write(iterator) runs once per partition on executors; it must not
  touch the driver. The checksum is a commutative fold (sum of per-row
  64-bit hashes mod 2^64) so the manifest is independent of partitioning
  and row order — re-partitioning the same data yields the same digest.
- Each task returns a WriterCommitMessage; ONLY commit(messages) on the
  driver performs the externally visible write (manifest), so failed /
  speculative tasks never corrupt the output — exactly-once at the
  manifest level on top of at-least-once task attempts.
- abort() leaves no partial manifest.

Usage:
    spark.dataSource.register(StatsSinkDataSource)
    df.write.format("stats_sink").option("path", p).mode("append").save()
    json.load(open(os.path.join(p, "manifest.json")))
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

_MOD = 1 << 64


@dataclass
class _StatsCommit(WriterCommitMessage):
    rows: int
    checksum: int


def _row_digest(row) -> int:
    # stdlib-only stable digest of the row's repr-normalized fields;
    # executors may lack any particular hash lib, but hashlib is stdlib
    import hashlib

    payload = "\x1f".join(str(v) for v in row).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")


class _StatsWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("stats_sink requires option('path', ...)")

    def write(self, iterator) -> _StatsCommit:
        rows = 0
        checksum = 0
        for row in iterator:
            rows += 1
            checksum = (checksum + _row_digest(row)) % _MOD
        return _StatsCommit(rows=rows, checksum=checksum)

    def commit(self, messages) -> None:
        rows = sum(m.rows for m in messages)
        checksum = sum(m.checksum for m in messages) % _MOD
        os.makedirs(self.path, exist_ok=True)
        manifest = {
            "rows": rows,
            "checksum": f"{checksum:016x}",
            "partitions": len(list(messages)),
        }
        tmp = os.path.join(self.path, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))

    def abort(self, messages) -> None:
        # nothing externally visible was written before commit()
        pass


class StatsSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stats_sink"

    def writer(self, schema, overwrite: bool) -> _StatsWriter:
        return _StatsWriter(self.options)
