"""Synthetic-corpus data source via the Python DataSource API (Spark 4).

The reference ingests whatever Python lists the caller holds in memory
(add(), /root/reference/local_db.py:56-75). At cluster scale the analogous
dev/test need — "give me a corpus of N documents shaped like production" —
must itself be distributed: materializing synthetic data on the driver and
parallelizing it ships the whole corpus through one process. This module
registers a first-class `fake_docs` format instead:

    spark.dataSource.register(FakeDocsDataSource)
    spark.read.format("fake_docs").option("n", 100_000).load()

Scale properties:
- PARTITIONED GENERATION: `partitions()` splits [0, n) into row ranges;
  each executor generates only its slice. No driver materialization, no
  single-point bottleneck — generation parallelism == requested partitions.
- DETERMINISM: row content is a pure function of (seed, doc_id) via
  splitmix64 — same corpus on every run, every retry, any partitioning.
  The same generator drives the batch and streaming paths, so a streaming
  pipeline can be validated against its batch twin row-for-row.
- NO FILTER PUSHDOWN (round 12, deliberate): Spark reuses one reader per
  loaded relation across every scan of a plan, and branches with
  un-pushable predicates never call pushFilters — so any range clamp set
  by one branch silently prunes rows out of its siblings (measured:
  doc_id 0 lost from a union whose other branch pushed doc_id > 0).
  Spark post-applies all predicates itself; generation is cheap enough
  that source-side pruning bought nothing real.
- STREAMING: `fake_docs` also implements a microbatch stream reader whose
  offset is the next doc_id — an unbounded, replayable document feed for
  exercising the streaming ingest/dedup/decontam gates without files.
  Offsets are plain ints; a restarted query resumes exactly (the offset
  log is the source of truth, generation is stateless).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    pass

SCHEMA_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

_WORDS = (
    "spark table row scan filter join agg window sort hash merge batch "
    "stream key value part query vector data column the a fast slow big "
    "small line order customer group"
).split()
_LANGS = ("en", "de", "fr", "es", "pt")


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _gen_row(seed: int, doc_id: int):
    h = _splitmix64(seed * 0x100000001B3 + doc_id)
    n_words = 5 + (h % 40)
    words = []
    w = h
    for _ in range(n_words):
        w = _splitmix64(w)
        words.append(_WORDS[w % len(_WORDS)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[_splitmix64(h ^ 0xA5A5) % len(_LANGS)],
        f"src{_splitmix64(h ^ 0x5A5A) % 8}",
        len(text),
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int
    seed: int


class _FakeDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numpartitions", 8))

    # Round 12: pushFilters/range-clamping REMOVED — deliberately. Spark
    # creates ONE reader per loaded relation and reuses it for every scan
    # of that relation in a plan; a branch whose filters are not pushable
    # (e.g. an OR) never calls pushFilters, so it inherits whatever range
    # another branch's pushed predicates clamped onto the shared reader.
    # Measured: doc_id 0 silently missing from a base∪dups union because
    # the dups branch pushed doc_id > 0 — a correctness bug no clamp
    # bookkeeping can fix, since the un-called branch is invisible to the
    # reader. Without pushFilters, Spark applies every predicate itself
    # (post-scan, exact in all sharing scenarios); generation cost is a
    # splitmix64 stream per row, so the pruning this gives up is
    # microseconds at any tested scale. Real pruning for derived corpora
    # belongs in a file-backed source (parquet min/max), not a generator.

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = 0, self.n
        p = max(1, self.num_partitions)
        step = max(1, (hi - lo + p - 1) // p)
        return [
            _RangePartition(s, min(s + step, hi), self.seed)
            for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo, self.seed)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _gen_row(partition.seed, i)


class _FakeDocsStreamReader(DataSourceStreamReader):
    """Microbatch feed: offset = next doc_id to emit; each latestOffset
    advances by `rate` docs. Generation is the same pure function as the
    batch reader, so replays reproduce bytes exactly."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rate = int(options.get("rate", 100))
        self.num_partitions = int(options.get("numpartitions", 4))
        # maxDocs bounds the feed (so availableNow/processAllAvailable
        # terminate — the testing mode); default is an unbounded stream
        self.max_docs = int(options.get("maxdocs", -1))
        self._current = 0

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        self._current += self.rate
        if self.max_docs >= 0:
            self._current = min(self._current, self.max_docs)
        return {"next": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # RESTART fast-forward: a restarted query re-plans from the OFFSET
        # LOG, not from this (fresh) reader instance, so `_current` may be
        # behind the logged offsets. Without this clamp, the next
        # latestOffset() could return an offset BELOW the committed one —
        # the engine would record it and rewind the stream, re-emitting
        # already-committed ranges as duplicates (caught by the restart
        # test in tests/test_formats.py).
        self._current = max(self._current, int(end["next"]))
        lo, hi = int(start["next"]), int(end["next"])
        p = max(1, self.num_partitions)
        step = max(1, (hi - lo + p - 1) // p)
        return [
            _RangePartition(s, min(s + step, hi), self.seed)
            for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo, self.seed)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _gen_row(partition.seed, i)

    def commit(self, end: dict) -> None:
        pass  # stateless: the offset log is the only state

    def stop(self) -> None:
        pass


class FakeDocsDataSource(DataSource):
    """`format("fake_docs")` — see module docstring. Options: n, seed,
    numPartitions (batch); seed, rate, numPartitions (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "fake_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FakeDocsReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _FakeDocsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeDocsDataSource)
