"""Streaming kNN-graph maintenance — keep the corpus graph current as
embedding batches arrive.

`IncrementalKnnGraph` is the graph-tier sibling of dedup.IncrementalNearDup
(same foreachBatch + per-batch-idempotent parquet state contract): each
micro-batch appends its rows to the corpus state and produces a NEW graph
VERSION via the exact merge `nndescent.knn_graph_add` (new→old, new→new,
old→new reverse repair through the distributed kNN join). Because the
merge is exact and composes, the standing law is strong:

    graph after batches B1..Bn  ==  knn_graph_auto(B1 ∪ ... ∪ Bn)

bit-for-bit, for ANY batch split — the chunk-invariance twin law every
streaming operator in this package pins (tests/test_streaming.py).

State layout (all writes per-batch idempotent: batch=<id> subdirs with
overwrite, the ingest.IncrementalCorpus contract):
- root/corpus/batch=<id>/  — the batch's (id, vector) rows. A replayed
  batch excludes its OWN previous write when reading state.
- root/graph/batch=<id>/   — the full graph version AFTER that batch:
  (src, rn, neighbor_id, score) — ids and scores only, never vectors,
  so a version costs O(N·k) small rows (a billion-node k=3 graph is
  ~3e9 24-byte rows — a compact relation, not a corpus copy). Replay
  reads the latest version with batch < its own id, so a re-delivered
  micro-batch recomputes the identical version it wrote before.
  `compact()` drops superseded versions once the stream is quiesced.

Scale shape: per batch, one pass over the old corpus + one pass of the
old ids against the small new block (knn_join block-matrix tiles — no
driver state), so maintenance cost is O(N·|batch|/blocks) per batch
instead of the O(N²) rebuild the batch entry pays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators import nndescent


class IncrementalKnnGraph:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 3,
    ):
        self.spark = spark
        self.root = root
        self.id_col, self.vec_col, self.k = id_col, vec_col, k
        self.corpus_path = os.path.join(root, "corpus")
        self.graph_path = os.path.join(root, "graph")

    # ---------------------------------------------------------- state
    def _corpus_before(self, exclude_batch: int) -> DataFrame | None:
        try:
            df = self.spark.read.parquet(self.corpus_path)
        except Exception:
            return None  # first batch
        df = df.where(F.col("batch").cast("string") != str(exclude_batch))
        return df.drop("batch") if df.limit(1).count() else None

    def _graph_before(self, exclude_batch: int) -> DataFrame | None:
        try:
            df = self.spark.read.parquet(self.graph_path)
        except Exception:
            return None
        prior = df.where(F.col("batch") < exclude_batch)
        row = prior.agg(F.max("batch").alias("m")).collect()[0]
        if row.m is None:
            return None
        return prior.where(F.col("batch") == row.m).drop("batch")

    # ---------------------------------------------------------- ingest
    def ingest_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is None:
            batch_id = 0
        rows = batch.select(self.id_col, self.vec_col)
        old = self._corpus_before(exclude_batch=batch_id)
        if old is None:
            graph = nndescent.knn_graph_auto(
                rows, id_col=self.id_col, vec_col=self.vec_col, k=self.k
            )
        else:
            prev = self._graph_before(exclude_batch=batch_id)
            if prev is None:
                # corpus state exists but no prior version (e.g. version
                # dirs compacted away mid-replay) — rebuild honestly
                graph = nndescent.knn_graph_auto(
                    old.unionByName(rows),
                    id_col=self.id_col,
                    vec_col=self.vec_col,
                    k=self.k,
                )
            else:
                graph = nndescent.knn_graph_add(
                    prev,
                    old,
                    rows,
                    id_col=self.id_col,
                    vec_col=self.vec_col,
                    k=self.k,
                )
        graph.write.mode("overwrite").parquet(
            os.path.join(self.graph_path, f"batch={batch_id}")
        )
        rows.write.mode("overwrite").parquet(
            os.path.join(self.corpus_path, f"batch={batch_id}")
        )

    # ---------------------------------------------------------- access
    def graph(self) -> DataFrame:
        df = self.spark.read.parquet(self.graph_path)
        latest = df.agg(F.max("batch").alias("m")).collect()[0].m
        return df.where(F.col("batch") == latest).drop("batch")

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_path).drop("batch")

    def compact(self) -> None:
        """Drop superseded graph versions (keep the latest) and fold the
        corpus batch dirs. Offline maintenance — run while quiesced."""
        import shutil

        df = self.spark.read.parquet(self.graph_path)
        latest = df.agg(F.max("batch").alias("m")).collect()[0].m
        for name in os.listdir(self.graph_path):
            if name.startswith("batch=") and name != f"batch={latest}":
                shutil.rmtree(os.path.join(self.graph_path, name))
        from homemade_vector_db_spark.sources.maintenance import (
            compact_batched_state,
        )

        compact_batched_state(self.spark, self.corpus_path)

    def attach_stream(self, stream: DataFrame, checkpoint: str | None = None):
        """stream must carry (id_col, vec_col); returns the StreamingQuery."""
        return (
            stream.writeStream.foreachBatch(self.ingest_batch)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.root, "_kg_checkpoint"),
            )
            .outputMode("append")
            .start()
        )
