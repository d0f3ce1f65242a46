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
        self._recover_compact()

    def _recover_compact(self) -> None:
        """Crash recovery for compact()'s two-rename swap (ADVICE r12):
        between `old aside` and `new in` there is a window where
        corpus_path does not exist and the only complete copy sits at
        _compact_bak. Restore it whenever we observe that state — at
        startup, at compact entry, and before any corpus read — so a
        crash inside the window never strands the corpus."""
        bak = self.corpus_path.rstrip("/") + "_compact_bak"
        if not os.path.isdir(self.corpus_path) and os.path.isdir(bak):
            os.replace(bak, self.corpus_path)

    # ---------------------------------------------------------- state
    def _corpus_before(self, exclude_batch: int) -> DataFrame | None:
        """Live corpus view across batch dirs: the LATEST batch's row
        wins per id (an update_batch supersedes the original row; a
        delete_batch writes a `_deleted` tombstone that wins the same
        way — VERDICT r10 Next #7). Append-only dirs stay the storage
        law; mutation is a read-time window, the standard columnar
        merge-on-read. Pre-mutation state (no `_deleted` column) reads
        as live via mergeSchema + coalesce."""
        from pyspark.sql.window import Window

        self._recover_compact()
        try:
            df = self.spark.read.option("mergeSchema", "true").parquet(
                self.corpus_path
            )
        except Exception:
            return None  # first batch
        df = df.where(F.col("batch").cast("string") != str(exclude_batch))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        # try_cast: the compacted dir's batch value is the string
        # 'compacted' — it sorts as NULL (last under desc), i.e. older
        # than every numeric mutation batch, which is exactly the law
        w = Window.partitionBy(self.id_col).orderBy(
            F.desc(F.expr("try_cast(batch AS long)"))
        )
        live = (
            df.withColumn("_v", F.row_number().over(w))
            .where(
                (F.col("_v") == 1)
                & ~F.coalesce(F.col("_deleted"), F.lit(False))
            )
            .select(self.id_col, self.vec_col)
        )
        return live if live.limit(1).count() else None

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

    # ---------------------------------------------------------- mutate
    def delete_batch(self, ids, batch_id: int) -> None:
        """Mutation-driven maintenance (VERDICT r10 Next #7): remove ids
        and repair ONLY the nodes that lost a neighbor
        (nndescent.knn_graph_delete — exact, one mutation-sized pass,
        no NN-Descent rebuild). Writes a new graph version plus
        `_deleted` tombstone rows that supersede the original corpus
        rows under the latest-batch-wins read law. Per-batch idempotent
        like ingest_batch."""
        old = self._corpus_before(exclude_batch=batch_id)
        if old is None:
            raise ValueError("delete_batch on empty graph state")
        prev = self._graph_before(exclude_batch=batch_id)
        id_list = [int(i) for i in ids]
        if prev is None:
            graph = nndescent.knn_graph_auto(
                old.where(~F.col(self.id_col).isin(id_list)),
                id_col=self.id_col,
                vec_col=self.vec_col,
                k=self.k,
            )
        else:
            graph = nndescent.knn_graph_delete(
                prev,
                old,
                id_list,
                id_col=self.id_col,
                vec_col=self.vec_col,
                k=self.k,
            )
        graph.write.mode("overwrite").parquet(
            os.path.join(self.graph_path, f"batch={batch_id}")
        )
        tombs = old.where(F.col(self.id_col).isin(id_list)).withColumn(
            "_deleted", F.lit(True)
        )
        tombs.write.mode("overwrite").parquet(
            os.path.join(self.corpus_path, f"batch={batch_id}")
        )

    def update_batch(self, rows: DataFrame, batch_id: int) -> None:
        """In-place vector update (ids stable — the db.update contract):
        strip + re-insert via nndescent.knn_graph_update (exact, no
        rebuild). The replacement rows supersede the originals under
        the latest-batch-wins corpus law."""
        new = rows.select(self.id_col, self.vec_col)
        old = self._corpus_before(exclude_batch=batch_id)
        if old is None:
            raise ValueError("update_batch on empty graph state")
        prev = self._graph_before(exclude_batch=batch_id)
        if prev is None:
            upd = new
            keep = old.join(new.select(self.id_col), self.id_col, "left_anti")
            graph = nndescent.knn_graph_auto(
                keep.unionByName(upd),
                id_col=self.id_col,
                vec_col=self.vec_col,
                k=self.k,
            )
        else:
            graph = nndescent.knn_graph_update(
                prev,
                old,
                new,
                id_col=self.id_col,
                vec_col=self.vec_col,
                k=self.k,
            )
        graph.write.mode("overwrite").parquet(
            os.path.join(self.graph_path, f"batch={batch_id}")
        )
        new.write.mode("overwrite").parquet(
            os.path.join(self.corpus_path, f"batch={batch_id}")
        )

    # ---------------------------------------------------------- access
    def graph(self) -> DataFrame:
        df = self.spark.read.parquet(self.graph_path)
        latest = df.agg(F.max("batch").alias("m")).collect()[0].m
        return df.where(F.col("batch") == latest).drop("batch")

    def corpus(self) -> DataFrame:
        # merge-on-read live view: latest batch wins per id, tombstones
        # excluded (exclude_batch=-1 matches no real batch dir)
        live = self._corpus_before(exclude_batch=-1)
        if live is None:
            raise ValueError("empty graph state")
        return live

    def compact(self) -> None:
        """Drop superseded graph versions (keep the latest) and fold the
        corpus batch dirs. Offline maintenance — run while quiesced."""
        import shutil

        self._recover_compact()
        df = self.spark.read.parquet(self.graph_path)
        latest = df.agg(F.max("batch").alias("m")).collect()[0].m
        for name in os.listdir(self.graph_path):
            if name.startswith("batch=") and name != f"batch={latest}":
                shutil.rmtree(os.path.join(self.graph_path, name))
        # The corpus must compact through the LIVE view (latest batch
        # wins per id, tombstones dropped) — a raw fold of the batch
        # dirs would put superseded rows and tombstones into one batch
        # and collapse the merge-on-read law. Materialize live rows,
        # then swap via RENAMES (ADVICE r11 item 2): the old dir moves
        # ASIDE first and is deleted LAST, so a crash at any point
        # leaves at least one complete copy at a well-known path (the
        # previous rmtree-then-replace had a window with no corpus dir
        # at all). When every row is tombstoned, an EMPTY compacted
        # batch (schema-preserving limit(0)) keeps the corpus dir
        # present and readable instead of vanishing.
        if not os.path.isdir(self.corpus_path):
            return  # no corpus state yet — nothing to compact
        live = self._corpus_before(exclude_batch=-1)
        if live is None:
            live = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(self.corpus_path)
                .select(self.id_col, self.vec_col)
                .limit(0)
            )
        tmp = self.corpus_path.rstrip("/") + "_compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        live.write.mode("overwrite").parquet(
            os.path.join(tmp, "batch=compacted")
        )
        bak = self.corpus_path.rstrip("/") + "_compact_bak"
        shutil.rmtree(bak, ignore_errors=True)
        os.replace(self.corpus_path, bak)  # old aside (atomic)
        os.replace(tmp, self.corpus_path)  # new in (atomic)
        shutil.rmtree(bak)  # old copy deleted last

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
