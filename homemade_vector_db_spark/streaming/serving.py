"""Streaming k-NN serving — answer a live stream of query vectors
against a static corpus.

The online-serving path the batch-only reference cannot express
(/root/reference/README.md:148): queries arrive continuously, each
micro-batch is answered with exact top-k against the (large, static)
corpus, and answers land in a replayable result log.

Why foreachBatch and not a stream-static join: Spark's stream-static
join broadcasts/loops the STATIC side per micro-batch, which is exactly
wrong here — the corpus is the big side and the per-batch query set is
tiny. Inside foreachBatch the micro-batch is an ordinary DataFrame, so
we reuse the batch `knn_batch` operator (partition-local top-k heaps
against BROADCAST queries; shuffle carries p×Q×k candidate rows, never
the corpus). Per-batch results are written to a batch_id-keyed directory
with overwrite, so at-least-once replays of a failed micro-batch rewrite
their own output instead of duplicating it (same idempotency contract as
streaming/ingest.py:22).

At 100 TB the corpus scan per micro-batch is the cost driver; production
would front this with one of the ANN tiers (swap `knn_batch` for the
LSH/IVF/BQ shortlist + rerank — same plumbing, `ann.ann_knn_batch`).
Exact is the default here because it is the deterministic,
oracle-checkable contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from homemade_vector_db_spark.operators.knn import knn_batch


class KnnServer:
    """Answers micro-batches of queries against a fixed corpus."""

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        root: str,
        k: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
        qvec_col: str = "qv",
        answer_fn=None,
    ):
        """`answer_fn(corpus, queries, k) -> DataFrame[(query_id, id,
        score, rn)]` overrides the exact operator — the ANN drop-in
        point (default: knn.knn_batch)."""
        self.answer_fn = answer_fn
        self.spark = spark
        self.corpus = corpus
        self.root = root
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col
        self.query_id_col, self.qvec_col = query_id_col, qvec_col
        os.makedirs(root, exist_ok=True)
        self._adhoc = 0

    def _next_adhoc_id(self) -> int:
        # direct (non-streaming) calls: one past the largest batch dir,
        # monotone per process; checkpointed streams always pass batch_id
        try:
            existing = [
                int(d.split("=", 1)[1])
                for d in os.listdir(self.root)
                if d.startswith("batch=")
            ]
        except FileNotFoundError:
            existing = []
        nxt = max(existing, default=-1) + 1
        nxt = max(nxt, self._adhoc)
        self._adhoc = nxt + 1
        return nxt

    def answer_batch(self, queries: DataFrame, batch_id: int | None = None) -> None:
        """Compute top-k for one query batch and persist idempotently."""
        if batch_id is None:
            batch_id = self._next_adhoc_id()
        if queries.isEmpty():  # empty trigger — nothing to answer
            return
        qdf = queries.select(self.query_id_col, self.qvec_col)
        if self.answer_fn is not None:
            res = self.answer_fn(self.corpus, qdf, self.k)
        else:
            res = knn_batch(
                self.corpus,
                qdf,
                id_col=self.id_col,
                vec_col=self.vec_col,
                query_id_col=self.query_id_col,
                qvec_col=self.qvec_col,
                k=self.k,
            )
        res.write.mode("overwrite").parquet(
            os.path.join(self.root, f"batch={batch_id}")
        )

    def answers(self) -> DataFrame:
        """All answered queries so far: (query_id, vec_id, score, rn)
        plus the `batch` partition column (which micro-batch answered).
        Before any batch has been answered (e.g. a stream that only saw
        empty triggers) there are no batch= dirs — return an empty frame
        with the answer schema instead of raising PATH_NOT_FOUND."""
        import glob

        if not glob.glob(os.path.join(self.root, "batch=*")):
            # Derive the empty frame from the REAL answer plan on zero
            # queries (ADVICE r3): hardcoded types drifted from what the
            # parquet-read path returns, making the before-first-batch
            # and after-first-batch states union-incompatible. `batch` is
            # cast to int to match Spark's partition-column inference of
            # the batch=N directories.
            if self.answer_fn is not None:
                # A plan-based answer_fn yields its true schema on zero
                # queries; eager ones (knn_batch collects the block and
                # rejects empties) fall through to the structural form.
                try:
                    no_queries = self.corpus.select(
                        F.col(self.id_col).alias(self.query_id_col),
                        F.col(self.vec_col).alias(self.qvec_col),
                    ).limit(0)
                    base = self.answer_fn(self.corpus, no_queries, self.k)
                    return base.limit(0).withColumn(
                        "batch", F.lit(0).cast("int")
                    )
                except Exception:
                    pass
            id_type = self.corpus.schema[self.id_col].dataType
            return self.spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(self.query_id_col, id_type),
                        T.StructField(self.id_col, id_type),
                        T.StructField("score", T.DoubleType()),
                        T.StructField("rn", T.IntegerType()),
                        T.StructField("batch", T.IntegerType()),
                    ]
                ),
            )
        return self.spark.read.option("basePath", self.root).parquet(
            os.path.join(self.root, "batch=*")
        )

    def attach_stream(self, stream: DataFrame, checkpoint: str | None = None):
        """Wire a streaming query-vector DataFrame through the server."""
        writer = stream.writeStream.foreachBatch(
            lambda batch, bid: self.answer_batch(batch, bid)
        ).outputMode("update")
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()
