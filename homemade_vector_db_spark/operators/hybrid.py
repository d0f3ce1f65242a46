"""Hybrid search — weighted BM25 + vector score fusion.

Reference `hybrid_search` (/root/reference/local_db.py:323-401):
1. BM25 scores for ALL docs (local_db.py:351).
2. Vector scores for all docs — exact full-scan when n ≤ 1000
   (local_db.py:376-378), widened-k index search above.
3. Max-normalize each score vector, dividing only when max > 0
   (local_db.py:381-384).
4. combined = w·vec + (1-w)·text (local_db.py:387).
5. Metadata filter applied AFTER normalization by masking scores to 0
   (local_db.py:390-392) — excluded docs still participated in the max.
6. Top-k by argsort, dropping zero-score rows (local_db.py:394-401);
   np.argsort(-scores) is stable → lowest doc_id first among ties.

Deliberate deviation (SURVEY.md §2.3-1): the reference's exact path uses
true L2 (np.linalg.norm) while its index path uses squared L2 — internally
inconsistent. We use squared L2 everywhere.

Spark plan: the two score relations are sparse (only docs matching ≥1 query
term / all docs for vector), fused with a full-outer join on doc_id,
normalized by two global-max aggregates broadcast back via crossJoin
(1-row ⨯ n is a BroadcastNestedLoopJoin — free), then
TakeOrderedAndProject. At scale the only shuffles are the BM25 groupBys;
the fusion join co-partitions on doc_id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from homemade_vector_db_spark.functions.vector import (
    l2_to_similarity,
    squared_l2,
    squared_l2_fixed,
    squared_l2_lit,
)
from homemade_vector_db_spark.operators.bm25 import BM25Stats, bm25_scores, build_bm25_stats
from homemade_vector_db_spark.operators.knn import QVEC, with_query_vector


def hybrid_search(
    spark: SparkSession,
    corpus: DataFrame,
    query_text: str,
    query_vector: DataFrame | Sequence[float],
    top_k: int = 5,
    vector_weight: float = 0.5,
    filter_pred: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    stats: BM25Stats | None = None,
    score_decimals: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) by weighted fused score; zero-score rows dropped.

    Pass `dim` when known to use the codegen'd fixed-dim distance kernel
    instead of the interpreted HOF fold (same summation order, bit-identical
    — functions/vector.squared_l2_fixed)."""
    if stats is None:
        stats = build_bm25_stats(corpus, id_col, text_col)
    if dim is None and not isinstance(query_vector, DataFrame):
        dim = len(query_vector)

    text_scores = bm25_scores(spark, stats, query_text).withColumnRenamed(
        "score", "text_score"
    )
    if not isinstance(query_vector, DataFrame):
        # literal query → one parsed SQL kernel, no query-vector column
        # (single py4j round-trip; see functions/vector.py literal-kernel
        # note — bit-identical to the Column form)
        d2 = squared_l2_lit(vec_col, [float(v) for v in query_vector])
        vec_scores = corpus.select(
            F.col(id_col).alias("doc_id"),
            l2_to_similarity(d2).alias("vec_score"),
        )
    else:
        d2 = (
            squared_l2_fixed(vec_col, QVEC, dim)
            if dim is not None
            else squared_l2(vec_col, QVEC)
        )
        vec_scores = (
            with_query_vector(corpus.select(F.col(id_col).alias("doc_id"), vec_col), query_vector)
            .select("doc_id", l2_to_similarity(d2).alias("vec_score"))
        )

    fused = vec_scores.join(text_scores, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("vec_score", F.lit(0.0)).alias("vec_score"),
        F.coalesce("text_score", F.lit(0.0)).alias("text_score"),
    )
    # Max-normalization is inherently two-pass, and `fused` feeds both the
    # global-max aggregate and the normalize branch — without a barrier the
    # whole scoring pipeline (wide embedding scan + distance kernel + BM25
    # joins) executes once per branch. localCheckpoint materializes the
    # NARROW score relation (16 B/row vs 100s of bytes for the embedding
    # column) exactly once per query; unlike persist() it is scoped to this
    # DataFrame's RDD, not plan-matched across calls, so repeated queries
    # honestly recompute. Also truncates a ~150-node adaptive plan, cutting
    # driver re-planning cost.
    fused = fused.localCheckpoint(eager=False)
    maxes = fused.agg(
        F.max("vec_score").alias("vmax"), F.max("text_score").alias("tmax")
    )
    normed = fused.crossJoin(F.broadcast(maxes)).select(
        "doc_id",
        F.when(F.col("vmax") > 0, F.col("vec_score") / F.col("vmax"))
        .otherwise(F.col("vec_score"))
        .alias("vn"),
        F.when(F.col("tmax") > 0, F.col("text_score") / F.col("tmax"))
        .otherwise(F.col("text_score"))
        .alias("tn"),
    )
    combined = (
        F.lit(float(vector_weight)) * F.col("vn")
        + F.lit(1.0 - float(vector_weight)) * F.col("tn")
    )
    scored = normed.withColumn("score", combined)

    if filter_pred is not None:
        # Reference masks to 0 after normalization (local_db.py:390-392);
        # masked rows are then dropped by the score > 0 cut below, so a
        # plain semi-join filter is exactly equivalent.
        keep = corpus.where(filter_pred).select(F.col(id_col).alias("doc_id"))
        scored = scored.join(keep, "doc_id", "left_semi")

    score = F.col("score")
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    return (
        scored.where(F.col("score") > 0)
        .select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


def hybrid_search_batch(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    vector_weight: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qtext_col: str = "qtext",
    qvec_col: str = "qv",
    stats: BM25Stats | None = None,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Batched hybrid fusion: Q (text, vector) query pairs in one plan —
    the batch twin of hybrid_search, same reference law per query
    (local_db.py:323-401): dense vector scores over ALL docs, sparse
    BM25, PER-QUERY max-normalization, w·vec + (1-w)·text, zero-score
    drop, top-k with the stable lowest-doc_id-first tie.

    Plan shape: the text side is ONE postings pass for all queries
    (bm25.bm25_scores_batch); the vector side is a broadcast join of the
    Q-row query block against the corpus scan (the reference law is
    DENSE per query — every doc participates in each query's max — so
    the Q×N score relation is the semantics, not an implementation
    wart; for huge Q at scale the widened-k index path is the
    documented alternative, exactly as the reference flips at n>1000).
    Per-query maxes are a groupBy broadcast back on query_id; the final
    per-query top-k is a WindowGroupLimit window.
    """
    if stats is None:
        stats = build_bm25_stats(corpus, id_col, text_col)
    from pyspark.sql.window import Window

    from homemade_vector_db_spark.operators.bm25 import bm25_scores_batch

    text_scores = bm25_scores_batch(
        stats, queries, query_id_col=query_id_col, qtext_col=qtext_col
    ).withColumnRenamed("score", "text_score")
    qblock = queries.select(F.col(query_id_col), F.col(qvec_col).alias("__qv"))
    vec_scores = (
        corpus.select(F.col(id_col).alias("doc_id"), vec_col)
        .crossJoin(F.broadcast(qblock))
        .select(
            query_id_col,
            "doc_id",
            l2_to_similarity(squared_l2(vec_col, "__qv")).alias("vec_score"),
        )
    )
    fused = (
        vec_scores.join(text_scores, [query_id_col, "doc_id"], "left")
        .select(
            query_id_col,
            "doc_id",
            "vec_score",
            F.coalesce("text_score", F.lit(0.0)).alias("text_score"),
        )
        .localCheckpoint(eager=False)  # same two-pass barrier as hybrid_search
    )
    maxes = fused.groupBy(query_id_col).agg(
        F.max("vec_score").alias("vmax"), F.max("text_score").alias("tmax")
    )
    normed = fused.join(F.broadcast(maxes), query_id_col).select(
        query_id_col,
        "doc_id",
        F.when(F.col("vmax") > 0, F.col("vec_score") / F.col("vmax"))
        .otherwise(F.col("vec_score"))
        .alias("vn"),
        F.when(F.col("tmax") > 0, F.col("text_score") / F.col("tmax"))
        .otherwise(F.col("text_score"))
        .alias("tn"),
    )
    combined = (
        F.lit(float(vector_weight)) * F.col("vn")
        + F.lit(1.0 - float(vector_weight)) * F.col("tn")
    )
    scored = normed.withColumn("score", combined).where(F.col("score") > 0)
    score = F.col("score")
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select(query_id_col, "doc_id", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .orderBy(query_id_col, "rn")
    )
