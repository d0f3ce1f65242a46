"""Exact k-NN tests, mirroring the reference's flat-index assertions
(/root/reference/test_local_db.py: result-count bounds, filter satisfaction,
score ∈ [0,1], k > n returns n rows)."""

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators.knn import knn_exact
from homemade_vector_db_spark.sources.tables import load_embeddings
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embs(spark):
    return load_embeddings(spark, SF_SMOKE).cache()


def query_df(embs):
    return embs.where(F.col("vec_id") == 0).select("embedding")


def test_knn_topk_shape_and_scores(spark, embs):
    rows = knn_exact(embs, query_df(embs), k=10).collect()
    assert len(rows) == 10
    # vec_id 0 is its own nearest neighbor with distance 0 → score 1.0
    assert rows[0].vec_id == 0 and rows[0].score == 1.0
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_knn_k_greater_than_n_returns_n(spark, embs):
    small = embs.limit(3)
    rows = knn_exact(small, query_df(embs), k=100).collect()
    assert len(rows) == 3  # divergence D3: no -1 padding


def test_knn_pre_filter_true_semantics(spark, embs):
    # true pre-filter: returns min(k, n_matching) rows, all satisfying pred
    rows = knn_exact(
        embs, query_df(embs), k=5, pre_filter=F.col("label") == 3
    ).collect()
    labels = {
        r.label
        for r in embs.join(
            spark.createDataFrame([(r.vec_id,) for r in rows], "vec_id LONG"),
            "vec_id",
        ).collect()
    }
    assert labels == {3}
    assert len(rows) == min(5, embs.where("label = 3").count())


def test_knn_post_filter(spark, embs):
    # parity: post_filter runs on the top-k results and may return < k rows
    unfiltered = knn_exact(embs, query_df(embs), k=5).collect()
    rows = knn_exact(
        embs, query_df(embs), k=5, post_filter=F.col("label") != 0
    ).collect()
    kept = {r.vec_id for r in rows}
    assert kept <= {r.vec_id for r in unfiltered}
    assert len(rows) <= 5


def test_knn_literal_query_vector(spark, embs):
    dim = len(embs.first().embedding)
    rows = knn_exact(embs, [0.0] * dim, k=4).collect()
    assert len(rows) == 4


def test_knn_empty_corpus(spark, embs):
    rows = knn_exact(embs.where(F.lit(False)), query_df(embs), k=5).collect()
    assert rows == []  # parity: empty db returns [] (local_db.py:159-160)


def test_knn_cosine_metric(spark, embs):
    rows = knn_exact(embs, query_df(embs), k=5, metric="cosine").collect()
    assert rows[0].vec_id == 0 and abs(rows[0].score - 1.0) < 1e-6


def test_knn_batch_matches_per_query_exact(spark, embs):
    from homemade_vector_db_spark.operators.knn import knn_batch

    qs = embs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    batch = knn_batch(embs, qs, k=4).collect()
    assert [r.rn for r in batch] == [1, 2, 3, 4] * 3
    for qid in range(3):
        got = [(r.vec_id, r.score) for r in batch if r.query_id == qid]
        q = embs.where(F.col("vec_id") == qid).select("embedding")
        want = [(r.vec_id, r.score) for r in knn_exact(embs, q, k=4).collect()]
        assert got == want
