"""Hybrid fusion semantics (local_db.py:323-401 parity, SURVEY.md §2.3)."""

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators import hybrid

ROWS = [
    (0, "alpha beta gamma", [0.0, 0.0]),
    (1, "beta gamma delta", [1.0, 1.0]),
    (2, "epsilon zeta", [0.1, 0.1]),
    (3, "alpha alpha beta", [0.9, 0.9]),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS, "doc_id LONG, text STRING, embedding ARRAY<FLOAT>"
    ).cache()


def test_weight_extremes(spark, corpus):
    # w=1 → pure vector ranking: query near (0,0) ranks doc 0 first
    ids_vec = [
        r.doc_id
        for r in hybrid.hybrid_search(
            spark, corpus, "alpha", [0.0, 0.0], top_k=4, vector_weight=1.0
        ).collect()
    ]
    assert ids_vec[0] == 0
    # w=0 → pure text ranking: only docs containing 'alpha' score > 0
    rows_txt = hybrid.hybrid_search(
        spark, corpus, "alpha", [0.0, 0.0], top_k=4, vector_weight=0.0
    ).collect()
    assert {r.doc_id for r in rows_txt} <= {0, 3}


def test_zero_score_rows_dropped(spark, corpus):
    # parity local_db.py:399-401: hybrid drops zero-score rows
    rows = hybrid.hybrid_search(
        spark, corpus, "nonexistent", [10.0, 10.0], top_k=4, vector_weight=0.0
    ).collect()
    assert rows == []


def test_max_normalization(spark, corpus):
    # top combined score with w=0.5 is ≤ 1 and the best doc on both axes
    # (doc 0: contains 'alpha', nearest to (0,0)) gets exactly 1.0
    rows = hybrid.hybrid_search(
        spark, corpus, "alpha beta gamma", [0.0, 0.0], top_k=4, vector_weight=0.5
    ).collect()
    assert rows[0].doc_id == 0
    assert rows[0].score == pytest.approx(1.0)
    assert all(r.score <= 1.0 for r in rows)


def test_filter_masks_after_normalization(spark, corpus):
    # excluded docs still participate in the max (parity local_db.py:390-392):
    # filtering out doc 0 must NOT rescale the remaining scores
    unfiltered = {
        r.doc_id: r.score
        for r in hybrid.hybrid_search(
            spark, corpus, "alpha beta", [0.0, 0.0], top_k=4, vector_weight=0.5
        ).collect()
    }
    filtered = {
        r.doc_id: r.score
        for r in hybrid.hybrid_search(
            spark, corpus, "alpha beta", [0.0, 0.0], top_k=4, vector_weight=0.5,
            filter_pred=F.col("doc_id") != 0,
        ).collect()
    }
    assert 0 not in filtered
    for d, s in filtered.items():
        assert s == unfiltered[d]


def test_weights_change_ordering(spark, corpus):
    # reference test style (test_local_db.py:331-342): extreme weights give
    # different rankings when text and vector disagree
    txt = [r.doc_id for r in hybrid.hybrid_search(
        spark, corpus, "delta", [0.0, 0.0], top_k=1, vector_weight=0.0).collect()]
    vec = [r.doc_id for r in hybrid.hybrid_search(
        spark, corpus, "delta", [0.0, 0.0], top_k=1, vector_weight=1.0).collect()]
    assert txt == [1]  # only doc with 'delta'
    assert vec == [0]  # nearest to origin


def test_hybrid_batch_matches_single_query(spark, corpus):
    # the batch operator restricted to one query pair must reproduce
    # hybrid_search exactly (per-query normalization == global for Q=1)
    from pyspark.sql import functions as F

    from homemade_vector_db_spark.operators import hybrid

    qv = [float(x) for x in corpus.where(F.col("doc_id") == 0).first().embedding]
    single = hybrid.hybrid_search(
        spark, corpus, "quarterly meeting", qv, top_k=4, vector_weight=0.6
    ).collect()
    qdf = spark.createDataFrame(
        [(3, "quarterly meeting", qv)],
        "query_id long, qtext string, qv array<double>",
    )
    batch = hybrid.hybrid_search_batch(
        spark, corpus, qdf, top_k=4, vector_weight=0.6
    ).collect()
    assert [(r.doc_id, r.score) for r in batch] == [
        (r.doc_id, r.score) for r in single
    ]
    assert all(r.query_id == 3 for r in batch)
