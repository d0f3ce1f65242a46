"""BM25 parity tests on the reference's own 5-doc fixture corpus
(/root/reference/test_local_db.py:14-20 style office emails) with
hand-computed BM25Okapi expectations."""

import math

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators import bm25

DOCS = [
    (0, "meeting scheduled with the team tomorrow morning"),
    (1, "invoice for services rendered amount due"),
    (2, "project proposal deadline next week meeting"),
    (3, "system alert critical error detected"),
    (4, "quarterly report financial summary meeting results"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING").cache()


def py_bm25_scores(corpus, query, k1=1.5, b=0.75, epsilon=0.25):
    """Pure-python BM25Okapi (published rank_bm25 semantics) for oracle."""
    toks = [d.split() for d in corpus]
    N = len(toks)
    avgdl = sum(len(t) for t in toks) / N
    df = {}
    for t in toks:
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    idf_raw = {w: math.log((N - f + 0.5) / (f + 0.5)) for w, f in df.items()}
    avg_idf = sum(idf_raw.values()) / len(idf_raw)
    idf = {w: (epsilon * avg_idf if v < 0 else v) for w, v in idf_raw.items()}
    out = []
    for t in toks:
        dl = len(t)
        s = 0.0
        for q in query.split():
            if q not in idf:
                continue
            tf = t.count(q)
            if tf == 0:
                continue
            s += idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append(s)
    return out


def test_bm25_scores_match_reference_formula(spark, docs):
    query = "meeting with team"
    expected = py_bm25_scores([d[1] for d in DOCS], query)
    got = {
        r.doc_id: r.score
        for r in bm25.query_text(spark, docs, query, top_k=5).collect()
    }
    for i, e in enumerate(expected):
        assert got[i] == pytest.approx(round(e, 6), abs=2e-6), f"doc {i}"


def test_bm25_epsilon_floor_applied(spark, docs):
    # 'meeting' appears in 3/5 docs → raw idf = ln((5-3+0.5)/(3+0.5)) < 0
    # → must be floored to 0.25·avg_idf, giving a small POSITIVE score
    got = {
        r.doc_id: r.score
        for r in bm25.query_text(spark, docs, "meeting", top_k=5).collect()
    }
    assert got[0] > 0 and got[2] > 0 and got[4] > 0
    assert got[3] == 0.0


def test_bm25_returns_exactly_topk_with_zero_scores(spark, docs):
    # parity local_db.py:130: argsort slice returns k rows even at score 0
    rows = bm25.query_text(spark, docs, "zzz_nonexistent_term", top_k=3).collect()
    assert len(rows) == 3
    assert all(r.score == 0.0 for r in rows)
    # tie-break: highest doc_id first (SURVEY.md §2.3-5)
    assert [r.doc_id for r in rows] == [4, 3, 2]


def test_bm25_query_term_multiplicity_counts(spark, docs):
    s1 = {r.doc_id: r.score for r in bm25.query_text(spark, docs, "meeting", 5).collect()}
    s2 = {r.doc_id: r.score for r in bm25.query_text(spark, docs, "meeting meeting", 5).collect()}
    assert s2[0] == pytest.approx(2 * s1[0], abs=2e-6)


def test_bm25_empty_query_raises(spark, docs):
    with pytest.raises(ValueError):
        bm25.query_text(spark, docs, "   ", top_k=3)


def test_tokenizer_parity_with_str_split(spark):
    df = spark.createDataFrame(
        [(0, "  leading and   multiple\tspaces\nnewlines ")],
        "doc_id LONG, text STRING",
    )
    from homemade_vector_db_spark.functions.text import tokenize

    got = df.select(tokenize("text").alias("t")).first().t
    assert got == "  leading and   multiple\tspaces\nnewlines ".split()


def test_query_text_batch_matches_single_query(spark, docs):
    # the batch operator restricted to one query must reproduce
    # query_text exactly (same scores, same zero-pad, same tie law)
    single = bm25.query_text(spark, docs, "quarterly meeting notes", top_k=4).collect()
    qdf = spark.createDataFrame([(7, "quarterly meeting notes")], "query_id long, qtext string")
    batch = bm25.query_text_batch(spark, docs, qdf, top_k=4).collect()
    assert [(r.doc_id, r.score) for r in batch] == [
        (r.doc_id, r.score) for r in single
    ]
    assert all(r.query_id == 7 for r in batch)
    assert [r.rn for r in batch] == [1, 2, 3, 4]


def test_query_text_batch_multi_query_independence(spark, docs):
    # each query's rows are unaffected by the other queries in the batch
    qdf = spark.createDataFrame(
        [(0, "quarterly meeting notes"), (1, "security vulnerability")],
        "query_id long, qtext string",
    )
    both = bm25.query_text_batch(spark, docs, qdf, top_k=3).collect()
    for qid, qtext in ((0, "quarterly meeting notes"), (1, "security vulnerability")):
        alone = bm25.query_text(spark, docs, qtext, top_k=3).collect()
        got = [(r.doc_id, r.score) for r in both if r.query_id == qid]
        assert got == [(r.doc_id, r.score) for r in alone]


def test_query_text_batch_no_pad_only_matches(spark, docs):
    # pad_zero=False returns only docs sharing >=1 term, never zero rows
    qdf = spark.createDataFrame([(0, "invoice")], "query_id long, qtext string")
    rows = bm25.query_text_batch(spark, docs, qdf, top_k=10, pad_zero=False).collect()
    assert 0 < len(rows) < docs.count()
    assert all(r.score > 0 for r in rows)
