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


def test_radius_search_matches_threshold_scan(spark, embs):
    from homemade_vector_db_spark.operators.knn import radius_search

    q = list(embs.where(F.col("vec_id") == 0).first().embedding)
    rows = radius_search(embs, q, threshold=0.4, dim=64).collect()
    # exhaustive truth: every score >= t in the full ranking, nothing else
    full = {
        r.vec_id: r.score
        for r in knn_exact(embs, q, k=embs.count(), dim=64).collect()
    }
    want = {v for v, s in full.items() if s >= 0.4}
    assert {r.vec_id for r in rows} == want
    assert all(r.score >= 0.4 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_maxsim_matches_numpy_model(spark, embs):
    import numpy as np

    from homemade_vector_db_spark.operators.knn import maxsim_search

    q = np.array(
        embs.where(F.col("vec_id") == 0).first().embedding, dtype=np.float64
    )
    rows = embs.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    parts, w = 4, 16
    Q = q.reshape(parts, w)          # query sub-vectors
    D = X.reshape(len(ids), parts, w)  # doc sub-vectors
    # score_i = sum_p max_d Q[p] . D[i,d]
    dots = np.einsum("pw,ndw->npd", Q, D)  # n × p × d
    truth = dots.max(axis=2).sum(axis=1)
    order = np.lexsort((ids, -np.round(truth, 6)))
    want = [int(ids[i]) for i in order[:10]]
    got = [r.vec_id for r in maxsim_search(embs, list(q), k=10, parts=4, dim=64).collect()]
    assert got == want


def test_maxsim_self_is_top_and_plan_shuffle_free(spark, embs):
    from homemade_vector_db_spark.operators.knn import maxsim_search

    q = list(embs.where(F.col("vec_id") == 0).first().embedding)
    df = maxsim_search(embs, q, k=10, parts=4, dim=64)
    rows = df.collect()
    # a vector maximizes its own MaxSim (every cross-part dot ≤ matched-part
    # dot only in expectation, but self is the global argmax on this corpus)
    assert rows[0].vec_id == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # TakeOrderedAndProject only


def test_maxsim_token_matches_numpy_model(spark):
    """Token-level MaxSim (round 11): score(d) = Σ_q max_t dot(q, t)
    over the REAL per-token vector fixture must match an independent
    numpy evaluation of the same law, with the engine's rounding + tie
    rules (round 6dp, score desc, doc_id asc)."""
    import numpy as np
    import pyarrow.parquet as pq

    import homemade_vector_db_spark.queries as Qm
    from homemade_vector_db_spark.sources import tokenvec

    path = tokenvec.ensure_token_fixture(SF_SMOKE)
    t = pq.read_table(path).to_pandas()
    qv = np.stack(
        t[t.doc_id == -1].sort_values("pos").tvec.map(np.asarray)
    ).astype(np.float64)
    docs = t[t.doc_id >= 0]
    truth = {}
    for doc_id, grp in docs.groupby("doc_id"):
        D = np.stack(grp.tvec.map(np.asarray)).astype(np.float64)
        truth[int(doc_id)] = round(float((qv @ D.T).max(axis=1).sum()), 6)
    ids = np.array(sorted(truth))
    sc = np.array([truth[i] for i in ids])
    order = np.lexsort((ids, -sc))
    want = [(int(ids[i]), truth[int(ids[i])]) for i in order[:10]]
    got = [
        (r.doc_id, r.score)
        for r in Qm.q_maxsim_token_topk(spark, SF_SMOKE).collect()
    ]
    # scores agree to the last rounding ulp; ids exactly
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) <= 1e-6


def test_token_fixture_law(spark):
    """Fixture invariants: unit-norm vectors, positional variation
    (same word at different positions gets different vectors), the
    in-fixture query pseudo-doc, the doc-length cap, and
    generation determinism (same (word, pos) -> same vector)."""
    import numpy as np
    import pyarrow.parquet as pq

    from homemade_vector_db_spark.sources import tokenvec

    path = tokenvec.ensure_token_fixture(SF_SMOKE)
    t = pq.read_table(path).to_pandas()
    q = t[t.doc_id == -1].sort_values("pos")
    assert list(q.term) == tokenvec.TOKVEC_QUERY.split()
    norms = np.stack(t.tvec.map(np.asarray)).astype(np.float64)
    assert np.allclose(np.linalg.norm(norms, axis=1), 1.0, atol=1e-5)
    assert t[t.doc_id >= 0].groupby("doc_id").size().max() <= (
        tokenvec.TOKVEC_MAX_TOKENS
    )
    # positional variation + determinism via the law itself
    w = "spark"
    v0 = tokenvec._normalize(
        tokenvec._base_vec(w, 16) + 0.15 * tokenvec._pos_vec(0, 16)
    )
    v1 = tokenvec._normalize(
        tokenvec._base_vec(w, 16) + 0.15 * tokenvec._pos_vec(1, 16)
    )
    assert not np.allclose(v0, v1)
    sel = t[(t.term == w) & (t.pos == 0) & (t.doc_id >= 0)]
    if len(sel):
        assert np.allclose(
            np.asarray(sel.iloc[0].tvec, dtype=np.float64),
            v0.astype(np.float32).astype(np.float64),
        )


def test_mips_matches_numpy_and_allows_negative(spark, embs):
    import numpy as np

    q = np.array(
        embs.where(F.col("vec_id") == 0).first().embedding, dtype=np.float64
    )
    rows = embs.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    truth = X @ q
    order = np.lexsort((ids, -np.round(truth, 6)))
    want = [int(ids[i]) for i in order[:10]]
    got = knn_exact(embs, list(q), k=10, metric="ip", dim=64).collect()
    assert [r.vec_id for r in got] == want
    # raw inner products — scores are NOT clamped to [0, 1]
    full = knn_exact(embs, list(q), k=embs.count(), metric="ip", dim=64).collect()
    assert any(r.score < 0 for r in full)


def test_knn_batch_bounds_driver_collect_and_chunked_fallback(spark, embs):
    """VERDICT r6 What's-wrong #2: the query block is driver state, so
    knn_batch refuses past max_query_rows instead of OOMing; the chunked
    fallback returns byte-identical results to the bounded path."""
    import pytest as _pytest

    from homemade_vector_db_spark.operators.knn import knn_batch, knn_batch_chunked

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    with _pytest.raises(ValueError, match="max_query_rows"):
        knn_batch(embs, qs, k=3, max_query_rows=4)
    want = knn_batch(embs, qs, k=3).collect()
    got = knn_batch_chunked(embs, qs, k=3, max_query_rows=4).collect()
    assert sorted(got) == sorted(want)
    with _pytest.raises(ValueError, match="empty query block"):
        knn_batch_chunked(embs, qs.where("query_id < 0"), k=3)


def test_hard_negatives_mask_and_rank(spark):
    from homemade_vector_db_spark.operators.knn import hard_negatives

    # anchor 0 (label 0) at e0; candidates: same-label near-copy (id 1,
    # must be masked), different-label near (id 2), different-label far
    # (id 3), zero vector (id 4, scores 0.0)
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0], 0),
        (2, [0.9, 0.1, 0.0], 1),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    anchors = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    out = hard_negatives(emb, anchors, k=3).collect()
    # id 3 is orthogonal (cos 0.0) and ties the zero vector (0.0 by the
    # zero-norm contract); the tie breaks by ascending id
    assert [(r.vec_id, r.rn) for r in out] == [(2, 1), (3, 2), (4, 3)]
    assert all(r.neg_label != 0 for r in out)
    assert out[1].score == 0.0 and out[2].score == 0.0


def test_hard_negatives_bounded_anchor_collect(spark):
    from homemade_vector_db_spark.operators.knn import hard_negatives

    rows = [(i, [float(i), 1.0], i % 2) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    anchors = emb.select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    with pytest.raises(ValueError, match="max_anchor_rows"):
        hard_negatives(emb, anchors, k=2, max_anchor_rows=5)
    # chunked anchor runs concatenate to the bounded-path result
    full = hard_negatives(emb, anchors, k=2).collect()
    chunks = []
    for lo in range(0, 20, 5):
        part = anchors.where(
            (F.col("anchor_id") >= lo) & (F.col("anchor_id") < lo + 5)
        )
        chunks += hard_negatives(emb, part, k=2, max_anchor_rows=5).collect()
    assert sorted(map(tuple, chunks)) == sorted(map(tuple, full))


def test_hard_negatives_same_label_positive_mode(spark):
    from homemade_vector_db_spark.operators.knn import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.99, 0.01], 0),  # same-label near -> hardest positive
        (2, [0.5, 0.5], 0),    # same-label farther
        (3, [0.98, 0.02], 1),  # different label, excluded in positive mode
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    anchors = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("anchor_id"), "label", "embedding"
    )
    pos = hard_negatives(emb, anchors, k=2, same_label=True).collect()
    # anchor itself (id 0, cos 1.0) must be excluded; order 1 then 2
    assert [(r.vec_id, r.rn) for r in pos] == [(1, 1), (2, 2)]
    assert all(r.neg_label == 0 for r in pos)


def test_knn_graph_chunked_equals_direct(spark):
    # the hash-chunked graph equals a direct per-node exact ranking,
    # and never contains a self edge
    from homemade_vector_db_spark import queries as Q
    from tests.conftest import SF_SMOKE

    rows = Q.q_knn_graph(spark, SF_SMOKE).collect()
    assert all(r.src != r.neighbor_id for r in rows)
    import numpy as np

    emb = sorted(
        Q.load_embeddings(spark, SF_SMOKE)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in emb])
    X = np.stack([np.asarray(r.embedding, np.float64) for r in emb])
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append((r.rn, r.neighbor_id, r.score))
    # spot-check 10 nodes against numpy ground truth
    for src in list(by_src)[:10]:
        qi = int(np.flatnonzero(ids == src)[0])
        d = ((X - X[qi]) ** 2).sum(axis=1)
        score = np.round(1.0 / (1.0 + d), 6)
        mask = ids != src
        order = np.lexsort((ids[mask], -score[mask]))[: Q.KNN_GRAPH_K]
        want = [
            (i + 1, int(ids[mask][j]), float(score[mask][j]))
            for i, j in enumerate(order)
        ]
        got = sorted(by_src[src])
        assert got == want, (src, got, want)


def test_knn_join_equals_knn_batch(spark, embs):
    # the distributed join and the driver-broadcast batch share one
    # determinism contract — identical rows including scores
    from homemade_vector_db_spark.operators.knn import knn_batch, knn_join

    qs = embs.where(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    a = knn_batch(embs, qs, k=4).collect()
    b = knn_join(embs, qs, k=4).collect()
    key = lambda r: (r.query_id, r.rn)
    assert sorted(((r.query_id, r.rn, r.vec_id, r.score) for r in b)) == sorted(
        ((r.query_id, r.rn, r.vec_id, r.score) for r in a)
    )


def test_knn_join_blocking_invariance(spark, embs):
    # (P, QB) tiling must never change the result: 1x1 vs forced multi-tile
    from homemade_vector_db_spark.operators.knn import knn_join

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    one = knn_join(embs, qs, k=3).collect()  # 500 rows -> 1x1 tile
    tiled = knn_join(
        embs, qs, k=3, corpus_rows_per_block=120, query_rows_per_block=4
    ).collect()  # 5 corpus blocks x 3 query blocks
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    assert norm(tiled) == norm(one)


def test_knn_join_k_greater_than_n_and_empty_inputs(spark, embs):
    from homemade_vector_db_spark.operators.knn import knn_join

    small = embs.limit(3)
    qs = embs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = knn_join(small, qs, k=100).collect()
    assert len(rows) == 2 * 3  # min(k, n) per query, D3: no padding
    with pytest.raises(ValueError, match="empty query block"):
        knn_join(embs, qs.where(F.lit(False)))
    with pytest.raises(ValueError, match="empty corpus"):
        knn_join(embs.where(F.lit(False)), qs)


def test_knn_join_ivf_full_probe_equals_exact(spark, embs):
    # nprobe = nlist probes every cell, so the IVF tier must reproduce
    # the exact join bit-for-bit (shared tile kernel, shared tie law) —
    # pins that the cell routing loses rows ONLY via unprobed cells
    from homemade_vector_db_spark.operators.knn import knn_join, knn_join_ivf

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    a = knn_join(embs, qs, k=4).collect()
    b = knn_join_ivf(embs, qs, k=4, nlist=8, nprobe=8).collect()
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    assert norm(b) == norm(a)


def test_knn_join_ivf_partial_probe_subset_and_bounds(spark, embs):
    # with nprobe < nlist the result is a per-query subset drawn only
    # from probed cells: <= k rows per query, scores exact (any returned
    # pair's score equals the exact kernel's), rn dense from 1
    from homemade_vector_db_spark.operators.knn import knn_batch, knn_join_ivf

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = knn_join_ivf(embs, qs, k=4, nlist=8, nprobe=3).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    exact_scores = {
        (r.query_id, r.vec_id): r.score
        for r in knn_batch(embs, qs, k=1000).collect()
    }
    for qid, rs in per_q.items():
        assert len(rs) <= 4
        assert [r.rn for r in sorted(rs, key=lambda r: r.rn)] == list(
            range(1, len(rs) + 1)
        )
        for r in rs:
            assert exact_scores[(r.query_id, r.vec_id)] == r.score


def test_knn_join_ivfpq_full_probe_full_overfetch_equals_exact(spark, embs):
    # exactness envelope: nprobe = nlist probes every cell and a pool
    # >= the whole corpus means the ADC shortlist drops nothing, so the
    # exact rerank (same arithmetic + tie law as the exact tile kernel)
    # must reproduce knn_join bit-for-bit — pins that compression loses
    # rows ONLY via the shortlist cut / unprobed cells, never via
    # scoring drift
    from homemade_vector_db_spark.operators.knn import knn_join, knn_join_ivfpq

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    a = knn_join(embs, qs, k=4).collect()
    b = knn_join_ivfpq(
        embs, qs, k=4, nlist=8, nprobe=8, m=8, codebook_size=16, overfetch=200
    ).collect()
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    assert norm(b) == norm(a)


def test_knn_join_ivfpq_shortlist_bounds_and_exact_scores(spark, embs):
    # tight shortlist: <= k rows per query, rn dense from 1, and every
    # returned pair's score is the EXACT kernel's score (the rerank is
    # full-precision; only candidate selection is approximate)
    from homemade_vector_db_spark.operators.knn import knn_batch, knn_join_ivfpq

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = knn_join_ivfpq(
        embs, qs, k=4, nlist=8, nprobe=3, m=8, codebook_size=16, overfetch=2
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    exact_scores = {
        (r.query_id, r.vec_id): r.score
        for r in knn_batch(embs, qs, k=1000).collect()
    }
    assert per_q, "ivfpq join returned no rows"
    for qid, rs in per_q.items():
        assert len(rs) <= 4
        assert [r.rn for r in sorted(rs, key=lambda r: r.rn)] == list(
            range(1, len(rs) + 1)
        )
        for r in rs:
            assert exact_scores[(r.query_id, r.vec_id)] == r.score


def test_knn_join_auto_three_tier_dispatch(spark, embs):
    # thresholds force each tier in turn on the same inputs; with every
    # cell probed and the shortlist uncut, all three tiers must agree
    # bit-for-bit (shared tile kernel + tie law), so the dispatch can
    # never change a result, only its cost
    from homemade_vector_db_spark.operators.knn import knn_join, knn_join_auto

    qs = embs.where(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    want = norm(knn_join(embs, qs, k=3).collect())
    # corpus (500 rows) <= exact_threshold -> exact tier
    exact_tier = knn_join_auto(embs, qs, k=3, exact_threshold=10_000)
    # exact_threshold < corpus <= pq_threshold -> IVF tier
    ivf_tier = knn_join_auto(
        embs, qs, k=3, exact_threshold=1, pq_threshold=10_000, nlist=8, nprobe=8
    )
    # corpus > pq_threshold -> IVF-PQ tier
    pq_tier = knn_join_auto(
        embs, qs, k=3, exact_threshold=1, pq_threshold=1,
        nlist=8, nprobe=8, m=8, codebook_size=16, overfetch=200,
    )
    assert norm(exact_tier.collect()) == want
    assert norm(ivf_tier.collect()) == want
    assert norm(pq_tier.collect()) == want


def test_knn_join_ivf_hot_cell_split_invariance(spark, embs):
    # sub-sharding oversized cells is pure task-width control: forcing a
    # tiny cap (every cell splits) must reproduce the unsplit plan
    # bit-for-bit — each (query, corpus-row) pair still meets exactly once
    from homemade_vector_db_spark.operators.knn import knn_join_ivf

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    base = norm(knn_join_ivf(embs, qs, k=4, nlist=8, nprobe=3).collect())
    split = norm(
        knn_join_ivf(
            embs, qs, k=4, nlist=8, nprobe=3, max_cell_rows=20
        ).collect()
    )
    assert split == base


def test_knn_join_ivfpq_split_keeps_exactness_envelope(spark, embs):
    # under forced sub-sharding the per-shard ADC shortlist is a superset
    # of the per-cell one, so the full-probe/full-overfetch exactness
    # envelope must still hold
    from homemade_vector_db_spark.operators.knn import knn_join, knn_join_ivfpq

    qs = embs.where(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    norm = lambda rows: sorted((r.query_id, r.rn, r.vec_id, r.score) for r in rows)
    want = norm(knn_join(embs, qs, k=3).collect())
    got = norm(
        knn_join_ivfpq(
            embs, qs, k=3, nlist=8, nprobe=8, m=8, codebook_size=16,
            overfetch=200, max_cell_rows=25,
        ).collect()
    )
    assert got == want


def test_tune_nprobe_ladder_laws(spark, embs):
    # recall is weakly monotone in nprobe (candidate-superset argument),
    # the tuner returns the MINIMAL ladder rung meeting the target, a
    # zero target picks the first rung, and an unreachable target (cap
    # 1.0 validated separately) falls back to full probe
    from homemade_vector_db_spark.operators.ann import build_ivf
    from homemade_vector_db_spark.operators.knn import (
        knn_join, knn_join_ivf, tune_nprobe,
    )

    qs = embs.where(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        (r.query_id, r.vec_id) for r in knn_join(embs, qs, k=4).collect()
    }
    idx = build_ivf(embs, nlist=8, cache=False)
    recalls = []
    for npro in (1, 2, 4, 8):
        a = {
            (r.query_id, r.vec_id)
            for r in knn_join_ivf(
                embs, qs, k=4, nlist=8, nprobe=npro, ivf_index=idx
            ).collect()
        }
        recalls.append(len(a & exact) / len(exact))
    assert recalls == sorted(recalls)  # monotone ladder
    assert recalls[-1] == 1.0  # full probe == exact

    chosen, achieved = tune_nprobe(embs, qs, k=4, nlist=8, target_recall=0.9)
    assert achieved >= 0.9
    # minimality: every smaller rung must miss the target
    rung_of = {1: 0, 2: 1, 4: 2, 8: 3}
    for npro, r in zip((1, 2, 4, 8), recalls):
        if npro < chosen:
            assert r < 0.9
    assert recalls[rung_of[chosen]] == achieved

    c0, _ = tune_nprobe(embs, qs, k=4, nlist=8, target_recall=0.0)
    assert c0 == 1
    with pytest.raises(ValueError):
        tune_nprobe(embs, qs, k=4, nlist=8, target_recall=1.5)
