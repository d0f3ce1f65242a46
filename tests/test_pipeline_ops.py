"""Round-2b corpus-statistics / data-selection operators.

Covers the operators the reference has no analogue for (it stores text
verbatim and never profiles it — local_db.py:35-37): PII scrub, weighted
sampling, vocabulary stats, perplexity deciles, DSIR weighting, and
embedding clustering. The oracle-side twins live in queries.py; these
tests pin the semantic contracts the oracle can't see (redaction content,
sampling bias, determinism under repartitioning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.functions.text import pii_count, scrub_pii
from tests.conftest import SF_SMOKE


def test_scrub_pii_redacts_planted_patterns(spark):
    rows = [
        ("contact a.smith+x@exa-mple.co.uk today", 1, 0, 0),
        ("server at 10.0.255.3 responded", 0, 1, 0),
        ("call +1 (555) 123-4567 now", 0, 0, 1),
        ("plain text with no pii at all", 0, 0, 0),
        ("two mails: a@b.io c@d.org and 1.2.3.4", 2, 1, 0),
    ]
    df = spark.createDataFrame(
        rows, ["text", "n_email", "n_ip", "n_phone"]
    )
    got = df.select(
        "n_email",
        "n_ip",
        "n_phone",
        pii_count("text", "email").alias("e"),
        pii_count("text", "ipv4").alias("i"),
        pii_count("text", "phone").alias("p"),
        scrub_pii("text").alias("clean"),
    ).collect()
    for r in got:
        assert (r["e"], r["i"], r["p"]) == (
            r["n_email"],
            r["n_ip"],
            r["n_phone"],
        )
        assert "@" not in r["clean"] or r["n_email"] == 0
        if r["n_email"] + r["n_ip"] + r["n_phone"] > 0:
            assert "[PII]" in r["clean"]
        else:
            assert "[PII]" not in r["clean"]


def test_scrub_pii_preserves_clean_text(spark):
    df = spark.createDataFrame([("hello world spark join",)], ["text"])
    assert (
        df.select(scrub_pii("text").alias("c")).first()["c"]
        == "hello world spark join"
    )


def test_weighted_sample_deterministic_under_repartitioning(spark):
    a = Q.q_weighted_sample(spark, SF_SMOKE).collect()
    docs = Q.load_documents(spark, SF_SMOKE).repartition(13)
    u = (
        (F.col("doc_id") % Q.SAMPLE_MOD) * Q.SAMPLE_MULT % 1_000_003 + 1
    ) / 1_000_003.0
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    b = (
        docs.select("doc_id", "lang", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(Q.WSAMPLE_N)
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


def test_weighted_sample_biases_toward_heavy_weights(spark):
    # one doc 1000x heavier than the rest must always be drawn when N
    # spans a fifth of the corpus: P(miss) < (1 - w/(W))^N is astronomically
    # small and the ES-key realization is deterministic anyway.
    sample = Q.q_weighted_sample(spark, SF_SMOKE).collect()
    docs = Q.load_documents(spark, SF_SMOKE)
    longest = (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id")).first()["doc_id"]
    )
    # the corpus' longest document carries the largest weight; with the
    # deterministic key it lands in the sample unless its hash u is
    # pathologically small — assert the realized outcome is stable and
    # the sample skews long: sample mean length > corpus mean length.
    mean_sample = sum(r["n_chars"] for r in sample) / len(sample)
    mean_corpus = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_corpus
    del longest


def test_vocab_stats_tiny_fixture(spark):
    df = spark.createDataFrame(
        [
            (0, "a a b", "xx", "s", 5),
            (1, "a c", "xx", "s", 3),
            (2, "z z z z", "yy", "s", 7),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    import homemade_vector_db_spark.queries as q

    orig = q.load_documents
    try:
        q.load_documents = lambda spark, sf: df
        out = {r["lang"]: r for r in q.q_vocab_stats(spark, "ignored").collect()}
    finally:
        q.load_documents = orig
    assert out["xx"]["n_tokens"] == 5
    assert out["xx"]["vocab"] == 3  # a, b, c
    assert out["xx"]["top_term_share"] == pytest.approx(3 / 5)
    assert out["yy"]["vocab"] == 1
    assert out["yy"]["type_token_ratio"] == pytest.approx(1 / 4)


def test_ppl_deciles_partitions_the_corpus(spark):
    rows = Q.q_ppl_deciles(spark, SF_SMOKE).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    # every doc with ≥1 token lands in exactly one decile
    assert n_docs == Q.load_documents(spark, SF_SMOKE).count()
    deciles = [r["decile"] for r in rows]
    assert deciles == sorted(deciles)
    assert min(deciles) >= 1 and max(deciles) <= Q.PPL_DECILES
    # monotone: later deciles have higher mean NLL
    nlls = [r["avg_nll"] for r in rows]
    assert all(a <= b for a, b in zip(nlls, nlls[1:]))


def test_dsir_excludes_target_source_and_is_bounded(spark):
    rows = Q.q_dsir_weights(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= Q.DSIR_TOP_N
    assert all(r["source"] != Q.DSIR_TARGET_SOURCE for r in rows)
    ws = [r["weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_kmeans_gate_zero_mismatch(spark):
    r = Q.q_kmeans_check(spark, SF_SMOKE).first()
    assert r["n_mismatch"] == 0
    assert r["n_vectors"] == Q.load_embeddings(spark, SF_SMOKE).count()


def test_cluster_balanced_sample_contract(spark):
    r = Q.q_cluster_balanced_sample(spark, SF_SMOKE).first()
    assert r["per_cluster_ok"] is True
    assert r["n_clusters"] <= Q.KMEANS_K
    assert r["n_sampled"] <= r["n_clusters"] * Q.CLUSTER_SAMPLE_K


# ---- round-2c: retrieval fusion + curation operators ----


def test_mmr_rerank_contract_and_diversity(spark):
    """MMR: k distinct picks from the candidate set, seeded with the
    cosine top-1, and mean pairwise similarity strictly no worse (lower
    or equal) than the plain cosine top-k's — the property MMR exists
    to provide."""
    import numpy as np

    from homemade_vector_db_spark.operators.knn import knn_exact, mmr_rerank
    from homemade_vector_db_spark.sources.tables import load_embeddings

    emb = load_embeddings(spark, SF_SMOKE)
    qv = Q._qvec_list(spark, SF_SMOKE)
    k = 10
    picked = mmr_rerank(emb, qv, k=k, candidates=20, lam=0.5)
    ids = [p[0] for p in picked]
    assert len(ids) == k and len(set(ids)) == k

    cand = knn_exact(emb, qv, k=20, metric="cosine", dim=Q.EMB_DIM)
    cand_ids = [r["vec_id"] for r in cand.collect()]
    assert set(ids) <= set(cand_ids)
    assert ids[0] == cand_ids[0]  # seed = most query-similar candidate

    # cross-implementation check (the kmeans_check pattern): an
    # independent greedy recomputation over the same candidate block must
    # select the same sequence
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.join(
            spark.createDataFrame([(i,) for i in set(cand_ids)], ["vec_id"]),
            "vec_id",
            "left_semi",
        ).collect()
    }
    order = sorted(vecs)
    X = np.stack([vecs[i] for i in order])
    q = np.asarray(qv, dtype=np.float64)
    nX = np.linalg.norm(X, axis=1)
    qsim = np.round(X @ q / (nX * np.linalg.norm(q)), 6)
    S = np.round(X @ X.T / np.outer(nX, nX), 6)
    sel: list[int] = []
    rem = set(range(len(order)))
    for _ in range(k):
        best, best_v = None, -np.inf
        for j in sorted(rem):
            red = max((S[j][s] for s in sel), default=0.0)
            v = round(0.5 * qsim[j] - 0.5 * red, 6)
            if v > best_v:
                best, best_v = j, v
        sel.append(best)
        rem.discard(best)
    assert ids == [order[j] for j in sel]


def test_rrf_fusion_contract(spark):
    rows = Q.q_rrf_fusion(spark, SF_SMOKE).collect()
    assert len(rows) == Q.TOP_K
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # max possible score = rank 1 in both legs
    assert scores[0] <= round(2.0 / (Q.RRF_K + 1), 6) + 1e-9
    assert all(s > 0 for s in scores)


def test_benchmark_decontam_bounds(spark):
    rows = Q.q_benchmark_decontam(spark, SF_SMOKE).collect()
    assert rows, "expected at least one non-benchmark source"
    for r in rows:
        assert r["source"] != Q.DECONTAM_BENCH_SOURCE
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0.0 <= r["avg_overlap_frac"] <= 1.0


def test_semdedup_multiprobe_gate(spark):
    row = Q.q_semdedup_check(spark, SF_SMOKE).collect()[0]
    assert row["recall_ok"] and row["precision_exact"]


def test_neardup_canonical_reps_belong_to_cluster(spark):
    comp = {
        r["doc_id"]: r["component"]
        for r in Q.q_neardup_components(spark, SF_SMOKE).collect()
    }
    for r in Q.q_neardup_canonical(spark, SF_SMOKE).collect():
        assert comp[r["rep_id"]] == r["component"]
        assert r["cluster_size"] >= 2  # components come from pairs


# ---------------------------------------------------------------------------
# round-2d: gopher rules, duplicated-span coverage, bloom decontamination


def test_gopher_rules_hand_computed(spark):
    from homemade_vector_db_spark.operators.textstats import gopher_rules

    rows = [
        # 25 tokens, all alpha, contains 'the' and 'a' → passes count/alpha/stop
        (0, " ".join(["the", "a"] + ["word"] * 23)),
        # too short (5 tokens)
        (1, "the a and of with"),
        # no stopwords at all
        (2, " ".join(["zzzz"] * 30)),
        # numeric tokens → fails alpha fraction
        (3, " ".join(["the", "a"] + ["123"] * 28)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert got[0]["n_tokens"] == 25
    assert got[0]["rule_word_count"] and got[0]["rule_alpha"]
    assert got[0]["rule_stopwords"]
    # mean word len of doc 0: (3+1+23*4)/25 = 3.84 → fails [4.0, 5.0]
    assert got[0]["mean_word_len"] == pytest.approx(3.84)
    assert not got[0]["rule_mean_word_len"] and not got[0]["keep"]
    assert not got[1]["rule_word_count"]
    assert got[2]["n_stop_distinct"] == 0 and not got[2]["rule_stopwords"]
    assert got[3]["alpha_frac"] == pytest.approx(2 / 30, abs=1e-6)
    assert not got[3]["rule_alpha"] and not got[3]["keep"]


def test_duplicated_span_stats_interval_union(spark):
    from homemade_vector_db_spark.operators.dedup import duplicated_span_stats

    # doc 0 and doc 1 share tokens 1..9 ("c1..c9"): with k=4 that is
    # positions 1..6 in doc 0 — overlapping spans that must merge into
    # ONE island covering 9 tokens, not 6*4=24.
    shared = " ".join(f"c{i}" for i in range(1, 10))
    rows = [
        (0, shared + " x1 x2 x3"),          # 12 tokens, 9 covered
        (1, "y1 y2 " + shared),             # 11 tokens, 9 covered
        (2, "z1 z2 z3 z4 z5 z6 z7 z8"),     # unique → 0 covered
        (3, "w1 w2 w3"),                    # < k tokens → no spans at all
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in duplicated_span_stats(df, k=4).collect()}
    assert got[0]["n_tokens"] == 12
    assert got[0]["covered_tokens"] == 9
    assert got[0]["n_dup_spans"] == 6
    assert got[0]["dup_frac"] == pytest.approx(0.75)
    assert got[1]["covered_tokens"] == 9
    assert got[2]["covered_tokens"] == 0 and got[2]["n_dup_spans"] == 0
    assert got[3]["n_tokens"] == 3 and got[3]["dup_frac"] == 0.0


def test_duplicated_span_stats_disjoint_islands(spark):
    from homemade_vector_db_spark.operators.dedup import duplicated_span_stats

    # two disjoint shared regions inside one doc → two islands, summed
    a = "a1 a2 a3 a4"
    b = "b1 b2 b3 b4"
    rows = [
        (0, a + " m1 m2 m3 " + b),  # 11 tokens: cover 4 + 4 = 8
        (1, a),
        (2, b),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in duplicated_span_stats(df, k=4).collect()}
    assert got[0]["covered_tokens"] == 8
    assert got[0]["n_dup_spans"] == 2


def test_bloom_no_false_negatives_and_low_fp(spark):
    from homemade_vector_db_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    m, k = 1 << 12, 5
    members = spark.range(200).select(
        F.concat(F.lit("member-"), F.col("id")).alias("s")
    )
    bloom = bloom_build(members, "s", m_bits=m, k=k)
    probe_members = members.crossJoin(F.broadcast(bloom)).select(
        bloom_might_contain("bloom_words", "s", m, k).alias("hit")
    )
    # structural guarantee: every inserted member tests positive
    assert probe_members.where(~F.col("hit")).count() == 0
    strangers = spark.range(2000).select(
        F.concat(F.lit("stranger-"), F.col("id")).alias("s")
    )
    fp = (
        strangers.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain("bloom_words", "s", m, k))
        .count()
    )
    # m/n = 20.5 bits/member, k=5 → theoretical fp ≈ 0.2%; allow 5x slack
    assert fp / 2000 <= 0.01


def test_bloom_bitmap_shape(spark):
    from homemade_vector_db_spark.functions.bloom import bloom_build

    row = bloom_build(
        spark.createDataFrame([("x",)], ["s"]), "s", m_bits=256, k=3
    ).collect()[0]
    assert len(row["bloom_words"]) == 4
    # 3 hash functions set at most 3 bits total
    assert sum(bin(w & (2**64 - 1)).count("1") for w in row["bloom_words"]) <= 3


def test_bloom_empty_member_set_rejects_everything(spark):
    """bloom_build over ZERO members must produce an all-zeros bitmap
    (the zero-filler guarantees the dense shape), so every probe is a
    clean negative — no nulls, no index errors."""
    from homemade_vector_db_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    m, k = 256, 3
    empty = spark.createDataFrame([], "s STRING")
    bloom = bloom_build(empty, "s", m_bits=m, k=k)
    row = bloom.collect()[0]
    assert len(row["bloom_words"]) == 4 and all(w == 0 for w in row["bloom_words"])
    probes = spark.range(50).select(F.concat(F.lit("x"), F.col("id")).alias("s"))
    hits = (
        probes.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain("bloom_words", "s", m, k))
        .count()
    )
    assert hits == 0


# ------------------------------------------------------------------- BPE
def test_bpe_encode_greedy_min_rank_semantics():
    """Pin the encoder contract the oracle CTE mirrors: lowest-rank merge
    first, ALL non-overlapping occurrences merged left-to-right per step,
    stop at fixed point."""
    from homemade_vector_db_spark.functions.text import bpe_encode

    merges = [("a", "a"), ("aa", "b"), ("b", "c")]
    ranks = {m: i for i, m in enumerate(merges)}
    # 'aaa': rank-0 pair merges left-to-right non-overlapping -> [aa, a]
    assert bpe_encode("aaa", ranks, merges) == ["aa", "a"]
    # 'aab c': aa first (rank 0), then aab (rank 1); the (b,c) merge is
    # pre-empted because rank 1 < rank 2 claims the 'b'
    assert bpe_encode("aabc", ranks, merges) == ["aab", "c"]
    # no applicable merge -> characters
    assert bpe_encode("xyz", ranks, merges) == ["x", "y", "z"]
    # single char / empty
    assert bpe_encode("a", ranks, merges) == ["a"]
    assert bpe_encode("", ranks, merges) == []


def test_bpe_vendored_merges_loaded_in_rank_order():
    from homemade_vector_db_spark.functions.text import load_bpe_merges

    merges = load_bpe_merges()
    assert len(merges) >= 16
    assert all(len(m) == 2 and m[0] and m[1] for m in merges)


def test_bpe_oracle_cte_matches_python_encoder(spark):
    """Run the DuckDB recursive-CTE fragment the three token oracles
    embed and compare piece-for-piece with the Python encoder over the
    full fixture vocabulary — the lockstep guarantee the driver's hash
    gate rests on."""
    import duckdb

    from homemade_vector_db_spark.functions.text import (
        bpe_encode,
        load_bpe_merges,
    )
    from homemade_vector_db_spark.queries import _bpe_oracle_cte

    merges = load_bpe_merges()
    ranks = {m: i for i, m in enumerate(merges)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    sql = (
        f"WITH RECURSIVE {_bpe_oracle_cte()},\n"
        "fin AS (SELECT word, min_by(s, length(s)) AS s FROM bpe GROUP BY word)\n"
        "SELECT word, list_filter(string_split(s, chr(1)), x -> x <> '') AS pieces "
        "FROM fin ORDER BY word"
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) >= 20
    for word, pieces in rows:
        assert pieces == bpe_encode(word, ranks, merges), word


def test_bpe_word_pieces_relation_consistent(spark):
    """The disk-materialized vocab relation agrees with the encoder and
    n_pieces column is the pieces length; reassembling pieces restores
    the word (BPE is a partition of the character sequence)."""
    from homemade_vector_db_spark import queries as q

    wp = q._bpe_word_pieces(spark, SF_SMOKE).collect()
    assert len(wp) >= 20
    for r in wp:
        assert r["n_pieces"] == len(r["pieces"])
        assert "".join(r["pieces"]) == r["word"]


def test_split_sample_independence_at_sf01(spark):
    """Round-6 law pin (VERDICT r5 What's-wrong #1): inside the 10% hash
    sample, the train/val/test mix must match the global 90/5/5 law —
    sample membership and split assignment are independent because they
    read DISJOINT 32-bit windows of md5(doc_id). Under the old
    multiplicative %100 law this measured val=0%, test=10%."""
    docs = Q.load_documents(spark, "/root/testdata/sf0.1")
    sampled = docs.where(Q._md5_bucket(F.col("doc_id"), Q.SAMPLE_HEX_OFF) < 10)
    b = Q._md5_bucket(F.col("doc_id"), Q.SPLIT_HEX_OFF)
    split = (
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    )
    counts = {
        r["split"]: r["n"]
        for r in sampled.groupBy(split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert total > 0
    for part in ("val", "test"):
        frac = counts.get(part, 0) / total
        assert 0.03 <= frac <= 0.07, (part, frac, counts)


def test_split_law_has_full_bucket_range(spark):
    """The md5 law must not collapse to a congruence class: over ids
    0..9999 every one of the 100 buckets appears for BOTH hex windows,
    and bucket(id) != bucket(id+100) for a healthy majority of ids
    (the old law had bucket(id) == bucket(id+100) for ALL ids)."""
    df = spark.range(0, 10_000).select(F.col("id").alias("doc_id"))
    for off in (Q.SAMPLE_HEX_OFF, Q.SPLIT_HEX_OFF):
        bcol = Q._md5_bucket(F.col("doc_id"), off)
        nb = df.select(bcol.alias("b")).distinct().count()
        assert nb == 100, (off, nb)
        shifted = df.select(
            "doc_id",
            bcol.alias("b"),
            Q._md5_bucket(F.col("doc_id") + 100, off).alias("b2"),
        )
        moved = shifted.where(F.col("b") != F.col("b2")).count()
        assert moved > 9_500, (off, moved)


def test_split_decontam_drops_planted_train_leaks(spark):
    """Planted cross-split near-copies: eval docs whose NORMALIZED text
    matches a train doc are dropped; val<->test leaks without a train
    copy are kept (decontamination is train->eval only); train is never
    dropped. doc_ids below are precomputed split-class members of the
    md5-window law (train: 0-5, val: 34,50, test: 25,80)."""
    rows = [
        (0, "The quick brown fox!"),      # train
        (1, "unique train one"),          # train
        (2, "another train doc"),         # train
        (34, "the quick   brown fox"),    # val — normalized dupe of 0 → drop
        (50, "shared eval only text"),    # val — dupe of 25, no train copy
        (25, "Shared EVAL only text."),   # test — dupe of 50, no train copy
        (80, "unique test doc"),          # test — clean
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = {
        r["split"]: (r["n_before"], r["n_dropped"], r["n_after"])
        for r in Q.split_decontam_counts(docs).collect()
    }
    assert counts == {
        "train": (3, 0, 3),
        "val": (2, 1, 1),
        "test": (2, 0, 2),
    }
    dropped = Q.split_decontam_dropped(docs).collect()
    assert [(r["doc_id"], r["split"]) for r in dropped] == [(34, "val")]


def test_corpus_tag_isolates_sibling_basenames(tmp_path):
    """ADVICE r4 item 4: derived-state names for /x/sf0.1 and /x/sf0.1_alt
    must not glob-match each other (the old basename-keyed GC glob
    `tokens_sf0.1_*` also matched `tokens_sf0.1_alt_...`)."""
    import fnmatch

    a, b = tmp_path / "sf0.1", tmp_path / "sf0.1_alt"
    for d in (a, b):
        d.mkdir()
        (d / "documents.parquet").write_bytes(b"x")
    pa = Q._derived_path(str(a), "tokens", "documents.parquet")
    pb = Q._derived_path(str(b), "tokens", "documents.parquet")
    tag_a = Q._corpus_tag(str(a))
    assert tag_a != Q._corpus_tag(str(b))
    assert not fnmatch.fnmatch(
        pb.rsplit("/", 1)[-1], f"tokens_{tag_a}_*"
    ), (pa, pb)


def test_publish_derived_win_and_lose(tmp_path):
    """Atomic promote: the winner's state survives a concurrent loser's
    publish untouched; a win renames the temp into place."""
    # win: no existing final
    tmp1 = tmp_path / "build1"
    tmp1.mkdir()
    (tmp1 / "_SUCCESS").write_text("")
    (tmp1 / "part-0").write_text("winner")
    final = tmp_path / "final"
    Q._publish_derived(str(tmp1), str(final))
    assert (final / "part-0").read_text() == "winner"
    assert not tmp1.exists()
    # lose: final already present and complete -> loser build discarded
    tmp2 = tmp_path / "build2"
    tmp2.mkdir()
    (tmp2 / "_SUCCESS").write_text("")
    (tmp2 / "part-0").write_text("loser")
    Q._publish_derived(str(tmp2), str(final))
    assert (final / "part-0").read_text() == "winner"
    assert not tmp2.exists()
    # corrupt target (non-empty partial state, no _SUCCESS): loser
    # cleans up its temp and surfaces the error instead of reading junk
    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "part-0").write_text("partial")
    tmp3 = tmp_path / "build3"
    tmp3.mkdir()
    with pytest.raises(OSError):
        Q._publish_derived(str(tmp3), str(broken))
    assert not tmp3.exists()


def test_strata_window_independent_of_sample_and_split(spark):
    """Round-7 (ADVICE r6 #5): stratified sampling reads its OWN md5
    window (hex [17,24]), disjoint from the 10% hash-sample window [1,8]
    and the split window [9,16] — so inside the 10% sample the 20%-strata
    keep-fraction still holds (under the old shared window the strata
    keep-set was a superset of the whole sample: conditional frac = 1)."""
    df = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
    bcol = Q._md5_bucket(F.col("doc_id"), Q.STRATA_HEX_OFF)
    assert df.select(bcol.alias("b")).distinct().count() == 100
    sampled = df.where(Q._md5_bucket(F.col("doc_id"), Q.SAMPLE_HEX_OFF) < 10)
    n_sampled = sampled.count()
    n_both = sampled.where(bcol < 20).count()
    frac = n_both / n_sampled
    assert 0.15 <= frac <= 0.25, (frac, n_both, n_sampled)


def test_flagship_composes_split_decontam(spark, tmp_path):
    """Round-7 flagship composition: corpus_prep_hygiene's final stage
    drops an eval survivor whose NORMALIZED fingerprint matches a train
    survivor. Planted pair: same words, case flipped every 8th token —
    distinct dedup fingerprints (case-sensitive), zero shared 8-gram
    spans (dup_frac 0), identical nfp — so both survive gate+dedup+span
    and the eval copy is dropped as a leak."""
    # 24 words: two stopwords (len 3) + 22 len-5 words -> mwl 4.83,
    # all-alpha, passes the Gopher gate (20..90 tokens, mwl 4..5)
    words = ["the", "and"] + [f"word{chr(97 + i)}" for i in range(22)]
    base = list(words)
    # flip case at 0-indexed positions 2/10/18 (never the stopwords, which
    # the gate matches case-sensitively); every 8-token window contains a
    # flipped token, so the pair shares zero exact 8-gram spans
    cased = [
        w.upper() if i in (2, 10, 18) else w for i, w in enumerate(base)
    ]
    # find doc_ids landing in train vs not under the md5 split law
    ids = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    b = Q._md5_bucket(F.col("doc_id"), Q.SPLIT_HEX_OFF)
    buckets = {r.doc_id: r.b for r in ids.select("doc_id", b.alias("b")).collect()}
    train_id = next(i for i, v in buckets.items() if v < 90)
    eval_id = next(i for i, v in buckets.items() if v >= 90)
    rows = [
        (train_id, " ".join(base), "en", "web", len(" ".join(base))),
        (eval_id, " ".join(cased), "en", "web", len(" ".join(cased))),
    ]
    d = tmp_path / "corpus"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {
        (r.source, r.split): r
        for r in Q.q_corpus_prep_hygiene(spark, str(d)).collect()
    }
    train_row = out[("web", "train")]
    assert train_row.n_docs == 1 and train_row.n_dropped_leaks == 0
    eval_split = "val" if buckets[eval_id] < 95 else "test"
    eval_row = out[("web", eval_split)]
    assert eval_row.n_dropped_leaks == 1 and eval_row.n_docs == 0


def test_tokenizer_fertility_consistent_with_bpe_counts(spark):
    # per-lang sums must reconcile with the per-doc BPE relation, and
    # fertility >= 1 (a word never encodes to zero pieces)
    rows = Q.q_tokenizer_fertility(spark, SF_SMOKE).collect()
    per_doc = Q.q_token_count_bpe(spark, SF_SMOKE)
    total_bpe = per_doc.agg(F.sum("n_bpe_tokens")).first()[0]
    assert sum(r.n_bpe_tokens for r in rows) == total_bpe
    docs = Q.load_documents(spark, SF_SMOKE)
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        if r.n_words:
            assert r.fertility >= 1.0
            assert abs(r.fertility - round(r.n_bpe_tokens / r.n_words, 6)) < 1e-9


def test_dedup_cluster_sample_profile(spark):
    # full-corpus coverage; kept count never exceeds docs; the keep law
    # halves singletons (within a loose binomial band) and thins larger
    # clusters by ~1/(2*size)
    rows = Q.q_dedup_cluster_sample(spark, SF_SMOKE).collect()
    docs_n = Q.load_documents(spark, SF_SMOKE).count()
    assert sum(r.cluster_size * 0 + r.n_docs for r in rows) == docs_n
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
    singles = next(r for r in rows if r.cluster_size == 1)
    frac = singles.n_kept / singles.n_docs
    assert 0.35 < frac < 0.65  # p=1/2, n>=hundreds


def test_dedup_cluster_sample_window_disjoint():
    # the cluster-sample window [25,32] must not overlap the sampling,
    # split, or strata windows — independence of the four laws
    offs = {Q.SAMPLE_HEX_OFF, Q.SPLIT_HEX_OFF, Q.STRATA_HEX_OFF, Q.CSAMPLE_HEX_OFF}
    assert len(offs) == 4
    spans = sorted((o, o + 8) for o in offs)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0
    assert spans[-1][1] <= 33  # md5 has 32 hex chars


def test_curriculum_shard_plan_easy_first(spark):
    # within each shard the curriculum order is ascending n_chars; the
    # shard assignment is identical to epoch_shard_plan's (same law)
    from pyspark.sql import Window

    docs = Q.load_documents(spark, SF_SMOKE)
    ordkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(Q.EPOCH_SEED + ":"), F.col("doc_id").cast("string"))),
            1, 8,
        ), 16, 10,
    ).cast("bigint")
    h = docs.select("doc_id", "n_chars", ordkey.alias("ordkey")).withColumn(
        "shard", F.col("ordkey") % Q.EPOCH_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("n_chars", "ordkey", "doc_id")
    seq = h.withColumn("pos", F.row_number().over(w)).collect()
    by_shard = {}
    for r in seq:
        by_shard.setdefault(r.shard, []).append((r.pos, r.n_chars))
    for rows in by_shard.values():
        rows.sort()
        lens = [c for _, c in rows]
        assert lens == sorted(lens)  # monotone easy -> hard
    epoch = {r.shard: r.n_docs for r in Q.q_epoch_shard_plan(spark, SF_SMOKE).collect()}
    curr = {r.shard: r.n_docs for r in Q.q_curriculum_shard_plan(spark, SF_SMOKE).collect()}
    assert epoch == curr  # same shard membership, different order


def test_cluster_split_plan_no_straddle_and_singleton_compat(spark):
    rows = Q.q_cluster_split_plan(spark, SF_SMOKE).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.n_straddling == 0 for r in rows)
    assert sum(r.n_docs for r in rows) == Q.load_documents(spark, SF_SMOKE).count()
    # clusters genuinely move docs off the doc-level law: at least one
    # clustered doc's component head differs from its own id, and the
    # plan covers both clustered and singleton populations
    comps = Q.q_neardup_components(spark, SF_SMOKE).collect()
    assert any(r.doc_id != r.component for r in comps)
    assert len(comps) < Q.load_documents(spark, SF_SMOKE).count()


def test_mixture_reweight_moment_expansion_matches_rowwise(spark):
    # the exact-moment expansion of sum(residual^2) must equal a direct
    # row-wise residual computation against the probe coefficients
    rows = Q.q_mixture_reweight(spark, SF_SMOKE).collect()
    probe = Q.q_quality_linear_probe(spark, SF_SMOKE).first()
    docs = Q.load_documents(spark, SF_SMOKE).select(
        "source", "doc_id", "n_chars", "text"
    ).collect()
    import collections

    ssr = collections.defaultdict(float)
    n = collections.Counter()
    for d in docs:
        x2 = d.text.count(" ") + 1  # length - length(sans spaces) + 1
        y = d.n_chars - 3 * x2 + d.doc_id % 7
        r = y - (probe.w_bias + probe.w_chars * d.n_chars + probe.w_tokens * x2)
        ssr[d.source] += r * r
        n[d.source] += 1
    total_mse = sum(ssr.values()) / sum(n.values())
    for r in rows:
        want = ssr[r.source] / n[r.source]
        assert abs(r.mse - want) < 1e-3, (r.source, r.mse, want)
        assert abs(r.excess_ratio - want / total_mse) < 1e-3
        assert r.n_docs == n[r.source]
    # the signal is non-trivial: ratios straddle 1
    ratios = [r.excess_ratio for r in rows]
    assert min(ratios) < 1.0 < max(ratios)


def test_new_laws_partition_independent(spark, monkeypatch):
    # the exact-moment (mixture_reweight) and checksum (curriculum)
    # laws claim identical results under ANY partitioning: rerun with
    # the corpus re-split into 13 skewed partitions and compare rows
    base_mix = [tuple(r) for r in Q.q_mixture_reweight(spark, SF_SMOKE).collect()]
    base_cur = [tuple(r) for r in Q.q_curriculum_shard_plan(spark, SF_SMOKE).collect()]

    real_load = Q.load_documents

    def skewed(spark_, sf_dir):
        return real_load(spark_, sf_dir).repartition(13, "lang")

    monkeypatch.setattr(Q, "load_documents", skewed)
    try:
        got_mix = [tuple(r) for r in Q.q_mixture_reweight(spark, SF_SMOKE).collect()]
        got_cur = [tuple(r) for r in Q.q_curriculum_shard_plan(spark, SF_SMOKE).collect()]
    finally:
        monkeypatch.setattr(Q, "load_documents", real_load)
    assert got_mix == base_mix
    assert got_cur == base_cur


def test_chunk_bm25_topk_contract(spark):
    # passage retrieval: best_chunk must be a real window of the doc and
    # must itself contain >=1 query term (the max-pool picked it for a
    # reason); scores strictly ordered per the registered tie law
    rows = Q.q_chunk_bm25_topk(spark, SF_SMOKE).collect()
    assert len(rows) == Q.TOP_K
    scores = [(r.score, -r.doc_id) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    qterms = set(Q.TEXT_QUERY.split())
    docs = {
        r.doc_id: r.text
        for r in Q.load_documents(spark, SF_SMOKE)
        .where(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        toks = docs[r.doc_id].split()
        start = r.best_chunk * Q.CHUNK_STRIDE
        window = toks[start : start + Q.CHUNK_TOKENS]
        assert window, "best_chunk beyond the doc's windows"
        assert r.score > 0
        assert qterms & set(window), "best chunk holds no query term"


def test_embedding_outliers_integer_mad_law(spark):
    # pure-Python twin of the whole per-label discrete-MAD pipeline on
    # the smoke fixture: centroid (6dp), micro-distance, lower medians
    # by the 2*cm >= n law, ad > 3*mad — must agree row-for-row
    import numpy as np

    from homemade_vector_db_spark.sources.tables import load_embeddings

    got = {
        (r.vec_id, r.label, r.u, r.ad)
        for r in Q.q_embedding_outliers(spark, SF_SMOKE).collect()
    }
    rows = load_embeddings(spark, SF_SMOKE).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )

    def lower_median(vals):
        vals = sorted(vals)
        n = len(vals)
        cm = 0
        seen = {}
        for v in vals:
            seen[v] = seen.get(v, 0) + 1
        for v in sorted(seen):
            cm += seen[v]
            if cm * 2 >= n:
                return v

    want = set()
    for label, vecs in by_label.items():
        cent = np.round(
            np.stack([v for _, v in vecs]).mean(axis=0), 6
        )
        d = {
            vid: int(round(float(np.sqrt(((v - cent) ** 2).sum())) * 1e6))
            for vid, v in vecs
        }
        m = lower_median(d.values())
        ad = {vid: abs(u - m) for vid, u in d.items()}
        mad = lower_median(ad.values())
        for vid, a in ad.items():
            if a > 3 * mad:
                want.add((vid, label, d[vid], a))
    assert got == want
    assert want, "fixture produced no outliers; law untested"


def test_source_overlap_directed_containment_law(spark, monkeypatch):
    # a's shingles ⊂ b's: containment(a→b) = 1.0, (b→a) = |a|/|b|;
    # disjoint source c never appears
    d = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4", "a"),          # 2 distinct 3-gram shingles
            (2, "w1 w2 w3 w4 w5 w6", "b"),    # 4, superset of a's
            (3, "x1 x2 x3 x4", "c"),          # disjoint
        ],
        "doc_id long, text string, source string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    monkeypatch.setattr(Qm, "_shingle_sets", lambda s, sf: Qm.dedup._shingled(d, "doc_id", "text", 3))
    rows = {(r.source_a, r.source_b): (r.inter, r.containment)
            for r in Qm.q_source_overlap(spark, "ignored").collect()}
    assert rows == {("a", "b"): (2, 1.0), ("b", "a"): (2, 0.5)}


def test_fuzzy_term_search_edit_distance_law(spark, monkeypatch):
    # query "cat": exact term at dist 0, 1-edit neighbors in, 2+ out;
    # n_docs counts distinct docs per matched term
    d = spark.createDataFrame(
        [
            (1, "cat cart dog", "a"),
            (2, "cat bat", "a"),
            (3, "cargo", "a"),
        ],
        "doc_id long, text string, source string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    monkeypatch.setattr(Qm, "FUZZY_TERM", "cat")
    rows = {(r.term, r.dist): r.n_docs
            for r in Qm.q_fuzzy_term_search(spark, "ignored").collect()}
    assert rows == {("cat", 0): 2, ("cart", 1): 1, ("bat", 1): 1}


def test_mrl_curve_identity_law(spark):
    # the full-width rung is the exact search by construction: hits == k;
    # every rung is bounded by k
    rows = {r.dim: (r.hits, r.k) for r in Q.q_mrl_recall_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == {8, 16, 32, 64}
    full_hits, k = rows[64]
    assert full_hits == k
    assert all(h <= k for h, k in rows.values())


def test_neyman_allocation_budget_law(spark):
    # exact apportionment: quotas sum to the budget EXACTLY, every
    # stratum appears once, and quotas are non-negative
    rows = Q.q_neyman_allocation(spark, SF_SMOKE).collect()
    assert sum(r.quota for r in rows) == Q.NEYMAN_BUDGET
    assert len({r.source for r in rows}) == len(rows)
    assert all(r.quota >= 0 for r in rows)


def test_event_transitions_rows_are_conditional_distributions(spark):
    # per from_type the probabilities sum to 1 (each row's p is a
    # rounded share of that type's outgoing transitions)
    rows = Q.q_event_transitions(spark, SF_SMOKE).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.p)
    assert by_from
    for vals in by_from.values():
        assert abs(sum(vals) - 1.0) < 1e-4  # 6dp rounding per row


def test_rfm_quintiles_are_balanced(spark):
    # NTILE(5) over a total order: per dimension the five quintile
    # populations differ by at most 1
    rows = Q.q_rfm_segments(spark, SF_SMOKE).collect()
    for dim in ("r_q", "f_q", "m_q"):
        per_q = {}
        for r in rows:
            per_q[getattr(r, dim)] = per_q.get(getattr(r, dim), 0) + r.n_customers
        assert set(per_q) == {1, 2, 3, 4, 5}
        assert max(per_q.values()) - min(per_q.values()) <= 1


def test_cohort_retention_age_zero_is_cohort_size(spark):
    # every cohort is fully active at age 0 (its own first week), and
    # no later age exceeds the cohort size
    rows = Q.q_cohort_retention(spark, SF_SMOKE).collect()
    size = {r.cohort_week: r.n_active for r in rows if r.age_weeks == 0}
    assert size  # at least one cohort
    for r in rows:
        assert r.cohort_week in size
        assert r.n_active <= size[r.cohort_week]


# ---- round-9 fourth mini-batch laws ----


def test_dedup_rate_by_batch_first_batch_has_no_cross_dups(spark):
    rows = Q.q_dedup_rate_by_batch(spark, SF_SMOKE).collect()
    assert rows, "no batches"
    by_batch = {r.batch: r for r in rows}
    assert 0 in by_batch and by_batch[0].n_cross_dups == 0
    for r in rows:
        assert 0 <= r.batch < Q.DEDUP_BATCHES
        assert 0 <= r.n_cross_dups <= r.n_docs


def test_ngram_diversity_bounds(spark):
    for r in Q.q_ngram_diversity(spark, SF_SMOKE).collect():
        assert 1 <= r.n_distinct_shingles <= r.n_shingle_slots
        assert 0.0 < r.diversity <= 1.0


def test_padding_waste_bucket_law(spark):
    rows = Q.q_padding_waste(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.bucket_len & (r.bucket_len - 1) == 0  # power of two
        assert r.padding_tokens == r.bucket_len * r.n_docs - r.real_tokens
        assert 0.0 < r.efficiency <= 1.0
        # every doc in the bucket is > half the bucket (else it would
        # have landed in the smaller power)
        assert r.real_tokens > r.bucket_len // 2 * r.n_docs
    # Conservation: buckets partition the corpus — sum(n_docs) must
    # equal the doc count and sum(real_tokens) the corpus token total
    # (this is the invariant the pre-join count inflation violated:
    # per-row laws all held while every count carried a fan-out
    # factor from the inequality join).
    toks = (
        Q.load_documents(spark, SF_SMOKE)
        .select(F.size(Q.tokenize("text")).alias("n_tok"))
        .where(
            (F.col("n_tok") > 0)
            & (F.col("n_tok") <= (1 << Q.PAD_MAX_POW))
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tok").alias("tok"),
        )
        .first()
    )
    assert sum(r.n_docs for r in rows) == toks.n
    assert sum(r.real_tokens for r in rows) == toks.tok


def test_user_similarity_anchor_contract(spark):
    rows = Q.q_user_similarity(spark, SF_SMOKE).collect()
    assert len(rows) == min(Q.SIM_ANCHOR_USERS, len(rows))
    for r in rows:
        assert r.match_id != r.user_id
        assert 0.0 <= r.score <= 1.0  # count vectors: cosine is non-negative


def test_budget_mixture_fill_exact_budget(spark):
    rows = Q.q_budget_mixture_fill(spark, SF_SMOKE).collect()
    total_cap = sum(r.capacity_tokens for r in rows)
    budget = total_cap // 2
    assert sum(r.allocated_tokens for r in rows) == budget
    for r in rows:
        assert 0 <= r.allocated_tokens <= r.capacity_tokens
        if r.capped:
            assert r.allocated_tokens == r.capacity_tokens


def test_budget_mixture_fill_water_level(spark, monkeypatch):
    # capacities 2/10/100, budget 56: source a capped at 2, b capped
    # at 10, c gets the rest (44)
    d = spark.createDataFrame(
        [(1, " ".join(["w"] * 2), "a"),
         (2, " ".join(["w"] * 10), "b"),
         (3, " ".join(["w"] * 100), "c")],
        "doc_id long, text string, source string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    rows = {r.source: (r.allocated_tokens, bool(r.capped))
            for r in Qm.q_budget_mixture_fill(spark, "ignored").collect()}
    assert rows == {"a": (2, True), "b": (10, True), "c": (44, False)}


def test_attribution_last_touch_window_and_totals(spark, monkeypatch):
    # u1: click then purchase 1h later -> click; u2: view 8 days before
    # purchase -> direct; u3: purchase with no touch -> direct
    import datetime as dt

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "purchase", 10.0, "{}"),
        (3, t0 - dt.timedelta(days=8), 2, "view", 0.0, "{}"),
        (4, t0, 2, "purchase", 20.0, "{}"),
        (5, t0, 3, "purchase", 30.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    got = {r.channel: (r.n_purchases, r.revenue_micro)
           for r in Qm.q_attribution_last_touch(spark, "ignored").collect()}
    assert got == {"click": (1, 10_000_000), "direct": (2, 50_000_000)}


def test_graph_kcore_peels_tails_keeps_triangle(spark, monkeypatch):
    # path a-b-c (peels in 2 rounds) + triangle d-e-f (the 2-core)
    edges = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)]
    both = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    g = spark.createDataFrame(both, "src long, neighbor_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    r = Qm.q_graph_kcore(spark, "ignored").collect()[0]
    assert (r.n_core_nodes, r.n_core_edges, r.converged) == (3, 3, True)
    assert r.rounds == 2


def test_graph_hits_two_round_hand_computation(spark, monkeypatch):
    # edges 1->0, 2->0, 0->1: after 2 unnormalized rounds
    # a=(4,1,0), h=(1,4,4)
    g = spark.createDataFrame(
        [(1, 0), (2, 0), (0, 1)], "src long, neighbor_id long"
    )
    emb = spark.createDataFrame([(0,), (1,), (2,)], "vec_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    monkeypatch.setattr(Qm, "load_embeddings", lambda s, sf: emb)
    got = [(r.vec_id, r.authority, r.hub)
           for r in Qm.q_graph_hits(spark, "ignored").collect()]
    assert got == [(0, 4, 1), (1, 1, 4), (2, 0, 4)]


def test_cuped_bounds(spark):
    r = Q.q_cuped_adjust(spark, SF_SMOKE).collect()[0]
    assert r.n_users > 0
    assert 0.0 <= r.rho2 <= 1.0


def test_chi2_zero_under_exact_independence(spark, monkeypatch):
    # perfectly proportional 2x2 table -> chi2 == 0, cramers_v == 0
    rows = []
    i = 0
    for lang in ("en", "fr"):
        for src in ("a", "b"):
            for _ in range(5):
                rows.append((i, "t", lang, src, 1))
                i += 1
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_chi2_lang_source(spark, "ignored").collect()[0]
    assert (r.chi2, r.cramers_v, r.dof) == (0.0, 0.0, 1)


def test_mannwhitney_complete_separation(spark, monkeypatch):
    # arm0 strictly above arm1 -> U_a = n_a*n_b exactly, z > 0
    import datetime as dt

    rows = []
    for i, v in enumerate([10.0, 11.0, 12.0]):  # users 0,2,4 -> arm 0
        rows.append((i, dt.datetime(2024, 1, 1), 2 * i, "purchase", v, "{}"))
    for i, v in enumerate([1.0, 2.0]):  # users 1,3 -> arm 1
        rows.append(
            (10 + i, dt.datetime(2024, 1, 1), 2 * i + 1, "purchase", v, "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_mannwhitney_ab(spark, "ignored").collect()[0]
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.u2_a == 2 * 3 * 2
    assert r.z > 0


def test_k_anonymity_consistency(spark):
    r = Q.q_k_anonymity(spark, SF_SMOKE).collect()[0]
    assert r.k_floor >= 1
    assert 0 <= r.n_groups_below_k <= r.n_groups
    assert r.n_docs_at_risk >= r.n_groups_below_k * 1


def test_km_survival_monotone_and_bounded(spark):
    rows = Q.q_km_survival(spark, SF_SMOKE).collect()
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev  # non-increasing step curve
        assert 1 <= r.n_events <= r.n_at_risk
        prev = r.survival


def test_km_survival_hand_computed(spark, monkeypatch):
    # 4 users click at t0; u1 converts day 1, u2 day 2, u3/u4 censored
    # at horizon day 3 (no purchase). S(1)=3/4, S(2)=(3/4)(2/3)=1/2
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, u, "click", 0.0, "{}") for u in (1, 2, 3, 4)]
    rows += [
        (10, t0 + dt.timedelta(days=1), 1, "purchase", 1.0, "{}"),
        (11, t0 + dt.timedelta(days=2), 2, "purchase", 1.0, "{}"),
        (12, t0 + dt.timedelta(days=3), 3, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    got = [(r.day, r.n_at_risk, r.n_events, r.survival)
           for r in Qm.q_km_survival(spark, "ignored").collect()]
    assert got == [(1, 4, 1, 0.75), (2, 3, 1, 0.5)]


def test_benford_check_is_a_distribution(spark):
    rows = Q.q_benford_check(spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_freq for r in rows) - 1.0) < 1e-4
    import math
    for r in rows:
        assert abs(r.benford_freq - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        assert abs(r.deviation - round(r.obs_freq - r.benford_freq, 6)) < 2e-6


def test_t_closeness_laws(spark, monkeypatch):
    """Degenerate corners of the variational-distance law: a corpus
    where every QI group has the GLOBAL lang mix gives max_t = 0; a
    corpus where one group holds one lang exclusively gives
    max_t = 1 - p(lang) for that group (here 1 - 1/2 = 0.5)."""
    import homemade_vector_db_spark.queries as Qm

    mk = lambda rows: spark.createDataFrame(
        [(i, "t", lang, src, 10) for i, (lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    # two sources, each 50/50 en/fr -> every group mirrors the global mix
    uniform = mk([("en", "a"), ("fr", "a"), ("en", "b"), ("fr", "b")])
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: uniform)
    r = Qm.q_t_closeness(spark, "ignored-tclose-1").collect()[0]
    assert r.max_t == 0.0 and r.n_groups_above_t == 0
    # source a = all en, source b = all fr; global mix 50/50 -> t = 0.5
    skew = mk([("en", "a"), ("en", "a"), ("fr", "b"), ("fr", "b")])
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: skew)
    r = Qm.q_t_closeness(spark, "ignored-tclose-2").collect()[0]
    assert r.max_t == 0.5
    assert r.n_groups_above_t == 2  # 0.5 > 3/8 for both groups


def test_dow_revenue_profile_laws(spark):
    from tests.conftest import SF_SMOKE
    import homemade_vector_db_spark.queries as Qm

    rows = Qm.q_dow_revenue_profile(spark, SF_SMOKE).collect()
    assert [r.dow for r in rows] == sorted(r.dow for r in rows)
    assert all(0 <= r.dow <= 6 for r in rows)
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
    # gap-filled grid: total day count spans the whole observed window
    total_days = sum(r.n_days for r in rows)
    lo_hi = (
        Qm.load_table(spark, SF_SMOKE, "orders")
        .agg(
            F.expr(
                "max(datediff(cast(o_orderdate AS date),"
                " to_date('1970-01-01')))"
                " - min(datediff(cast(o_orderdate AS date),"
                " to_date('1970-01-01'))) + 1"
            ).alias("span")
        )
        .collect()[0]
        .span
    )
    assert total_days == lo_hi


def test_snippet_window_argmax_law(spark, monkeypatch):
    # query terms {spark, join, query, vector, the}: doc packs 3 query
    # terms at positions 9-11; the best 8-window must cover all 3 and
    # start at the earliest covering index. Round 11: the entry now
    # snippets the bm25 top-SNIPPET_TOP candidate set — with one doc
    # the candidate set is that doc, so the window law is unchanged;
    # a UNIQUE sf key keeps the _BM25_STATS session cache this entry
    # now builds from colliding with other monkeypatched tests.
    filler = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = spark.createDataFrame(
        [(1, filler + " spark join vector " + filler, "en", "a", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    Qm._BM25_STATS.pop("ignored-snippet-argmax", None)
    r = Qm.q_snippet_extract(spark, "ignored-snippet-argmax").collect()[0]
    assert r.n_hits == 3
    assert r.start == 4  # earliest 8-window covering tokens 9..11
    assert "spark join vector" in r.snippet


def test_column_entropy_uniform_law(spark, monkeypatch):
    # 4 equally-likely values -> H = ln(4); single value -> H = 0
    import math

    docs = spark.createDataFrame(
        [(i, "t", ["a", "b", "c", "d"][i % 4], "only", 1) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ev = spark.createDataFrame(
        [(i, None, i, "x", 0.0, "{}") for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(
        Qm, "load_table",
        lambda s, sf, name: docs if name == "documents" else ev,
    )
    got = {r.column_name: (r.ndv, round(r.entropy_nats, 4))
           for r in Qm.q_column_entropy_profile(spark, "ignored").collect()}
    assert got["documents.lang"] == (4, round(math.log(4), 4))
    assert got["documents.source"] == (1, 0.0)
    assert got["events.event_type"] == (1, 0.0)


def test_prefix_suggest_contract(spark):
    rows = Q.q_prefix_suggest(spark, SF_SMOKE).collect()
    assert rows
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r.term.startswith(Q.SUGGEST_PREFIX)
        assert r.total_tf >= r.df >= 1


def test_funnel_dropoff_strict_order(spark, monkeypatch):
    # u1 completes v->c->p in order; u2 clicks BEFORE the first view
    # (click must not count); u3 views only
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 5.0, "{}"),
        (4, t(1), 2, "click", 0.0, "{}"),
        (5, t(2), 2, "view", 0.0, "{}"),
        (6, t(0), 3, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_funnel_dropoff(spark, "ignored").collect()[0]
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 1, 1)
    assert abs(r.view_to_click - round(1 / 3, 6)) < 1e-9
    assert r.click_to_purchase == 1.0


def test_readability_syllable_law(spark, monkeypatch):
    # "aa b" -> tokens 2, vowel groups: 'aa'=1, 'b'=0 -> spt = 0.5
    d = spark.createDataFrame(
        [(1, "aa b", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_readability_profile(spark, "ignored").collect()[0]
    assert (r.n_docs, r.tokens_per_doc, r.syllables_per_token) == (1, 2.0, 0.5)
    assert r.chars_per_token == 2.0


def test_skyline_no_row_dominated(spark):
    # frontier law: no member strictly dominated by ANY order (checked
    # against the full relation), and every non-member dominated by
    # some member
    o = Q.load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr(
            "timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00',"
            " o_orderdate)"
        ).alias("dt_us"),
    )
    allrows = [(r.o_orderkey, r.cents, r.dt_us) for r in o.collect()]
    sky = [(r.o_orderkey, r.cents, r.dt_us)
           for r in Q.q_skyline_orders(spark, SF_SMOKE).collect()]
    skyset = {k for k, _, _ in sky}
    assert sky
    for k, cc, dd in sky:
        assert not any(
            c2 > cc and d2 > dd for _, c2, d2 in allrows
        ), f"skyline member {k} is dominated"
    for k, cc, dd in allrows:
        if k not in skyset:
            assert any(
                c2 > cc and d2 > dd for _, c2, d2 in sky
            ), f"non-member {k} not dominated by the frontier"


def test_graph_kcore_distributed_path_equals_driver_tier(spark, monkeypatch):
    # force the distributed peel (cap=0) on the same fixture: identical
    # output row to the bounded driver tier
    edges = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)]
    both = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    g = spark.createDataFrame(both, "src long, neighbor_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    want = Qm.q_graph_kcore(spark, "ignored").collect()[0]
    monkeypatch.setattr(Qm, "KCORE_DRIVER_EDGE_CAP", 0)
    got = Qm.q_graph_kcore(spark, "ignored").collect()[0]
    assert got == want
    assert (got.n_core_nodes, got.n_core_edges, got.rounds,
            got.converged) == (3, 3, 2, True)


def test_wedge_recommend_excludes_direct_edges(spark, monkeypatch):
    # square 0-1-2-3-0 (mutual): each node's only 2-hop non-neighbor is
    # the opposite corner, via exactly 2 common neighbors
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    both = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    g = spark.createDataFrame(both, "src long, neighbor_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    got = {(r.node, r.recommended, r.common)
           for r in Qm.q_wedge_recommend(spark, "ignored").collect()}
    assert got == {(0, 2, 2), (1, 3, 2), (2, 0, 2), (3, 1, 2)}


def test_probe_auc_rank_identity(spark, monkeypatch):
    # positives strictly above negatives on the score -> AUC = 1.0;
    # 'a b c' TTR=1.0 > 'a a a a' TTR=0.25
    d = spark.createDataFrame(
        [(1, "a a b", "en", "s", 1),             # negative, TTR=2/3
         (2, "a a a a", "en", "s", 1),           # negative, TTR=0.25
         (3, "b c d dup", "en", "s", 1)],        # positive, TTR=1.0
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_probe_auc(spark, "ignored").collect()[0]
    assert (r.n_pos, r.n_neg) == (1, 2)
    # positive TTR 1.0; negatives 0.25 and 5/6 -> AUC = 1.0
    assert r.auc == 1.0


def test_l_diversity_consistency(spark):
    r = Q.q_l_diversity(spark, SF_SMOKE).collect()[0]
    assert r.l_floor >= 1
    assert 0 <= r.n_groups_below_l <= r.n_groups
    assert r.n_docs_exposed >= r.n_groups_below_l


def test_graph_modularity_perfect_communities(spark, monkeypatch):
    # two disjoint mutual triangles with matching labels: Q = 2*(1/2 - 1/4) = 0.5
    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    both = [(u, v) for u, v in tri] + [(v, u) for u, v in tri]
    g = spark.createDataFrame(both, "src long, neighbor_id long")
    emb = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "vec_id long, label int"
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    monkeypatch.setattr(Qm, "load_embeddings", lambda s, sf: emb)
    rows = Qm.q_graph_modularity(spark, "ignored").collect()
    assert {(r.label, r.e_c, r.d_c) for r in rows} == {(0, 3, 6), (1, 3, 6)}
    assert all(r.modularity_q == 0.5 for r in rows)


def test_calibration_bins_partition_docs(spark):
    rows = Q.q_calibration_bins(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bin < Q.CALIB_BINS
        assert 0 <= r.n_pos <= r.n_docs
        assert 0.0 <= r.pos_rate <= 1.0
        # mean score sits inside (or on the edge of) its bin
        assert r.mean_score >= r.bin / Q.CALIB_BINS - 1e-6
        assert r.mean_score <= (r.bin + 1) / Q.CALIB_BINS + 1e-6 or r.bin == Q.CALIB_BINS - 1


def test_session_stats_consistency(spark):
    r = Q.q_session_stats(spark, SF_SMOKE).collect()[0]
    assert 0 <= r.n_bounce <= r.n_sessions
    assert r.median_events >= 1
    assert r.median_duration_s >= 0
    assert abs(r.bounce_rate - round(r.n_bounce / r.n_sessions, 6)) < 1e-9


def test_link_negatives_are_non_edges(spark):
    negs = {(r.anchor, r.cand)
            for r in Q.q_link_negatives(spark, SF_SMOKE).collect()}
    assert negs
    edges = {(r.src, r.neighbor_id)
             for r in Q._knn_graph(spark, SF_SMOKE)
             .select("src", "neighbor_id").collect()}
    assert not (negs & edges)
    per_anchor = {}
    for a, c in negs:
        assert a != c
        per_anchor[a] = per_anchor.get(a, 0) + 1
    assert all(v <= Q.NEG_PER_ANCHOR for v in per_anchor.values())


def test_pmi_pairs_hand_computed(spark, monkeypatch, tmp_path):
    # corpus of one repeated doc "a b": only bigram (a,b); PMI = ln(T*c/(c*c))
    # with T=c -> ln(1) = 0 after marginals over the event set
    d = spark.createDataFrame(
        [(i, "a b", "en", "s", 3) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    monkeypatch.setattr(
        Qm, "_doc_bigrams",
        lambda s, sf: d.select(
            "doc_id", F.lit("a").alias("w1"), F.lit("b").alias("w2"),
            F.lit(1).alias("tf"),
        ),
    )
    rows = Qm.q_pmi_pairs(spark, "ignored").collect()
    assert [(r.w1, r.w2, r.c12, r.pmi) for r in rows] == [("a", "b", 5, 0.0)]


def test_target_encoding_shrinks_toward_prior(spark):
    rows = Q.q_target_encoding(spark, SF_SMOKE).collect()
    assert rows
    prior = sum(r.raw_mean_cents * r.n_orders for r in rows) / sum(
        r.n_orders for r in rows
    )
    for r in rows:
        lo, hi = sorted((r.raw_mean_cents, prior))
        assert lo - 1e-3 <= r.encoded_cents <= hi + 1e-3


def test_psi_identical_halves_is_zero(spark, monkeypatch):
    # same value multiset in both halves -> every psi term == 0
    import datetime as dt

    rows = []
    for h, base in ((0, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 2, 1))):
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0] * 4):
            rows.append((h * 1000 + i, base + dt.timedelta(minutes=i), i,
                         "purchase", v, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    out = Qm.q_psi_value_drift(spark, "ignored").collect()
    assert out
    assert all(r.psi_term == 0.0 for r in out)
    assert all(r.n_ref == r.n_cur for r in out)


def test_gate_parity_best_group_ratio_one(spark):
    rows = Q.q_gate_parity(spark, SF_SMOKE).collect()
    assert rows
    assert any(r.impact_ratio == 1.0 for r in rows)
    for r in rows:
        assert 0 <= r.n_keep <= r.n_docs
        assert 0.0 <= r.impact_ratio <= 1.0 + 1e-9
        assert r.below_80pct == (r.impact_ratio < 0.8)


def test_feature_hash_load_conserves_mass(spark):
    rows = Q.q_feature_hash_load(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= Q.FHASH_DIM
    n_tok = sum(r.n_tokens for r in Q.q_token_count(spark, SF_SMOKE).collect())
    assert sum(r.total_tf for r in rows) == n_tok
    for r in rows:
        assert r.n_terms >= 1 and r.df >= 1


def test_corpus_health_composes_registered_laws(spark):
    rows = {r.metric: r.value for r in Q.q_corpus_health(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "cross_batch_dup_rate", "min_source_diversity",
        "min_gate_impact_ratio", "k_anonymity_floor", "l_diversity_floor",
    }
    kan = Q.q_k_anonymity(spark, SF_SMOKE).collect()[0]
    assert rows["k_anonymity_floor"] == float(kan.k_floor)
    par = min(r.impact_ratio for r in Q.q_gate_parity(spark, SF_SMOKE).collect())
    assert rows["min_gate_impact_ratio"] == par


# ---- round-10 mini-batch laws ----


def test_ks_split_drift_matches_python_model(spark, monkeypatch):
    """KS over a tiny synthetic corpus vs a pure-python ECDF model
    using the same md5-window split assignment."""
    import hashlib

    docs = [(i, " ".join(["w"] * (3 + i % 7)), "s0") for i in range(60)]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_ks_split_drift(spark, "x").collect()[0]

    def bucket(doc_id):  # _md5_bucket(col, SPLIT_HEX_OFF) twin
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[Qm.SPLIT_HEX_OFF - 1:Qm.SPLIT_HEX_OFF + 7], 16) % 100

    train = [3 + i % 7 for i, _, _ in docs
             if bucket(i) < Qm.SPLIT_TRAIN_PCT]
    val = [3 + i % 7 for i, _, _ in docs
           if Qm.SPLIT_TRAIN_PCT <= bucket(i)
           < Qm.SPLIT_TRAIN_PCT + Qm.SPLIT_VAL_PCT]
    na, nb = len(train), len(val)
    grid = sorted(set(train) | set(val))
    d_num = max(
        abs(sum(1 for v in train if v <= g) * nb
            - sum(1 for v in val if v <= g) * na)
        for g in grid
    )
    assert (r.n_train, r.n_val, r.d_num) == (na, nb, d_num)
    assert abs(r.ks_stat - d_num / (na * nb)) <= 1e-6


def test_ks_split_drift_bounds(spark):
    r = Q.q_ks_split_drift(spark, SF_SMOKE).collect()[0]
    assert r.n_train > 0 and r.n_val > 0
    assert 0 <= r.d_num <= r.n_train * r.n_val
    assert 0.0 <= r.ks_stat <= 1.0


def test_mutual_info_identities(spark):
    r = Q.q_mutual_info_lang_source(spark, SF_SMOKE).collect()[0]
    # MI = H(lang) + H(source) - H(joint), within rounding of the parts
    assert abs(r.mi_nats - (r.h_lang + r.h_source - r.h_joint)) <= 3e-6
    assert -1e-9 <= r.mi_nats <= min(r.h_lang, r.h_source) + 3e-6
    assert r.h_joint <= r.h_lang + r.h_source + 3e-6
    assert max(r.h_lang, r.h_source) <= r.h_joint + 3e-6


def test_mutual_info_dependence_extremes(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    # perfectly dependent: source = lang -> MI == H(lang) == H(source)
    dep = spark.createDataFrame(
        [(i, "t", ["en", "fr", "de"][i % 3], ["en", "fr", "de"][i % 3])
         for i in range(30)],
        "doc_id long, text string, lang string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: dep)
    r = Qm.q_mutual_info_lang_source(spark, "x").collect()[0]
    assert r.mi_nats == r.h_lang == r.h_source == r.h_joint
    # independent uniform grid -> MI == 0 exactly (balanced counts)
    ind = spark.createDataFrame(
        [(i, "t", ["en", "fr"][i % 2], ["a", "b", "c"][i // 2 % 3])
         for i in range(30)],
        "doc_id long, text string, lang string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: ind)
    r = Qm.q_mutual_info_lang_source(spark, "x").collect()[0]
    assert abs(r.mi_nats) <= 2e-6


def test_contamination_sweep_monotone_flags(spark):
    rows = Q.q_contamination_sweep(spark, SF_SMOKE).collect()
    assert [r.ngram_n for r in rows] == list(Q.CONTAM_SWEEP_NS)
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_train_docs
        assert 0.0 <= r.flag_rate <= 1.0
    # a shared n-gram contains a shared (n-1)-gram and n-eligibility
    # implies (n-1)-eligibility, so flagged counts are non-increasing
    flags = [r.n_flagged for r in rows]
    assert all(a >= b for a, b in zip(flags, flags[1:]))


def test_ngram_novelty_first_batch_all_novel_and_conserves(spark):
    rows = Q.q_ngram_novelty_curve(spark, SF_SMOKE).collect()
    assert rows and rows[0].batch == 0
    assert rows[0].novelty_rate == 1.0  # nothing precedes batch 0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
    # each distinct shingle is novel in exactly one batch
    total_distinct = (
        Q.load_documents(spark, SF_SMOKE)
        .select(F.explode(Q.dedup.shingles("text", Q.NOVELTY_NGRAM)).alias("s"))
        .select(F.xxhash64("s").alias("h"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == total_distinct


def test_hapax_share_counts(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    d = spark.createDataFrame(
        [(1, "a a b c", "en", "s"), (2, "a d", "en", "s"),
         (3, "x x", "fr", "s")],
        "doc_id long, text string, lang string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    Qm._ANN_IDX.pop(("tokens", "x"), None)
    Qm._TOKENS.pop("x", None)
    rows = {r.lang: r for r in Qm.q_hapax_share(spark, "x").collect()}
    # en: counts a=3 b=1 c=1 d=1 -> vocab 4, hapax 3, tokens 6
    assert (rows["en"].vocab, rows["en"].n_hapax) == (4, 3)
    assert rows["en"].hapax_vocab_share == 0.75
    assert rows["en"].hapax_token_share == 0.5
    # fr: x twice -> no hapax
    assert (rows["fr"].vocab, rows["fr"].n_hapax) == (1, 0)


def test_hapax_share_bounds(spark):
    for r in Q.q_hapax_share(spark, SF_SMOKE).collect():
        assert 0 <= r.n_hapax <= r.vocab
        assert 0.0 <= r.hapax_vocab_share <= 1.0
        assert 0.0 <= r.hapax_token_share <= 1.0


def test_zipf_fit_matches_python_regression(spark):
    import math

    rows = {r.lang: r for r in Q.q_zipf_fit(spark, SF_SMOKE).collect()}
    # recompute one lang's regression from the raw term counts
    lang = sorted(rows)[0]
    per_term = (
        Q._tokens(spark, SF_SMOKE)
        .where(F.col("lang") == lang)
        .select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("ctf"))
        .collect()
    )
    top = sorted(per_term, key=lambda r: (-r.ctf, r.t))[: Q.ZIPF_TOP_R]
    S = Q.ENTROPY_SCALE
    xs = [round(math.log(i + 1) * S) for i in range(len(top))]
    ys = [round(math.log(r.ctf) * S) for r in top]
    n = len(xs)
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    varx = n * sum(x * x for x in xs) - sum(xs) ** 2
    want = cov / varx
    got = rows[lang].slope
    assert abs(got - want) <= 2e-6
    for r in rows.values():
        assert r.slope is None or r.slope <= 0.0  # rank-freq never rises
        assert r.r2 is None or 0.0 <= r.r2 <= 1.0 + 1e-9


def test_zipf_fit_degenerate_grid_null_r2(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    # every term occurs exactly once -> all y equal -> r2 NULL, slope 0
    d = spark.createDataFrame(
        [(1, "a b", "en", "s"), (2, "c d", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    Qm._ANN_IDX.pop(("tokens", "x"), None)
    Qm._TOKENS.pop("x", None)
    r = Qm.q_zipf_fit(spark, "x").collect()[0]
    assert r.slope == 0.0 and r.r2 is None


def test_term_burstiness_uniform_is_zero(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    # every term appears exactly once per doc -> VMR == 0
    d = spark.createDataFrame(
        [(i, "a b c", "en", "s") for i in range(5)],
        "doc_id long, text string, lang string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    Qm._ANN_IDX.pop(("tokens", "x"), None)
    Qm._TOKENS.pop("x", None)
    rows = Qm.q_term_burstiness(spark, "x").collect()
    assert {r.term for r in rows} == {"a", "b", "c"}
    for r in rows:
        assert (r.df, r.total_tf, r.vmr) == (5, 5, 0.0)


def test_term_burstiness_law(spark):
    rows = Q.q_term_burstiness(spark, SF_SMOKE).collect()
    assert len(rows) <= Q.BURST_TOP
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r.vmr >= -1e-9  # variance is non-negative
        assert r.total_tf >= r.df


def test_doclen_gini_equal_lengths_zero(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    d = spark.createDataFrame(
        [(i, "w w w", "s0") for i in range(4)],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_doclen_gini_by_source(spark, "x").collect()[0]
    assert (r.n_docs, r.total_tokens, r.gini) == (4, 12, 0.0)


def test_doclen_gini_bounds(spark):
    for r in Q.q_doclen_gini_by_source(spark, SF_SMOKE).collect():
        assert -1e-9 <= r.gini < 1.0
        assert r.n_docs > 0 and r.total_tokens >= r.n_docs


def test_srm_check_synthetic_counts(spark, monkeypatch):
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

    # 60 even users vs 40 odd users -> chi2 = 400/100 = 4.0 > 3.841
    rows = [(i, dt.datetime(2024, 1, 1), u, "click", 0.0, "{}")
            for i, u in enumerate(
                [2 * k for k in range(60)] + [2 * k + 1 for k in range(40)]
            )]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_srm_check(spark, "x").collect()[0]
    assert (r.n_a, r.n_b, r.chi2, r.srm_detected) == (60, 40, 4.0, True)


def test_srm_check_balanced_not_detected(spark, monkeypatch):
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

    rows = [(i, dt.datetime(2024, 1, 1), i, "view", 0.0, "{}")
            for i in range(50)]  # 25 even, 25 odd
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_srm_check(spark, "x").collect()[0]
    assert (r.chi2, bool(r.srm_detected)) == (0.0, False)


def test_winsorized_mean_matches_python_model(spark, monkeypatch):
    import datetime as dt
    import math

    import homemade_vector_db_spark.queries as Qm

    vals = [(0, 1), (0, 2), (0, 3), (0, 100), (1, 2), (1, 2), (1, 4),
            (1, 5), (0, 1), (1, 3)]
    rows = [(i, dt.datetime(2024, 1, 1), 2 * i + arm, "purchase",
             float(v), "{}") for i, (arm, v) in enumerate(vals)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_winsorized_mean_ab(spark, "x").collect()[0]
    micro = sorted(v * 1_000_000 for _, v in vals)
    n = len(micro)

    def pctl(k):  # smallest v with cum >= ceil(n*k/100)
        need = -(-n * k // 100)
        return micro[need - 1]

    lo, hi = pctl(Qm.WINSOR_LO_PCT), pctl(Qm.WINSOR_HI_PCT)
    assert (r.lo_micro, r.hi_micro) == (lo, hi)
    wa = [max(lo, min(hi, v * 1_000_000)) for a, v in vals if a == 0]
    wb = [max(lo, min(hi, v * 1_000_000)) for a, v in vals if a == 1]
    assert abs(r.wmean_a_micro - sum(wa) / len(wa)) <= 1e-6
    assert abs(r.wmean_b_micro - sum(wb) / len(wb)) <= 1e-6
    assert lo <= r.wmean_a_micro <= hi and lo <= r.wmean_b_micro <= hi


def test_power_mde_matches_python_model(spark):
    import math

    r = Q.q_power_mde(spark, SF_SMOKE).collect()[0]
    ev = (
        Q.load_table(spark, SF_SMOKE, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.round(F.col("value") * 1e6).cast("long").alias("v"),
        )
        .collect()
    )
    vs = [row.v for row in ev]
    n = len(vs)
    var = (n * sum(v * v for v in vs) - sum(vs) ** 2) / (n * (n - 1))
    na = sum(1 for row in ev if row.arm == 0)
    nb = n - na
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.sd_micro - math.sqrt(var)) <= 1e-4
    want = (Q.Z_ALPHA_975 + Q.Z_BETA_80) * math.sqrt(
        var * (1 / na + 1 / nb)
    )
    assert abs(r.mde_micro - want) <= 1e-4
    assert r.mde_micro > 0


def test_twonn_line_manifold_matches_python_twin(spark, monkeypatch):
    """Points on a 1-D line in 4-D with growing gaps (an even lattice
    ties r1 = r2 for interior points — degenerate for TwoNN): the
    estimate must match the python replication of the exact
    fixed-point law and sit far below the ambient dimension."""
    import math

    import homemade_vector_db_spark.queries as Qm

    xs = [0.01 * i * i for i in range(10)]
    pts = [(i, [x, 0.0, 0.0, 0.0], 0) for i, x in enumerate(xs)]
    e = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(Qm, "load_embeddings", lambda s, sf: e)
    Qm._ANN_IDX.pop(("knn_graph", "x"), None)
    r = Qm.q_twonn_intrinsic_dim(spark, "x").collect()[0]
    assert (r.n_nodes, r.n_used) == (10, 10)

    # python twin: same rounded-score inversion + fixed-point terms
    def score(r2):
        return round(1.0 / (1.0 + r2), 6)

    S = Qm.ENTROPY_SCALE
    total = 0
    for i in range(10):
        ds = sorted(
            (xs[i] - xs[j]) ** 2 for j in range(10) if j != i
        )[:2]
        s1, s2 = score(ds[0]), score(ds[1])
        mu2 = (1.0 / s2 - 1.0) / (1.0 / s1 - 1.0)
        total += round(math.log(mu2) * 0.5 * S)
    want = round(10 * S / total, 6)
    assert abs(r.id_hat - want) <= 1e-6
    assert r.id_hat < 4.0  # a curve's estimate, not the ambient 4-D


def test_twonn_fixture_high_dim(spark):
    r = Q.q_twonn_intrinsic_dim(spark, SF_SMOKE).collect()[0]
    assert r.n_used <= r.n_nodes
    # near-uniform unit 64-d vectors: intrinsic dim far above any
    # low-dim manifold
    assert r.id_hat is None or r.id_hat > 5.0


def test_price_percentiles_match_python(spark):
    rows = {
        r.o_orderpriority: r
        for r in Q.q_price_percentiles_by_priority(
            spark, SF_SMOKE
        ).collect()
    }
    o = (
        Q.load_table(spark, SF_SMOKE, "orders")
        .select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    by_pri = {}
    for row in o:
        by_pri.setdefault(row.o_orderpriority, []).append(row.c)
    for pri, cents in by_pri.items():
        cents.sort()
        n = len(cents)
        r = rows[pri]
        assert r.n_orders == n
        for k in Q.PCTL_KS:
            need = (n * k + 99) // 100
            assert getattr(r, f"p{k}_cents") == cents[need - 1]
        assert r.p50_cents <= r.p90_cents <= r.p99_cents


def test_embedding_norm_profile_unit_vectors(spark):
    for r in Q.q_embedding_norm_profile(spark, SF_SMOKE).collect():
        assert r.n_vecs > 0
        assert 0.98 <= r.min_norm2 <= r.mean_norm2 <= r.max_norm2 <= 1.02


def test_embedding_norm_profile_scaled_synthetic(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    e = spark.createDataFrame(
        [(0, [2.0, 0.0], 0), (1, [0.0, 2.0], 0), (2, [1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(Qm, "load_embeddings", lambda s, sf: e)
    rows = {r.label: r for r in
            Qm.q_embedding_norm_profile(spark, "x").collect()}
    assert (rows[0].min_norm2, rows[0].max_norm2, rows[0].mean_norm2) == (
        4.0, 4.0, 4.0,
    )
    assert rows[1].mean_norm2 == 1.0


def test_attribution_window_sweep_monotone_and_consistent(spark):
    rows = Q.q_attribution_window_sweep(spark, SF_SMOKE).collect()
    by_win = {}
    for r in rows:
        by_win.setdefault(r.window_days, {})[r.channel] = (
            r.n_purchases, r.revenue_micro,
        )
    assert sorted(by_win) == sorted(Q.ATTR_SWEEP_DAYS)
    # per-window totals are the same purchase set, just re-bucketed
    totals = {
        w: (sum(v[0] for v in ch.values()), sum(v[1] for v in ch.values()))
        for w, ch in by_win.items()
    }
    assert len(set(totals.values())) == 1
    # direct credit shrinks (weakly) as the window widens
    directs = [by_win[w].get("direct", (0, 0))[0]
               for w in sorted(by_win)]
    assert all(a >= b for a, b in zip(directs, directs[1:]))
    # the 7-day point must equal the standalone entry exactly
    want = {
        r.channel: (r.n_purchases, r.revenue_micro)
        for r in Q.q_attribution_last_touch(spark, SF_SMOKE).collect()
    }
    assert by_win[7] == want


def test_dedup_threshold_sweep_monotone_and_consistent(spark):
    rows = Q.q_dedup_threshold_sweep(spark, SF_SMOKE).collect()
    assert [r.tau for r in rows] == list(Q.DEDUP_SWEEP_TAUS)
    counts = [r.n_pairs for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # the 0.6 point must equal the standalone detector's pair count
    n06 = Q.q_ngram_jaccard_neardup(spark, SF_SMOKE).count()
    tau_counts = dict(zip([r.tau for r in rows], counts))
    assert tau_counts[0.6] == n06


def test_srm_check_empty_events_null_not_crash(spark, monkeypatch):
    import homemade_vector_db_spark.queries as Qm

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_srm_check(spark, "x").collect()[0]
    assert (r.n_a, r.n_b, r.chi2, r.srm_detected) == (0, 0, None, None)


def test_ks_split_drift_degenerate_split_null_not_crash(spark, monkeypatch):
    """A corpus whose every doc hashes into the train window leaves the
    val side empty — ks_stat must be NULL, not DIVIDE_BY_ZERO."""
    import hashlib

    import homemade_vector_db_spark.queries as Qm

    def bucket(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[Qm.SPLIT_HEX_OFF - 1:Qm.SPLIT_HEX_OFF + 7], 16) % 100

    train_ids = [i for i in range(400)
                 if bucket(i) < Qm.SPLIT_TRAIN_PCT][:5]
    d = spark.createDataFrame(
        [(i, "w w w", "s") for i in train_ids],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_ks_split_drift(spark, "x").collect()[0]
    assert r.n_train == 5 and r.n_val == 0
    assert r.ks_stat is None


def test_acf_matches_python_model(spark, monkeypatch):
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

    # 14 days of revenue with a period-7 pattern -> lag-7 acf high
    xs = [100, 20, 30, 40, 50, 60, 70] * 2
    base = dt.datetime(2024, 1, 1)
    rows = [(i, 7, "O", float(x), base + dt.timedelta(days=i), "1-URGENT")
            for i, x in enumerate(xs)]
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: o)
    got = {r.lag: (r.n_pairs, r.acf)
           for r in Qm.q_acf_daily_revenue(spark, "x").collect()}
    cents = [x * 100 for x in xs]
    n = len(cents)
    xbar = sum(cents) / n
    den = sum((x - xbar) ** 2 for x in cents)
    for k in range(1, Qm.ACF_MAX_LAG + 1):
        num = sum((cents[t] - xbar) * (cents[t + k] - xbar)
                  for t in range(n - k))
        assert got[k][0] == n - k
        assert abs(got[k][1] - num / den) <= 1e-6
    assert got[7][1] > 0.9 * max(v for _, v in got.values())


def test_acf_bounds_on_fixture(spark):
    for r in Q.q_acf_daily_revenue(spark, SF_SMOKE).collect():
        assert r.acf is None or -1.1 <= r.acf <= 1.1
        assert r.n_pairs > 0


def test_js_divergence_bounds_and_extremes(spark, monkeypatch):
    import math

    import homemade_vector_db_spark.queries as Qm

    # identical distributions -> JS == 0; disjoint vocab -> JS == ln 2
    d = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2"), (3, "x y", "s3")],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    rows = {r.source: r.js_nats
            for r in Qm.q_js_divergence_by_source(spark, "x").collect()}
    # s3 is fully disjoint from the rest -> ln 2
    assert abs(rows["s3"] - math.log(2)) <= 1e-6
    # s1 vs rest = {a,b,x,y}: strictly between 0 and ln 2
    assert 0.0 < rows["s1"] < math.log(2)
    for r in Q.q_js_divergence_by_source(spark, SF_SMOKE).collect():
        assert -1e-9 <= r.js_nats <= math.log(2) + 1e-9


def test_changepoint_cusum_detects_level_shift(spark, monkeypatch):
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

    # revenue 100/day for 10 days then 300/day for 10 days:
    # |CUSUM| peaks exactly at the boundary (day index 9)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, 7, "O", 100.0 if i < 10 else 300.0,
             base + dt.timedelta(days=i), "1-URGENT")
            for i in range(20)]
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: o)
    r = Qm.q_changepoint_cusum(spark, "x").collect()[0]
    base_day = (base - dt.datetime(1970, 1, 1)).days
    assert r.changepoint_day == base_day + 9
    assert r.n_days == 20
    # perfect two-level shift: normalized CUSUM stat = 0.5 exactly
    assert abs(r.cusum_stat - 0.5) <= 1e-6


def test_inter_arrival_profile_matches_python(spark):
    rows = {r.event_type: r
            for r in Q.q_inter_arrival_profile(spark, SF_SMOKE).collect()}
    ev = (
        Q.load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_ut = {}
    for e in ev:
        by_ut.setdefault((e.user_id, e.event_type), []).append(
            (e.ts, e.event_id)
        )
    gaps_by_type = {}
    for (u, t), es in by_ut.items():
        es.sort()
        for a, b in zip(es, es[1:]):
            us = int((b[0] - a[0]).total_seconds() * 1_000_000)
            gaps_by_type.setdefault(t, []).append(us // 1_000_000)
    for t, gaps in gaps_by_type.items():
        gaps.sort()
        n = len(gaps)
        r = rows[t]
        assert r.n_gaps == n
        for k in Q.IAT_KS:
            need = (n * k + 99) // 100
            assert getattr(r, f"p{k}_s") == gaps[need - 1]


def test_category_mix_drift_identical_halves_zero(spark, monkeypatch):
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

    # identical type mix in both halves -> chi2 == 0
    base = dt.datetime(2024, 1, 1)
    rows = []
    for half in (0, 1):
        for i, t in enumerate(["click", "view", "click", "purchase"]):
            rows.append(
                (len(rows), base + dt.timedelta(days=10 * half + i),
                 len(rows), t, 0.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_category_mix_drift(spark, "x").collect()[0]
    assert (r.n_types, r.dof, r.chi2) == (3, 2, 0.0)


def test_experiment_readout_composes_registered_laws(spark):
    rows = {r.metric: r.value
            for r in Q.q_experiment_readout(spark, SF_SMOKE).collect()}
    assert set(rows) == {"srm_chi2", "welch_t", "mannwhitney_z",
                         "winsorized_diff_micro", "mde_micro"}
    srm = Q.q_srm_check(spark, SF_SMOKE).collect()[0]
    assert rows["srm_chi2"] == srm.chi2
    mde = Q.q_power_mde(spark, SF_SMOKE).collect()[0]
    assert rows["mde_micro"] == mde.mde_micro


def test_drift_dashboard_composes_registered_laws(spark):
    rows = {r.metric: r.value
            for r in Q.q_drift_dashboard(spark, SF_SMOKE).collect()}
    assert set(rows) == {"value_psi", "category_mix_chi2", "split_ks",
                         "embedding_drift_l2_max"}
    ks = Q.q_ks_split_drift(spark, SF_SMOKE).collect()[0]
    assert rows["split_ks"] == ks.ks_stat
    psi_terms = [r.psi_term
                 for r in Q.q_psi_value_drift(spark, SF_SMOKE).collect()]
    want = round(sum(round(t * 1_000_000) for t in psi_terms) / 1_000_000, 6)
    assert rows["value_psi"] == want
