"""Property-based tests (hypothesis): Spark operators vs pure-python models
on randomized inputs — the fuzz layer the reference suite lacks.

Examples are kept small (each runs Spark jobs); deadline disabled because
JVM latency is not the property under test.
"""

import math

import numpy as np
import pytest
from hypothesis import (
    HealthCheck,
    example,
    given,
    settings,
    strategies as st,
)

from homemade_vector_db_spark.functions.text import tokenize
from homemade_vector_db_spark.operators import bm25
from homemade_vector_db_spark.operators.knn import knn_exact

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)

# derandomize=True: green runs mean the same thing every time — the
# random draw that found the skyline dominance bug and the all-tied
# Mann-Whitney crash is replaced by explicit @example pins for the
# known degenerate corners (empty arm, all-tied, n=1, single group).
SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def py_bm25(corpus, query, k1=1.5, b=0.75, epsilon=0.25):
    toks = [d.split() for d in corpus]
    N = len(toks)
    avgdl = sum(len(t) for t in toks) / N
    dfreq = {}
    for t in toks:
        for w in set(t):
            dfreq[w] = dfreq.get(w, 0) + 1
    raw = {w: math.log((N - f + 0.5) / (f + 0.5)) for w, f in dfreq.items()}
    avg = sum(raw.values()) / len(raw)
    idf = {w: (epsilon * avg if v < 0 else v) for w, v in raw.items()}
    out = []
    for t in toks:
        dl = len(t)
        s = 0.0
        for q in query.split():
            tf = t.count(q)
            if tf and q in idf:
                s += idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append(s)
    return out


@SETTINGS
@given(corpus=corpus_strategy, query=st.lists(st.sampled_from(WORDS), min_size=1, max_size=3).map(" ".join))
def test_bm25_matches_python_model(spark, corpus, query):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id LONG, text STRING"
    )
    got = {
        r.doc_id: r.score
        for r in bm25.query_text(spark, docs, query, top_k=len(corpus)).collect()
    }
    expected = py_bm25(corpus, query)
    for i, e in enumerate(expected):
        assert got[i] == pytest.approx(round(e, 6), abs=2e-6)


@SETTINGS
@given(
    data=st.lists(
        st.lists(st.integers(-5, 5), min_size=3, max_size=3),
        min_size=1,
        max_size=8,
        unique_by=tuple,
    ),
    q=st.lists(st.integers(-5, 5), min_size=3, max_size=3),
)
def test_knn_matches_numpy(spark, data, q):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    k = min(3, len(data))
    got = [r.vec_id for r in knn_exact(df, [float(x) for x in q], k=k).collect()]
    arr = np.asarray(data, dtype="float64")
    d2 = ((arr - np.asarray(q, dtype="float64")) ** 2).sum(axis=1)
    # same ordering contract: score desc (dist asc), id asc on ties
    order = sorted(range(len(data)), key=lambda i: (d2[i], i))[:k]
    assert got == order


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet=" \t\nabz", min_size=0, max_size=20), min_size=1, max_size=10
    )
)
def test_tokenizer_matches_str_split(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "i LONG, text STRING")
    got = {r.i: list(r.t) for r in df.select("i", tokenize("text").alias("t")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == s.split(), repr(s)


edge_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
)


def py_components(edges):
    """Union-find reference: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.slow
@given(edges=edge_strategy)
@SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """Both execution paths — driver union-find (small graphs) and the
    distributed propagation loop (driver_threshold=0) — must agree with
    the Python reference."""
    from homemade_vector_db_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a_id LONG, b_id LONG"
    )
    want = py_components(edges)
    got_driver = {
        r.doc_id: r.component for r in dedup.connected_components(pairs).collect()
    }
    got_dist = {
        r.doc_id: r.component
        for r in dedup.connected_components(pairs, driver_threshold=0).collect()
    }
    assert got_driver == want
    assert got_dist == want


def test_connected_components_long_chain_converges(spark):
    """A 200-node path (diameter 199) must fully converge well inside the
    default round budget — pointer doubling gives O(log d) rounds, so 20
    rounds cover diameters up to ~2^20, not 20 hops."""
    from homemade_vector_db_spark.operators import dedup

    edges = [(i, i + 1) for i in range(199)]
    pairs = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # must NOT warn
        got = {
            r.doc_id: r.component
            for r in dedup.connected_components(
                pairs, driver_threshold=0
            ).collect()
        }
    assert got == {i: 0 for i in range(200)}


def test_connected_components_warns_when_unconverged(spark):
    import pytest as _pytest

    from homemade_vector_db_spark.operators import dedup

    edges = [(i, i + 1) for i in range(30)]
    pairs = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    with _pytest.warns(RuntimeWarning, match="not converged"):
        dedup.connected_components(
            pairs, max_iter=1, driver_threshold=0
        ).collect()


@pytest.mark.slow
@given(edges=edge_strategy)
@SETTINGS
def test_connected_components_star_matches_union_find(spark, edges):
    """The large-star/small-star implementation must agree with the
    Python union-find reference on arbitrary pair graphs."""
    from homemade_vector_db_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a_id LONG, b_id LONG"
    )
    want = py_components(edges)
    got = {
        r.doc_id: r.component
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == want


def test_connected_components_star_long_chain(spark):
    """A 100-node path (diameter 99): star rounds contract any topology
    in O(log² n) rounds — must converge inside the default budget with
    no under-merge warning."""
    from homemade_vector_db_spark.operators import dedup
    import warnings

    edges = [(i, i + 1) for i in range(99)]
    pairs = spark.createDataFrame(edges, "a_id LONG, b_id LONG")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # must NOT warn
        got = {
            r.doc_id: r.component
            for r in dedup.connected_components_star(pairs).collect()
        }
    assert got == {i: 0 for i in range(100)}


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=20),
        min_size=2,
        max_size=8,
    )
)
@SETTINGS
def test_duplicated_span_stats_matches_bruteforce(spark, docs):
    """Interval-union coverage must equal the brute-force 'count distinct
    covered positions' reference on arbitrary token sequences."""
    from homemade_vector_db_spark.operators.dedup import duplicated_span_stats

    k = 3
    texts = [" ".join(f"w{t}" for t in toks) for toks in docs]
    rows = [(i, s) for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # python reference
    spans = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            spans.setdefault(tuple(toks[p : p + k]), set()).add(i)
    dup = {s for s, owners in spans.items() if len(owners) >= 2}
    want = {}
    for i, toks in enumerate(docs):
        covered = set()
        n_spans = 0
        for p in range(len(toks) - k + 1):
            if tuple(toks[p : p + k]) in dup:
                n_spans += 1
                covered.update(range(p, p + k))
        want[i] = (len(toks), n_spans, len(covered))

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["covered_tokens"])
        for r in duplicated_span_stats(df, k=k).collect()
    }
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user
            st.integers(min_value=0, max_value=3),   # state id
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_scd2_matches_python_model(spark, events):
    """SCD2 construction (collapse + versioned intervals) vs a direct
    Python fold over the per-user event sequence."""
    from homemade_vector_db_spark.streaming.scd2 import _collapse
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, f"s{sid}", base + datetime.timedelta(hours=i), i)
        for i, (u, sid) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_type STRING, ts TIMESTAMP, event_id LONG"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    collapsed = _collapse(df)
    got = [
        (r["user_id"], r["state"], r["ts"], r["event_id"])
        for r in collapsed.orderBy("user_id", "ts", "event_id").collect()
    ]

    # python model: keep first event of each run of equal states per user
    by_user: dict[int, list] = {}
    for u, s, ts, eid in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        seq = by_user.setdefault(u, [])
        if not seq or seq[-1][1] != s:
            seq.append((u, s, ts, eid))
    want = [row for u in sorted(by_user) for row in by_user[u]]
    assert got == want


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=5, max_size=5,
        ),
        min_size=1, max_size=6,
    ),
    q=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=5, max_size=5,
    ),
)
def test_literal_kernel_bit_identical_to_column_form(spark, vecs, q):
    """The parsed-SQL literal kernels (squared_l2_lit / dot_lit) must be
    BIT-identical (no rounding tolerance) to the Column-composed fixed
    forms on arbitrary float32 inputs — the equivalence every
    hash-checked oracle of the reworked query paths rests on."""
    from pyspark.sql import functions as F

    from homemade_vector_db_spark.functions.vector import (
        dot_fixed,
        dot_lit,
        squared_l2_fixed,
        squared_l2_lit,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id LONG, embedding ARRAY<FLOAT>",
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    rows = df.select(
        squared_l2_fixed("embedding", qlit, 5).alias("d2_col"),
        squared_l2_lit("embedding", [float(x) for x in q]).alias("d2_str"),
        dot_fixed("embedding", qlit, 5).alias("dot_col"),
        dot_lit("embedding", [float(x) for x in q]).alias("dot_str"),
    ).collect()
    for r in rows:
        assert r.d2_col == r.d2_str  # exact, not approx
        assert r.dot_col == r.dot_str


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=6,
    ),
)
def test_bq_pack_and_hamming_match_model(spark, vecs):
    """BQ sign-bit packing and Hamming distances vs a numpy model on
    random float32 vectors (fixture-independent twin of test_bq)."""
    from homemade_vector_db_spark.operators import bq

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    idx = bq.build_bq(df, dim=3, cache=False)
    X = np.array(vecs, dtype=np.float64)
    thr = (X.min(axis=0) + X.max(axis=0)) / 2.0
    assert np.allclose(idx.thresholds, thr, rtol=0, atol=0)
    bits = X > thr[None, :]
    q = [float(x) for x in vecs[0]]
    qbits = np.asarray(q, dtype=np.float64) > thr
    truth = {i: int((b != qbits).sum()) for i, b in enumerate(bits)}
    got = {r.vec_id: r.hamming for r in bq.bq_search(idx, q, k=len(vecs)).collect()}
    assert got == truth


@settings(
    deadline=None,
    max_examples=25,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_bpe_oracle_cte_matches_encoder_on_arbitrary_words(words):
    """Cross-engine BPE property: the DuckDB recursive-CTE fragment and
    the Python encoder agree piece-for-piece on ARBITRARY words (not
    just the fixture vocabulary) under the vendored merges table — the
    lockstep guarantee generalized. The CTE derives its word set from a
    `documents` view, so the random words are planted as one text."""
    import duckdb

    from homemade_vector_db_spark.functions.text import (
        bpe_encode,
        load_bpe_merges,
    )
    from homemade_vector_db_spark.queries import _bpe_oracle_cte

    merges = load_bpe_merges()
    ranks = {m: i for i, m in enumerate(merges)}
    con = duckdb.connect()
    text = " ".join(words).replace("'", "")
    con.execute(
        f"CREATE VIEW documents AS SELECT '{text}' AS text"
    )
    sql = (
        f"WITH RECURSIVE {_bpe_oracle_cte()},\n"
        "fin AS (SELECT word, min_by(s, length(s)) AS s FROM bpe GROUP BY word)\n"
        "SELECT word, list_filter(string_split(s, chr(1)), x -> x <> '') AS pieces "
        "FROM fin"
    )
    for word, pieces in con.execute(sql).fetchall():
        assert pieces == bpe_encode(word, ranks, merges), word


@settings(deadline=None, max_examples=20)
@given(
    n=st.integers(min_value=4, max_value=50),
    split=st.floats(min_value=0.2, max_value=0.8),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_nsw_incremental_insert_bit_identical_when_appending(n, split, seed):
    """Determinism law of nsw_add at the numpy level: when every added
    id sorts AFTER the existing ids (the append case — db.add always
    allocates ascending ids), the incremental insert replays the exact
    insertion sequence of a fresh full build, so levels AND adjacency
    are bit-identical — not merely recall-equivalent."""
    import math

    from homemade_vector_db_spark.operators import nsw

    rng = np.random.RandomState(seed)
    X = rng.rand(n, 4).astype(np.float64)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # arbitrary ascending ids
    m, ef = 4, 12
    s = max(1, min(n - 1, int(n * split)))

    levels_full, adj_full = nsw._hnsw_insertions(X, ids, m, ef)

    levels0, adj0 = nsw._hnsw_insertions(X[:s], ids[:s], m, ef)
    m_l = 1.0 / math.log(max(m, 2))
    levels_inc = list(levels0) + [
        nsw._level_of(int(i), m_l) for i in ids[s:]
    ]
    adj = [list(map(list, node)) for node in adj0] + [
        [[] for _ in range(levels_inc[p] + 1)] for p in range(s, n)
    ]
    old_levels = np.asarray(levels_inc[:s])
    max_lvl = int(old_levels.max())
    entry = int(np.flatnonzero(old_levels == max_lvl)[0])
    nsw._insert_positions(X, levels_inc, adj, range(s, n), m, ef, entry, max_lvl)

    assert levels_inc == levels_full
    assert adj == adj_full


@given(
    corpus=st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=6).map(
            "".join
        ),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=0, max_value=6),
)
@SETTINGS
def test_bpe_train_distributed_matches_reference_model(spark, corpus, n_merges):
    """Distributed BPE training == the pure-Python reference trainer on
    arbitrary tiny corpora (ties, saturation, single-char words,
    repeated words — the cases a fixed fixture can't sweep)."""
    from homemade_vector_db_spark.operators.bpetrain import (
        train_bpe_distributed,
        train_bpe_reference,
    )

    docs = spark.createDataFrame(
        [(i, " ".join([w])) for i, w in enumerate(corpus)],
        "doc_id long, text string",
    )
    freqs = {}
    for w in corpus:
        freqs[w] = freqs.get(w, 0) + 1
    assert train_bpe_distributed(docs, n_merges) == train_bpe_reference(
        freqs, n_merges
    )


@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=3, max_size=10).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    ),
    threshold=st.sampled_from([0.5, 0.8, 1.0]),
)
@SETTINGS
def test_containment_pairs_match_model_on_random_corpora(
    spark, texts, threshold
):
    """containment_pairs == the all-pairs set model on random corpora —
    sweeps duplicate texts, full containment, and threshold edges."""
    from homemade_vector_db_spark.operators import dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.a_id, r.b_id): r.containment
        for r in dedup.containment_pairs(
            docs, n=3, threshold=threshold
        ).collect()
    }
    sets = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) >= 3:
            sets[i] = {
                " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
            }
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                c = len(sa & sb) / len(sa)
                if c >= threshold:
                    want[(a, b)] = round(c, 6)
    assert got == want


# ---- round-9 fourth mini-batch law fuzz ----


@SETTINGS
@given(
    caps=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8),
)
def test_budget_fill_matches_python_waterfill(spark, caps, monkeypatch):
    """Water-filling allocation vs an O(S²) reference: Σ==B, caps
    respected, and the equal-share level law (no uncapped source gets
    less than a capped source's capacity)."""
    docs = [
        (i, " ".join(["w"] * c), f"s{i:02d}") for i, c in enumerate(caps)
    ]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    rows = {r.source: (r.capacity_tokens, r.allocated_tokens, bool(r.capped))
            for r in Qm.q_budget_mixture_fill(spark, "x").collect()}
    total = sum(caps)
    budget = total // 2
    got_sum = sum(a for _, a, _ in rows.values())
    assert got_sum == budget
    for src, (c, a, capped) in rows.items():
        assert 0 <= a <= c
        if capped:
            assert a == c
    # level law: every capped capacity <= every uncapped allocation + 1
    capped_caps = [c for c, a, k in rows.values() if k]
    uncapped_allocs = [a for c, a, k in rows.values() if not k]
    if capped_caps and uncapped_allocs:
        assert max(capped_caps) <= min(uncapped_allocs) + 1


@SETTINGS
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20)),
        min_size=1, max_size=30,
    ),
)
@example(vals=[(0, 5), (1, 5)])  # all-tied across arms: var2=0, z NULL
@example(vals=[(0, 3)])  # n=1 single row: n(n-1)=0 tie denominator
@example(vals=[(0, 2), (0, 2), (0, 2)])  # one arm empty + all tied
@example(vals=[(0, 7), (1, 7), (1, 7), (0, 7), (0, 7)])  # all-tied, n=5
@example(vals=[(0, 1), (1, 2), (1, 2), (0, 3)])  # partial ties, both arms
def test_mannwhitney_matches_python_ranksum(spark, vals, monkeypatch):
    """Doubled-midrank U₂ vs a pure-python midrank computation, plus
    the degenerate-variance contract: z is NULL exactly when the
    normal approximation's variance collapses to 0 (all values tied,
    one arm empty, or a single observation)."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), 2 * i + arm, "purchase", float(v), "{}")
        for i, (arm, v) in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: ev)
    r = Qm.q_mannwhitney_ab(spark, "x").collect()[0]
    # python midranks (1-based); arm of user 2i+arm is (2i+arm)%2 = arm
    data = sorted(range(len(vals)), key=lambda i: vals[i][1])
    ranks = {}
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and vals[data[j]][1] == vals[data[i]][1]:
            j += 1
        mid2 = (i + 1) + j  # 2*avg of positions i+1..j (1-based)
        for t in range(i, j):
            ranks[data[t]] = mid2
        i = j
    r2a = sum(ranks[i] for i, (arm, _) in enumerate(vals) if arm == 0)
    na = sum(1 for a, _ in vals if a == 0)
    nb = len(vals) - na
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.u2_a == r2a - na * (na + 1)
    # z contract: NULL iff var2 degenerates to 0
    n = na + nb
    ties = 0
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and vals[data[j]][1] == vals[data[i]][1]:
            j += 1
        t = j - i
        ties += t * t * t - t
        i = j
    tie_term = ties / (n * (n - 1)) if n > 1 else 0.0
    var2 = 4.0 * (na * nb / 12.0) * ((n + 1) - tie_term)
    if var2 > 0:
        z_py = (r.u2_a - na * nb) / math.sqrt(var2)
        assert r.z is not None and abs(r.z - z_py) <= 1e-6
    else:
        assert r.z is None


@SETTINGS
@given(
    pts=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)),
        min_size=1, max_size=25,
    ),
)
def test_skyline_matches_bruteforce(spark, pts, monkeypatch):
    """Two-level window skyline vs the O(n²) dominance definition."""
    import datetime as dt

    rows = [
        (i, float(c) / 100.0, dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
        for i, (c, d) in enumerate(pts)
    ]
    o = spark.createDataFrame(
        [(k, 7, "O", p, t, "1-URGENT") for k, p, t in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "load_table", lambda s, sf, name: o)
    got = {r.o_orderkey for r in Qm.q_skyline_orders(spark, "x").collect()}
    want = set()
    for k, (c, d) in enumerate(pts):
        if not any(
            c2 > c and d2 > d for k2, (c2, d2) in enumerate(pts) if k2 != k
        ):
            want.add(k)
    assert got == want


graph_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0, max_size=30,
)


@SETTINGS
@given(edges=graph_edges)
def test_kcore_matches_python_peel(spark, edges, monkeypatch):
    """Distributed-or-driver k-core vs a pure-python fixpoint peel on
    random mutual graphs (both endpoints list each other). Edges are
    canonicalized first — the kNN-graph input contract is unique
    (src, neighbor) pairs."""
    edges = sorted({(min(u, v), max(u, v)) for u, v in edges})
    both = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    g = spark.createDataFrame(
        both or [(0, 1), (1, 0)], "src long, neighbor_id long"
    ) if both else spark.createDataFrame([], "src long, neighbor_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    r = Qm.q_graph_kcore(spark, "ignored").collect()[0]

    und = {(min(u, v), max(u, v)) for u, v in edges}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = set(adj)
    rounds = 0
    while True:
        keep = {x for x in nodes
                if sum(1 for y in adj[x] if y in nodes) >= Qm.KCORE_K}
        if keep == nodes:
            break
        nodes = keep
        rounds += 1
    ce = sum(1 for u, v in und if u in nodes and v in nodes)
    assert (r.n_core_nodes, r.n_core_edges, r.rounds, r.converged) == (
        len(nodes), ce, rounds, True
    )


@pytest.mark.slow
@SETTINGS
@given(edges=graph_edges)
def test_hits_matches_python_power_iteration(spark, edges, monkeypatch):
    """2-round unnormalized HITS vs a pure-python computation on random
    DIRECTED graphs."""
    dedges = list(dict.fromkeys(edges))
    if not dedges:
        return
    nodes = sorted({x for e in dedges for x in e})
    g = spark.createDataFrame(dedges, "src long, neighbor_id long")
    emb = spark.createDataFrame([(n,) for n in nodes], "vec_id long")
    import homemade_vector_db_spark.queries as Qm

    monkeypatch.setattr(Qm, "_knn_graph", lambda s, sf: g)
    monkeypatch.setattr(Qm, "load_embeddings", lambda s, sf: emb)
    got = {r.vec_id: (r.authority, r.hub)
           for r in Qm.q_graph_hits(spark, "ignored").collect()}

    h = {n: 1 for n in nodes}
    a = {}
    for _ in range(Qm.HITS_ROUNDS):
        a = {n: 0 for n in nodes}
        for u, v in dedges:
            a[v] += h[u]
        h = {n: 0 for n in nodes}
        for u, v in dedges:
            h[u] += a[v]
    want_order = sorted(nodes, key=lambda n: (-a[n], n))[:Qm.HITS_TOP]
    assert got == {n: (a[n], h[n]) for n in want_order}


@pytest.mark.slow
@SETTINGS
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30)),
        min_size=1, max_size=40,
    ).filter(lambda v: len({a for a, _ in v}) == 2),
)
@example(vals=[(0, 5), (1, 5)])  # all equal: lo == hi == every value
@example(vals=[(0, 0), (1, 30)])  # two-point extremes
@example(vals=[(0, 1)] * 20 + [(1, 29)])  # mass at one value
def test_winsorized_mean_matches_python(spark, vals, monkeypatch):
    """Discrete ceil-identity percentile bounds + clamped arm means vs
    a pure-python model on randomized arm/value lists."""
    import datetime as dt

    import homemade_vector_db_spark.queries as Qm

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

    def pctl(k):
        return micro[(n * k + 99) // 100 - 1]

    lo, hi = pctl(Qm.WINSOR_LO_PCT), pctl(Qm.WINSOR_HI_PCT)
    assert (r.lo_micro, r.hi_micro) == (lo, hi)
    wa = [max(lo, min(hi, v * 1_000_000)) for a, v in vals if a == 0]
    wb = [max(lo, min(hi, v * 1_000_000)) for a, v in vals if a == 1]
    assert abs(r.wmean_a_micro - sum(wa) / len(wa)) <= 1e-6
    assert abs(r.wmean_b_micro - sum(wb) / len(wb)) <= 1e-6


@SETTINGS
@given(
    lens=st.lists(st.integers(1, 40), min_size=1, max_size=30),
)
@example(lens=[7] * 10)  # all equal lengths: gini == 0
@example(lens=[1, 39])  # two extremes
def test_doclen_gini_matches_python(spark, lens, monkeypatch):
    """Per-source Gini vs the rank-formula python model."""
    import homemade_vector_db_spark.queries as Qm

    d = spark.createDataFrame(
        [(i, " ".join(["w"] * c), "s0") for i, c in enumerate(lens)],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(Qm, "load_documents", lambda s, sf: d)
    r = Qm.q_doclen_gini_by_source(spark, "x").collect()[0]
    xs = sorted(lens)
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    want = 2.0 * srx / (n * sx) - (n + 1.0) / n
    assert r.n_docs == n and r.total_tokens == sx
    assert abs(r.gini - want) <= 1e-6
