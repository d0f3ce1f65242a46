"""Derived-state BUILD ledger (VERDICT r12 Next #1).

Round 12 moved every timing artifact to warm steady-state (bench.py
pre-builds untimed, check_correctness --warm, warmed scale audit) —
correct query-latency policy, but it made the INGEST-side cost of the
materialized tier invisible: the reference pays this cost at add()
(local_db.py:73-75), and at 100 TB it is real money. This script times
every `_materialized` derived-state family COLD at sf0.01 / sf0.1 / sf1
and records a `builds` section in SCALE_AUDIT.json:

    name -> {table, sec{sf}, rows_out, bytes{sf}, alpha{lo->hi}}

Semantics: INCREMENTAL dependency-ordered cost — each artifact is timed
with its upstreams already materialized (tokens before doc_bigrams
before bigram_lm, the order a real ingest pipeline runs), so the sum of
rows at one SF is the total cold-ingest cost of the whole derived tier.
The measurement is the REAL cold path: the on-disk artifact is removed
and the session cache cleared, then the production wrapper runs —
build + parquet write + atomic publish + read-back all included.

Two rows are session-persisted state rather than parquet artifacts and
are timed as their first-materialization cost: `tfidf_norms` (the
persisted normalized-postings relation) and `components` (the three
dashboard capstones driving every registered monitor law cold).
`knn_graph_base50` is timed through the incremental-gate entry, so its
number includes the (cheap) live merge that entry exists to test.

Usage: python scripts/build_audit.py [row ...]   (default: all rows)
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.session import get_spark, release_transient

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.localdata/sf1"),
]

OUT = "/root/repo/SCALE_AUDIT.json"


def _clear_kinds(kinds: list[str], sf_dir: str) -> None:
    """Remove the on-disk artifacts and session-cache entries for the
    given derived-state kinds, so the next wrapper call is a true cold
    build. The glob anchor is the same `{kind}_{corpus-tag}_` prefix the
    production GC uses."""
    tag = Q._corpus_tag(sf_dir)
    for kind in kinds:
        for d in glob.glob(os.path.join(Q._DERIVED_ROOT, f"{kind}_{tag}_*")):
            shutil.rmtree(d, ignore_errors=True)
        Q._ANN_IDX.pop((kind, sf_dir), None)


def _artifact_bytes(kinds: list[str], sf_dir: str) -> int:
    tag = Q._corpus_tag(sf_dir)
    total = 0
    for kind in kinds:
        for d in glob.glob(os.path.join(Q._DERIVED_ROOT, f"{kind}_{tag}_*")):
            for root, _, files in os.walk(d):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


# --------------------------------------------------------------- rows
# (name, table-for-alpha, kinds, extra-session-clear, build fn)
# fn(spark, sf_dir) -> rows_out (forces the build + one read-back count)


def _bm25(spark, sf):
    return Q._bm25_stats(spark, sf).postings.count()


def _bm25c(spark, sf):
    return Q._bm25_stats_corpus(spark, sf).postings.count()


def _tokens(spark, sf):
    return Q._tokens(spark, sf).count()


def _unigrams(spark, sf):
    return Q._unigram_counts(spark, sf).count()


def _doc_bigrams(spark, sf):
    return Q._doc_bigrams(spark, sf).count()


def _bigram_lm(spark, sf):
    return Q._bigram_lm(spark, sf).count()


def _bpe(spark, sf):
    return Q._bpe_word_pieces(spark, sf).count()


def _shingles(spark, sf):
    return Q._shingle_sets(spark, sf).count()


def _graph_exact(spark, sf):
    return Q._knn_graph_exact(spark, sf).count()


def _graph_ann(spark, sf):
    return Q.q_knn_graph_ann(spark, sf).count()


def _graph_auto(spark, sf):
    return Q._knn_graph(spark, sf).count()


def _graph_base(spark, sf):
    return Q.q_knn_graph_incremental(spark, sf).count()


def _token_fixture(spark, sf):
    from homemade_vector_db_spark.sources import tokenvec

    path = tokenvec.token_fixture_path(sf)
    if os.path.isfile(path):
        os.remove(path)
    tokenvec.ensure_token_fixture(sf)
    return spark.read.parquet(path).count()


def _tfidf_norms(spark, sf):
    from homemade_vector_db_spark.operators import dedup

    tf = Q._bm25_stats(spark, sf).postings.select("doc_id", "term", "tf")
    n_docs = tf.select("doc_id").distinct().count()
    u = dedup.tfidf_normalized_postings(
        tf, n_docs, max_df_frac=Q.TFIDF_MAX_DF_FRAC
    )
    return u.count()


def _components(spark, sf):
    reg = Q.registry()
    n = 0
    for name in ("corpus_health", "experiment_readout", "drift_dashboard"):
        n += reg[name](spark, sf).count()
    return n


def _clear_components(sf_dir: str) -> list[str]:
    """cmp-kind discovery: session keys + on-disk dirs share the
    cmp{version}_ prefix."""
    tag = Q._corpus_tag(sf_dir)
    prefix = f"cmp{Q._CMP_VERSION}_"
    kinds = set()
    for d in glob.glob(os.path.join(Q._DERIVED_ROOT, f"{prefix}*_{tag}_*")):
        base = os.path.basename(d)
        kinds.add(base.split(f"_{tag}_")[0])
    for key in [k for k in list(Q._ANN_IDX) if isinstance(k, tuple)
                and str(k[0]).startswith(prefix) and k[1] == sf_dir]:
        Q._ANN_IDX.pop(key, None)
    for k in kinds:
        _clear_kinds([k], sf_dir)
    return sorted(kinds)


LEDGER = [
    ("tokens", "documents", ["tokens"], _tokens),
    ("unigram_counts", "documents", ["unigram_counts"], _unigrams),
    ("doc_bigrams", "documents", ["doc_bigrams"], _doc_bigrams),
    ("bigram_lm", "documents", ["bigram_lm"], _bigram_lm),
    ("bpe_word_pieces", "documents", ["bpe_word_pieces"], _bpe),
    ("bm25_stats", "documents", ["bm25_postings", "bm25_doclen"], _bm25),
    ("bm25c_stats", "documents", ["bm25c_postings", "bm25c_doclen"], _bm25c),
    ("shingles", "documents", ["shingles"], _shingles),
    ("tfidf_norms", "documents", [], _tfidf_norms),
    ("token_fixture", "documents", [], _token_fixture),
    ("knn_graph_exact", "embeddings", ["knn_graph_exact"], _graph_exact),
    ("knn_graph_ann", "embeddings", ["knn_graph_ann"], _graph_ann),
    ("knn_graph", "embeddings", ["knn_graph"], _graph_auto),
    (
        f"knn_graph_base{Q.KNN_INC_NEW}",
        "embeddings",
        [f"knn_graph_base{Q.KNN_INC_NEW}"],
        _graph_base,
    ),
    ("components", "documents", None, _components),  # kinds discovered
]


def main() -> None:
    names = sys.argv[1:] or [n for n, *_ in LEDGER]
    spark = get_spark(
        app_name="build-audit",
        cpus=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    counts: dict[str, dict[str, int]] = {}
    for sf, d in SFS:
        counts[sf] = {
            t: spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
            for t in ("documents", "embeddings")
        }
    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    builds = prior.get("builds", {})
    # warm the JVM once so sf0.01 builds aren't paying interpreter boot
    Q.registry()["knn_exact"](spark, SFS[0][1]).collect()
    for sf, d in SFS:
        # pop the whole-corpus session caches so each SF starts cold
        Q._BM25_STATS.pop(d, None)
        Q._BM25_STATS_CORPUS.pop(d, None)
        Q._TOKENS.pop(d, None)
        for name, table, kinds, fn in LEDGER:
            if name not in names:
                continue
            if kinds is None:
                kinds = _clear_components(d)
            else:
                _clear_kinds(kinds, d)
                if name == "bm25_stats":
                    Q._BM25_STATS.pop(d, None)
                elif name == "bm25c_stats":
                    Q._BM25_STATS_CORPUS.pop(d, None)
                elif name == "tokens":
                    Q._TOKENS.pop(d, None)
            t0 = time.perf_counter()
            rows = fn(spark, d)
            dt = round(time.perf_counter() - t0, 3)
            row = builds.setdefault(
                name, {"table": table, "sec": {}, "bytes": {}, "rows": {}}
            )
            row["sec"][sf] = dt
            row["rows"][sf] = rows
            if name == "components" and not kinds:
                # fresh machine: the cmp_* dirs only exist AFTER the
                # build — re-discover them now so bytes are recorded on
                # exactly the cold runs the ledger exists to measure
                tag = Q._corpus_tag(d)
                kinds = sorted(
                    os.path.basename(p).split(f"_{tag}_")[0]
                    for p in glob.glob(os.path.join(
                        Q._DERIVED_ROOT, f"cmp{Q._CMP_VERSION}_*_{tag}_*"
                    ))
                )
            row["bytes"][sf] = _artifact_bytes(kinds, d) if kinds else None
            release_transient()
            print(f"BUILD {name:22s} {sf:7s} {dt:8.2f}s rows={rows}",
                  flush=True)
            # incremental write so a killed run keeps finished rows
            row["alpha"] = {}
            for (lo, _), (hi, _) in zip(SFS, SFS[1:]):
                if lo in row["sec"] and hi in row["sec"]:
                    n_lo = counts[lo][row["table"]]
                    n_hi = counts[hi][row["table"]]
                    if n_hi != n_lo and row["sec"][lo] > 0:
                        row["alpha"][f"{lo}->{hi}"] = round(
                            math.log(row["sec"][hi] / row["sec"][lo])
                            / math.log(n_hi / n_lo), 3,
                        )
            prior["builds"] = builds
            with open(OUT, "w") as f:
                json.dump(prior, f, indent=1)
    totals = {
        sf: round(sum(r["sec"].get(sf, 0.0) for r in builds.values()), 2)
        for sf, _ in SFS
    }
    prior["builds_total_sec"] = totals
    with open(OUT, "w") as f:
        json.dump(prior, f, indent=1)
    print(json.dumps({"builds_total_sec": totals}))
    spark.stop()


if __name__ == "__main__":
    main()
