"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Per query: 1 warmup + N timed runs, MIN reported (this container shows
multi-second JIT/GC stalls on otherwise-sub-second queries; min-of-N is
the standard noise-robust statistic for microbenchmarks). `value` is the
sum of per-query minima (total headline seconds — lower is better).
VERDICT r10 Next #2: the MEDIAN of the same samples is reported beside
the min (`median` total + per-query `queries_median`), so a run-local
outlier like the r10 knn_graph 12× swing is detectable in the artifact
itself instead of only by diffing rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "5"))

# Headline set: one per operator family (SURVEY.md §2).
HEADLINE = [
    "knn_exact",
    "cosine_topk",
    "knn_prefilter",
    "meta_conditions",
    "bm25_topk",
    "hybrid_topk",
    "dedup_exact",
    "ngram_jaccard_neardup",
    "token_count",
    "quality_score",
    "lineitem_pricing",
    "top_customers",
    "events_hourly",
    "minhash_neardup",
    "knn_batch",
    "asof_click_before_purchase",
    "top_terms",
    "user_running_total",
    "top_orders_q3",
    "sessionize",
    "cube_pricing",
    "regional_supplier_volume",
    "corpus_prep",
    # round 2: planner-shape guards (Q19/Q21/Q22 forms) + the reworked
    # scale paths, so their plans stay perf-regression-visible
    "brand_quantity_revenue",
    "rich_inactive_customers",
    "multi_supplier_orders",
    "cosine_neardup",
    "cross_source_contamination",
    "neardup_components",
    # round 2c: planner + fusion guards (heaviest of the new shapes)
    "returned_item_revenue",
    "rolling_weekly_revenue",
    "rrf_fusion",
    # round 2e: new retrieval tiers (literal-kernel regression guards)
    "bq_topk",
    "radius_search",
    "maxsim_topk",
    # round 11: token-level MaxSim over the real per-token vector
    # fixture (warmup absorbs the one-time fixture generation), the
    # bm25→MaxSim rerank cascade, and the proximity-ranking window law
    "maxsim_token_topk",
    "maxsim_rerank_topk",
    "term_proximity_topk",
    "t_closeness",
    "dow_revenue_profile",
    # round 4: derived-state guards (disk-materialized token/bigram/BPE
    # relations — warmup absorbs the one-time build; the timed number is
    # the scoring-only path these rounds optimized)
    "bigram_logprob",
    "token_count_bpe",
    # round 7: the new training-pipeline families — media dedup through
    # the real codecs (both modalities share the banded-Hamming engine)
    # and the relational embedding-drift monitor (scales with SF)
    "image_phash_neardup",
    "audio_fingerprint_neardup",
    "embedding_drift",
    # round 7 second half: video dedup (third modality on the shared
    # engine), contrastive pair mining, and the cluster-weighted sampler
    # (the heaviest new shape: CC + window law over the full corpus)
    "video_phash_neardup",
    "hard_negatives",
    "dedup_cluster_sample",
    "triplet_mining",
    "tokenizer_fertility",
    # round 11 (VERDICT r10 Next #1): the bare exact `knn_graph` tier is
    # OUT of the headline set — same code measured 1.93 s (r9), 8.2 s
    # (SCALE_AUDIT), 24.58 s (r10) at the same sf0.1, i.e. run-local
    # noise that swamped the whole bench total. The exact tier remains
    # the oracle input to the knn_graph_recall gate (its correctness
    # role, mirroring the reference's flat index, local_db.py:47-48);
    # the entry users should call — and the one benched — is
    # knn_graph_auto below (tier dispatch + disk materialization).
    "mixture_reweight",
    # round 9: the tier-dispatched graph entry (exact kernel at bench SF —
    # one chunk, vs knn_graph's two) and the graph-SemDeDup composition.
    # knn_graph_ann is deliberately NOT here: at 2k rows it is the wrong
    # tier by design (the auto dispatch exists precisely so users never
    # run it there); its time-vs-rows curve is recorded in SCALE.md /
    # SCALE_AUDIT.json where the crossover story lives.
    "knn_graph_auto",
    "graph_semdedup",
    # round 9: distributed-both-sides exact kNN join (cogrouped tiles)
    # and the embedding-level decontam sweep built on it
    "knn_join_topk",
    "semantic_decontam",
    # round 9 second half: the retrieval cascade family (passage-granular
    # BM25, lexical-recall/dense-precision rerank) and graph centrality
    "chunk_bm25_topk",
    "bm25_rerank_topk",
    "graph_pagerank",
    # round 9 continuation: asymmetric containment dedup (prefix-vs-
    # posting-list join — wider than jaccard's prefix×prefix by design),
    # the distributed-BPE-training round-1 law, and the per-label
    # integer-MAD embedding outlier gate. knn_join_ivfpq is NOT here for
    # the same reason knn_graph_ann isn't: at 2k rows the auto dispatch
    # never picks it; its curve lives in SCALE_AUDIT.json.
    "containment_neardup",
    "bpe_pair_counts",
    "embedding_outliers",
    "source_overlap",
    "fuzzy_term_search",
    # round 9 fourth mini-batch: the perf-interesting new shapes — the
    # capped iterative peel (graph_kcore), the no-division power
    # iteration (graph_hits), the corpus-sized md5 dup-rate monitor,
    # the event-type pivot similarity join, the scan-side HOF snippet
    # window, and the per-user attribution window pass
    "graph_kcore",
    "graph_hits",
    "dedup_rate_by_batch",
    "user_similarity",
    "snippet_extract",
    "attribution_last_touch",
    # and the preference/survival/funnel additions (skyline's two-level
    # window prune is the perf-interesting shape)
    "skyline_orders",
    "km_survival",
    "funnel_dropoff",
    "wedge_recommend",
    "probe_auc",
    "graph_modularity",
    "session_stats",
    "link_negatives",
    "pmi_pairs",
    "target_encoding",
    "psi_value_drift",
    "gate_parity",
    "feature_hash_load",
    "corpus_health",
    # round-10 mini-batch: drift + saturation laws
    "ks_split_drift",
    "mutual_info_lang_source",
    "contamination_sweep",
    "ngram_novelty_curve",
    # round-10 second mini-batch: vocabulary-shape laws
    "hapax_share",
    "zipf_fit",
    "term_burstiness",
    "doclen_gini_by_source",
    # round-10 third mini-batch: experimentation hygiene
    "srm_check",
    "winsorized_mean_ab",
    "power_mde",
    # round-10 fourth mini-batch: embedding-space diagnostics
    "twonn_intrinsic_dim",
    "price_percentiles_by_priority",
    "embedding_norm_profile",
    # round-10 fifth mini-batch: parameter-sweep curves
    "attribution_window_sweep",
    "dedup_threshold_sweep",
    # round-10 sixth mini-batch: time-series + distribution laws
    "acf_daily_revenue",
    "js_divergence_by_source",
    # round-10 seventh mini-batch: monitors + profiles
    "changepoint_cusum",
    "inter_arrival_profile",
    "category_mix_drift",
    # round-10 capstones
    "experiment_readout",
    "drift_dashboard",
    # round 13 (VERDICT r12 Next #4): the entries whose plans rounds
    # 12-13 changed join the headline so the cross-round trend sees
    # them — the tfidf df-cap APSS rewrite (r11's invisibility
    # complaint), the rotated-PQ gate, and the new IVF-OPQ stack gate.
    "tfidf_cosine_neardup",
    "opq_recall",
    "ivfopq_recall",
]


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(
        app_name="hvdb-bench",
        cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.registry()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    # Phase 0 (VERDICT r11 Next #4): one untimed PRE-BUILD pass over the
    # whole headline set before ANY timed sample. This forces every
    # piece of session-shared derived state (BM25 stats, shingle sets,
    # tf-idf norms, token fixture, _materialized graph/token artifacts)
    # to exist up front — the reference builds its index at add() time
    # (local_db.py:73-75), not inside a query — and gives the JVM a full
    # JIT pass over every generated plan class, so a first-use build or
    # C2 compilation stall can never land inside one entry's timed
    # min on a contended box (r11: rrf_fusion 1.06 s builder vs 4.16 s
    # driver for identical code).
    for name in HEADLINE:
        registry[name](spark, SF_DIR).collect()
        release_transient()
    colds: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        fn(spark, SF_DIR).collect()  # warmup: JIT, parquet footer cache
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        medians[name] = round(statistics.median(samples), 4)
        release_transient()
        # VERDICT r13 Next #8: one additional run AFTER release_transient
        # so persisted entries' per-invocation (cold-cache) cost is visible
        # in the sidecar. Timed fields above are untouched (methodology
        # unchanged; this sample is sidecar-only).
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        colds[name] = round(time.perf_counter() - t0, 4)
        release_transient()
    spark.stop()
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "median": round(sum(medians.values()), 4),
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_cold": colds,
        "sf": sf_from_dir(SF_DIR),
    }
    # Full detail (min + median + cold per query) goes to a sidecar file
    # and a PRECEDING stdout line; the FINAL line is the compact summary.
    # VERDICT r13 Next #2: the final line carries the per-query MIN map
    # again (3-decimal, ~2.5 KB for 109 entries — well inside the
    # driver's tail capture; the r09 truncation came from the full
    # 3-map dict). Medians and cold samples stay in the sidecar.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))
    print(json.dumps({
        "metric": out["metric"],
        "value": out["value"],
        "median": out["median"],
        "unit": "sec",
        "n_queries": len(timings),
        "sf": out["sf"],
        "detail": "BENCH_DETAIL.json",
        "queries": {k: round(v, 3) for k, v in timings.items()},
    }))


if __name__ == "__main__":
    main()
