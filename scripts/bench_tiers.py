"""Head-to-head ANN tier benchmark (VERDICT r3 item 9): build time,
per-query latency, and recall@10 vs exact for the LSH / IVF / NSW-graph
tiers at $SPARK_GRAFT_SF_DIR (default sf0.1). Prints one JSON line per
tier plus a summary; the measured numbers and the tier-selection
guidance they support live in BASELINE.md (round 4) and README.

Method: build once (timed, forced with a count), then for each of
N_QUERIES corpus vectors run the tier's point search twice and keep the
min (JIT/GC guard); recall@10 against knn_exact on the same queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homemade_vector_db_spark.operators import ann, nsw
from homemade_vector_db_spark.operators.knn import knn_exact
from homemade_vector_db_spark.session import get_spark
from homemade_vector_db_spark.sources.tables import load_embeddings

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_QUERIES = int(os.environ.get("TIER_QUERIES", "10"))
K = 10
DIM = 64


def main() -> None:
    spark = get_spark(
        app_name="tier-bench",
        cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    embs = load_embeddings(spark, SF_DIR).cache()
    n = embs.count()
    qrows = embs.orderBy("vec_id").limit(N_QUERIES).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in qrows]
    exact = {
        qid: [r.vec_id for r in knn_exact(embs, qv, k=K, dim=DIM).collect()]
        for qid, qv in queries
    }

    tiers = {
        "flat": (
            lambda: embs,  # brute force: the corpus IS the index
            lambda idx, qv: knn_exact(idx, qv, k=K, dim=DIM),
        ),
        "lsh": (
            lambda: ann.build_lsh(embs, bucket_length=2.0, num_hash_tables=3),
            lambda idx, qv: ann.lsh_search(idx, qv, k=K),
        ),
        "ivf": (
            lambda: ann.build_ivf(embs, nlist=16),
            lambda idx, qv: ann.ivf_search(idx, qv, k=K, nprobe=8),
        ),
        "nsw": (
            lambda: nsw.build_nsw(embs, rows_per_shard=2000),
            lambda idx, qv: nsw.nsw_search(idx, qv, k=K, ef_search=50),
        ),
    }
    results = {}
    for name, (build, search) in tiers.items():
        t0 = time.perf_counter()
        idx = build()
        search(idx, queries[0][1]).collect()  # forces build + warms search
        t_build = time.perf_counter() - t0
        lat, hits = [], 0
        for qid, qv in queries:
            got = None
            best = float("inf")
            for _ in range(2):
                t1 = time.perf_counter()
                got = [r.vec_id for r in search(idx, qv).collect()]
                best = min(best, time.perf_counter() - t1)
            lat.append(best)
            hits += len(set(got) & set(exact[qid]))
        results[name] = {
            "build_sec": round(t_build, 3),
            "query_sec_min_avg": round(sum(lat) / len(lat), 4),
            "recall_at_10": round(hits / (K * len(queries)), 3),
        }
        print(json.dumps({"tier": name, "n": n, **results[name]}))
    print(json.dumps({"summary": results, "n": n, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
