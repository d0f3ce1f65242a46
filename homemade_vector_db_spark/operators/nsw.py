"""Partition-local NSW graph index — the HNSW-role tier as a *shard-local
graph*, the architecture real distributed vector stores use for graph ANN
(each shard owns an independent navigable-small-world graph; a query beam-
searches every shard and the tiny per-shard top-k lists merge globally).

Reference parity: hnswlib IS the reference's primary index
(local_db.py:41-47, M / ef_construction / ef_search kwargs). A single
global graph walk is inherently sequential (each hop needs the previous
hop's result — the antithesis of the DataFrame model, SURVEY.md §2), but
SHARDED graphs parallelize perfectly: build is one `applyInPandas` over
hash-partitioned rows, search is one `applyInPandas` over the persisted
shard tables + a global TakeOrderedAndProject merge. The LSH/IVF tiers
remain the bucketed alternatives; this tier exists for graph-parity and
for corpora where graph search's recall/probe tradeoff wins.

Determinism: insertion order is id-ascending within a shard, shard
assignment is a pure hash of the id, and all distance ties break on id —
same build every run, any cluster size.

Scale: shards are bounded (`rows_per_shard`); at 100 TB the graph table
is (id, vec, neighbors[M]) rows partitioned by shard — neighbors add
M×8 bytes/row. Build cost is O(n·ef_construction) distance evals done
shard-locally in numpy; no shuffle beyond the initial hash partition.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class NSWIndex:
    graph: DataFrame  # shard, id, vec, neighbors (array<long>)
    id_col: str
    vec_col: str
    m: int
    ef_construction: int


def _greedy_insertions(X: np.ndarray, ids: np.ndarray, m: int, ef: int):
    """Sequential NSW build over one shard (numpy, id-ascending order).
    Returns neighbor id lists aligned with `ids`. Distances are squared
    L2; candidate ties break on id via stable argsort."""
    n = len(ids)
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        # beam search existing graph from node 0 for the ef closest
        q = X[i]
        dist = lambda j: float(((X[j] - q) ** 2).sum())  # noqa: E731
        visited = {0}
        cand = [(dist(0), 0)]
        best = list(cand)
        while cand:
            cand.sort()
            d, u = cand.pop(0)
            if best and d > max(b[0] for b in best) and len(best) >= ef:
                break
            for v in nbrs[u]:
                if v in visited:
                    continue
                visited.add(v)
                dv = dist(v)
                best.append((dv, v))
                cand.append((dv, v))
            best.sort()
            best = best[:ef]
        links = [v for _, v in best[:m]]
        nbrs[i] = links
        for v in links:  # undirected: backlink, keep the m closest
            nbrs[v].append(i)
            if len(nbrs[v]) > m:
                dv = [(float(((X[w] - X[v]) ** 2).sum()), w) for w in nbrs[v]]
                dv.sort()
                nbrs[v] = [w for _, w in dv[:m]]
    return [[int(ids[v]) for v in lst] for lst in nbrs]


def build_nsw(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 32,
    rows_per_shard: int = 2000,
    cache: bool = True,
) -> NSWIndex:
    n = df.count()
    n_shards = max(1, -(-n // rows_per_shard))
    sharded = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )

    def build(key, pdf: pd.DataFrame):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        nbrs = _greedy_insertions(X, ids, m, ef_construction)
        return pd.DataFrame(
            {
                "shard": key[0],
                "id": ids,
                "vec": list(pdf["vec"]),
                "neighbors": nbrs,
            }
        )

    vec_t = dict(df.dtypes)[vec_col]
    graph = sharded.groupBy("shard").applyInPandas(
        build, f"shard long, id long, vec {vec_t}, neighbors array<bigint>"
    )
    if cache:
        graph = graph.persist()
    return NSWIndex(graph, id_col, vec_col, m, ef_construction)


def nsw_search(
    index: NSWIndex, query, k: int = 10, ef_search: int = 50
) -> DataFrame:
    """Beam-search every shard's graph, merge the per-shard top-k lists
    with one global TakeOrderedAndProject. Score = 1/(1+L2²) ∈ (0, 1]
    (the reference's normalized-similarity convention, shared with the
    LSH tier — ann.py:246), rounded 6dp; ties break on id ascending."""
    q = np.asarray(list(query), dtype=np.float64)
    # close over plain values only — capturing the NSWIndex would drag
    # its DataFrame (and the SparkContext) into the executor pickle
    id_col = index.id_col

    def search(key, pdf: pd.DataFrame):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        pos = {int(i): p for p, i in enumerate(ids)}
        nbrs = [[pos[int(v)] for v in lst] for lst in pdf["neighbors"]]
        d2 = lambda j: float(((X[j] - q) ** 2).sum())  # noqa: E731
        visited = {0}
        d0 = d2(0)
        cand = [(d0, 0)]
        best = [(d0, 0)]
        while cand:
            cand.sort()
            d, u = cand.pop(0)
            if len(best) >= ef_search and d > best[-1][0]:
                break
            for v in nbrs[u]:
                if v in visited:
                    continue
                visited.add(v)
                dv = d2(v)
                best.append((dv, v))
                cand.append((dv, v))
            best.sort(key=lambda t: (t[0], ids[t[1]]))
            best = best[:ef_search]
        top = best[:k]
        return pd.DataFrame(
            {
                id_col: [int(ids[v]) for _, v in top],
                "score": [round(1.0 / (1.0 + d), 6) for d, _ in top],
            }
        )

    per_shard = index.graph.groupBy("shard").applyInPandas(
        search, f"{id_col} long, score double"
    )
    return per_shard.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def save_nsw(index: NSWIndex, path: str) -> None:
    """Graph table as shard-partitioned parquet + a params manifest —
    search-time reads prune to shards via partition paths."""
    import json
    import os

    index.graph.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(path, "graph")
    )
    with open(os.path.join(path, "nsw.json"), "w") as f:
        json.dump(
            {
                "id_col": index.id_col,
                "vec_col": index.vec_col,
                "m": index.m,
                "ef_construction": index.ef_construction,
            },
            f,
        )


def load_nsw(spark, path: str) -> NSWIndex:
    import json
    import os

    with open(os.path.join(path, "nsw.json")) as f:
        meta = json.load(f)
    graph = spark.read.parquet(os.path.join(path, "graph"))
    return NSWIndex(
        graph, meta["id_col"], meta["vec_col"], meta["m"], meta["ef_construction"]
    )
