"""Model-based sequence fuzz of the VectorDatabase facade.

tests/test_reference_parity.py ports the reference's own scenarios; this
file drives a LONG randomized (seeded, deterministic) interleaving of
add / delete / update / query_vector / get_document / get_metadata / len
against an in-memory numpy model with the reference's semantics
(local_db.py: dense insertion ids, L2 flat search, meta dicts) — the
class of bugs it hunts is stale derived state and id-accounting drift
across MUTATION SEQUENCES, which single-scenario tests cannot reach
(e.g. the round-1 delete-then-add id-reuse bug in ADVICE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

from homemade_vector_db_spark.db import VectorDatabase

DIM = 6
N_OPS = 30


class Model:
    """Reference-semantics twin: dense ids, monotone high-water mark."""

    def __init__(self) -> None:
        self.rows: dict[int, tuple[str, dict, np.ndarray]] = {}
        self.next_id = 0

    def add(self, texts, vecs, metas):
        for t, v, m in zip(texts, vecs, metas):
            self.rows[self.next_id] = (t, m, np.asarray(v, dtype="float32"))
            self.next_id += 1

    def delete(self, ids):
        removed = [i for i in ids if i in self.rows]
        for i in removed:
            del self.rows[i]
        return len(removed)

    def update(self, idx, text=None, vec=None):
        t, m, v = self.rows[idx]
        self.rows[idx] = (
            text if text is not None else t,
            m,
            np.asarray(vec, dtype="float32") if vec is not None else v,
        )

    def knn(self, q, k):
        q = np.asarray(q, dtype="float32")
        scored = [
            (float(((v - q) ** 2).sum()), i) for i, (t, m, v) in self.rows.items()
        ]
        scored.sort(key=lambda x: (x[0], x[1]))
        return [i for _, i in scored[:k]]


def _mk_vec(rng):
    return [float(x) for x in rng.normal(size=DIM).round(3)]


def _mk_text(rng):
    words = ["spark", "join", "vector", "query", "table", "row", "fast"]
    return " ".join(rng.choice(words) for _ in range(int(rng.integers(3, 8))))


@pytest.mark.slow
def test_facade_random_op_sequence_matches_model(spark):
    rng = np.random.default_rng(1234)
    db = VectorDatabase(spark, dim=DIM, index_type="flat")
    model = Model()

    for step in range(N_OPS):
        live = sorted(model.rows)
        op = rng.choice(
            ["add", "add", "delete", "update", "knn", "lookup", "len"]
            if live
            else ["add"]
        )
        if op == "add":
            n = int(rng.integers(1, 4))
            texts = [_mk_text(rng) for _ in range(n)]
            vecs = [_mk_vec(rng) for _ in range(n)]
            metas = [{"k": str(int(rng.integers(0, 3)))} for _ in range(n)]
            db.add(texts, vecs, metas)
            model.add(texts, vecs, metas)
        elif op == "delete":
            ids = list(rng.choice(live, size=min(2, len(live)), replace=False))
            ids = [int(i) for i in ids]
            got = db.delete(ids)
            want = model.delete(ids)
            assert got == want, (step, ids)
        elif op == "update":
            idx = int(rng.choice(live))
            new_text = _mk_text(rng)
            new_vec = _mk_vec(rng)
            db.update([idx], docs=[new_text], vectors=[new_vec])
            model.update(idx, text=new_text, vec=new_vec)
        elif op == "knn":
            q = _mk_vec(rng)
            k = int(rng.integers(1, 6))
            got = db.query_vector(q, top_k=k)
            want = model.knn(q, k)
            assert got == want, (step, q, k)
        elif op == "lookup":
            idx = int(rng.choice(live))
            assert db.get_document(idx) == model.rows[idx][0], step
            assert db.get_metadata(idx) == model.rows[idx][1], step
        elif op == "len":
            assert len(db) == len(model.rows), step

    # end-state audit: every surviving doc agrees, and no deleted id leaks
    assert len(db) == len(model.rows)
    final_ids = db.query_vector([0.0] * DIM, top_k=10_000)
    assert sorted(final_ids) == sorted(model.rows)
    # high-water mark: fresh adds never reuse a deleted id
    before = set(model.rows)
    db.add(["tail doc"], [[0.0] * DIM], [{}])
    model.add(["tail doc"], [[0.0] * DIM], [{}])
    (new_id,) = set(model.rows) - before
    assert new_id == model.next_id - 1
    assert db.get_document(new_id) == "tail doc"
