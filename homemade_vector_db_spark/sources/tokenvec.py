"""Deterministic per-token embedding fixture (VERDICT r10 Next #5).

Token-level MaxSim (the ColBERT late-interaction law — Khattab &
Zaharia, SIGIR 2020) needs REAL per-token vectors: one embedding per
(doc, token position), not sub-vector slices of a doc embedding. The
driver's testdata carries no token vectors, so this module derives a
repo-local fixture FROM each scale factor's documents.parquet,
deterministically:

    base(word)   = 16-dim standard normal, PRNG seeded crc32(word)
    posvec(p)    = 16-dim standard normal, PRNG seeded 10_000 + p
    tvec(w, p)   = l2_normalize(base(w) + 0.15 * posvec(p))   (doc tokens)
    qvec(w)      = l2_normalize(base(w))                      (query tokens)

so the same token at different positions gets a *different* (but
correlated) vector — the property that makes MaxSim genuinely
token-level. Docs are whitespace-tokenized with the reference law
(split on \\s+, drop empties — local_db.py:73-75) and truncated to the
first TOKVEC_MAX_TOKENS tokens (the ColBERT doc-length cap). The query
is stored INSIDE the fixture as pseudo-doc doc_id = -1 (pos = query
token index), so Spark and DuckDB read the query vectors from the SAME
parquet — the oracle check is a genuine cross-engine verification over
shared data, not two re-derivations.

Vectors are computed in float64 and stored as float32 (list<float>),
matching embeddings.parquet's element type; both engines cast elements
to DOUBLE before arithmetic, so they see bit-identical values.

Generation is write-to-temp + atomic rename (the _materialized
discipline) and idempotent; the fixture lives under REPO_ROOT/fixtures/
(gitignored — ~100 KB at sf0.001, ~20 MB at sf0.1) and is keyed by the
sf directory's basename.
"""

from __future__ import annotations

import os
import zlib

TOKVEC_DIM = 16
TOKVEC_MAX_TOKENS = 32
TOKVEC_QUERY = "dup spark join vector"
POS_JITTER = 0.15

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
FIXTURE_DIR = os.path.join(_REPO_ROOT, "fixtures")


def _docs_tag(sf_dir: str) -> str:
    """Fingerprint of the source documents (the _materialized family's
    (size, mtime) discipline): the fixture filename encodes it, so a
    driver-regenerated documents.parquet can never be served a STALE
    token relation — both engines would keep agreeing on the old bytes
    (hash-green) while no longer describing the corpus. Missing source
    → empty tag (in-memory/test corpora)."""
    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(p):
            parts = sorted(
                f for f in os.listdir(p) if f.endswith(".parquet")
            )
            sig = ",".join(
                f"{f}:{os.path.getsize(os.path.join(p, f))}" for f in parts
            )
        else:
            st = os.stat(p)
            sig = f"{st.st_size}:{int(st.st_mtime)}"
    except OSError:
        return ""
    return format(zlib.crc32(sig.encode()) & 0xFFFFFFFF, "08x")


def token_fixture_path(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    tag = _docs_tag(sf_dir)
    suffix = f"_{tag}" if tag else ""
    return os.path.join(
        FIXTURE_DIR, f"token_embeddings_{base}{suffix}.parquet"
    )


def _base_vec(word: str, dim: int):
    import numpy as np

    rng = np.random.default_rng(zlib.crc32(word.encode("utf-8")) & 0xFFFFFFFF)
    return rng.standard_normal(dim)


def _pos_vec(pos: int, dim: int):
    import numpy as np

    rng = np.random.default_rng(10_000 + pos)
    return rng.standard_normal(dim)


def _normalize(v):
    import numpy as np

    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def ensure_token_fixture(sf_dir: str) -> str:
    """Generate (if missing) and return the token-embedding fixture for
    `sf_dir`. Safe to call from multiple processes: the writer renames a
    temp file into place, losers of the race just overwrite with
    identical bytes-equivalent content."""
    path = token_fixture_path(sf_dir)
    if os.path.isfile(path):
        return path
    docs_parquet = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(docs_parquet):
        # Spark-written dataset dir (the .localdata/sf1 layout)
        docs_parquet = os.path.join(docs_parquet, "*.parquet")
    elif not os.path.isfile(docs_parquet):
        raise FileNotFoundError(docs_parquet)

    import glob
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    # GC fixtures built from a STALE documents fingerprint of this sf
    base = os.path.basename(sf_dir.rstrip("/"))
    for old in glob.glob(
        os.path.join(FIXTURE_DIR, f"token_embeddings_{base}_*.parquet")
    ) + glob.glob(
        os.path.join(FIXTURE_DIR, f"token_embeddings_{base}.parquet")
    ):
        if old != path and not old.startswith(f"{path}.tmp."):
            try:
                os.remove(old)
            except OSError:
                pass
    rows_doc, rows_pos, rows_term, rows_vec = [], [], [], []

    # memoize per-(word, pos) vectors: the fixture vocabulary is tiny
    cache: dict[tuple[str, int], "np.ndarray"] = {}

    def tvec(word: str, pos: int):
        key = (word, pos)
        if key not in cache:
            cache[key] = _normalize(
                _base_vec(word, TOKVEC_DIM)
                + POS_JITTER * _pos_vec(pos, TOKVEC_DIM)
            ).astype(np.float32)
        return cache[key]

    con = duckdb.connect()
    # prepared parameter for the path (ADVICE r11 item 4): a quote
    # character in a corpus directory no longer breaks the SQL
    for doc_id, text in con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [docs_parquet],
    ).fetchall():
        toks = [t for t in text.split() if t][:TOKVEC_MAX_TOKENS]
        for p, w in enumerate(toks):
            rows_doc.append(doc_id)
            rows_pos.append(p)
            rows_term.append(w)
            rows_vec.append(tvec(w, p))
    con.close()

    # query pseudo-doc: doc_id = -1, position-free vectors
    for p, w in enumerate(TOKVEC_QUERY.split()):
        rows_doc.append(-1)
        rows_pos.append(p)
        rows_term.append(w)
        rows_vec.append(
            _normalize(_base_vec(w, TOKVEC_DIM)).astype(np.float32)
        )

    table = pa.table(
        {
            "doc_id": pa.array(rows_doc, pa.int64()),
            "pos": pa.array(rows_pos, pa.int32()),
            "term": pa.array(rows_term, pa.string()),
            "tvec": pa.array(
                [v.tolist() for v in rows_vec], pa.list_(pa.float32())
            ),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
