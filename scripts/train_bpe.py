"""Train the vendored BPE merges table (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units") on the
sf0.001 fixture corpus and write it to
homemade_vector_db_spark/functions/bpe_merges.txt (one merge per line,
"left right", rank = line order).

Deterministic: word frequencies from documents.parquet, whitespace
pre-split identical to functions.text.tokenize (split on \\s+, drop
empties), no end-of-word marker (word-internal merges only — keeps the
DuckDB recursive-CTE oracle and the Spark encoder in exact lockstep),
ties broken by lexicographic pair order.

Run: python scripts/train_bpe.py [n_merges] — committed output, so this
only needs re-running if the fixture corpus or merge count changes.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import pyarrow.parquet as pq

# 32 merges: the synthetic fixture corpus has only ~31 distinct words, so
# an uncapped run saturates (every word -> 1 symbol) and the encoder would
# degenerate back to whitespace counting. 32 leaves a 1-5 pieces-per-word
# spread, so greedy min-rank encoding is genuinely exercised.
N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SOURCE = "/root/testdata/sf0.001/documents.parquet"
OUT = "homemade_vector_db_spark/functions/bpe_merges.txt"


def word_freqs() -> Counter:
    texts = pq.read_table(SOURCE, columns=["text"]).column("text").to_pylist()
    freqs: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t or ""):
            if w:
                freqs[w] += 1
    return freqs


def train(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    # vocab: symbol-sequence -> frequency, starting from characters
    vocab: dict[tuple[str, ...], int] = {tuple(w): c for w, c in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def main() -> None:
    merges = train(word_freqs(), N_MERGES)
    with open(OUT, "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
