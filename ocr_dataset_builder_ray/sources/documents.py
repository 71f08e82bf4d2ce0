"""Deterministic synthetic documents corpus with a controlled
duplicate mix — the near-dedup family's scale-bench input.

The driver testdata's ``documents`` table is fixed at 500 rows, too
small to evidence the dedup operators' throughput or the
duplicate-bounded driver state. This generator produces an
arbitrarily-sized (doc_id, lang, text) table, pure function of
(seed, i), with three row classes:

* **base** docs — fresh seeded articles (``pages._article`` text);
* **near-dups** — a base doc with ~2% of its words replaced (seeded),
  keeping word-3-gram Jaccard ≥ ~0.8 so MinHash/SimHash/ngram dedup
  at the default thresholds finds them;
* **exact dups** — byte-identical copies of a base doc.

Layout mirrors ``generate_pages_corpus``: fixed rows-per-file shards,
``_SUCCESS`` marker for idempotent reuse.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64
from .pages import LANGS, _WORDS

_KNUTH = 2654435761


_VOCAB_SIZE = 50_000
_vocab_cache: list[str] | None = None


def _vocab() -> list[str]:
    """50k random 4-9-letter words (seeded once). Realistic corpora are
    diverse at BOTH the token level and the character level; the pages
    word lists (~50 words/lang) make unrelated docs near-identical
    under SimHash (shared token hashes) AND under char-shingle MinHash
    (shared substrings), which floods LSH with spurious candidates. A
    large random vocabulary gives unrelated docs the near-zero overlap
    real text has."""
    global _vocab_cache
    if _vocab_cache is None:
        rng = random.Random(stable_hash64("docs-vocab-v3"))
        letters = "abcdefghijklmnopqrstuvwxyz"
        _vocab_cache = [
            "".join(rng.choice(letters) for _ in range(rng.randint(4, 9)))
            for _ in range(_VOCAB_SIZE)
        ]
    return _vocab_cache


def _base_text(i: int, seed: int) -> tuple[str, str]:
    lang = LANGS[i % len(LANGS)]
    rng = random.Random(stable_hash64(f"{seed}:doc:{i}"))
    vocab = _vocab()
    n_words = rng.randint(120, 400)
    toks = [vocab[rng.randrange(_VOCAB_SIZE)] for _ in range(n_words)]
    # a few per-lang anchor words so langid-ish ops have signal
    anchors = _WORDS[lang]
    for _ in range(max(1, n_words // 20)):
        toks[rng.randrange(n_words)] = anchors[rng.randrange(len(anchors))]
    # sentence-ish structure: period every 6-14 tokens
    out, k = [], 0
    while k < n_words:
        n = rng.randint(6, 14)
        out.append(" ".join(toks[k : k + n]) + ".")
        k += n
    return lang, " ".join(out)


def _mutate(text: str, i: int, seed: int, rate: float = 0.02) -> str:
    """Replace ~rate of words with seeded noise tokens — word-3-gram
    Jaccard stays ≥ ~1 - 3*rate ≈ 0.94 in expectation."""
    rng = random.Random(stable_hash64(f"{seed}:mut:{i}"))
    words = text.split()
    n_swap = max(1, int(len(words) * rate))
    for _ in range(n_swap):
        words[rng.randrange(len(words))] = f"w{rng.randrange(10**6)}"
    return " ".join(words)


def gen_doc(i: int, n_base: int, n_near: int, seed: int) -> dict:
    """Row *i* — pure function of (seed, i, class boundaries)."""
    if i < n_base:
        lang, text = _base_text(i, seed)
    elif i < n_base + n_near:
        j = (i * _KNUTH) % n_base
        lang, text = _base_text(j, seed)
        text = _mutate(text, i, seed)
    else:  # exact dup
        j = (i * _KNUTH) % n_base
        lang, text = _base_text(j, seed)
    return {"doc_id": i, "lang": lang, "text": text}


def generate_documents_corpus(
    out_dir: str,
    n_docs: int = 100_000,
    *,
    seed: int = 7,
    near_rate: float = 0.2,
    exact_rate: float = 0.05,
    rows_per_file: int = 20_000,
) -> str:
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_base = int(n_docs * (1 - near_rate - exact_rate))
    n_near = int(n_docs * near_rate)
    for k, s in enumerate(range(0, n_docs, rows_per_file)):
        rows = [
            gen_doc(i, n_base, n_near, seed)
            for i in range(s, min(s + rows_per_file, n_docs))
        ]
        pq.write_table(
            pa.Table.from_pylist(rows),
            os.path.join(out_dir, f"documents-{k:05d}.parquet"),
        )
    with open(marker, "w") as f:
        f.write(f"n_docs={n_docs} seed={seed} near={near_rate} exact={exact_rate}\n")
    return out_dir


def default_docs_corpus_dir(n_docs: int, seed: int = 7) -> str:
    return f"/tmp/graft_docs/n{n_docs}_s{seed}_v3"


def generate_embeddings_corpus(
    out_dir: str,
    n_vecs: int = 100_000,
    *,
    dim: int = 64,
    seed: int = 11,
    near_rate: float = 0.2,
    rows_per_file: int = 25_000,
) -> str:
    """Deterministic (vec_id, embedding) table with planted near-dups:
    base vectors are unit Gaussians; near-dups are a base plus tiny
    noise (cosine ≥ ~0.999). Same layout contract as the documents
    corpus."""
    import numpy as np

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_base = int(n_vecs * (1 - near_rate))
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, dim))
    idx = (np.arange(n_base, n_vecs, dtype=np.int64) * _KNUTH) % n_base
    near = base[idx] + 0.01 * rng.standard_normal((n_vecs - n_base, dim))
    vecs = np.vstack([base, near])
    for k, s in enumerate(range(0, n_vecs, rows_per_file)):
        chunk = vecs[s : s + rows_per_file]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(s, s + len(chunk)), pa.int64()),
                    "embedding": pa.array(
                        [row.tolist() for row in chunk], pa.list_(pa.float64())
                    ),
                }
            ),
            os.path.join(out_dir, f"embeddings-{k:05d}.parquet"),
        )
    with open(marker, "w") as f:
        f.write(f"n_vecs={n_vecs} dim={dim} seed={seed} near={near_rate}\n")
    return out_dir


def default_vecs_corpus_dir(n_vecs: int, seed: int = 11) -> str:
    return f"/tmp/graft_vecs/n{n_vecs}_s{seed}_v1"
