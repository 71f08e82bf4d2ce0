"""Distributed BPE tokenizer training + encoding (Sennrich, Haddow,
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the published byte-pair-encoding recipe every production
subword trainer implements).

Scale shape — the standard trainer trick makes this one corpus pass:
BPE statistics depend only on the WORD HISTOGRAM, so the corpus-sized
work is a single vocabulary-bounded ``word_counts`` exchange (the
``top_tokens`` plan without the top-k cut: per-batch Arrow
value_counts partials, ONE coarse-bucket sum); the merge loop then
runs on the driver over the histogram (``min_count`` prunes the long
tail — hapax words can't win a merge anyway at any realistic
``n_merges``). Encoding is a pure broadcast map with a per-batch word
cache: each DISTINCT word in a batch is segmented once (greedy
lowest-rank merge application, the exact inverse of training), then
scattered back through the inverse indices.

Determinism: merge ties (equal pair count) break to the
lexicographically smallest pair; vocabulary ids are sorted initial
symbols first, then merge products in merge order — a pure function
of (histogram, n_merges), hence of the corpus.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import stable_hash64_array

# End-of-word sentinel symbol. U+2581 DOES occur in real web text
# (it is SentencePiece's own boundary marker, pasted tokenizer dumps
# exist in crawls), so both the trainer and the encoder STRIP it from
# input first — the same reserved-character policy SentencePiece
# itself applies. The decode roundtrip reproduces the stripped text.
EOW = "▁"


def _strip_sentinel(col):
    return pc.replace_substring(col, pattern=EOW, replacement="")


def word_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    lowercase: bool = False,
    min_count: int = 1,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Corpus-wide whitespace-word histogram ``(word, n)``, exact,
    sorted (n DESC, word ASC). Same plan as ``top_tokens`` (per-batch
    value_counts partials + one coarse-bucket exchange) but keeping
    the full post-``min_count`` vocabulary — the driver collect is
    vocabulary-bounded, which is the published trainer contract (every
    BPE/unigram trainer holds the word histogram; prune with
    ``min_count`` when the tail matters)."""

    def _partial(batch: pa.Table) -> pa.Table:
        col = _strip_sentinel(batch[text_col])
        if lowercase:
            col = pc.utf8_lower(col)
        toks = pc.list_flatten(pc.utf8_split_whitespace(col))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        words = vc.field("values")
        bucket = stable_hash64_array(words.to_pylist()) % np.uint64(n_buckets)
        return pa.table(
            {
                "word": words,
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "bucket": pa.array(bucket.astype(np.int32)),
            }
        )

    def _bucket_sum(group: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "word": group["word"].to_pylist(),
                "n": group["n"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("word", sort=False)["n"].sum().reset_index()
        agg = agg[agg["n"] >= min_count]
        return pa.table(
            {
                "word": pa.array(agg["word"].tolist(), pa.string()),
                "n": pa.array(agg["n"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_sum, batch_format="pyarrow")
        .to_pandas()
    )
    if "word" not in out.columns:
        return pd.DataFrame({"word": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)})
    out = out.sort_values(["n", "word"], ascending=[False, True])
    return out.reset_index(drop=True)


@dataclass
class BPEModel:
    """Ordered merge list + the derived vocabulary (symbol -> id)."""

    merges: list = field(default_factory=list)  # [(a, b), ...] in rank order
    vocab: dict = field(default_factory=dict)

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}


def _learn_merges(words: list, counts: np.ndarray, n_merges: int) -> list:
    """Sennrich's learn_bpe over the histogram with incremental pair
    bookkeeping: each merge only re-counts the words that contain the
    merged pair."""
    syms = [list(w) + [EOW] for w in words]
    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for i, s in enumerate(syms):
        c = int(counts[i])
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    merges = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count <= 0:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words[best]):
            s = syms[i]
            c = int(counts[i])
            # retract the word's current pairs
            for p in zip(s, s[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pw = pair_words[p]
                pw.discard(i)
            # left-to-right non-overlapping merge
            out = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    n_merges: int = 1000,
    lowercase: bool = False,
    min_count: int = 1,
    n_buckets: int = 64,
) -> BPEModel:
    """One corpus pass (the histogram exchange) + the driver merge
    loop. Returns the ordered merges and a deterministic vocabulary:
    sorted initial symbols (all characters seen + the end-of-word
    sentinel), then merge products in merge order."""
    wc = word_counts(
        ds,
        text_col,
        lowercase=lowercase,
        min_count=min_count,
        n_buckets=n_buckets,
    )
    words = wc["word"].tolist()
    counts = wc["n"].to_numpy()
    merges = _learn_merges(words, counts, n_merges)
    chars = sorted({ch for w in words for ch in w} | {EOW})
    vocab = {s: i for i, s in enumerate(chars)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return BPEModel(merges=merges, vocab=vocab)


def encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank merge application — the exact inverse of
    training: encoding a training word reproduces its final training
    segmentation."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_rank, best_pair = None, None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        new_sym = best_pair[0] + best_pair[1]
        out = []
        j = 0
        while j < len(s):
            if (
                j + 1 < len(s)
                and s[j] == best_pair[0]
                and s[j + 1] == best_pair[1]
            ):
                out.append(new_sym)
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return s


def bpe_encode(
    ds: ray.data.Dataset,
    model: BPEModel,
    text_col: str = "text",
    *,
    out_col: str = "bpe_ids",
    lowercase: bool = False,
    unk_id: int = -1,
) -> ray.data.Dataset:
    """Append a ``list<int32>`` of BPE token ids per document. Pure
    broadcast map; each batch segments its DISTINCT words once and
    scatters through inverse indices. Characters unseen at training
    encode as ``unk_id``."""
    bcast = ray.put((model.merges, model.vocab))

    def _encode(batch: pa.Table) -> pa.Table:
        merges, vocab = ray.get(bcast)
        ranks = {pair: i for i, pair in enumerate(merges)}
        col = _strip_sentinel(batch[text_col])
        if lowercase:
            col = pc.utf8_lower(col)
        lists = pc.utf8_split_whitespace(col)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.values.to_numpy(zero_copy_only=False)
        offsets = lists.offsets.to_numpy()
        uniq, inv = (
            np.unique(flat, return_inverse=True)
            if flat.size
            else (flat[:0], np.empty(0, np.intp))
        )
        enc = [
            [vocab.get(t, unk_id) for t in encode_word(w, ranks)]
            if w
            else []
            for w in uniq
        ]
        ids_per_token = [enc[i] for i in inv]
        doc_ids: list = []
        out_offsets = [0]
        for d in range(batch.num_rows):
            lo, hi = offsets[d], offsets[d + 1]
            row: list = []
            for t in range(lo, hi):
                row.extend(ids_per_token[t])
            doc_ids.extend(row)
            out_offsets.append(len(doc_ids))
        arr = pa.ListArray.from_arrays(
            pa.array(out_offsets, pa.int32()),
            pa.array(doc_ids, pa.int32()),
        )
        return batch.append_column(out_col, arr)

    return ds.map_batches(_encode, batch_format="pyarrow")
