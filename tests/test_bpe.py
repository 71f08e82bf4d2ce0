"""BPE trainer/encoder (stages/bpe.py): the classic Sennrich example,
equality with a naive recount-per-round reference, encode/decode
roundtrip, and histogram exchange invariance."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.bpe import (
    EOW,
    BPEModel,
    _learn_merges,
    bpe_encode,
    encode_word,
    train_bpe,
    word_counts,
)


def _naive_learn(words, counts, n_merges):
    """Recount-from-scratch reference (no incremental bookkeeping)."""
    syms = [list(w) + [EOW] for w in words]
    merges = []
    for _ in range(n_merges):
        pc_ = {}
        for s, c in zip(syms, counts):
            for p in zip(s, s[1:]):
                pc_[p] = pc_.get(p, 0) + int(c)
        if not pc_:
            break
        m = max(pc_.values())
        best = min(p for p, c in pc_.items() if c == m)
        merges.append(best)
        new = best[0] + best[1]
        for i, s in enumerate(syms):
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(new)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[i] = out
    return merges, syms


def test_sennrich_example():
    words = ["low", "lower", "newest", "widest"]
    counts = np.array([5, 2, 6, 3])
    merges = _learn_merges(words, counts, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)


def test_incremental_equals_naive():
    rng = np.random.default_rng(13)
    alphabet = list("abcdef")
    words = list(
        {
            "".join(rng.choice(alphabet, int(rng.integers(2, 9))))
            for _ in range(120)
        }
    )
    words.sort()
    counts = rng.integers(1, 50, len(words))
    fast = _learn_merges(words, counts, 25)
    ref, ref_syms = _naive_learn(words, counts, 25)
    assert fast == ref
    # greedy encoding with the learned ranks reproduces the final
    # training segmentation of every training word
    ranks = {p: i for i, p in enumerate(fast)}
    for w, s in zip(words, ref_syms):
        assert encode_word(w, ranks) == s


def test_train_and_encode_roundtrip(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}x" for i in range(50)] + ["hello", "world", "subword"]
    texts = [
        " ".join(rng.choice(vocab, 12)) for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    model = train_bpe(ds, n_merges=60)
    assert len(model.merges) == 60
    inv = {i: s for s, i in model.vocab.items()}
    got = bpe_encode(ds, model).to_pandas().set_index("doc_id")
    for did in (0, 57, 199):
        ids = got.loc[did, "bpe_ids"]
        text = got.loc[did, "text"]
        decoded = "".join(inv[i] for i in ids).replace(EOW, " ").strip()
        assert decoded == text
    # more merges -> fewer tokens per doc
    small = train_bpe(ds, n_merges=5)
    n_small = sum(len(encode_word(w, small.ranks)) for w in vocab)
    n_big = sum(len(encode_word(w, model.ranks)) for w in vocab)
    assert n_big < n_small


def test_word_counts_invariance_and_min_count(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": ["aaa bbb aaa", "bbb ccc"] * 20,
        }
    )
    a = word_counts(ray.data.from_pandas(df).repartition(2))
    b = word_counts(ray.data.from_pandas(df).repartition(13), n_buckets=8)
    pd.testing.assert_frame_equal(a, b)
    assert a.iloc[0]["word"] in ("aaa", "bbb") and a.iloc[0]["n"] == 40
    pruned = word_counts(
        ray.data.from_pandas(df), min_count=25
    )
    assert set(pruned["word"]) == {"aaa", "bbb"}


def test_train_determinism(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "text": ["the quick brown fox jumps over the lazy dog"] * 30,
        }
    )
    m1 = train_bpe(ray.data.from_pandas(df).repartition(3), n_merges=20)
    m2 = train_bpe(ray.data.from_pandas(df).repartition(7), n_merges=20)
    assert m1.merges == m2.merges
    assert m1.vocab == m2.vocab


def test_unknown_chars_encode_as_unk(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["abc abc"]})
    model = train_bpe(ray.data.from_pandas(df), n_merges=5)
    test_df = pd.DataFrame({"doc_id": [0], "text": ["abc zzz"]})
    got = bpe_encode(
        ray.data.from_pandas(test_df), model, unk_id=-1
    ).to_pandas()
    ids = got["bpe_ids"][0]
    assert -1 in ids  # the unseen 'z' maps to unk
    inv = {i: s for s, i in model.vocab.items()}
    # the known word still decodes
    known = "".join(inv[i] for i in ids if i >= 0)
    assert "abc" in known


def test_sentinel_char_in_input_is_stripped(ray_session):
    from ocr_dataset_builder_ray.stages.bpe import _strip_sentinel  # noqa: F401

    df = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["▁hello world", "plain words here"]}
    )
    ds = ray.data.from_pandas(df)
    model = train_bpe(ds, n_merges=10)
    assert EOW not in {ch for w in ("hello", "world") for ch in w}
    # no training symbol contains an embedded sentinel except as the
    # trailing end-of-word marker
    for s in model.vocab:
        assert EOW not in s or s.endswith(EOW)
    got = bpe_encode(ds, model).to_pandas().set_index("doc_id")
    inv = {i: s for s, i in model.vocab.items()}
    decoded = "".join(inv[i] for i in got.loc[0, "bpe_ids"]).replace(
        EOW, " "
    ).strip()
    assert decoded == "hello world"  # the pasted marker is gone
