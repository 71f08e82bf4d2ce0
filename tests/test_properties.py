"""Property-based tests (hypothesis) for the invariants the engine's
determinism contract rests on."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_dataset_builder_ray.functions.html_extract import extract_document
from ocr_dataset_builder_ray.functions.layout_extract import extract_pdf_document
from ocr_dataset_builder_ray.functions.textnorm import clean_text, nfc
from ocr_dataset_builder_ray.stages.extract import dedup_table, extract_table

TEXT = st.text(max_size=400)


@given(TEXT)
@settings(max_examples=200)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once


@given(TEXT)
@settings(max_examples=200)
def test_clean_text_no_blank_lines_no_space_runs(s):
    out = clean_text(s)
    if out == "":
        return
    for line in out.split("\n"):
        assert line == line.strip()
        assert line != ""
        assert "  " not in line and "\t" not in line
    assert not out.startswith("\n") and not out.endswith("\n")


@given(TEXT)
@settings(max_examples=200)
def test_nfc_idempotent_and_normalized(s):
    out = nfc(s)
    assert unicodedata.is_normalized("NFC", out)
    assert nfc(out) == out


@given(st.binary(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_extract_document_total_and_deterministic(payload):
    a = extract_document(payload)
    b = extract_document(payload)
    assert a == b  # pure function of payload
    assert a["n_chars"] == len(a["extracted_text"])
    assert a["n_spans"] == len(a["spans"])
    for s in a["spans"]:
        piece = a["extracted_text"][s["start"] : s["end"]]
        assert len(piece) == s["end"] - s["start"]


@given(st.binary(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_extract_pdf_document_total(payload):
    res = extract_pdf_document(b"%FAKE-PDF\n" + payload)
    assert res["status"].startswith(("ok", "<<<"))
    assert res["n_chars"] == len(res["extracted_text"])


@given(st.permutations(list(range(8))))
@settings(max_examples=50, deadline=None)
def test_dedup_winner_invariant_under_row_order(perm):
    """The keep-latest winner must not depend on input row order."""
    import pyarrow as pa

    from ocr_dataset_builder_ray.sources.pages import gen_table
    from ocr_dataset_builder_ray.stages.extract import ExtractPages

    flat = ExtractPages()(gen_table(12))  # includes the url-6/7/8 dup group
    n = flat.num_rows
    order = [p % n for p in perm] + list(range(n))
    seen: set[int] = set()
    idx = [i for i in order if not (i in seen or seen.add(i))]
    shuffled = flat.take(pa.array(idx))
    a = dedup_table(flat).to_pydict()
    b = dedup_table(shuffled).to_pydict()
    key = lambda d: sorted(zip(d["url"], d["content_hash"]))  # noqa: E731
    assert key(a) == key(b)


# --- media codec round-trips ------------------------------------------------

import numpy as np
from hypothesis import HealthCheck

from ocr_dataset_builder_ray.functions.media_codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    nearest_resize,
)

DIMS = st.tuples(st.integers(1, 40), st.integers(1, 40))


@given(DIMS, st.integers(0, 2**32 - 1))
@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow])
def test_ppm_bmp_roundtrip_any_dims(dims, seed):
    h, w = dims
    arr = np.random.RandomState(seed % 2**31).randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


@given(st.integers(1, 500), st.integers(1, 4), st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=40)
def test_wav_roundtrip_any_shape(n, channels, rate):
    samples = np.random.RandomState(n * channels).randint(
        -32768, 32767, (n, channels)
    ).astype("<i2")
    arr, r = decode_wav(encode_wav(samples, rate))
    assert r == rate and np.array_equal(arr, samples)


@given(DIMS, st.integers(1, 64))
@settings(max_examples=80)
def test_nearest_resize_bounds_and_aspect(dims, max_dim):
    h, w = dims
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    out = nearest_resize(arr, max_dim)
    oh, ow = out.shape[:2]
    assert max(oh, ow) <= max(max_dim, 1)
    if max(h, w) <= max_dim:
        assert (oh, ow) == (h, w)  # no upscale, no-op
    else:
        # exact contract: truncated scale with a 1-pixel floor
        scale = max_dim / max(h, w)
        assert (oh, ow) == (max(1, int(h * scale)), max(1, int(w * scale)))
    assert oh <= h and ow <= w  # never upscales


# --- BPE trainer/encoder invariants (driver kernels, stages/bpe.py) --------

from ocr_dataset_builder_ray.stages.bpe import (  # noqa: E402
    EOW,
    _learn_merges,
    encode_word,
)

_WORD = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=104), # a-h
    min_size=1,
    max_size=10,
)


@given(
    st.lists(_WORD, min_size=1, max_size=40, unique=True),
    st.integers(min_value=0, max_value=30),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encode_reproduces_training_segmentation(words, n_merges, rnd):
    counts = [rnd.randint(1, 20) for _ in words]
    merges = _learn_merges(list(words), counts, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay the merges naively to get each word's final segmentation
    syms = [list(w) + [EOW] for w in words]
    for a, b in merges:
        new = a + b
        for i, s in enumerate(syms):
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[i] = out
    for w, s in zip(words, syms):
        enc = encode_word(w, ranks)
        # greedy lowest-rank application lands on the training result
        assert enc == s, (w, enc, s)
        # and always reconstructs the word exactly
        assert "".join(enc) == w + EOW


@given(st.lists(_WORD, min_size=1, max_size=30, unique=True))
@settings(max_examples=40, deadline=None)
def test_bpe_merge_count_monotone(words):
    counts = [1] * len(words)
    total = lambda ms: sum(  # noqa: E731
        len(encode_word(w, {p: i for i, p in enumerate(ms)})) for w in words
    )
    m5 = _learn_merges(list(words), counts, 5)
    m20 = _learn_merges(list(words), counts, 20)
    # merge lists are prefix-consistent and more merges never lengthen
    assert m20[: len(m5)] == m5
    assert total(m20) <= total(m5)


# --- session-8 parsers: robots matcher + charset declaration rewrite ---

_ROBOTS_CHARS = st.text(alphabet="/ab*$x-", min_size=0, max_size=12)


def _wild_match(pattern: str, path: str) -> bool:
    """Independent reference matcher: '*' any sequence, final '$'
    anchors; prefix match otherwise. Recursive, memo-free (inputs are
    tiny)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern

    def rec(p: str, s: str) -> bool:
        if not p:
            return (not s) if anchored else True
        if p[0] == "*":
            return any(rec(p[1:], s[i:]) for i in range(len(s) + 1))
        return bool(s) and s[0] == p[0] and rec(p[1:], s[1:])

    return rec(body, path)


@given(
    st.lists(
        st.tuples(st.booleans(), _ROBOTS_CHARS), min_size=0, max_size=8
    ),
    _ROBOTS_CHARS,
)
@settings(max_examples=300)
def test_robots_rules_match_reference(rules, path):
    """RobotsRules.allowed == the spec decision computed independently:
    among matching rules pick max pattern length, allow wins ties; no
    match -> allowed."""
    from ocr_dataset_builder_ray.functions.robots import RobotsRules

    if not path.startswith("/"):
        path = "/" + path
    got = RobotsRules(list(rules)).allowed(path)
    matching = [
        (len(p), is_allow)
        for is_allow, p in rules
        if p != "" and _wild_match(p, path)
    ]
    want = max(matching)[1] if matching else True
    assert got == want, (rules, path, got, want)


@given(
    st.lists(st.tuples(st.booleans(), _ROBOTS_CHARS), max_size=6),
    st.randoms(),
    _ROBOTS_CHARS,
)
@settings(max_examples=150)
def test_robots_rule_order_irrelevant(rules, rnd, path):
    from ocr_dataset_builder_ray.functions.robots import RobotsRules

    if not path.startswith("/"):
        path = "/" + path
    a = RobotsRules(list(rules)).allowed(path)
    shuffled = list(rules)
    rnd.shuffle(shuffled)
    assert RobotsRules(shuffled).allowed(path) == a


@given(st.text(max_size=600))
@settings(max_examples=300)
def test_rewrite_declared_utf8_no_mojibake_roundtrip(s):
    """THE transcode property: for any decoded text, rewriting the
    declaration and encoding to utf-8 must re-sniff and decode back to
    exactly the same characters (no double-decode path left)."""
    from ocr_dataset_builder_ray.functions.charset import (
        decode_payload,
        rewrite_declared_utf8,
    )

    fixed = rewrite_declared_utf8(s)
    # surrogates can't encode; decode_payload would have never produced
    # them (errors=replace), so normalize the input the same way
    payload = fixed.encode("utf-8", errors="replace")
    text, _enc, _src = decode_payload(payload)
    assert text == payload.decode("utf-8"), (s[:80],)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=400))
@settings(max_examples=200)
def test_rewrite_declared_preserves_tail(s):
    """The rewrite only ever edits the prescan window; text past it is
    byte-identical, and text without a declaration is untouched."""
    from ocr_dataset_builder_ray.functions.charset import (
        PRESCAN_BYTES,
        rewrite_declared_utf8,
    )

    out = rewrite_declared_utf8(s)
    assert out[PRESCAN_BYTES:] == s[PRESCAN_BYTES:]
    if "charset" not in s.lower() and "encoding" not in s.lower():
        assert out == s
