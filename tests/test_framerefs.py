"""F:i delta-codec tests (M11 parity: docs/FRAME_REFERENCING_NOTATION.md
semantics — exact ref, ref+append, forward/self-reference guard,
malformed fallback)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from ocr_dataset_builder_ray.functions.framerefs import (
    decode_ref_column,
    decode_refs,
    encode_refs,
)


def test_exact_reference():
    assert decode_refs(["hello", "F:0", "F:1"]) == ["hello", "hello", "hello"]


def test_reference_with_append():
    assert decode_refs(["line1", "F:0\nline2", "F:1\nline3"]) == [
        "line1",
        "line1\nline2",
        "line1\nline2\nline3",
    ]


def test_chained_refs_resolve_transitively():
    out = decode_refs(["a", "F:0b", "F:1c", "F:2"])
    assert out == ["a", "ab", "abc", "abc"]


def test_forward_and_self_reference_kept_raw():
    assert decode_refs(["F:0", "x", "F:5"]) == ["F:0", "x", "F:5"]


def test_malformed_ref_kept_raw():
    assert decode_refs(["F:", "F:abc", "plain"]) == ["F:", "F:abc", "plain"]


def test_none_cells_become_empty():
    assert decode_refs([None, "F:0tail"]) == ["", "tail"]


def test_encode_decode_roundtrip_simple():
    cells = ["alpha", "alpha", "alpha beta", "gamma", "gamma"]
    enc = encode_refs(cells)
    assert enc == ["alpha", "F:0", "F:1 beta", "gamma", "F:3"]
    assert decode_refs(enc) == cells


@given(st.lists(st.text(alphabet="ab \n", max_size=8), max_size=12))
@settings(max_examples=150)
def test_encode_decode_roundtrip_property(cells):
    # literal "F:"-prefixed inputs are never re-encoded, so roundtrip holds
    assert decode_refs(encode_refs(cells)) == cells


def test_decode_ref_column_distributed(ray_session):
    rows = []
    for g in ("u1", "u2"):
        rows += [
            {"url": g, "ts": 0, "cell": f"{g}-base"},
            {"url": g, "ts": 1, "cell": "F:0 more"},
            {"url": g, "ts": 2, "cell": "F:1"},
        ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = (
        decode_ref_column(ds, group_col="url", order_col="ts", value_col="cell")
        .to_pandas()
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
    )
    assert list(out[out["url"] == "u1"]["cell"]) == [
        "u1-base",
        "u1-base more",
        "u1-base more",
    ]
    assert list(out[out["url"] == "u2"]["cell"]) == [
        "u2-base",
        "u2-base more",
        "u2-base more",
    ]
