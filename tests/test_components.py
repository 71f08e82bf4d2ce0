"""Distributed min-label connected components (the dedup scale path)."""

import pyarrow as pa

import ray.data

from ocr_dataset_builder_ray.stages.components import min_label_components


def _ds(rows, schema_cols):
    return ray.data.from_arrow(pa.Table.from_pylist([dict(zip(schema_cols, r)) for r in rows]))


def test_chain_and_isolated(ray_session):
    # chain 1-2-3-4 (one component), pair 10-11, isolated 20
    edges = _ds([(1, 2), (2, 3), (3, 4), (10, 11)], ["a", "b"])
    nodes = _ds([(k,) for k in (1, 2, 3, 4, 10, 11, 20)], ["key"])
    out = (
        min_label_components(edges, nodes)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_no_edges(ray_session):
    edges = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    nodes = _ds([(5,), (7,)], ["key"])
    out = min_label_components(edges, nodes).to_pandas()
    assert dict(zip(out["node"], out["component"])) == {5: 5, 7: 7}


def test_string_keys_and_star(ray_session):
    edges = _ds([("z", "m"), ("m", "a"), ("m", "q")], ["a", "b"])
    nodes = _ds([(k,) for k in ("a", "m", "q", "z", "solo")], ["key"])
    out = min_label_components(edges, nodes).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"a": "a", "m": "a", "q": "a", "z": "a", "solo": "solo"}


def test_minhash_distributed_matches_driver(ray_session, sf_dir):
    from ocr_dataset_builder_ray.stages.dedup import minhash_lsh_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    a = (
        minhash_lsh_dedup(ds, "text", "doc_id", components="driver")
        .select_columns(["doc_id"]).to_pandas()["doc_id"].sort_values().tolist()
    )
    b = (
        minhash_lsh_dedup(ds, "text", "doc_id", components="distributed")
        .select_columns(["doc_id"]).to_pandas()["doc_id"].sort_values().tolist()
    )
    assert a == b
