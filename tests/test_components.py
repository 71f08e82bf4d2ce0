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


def test_coarse_plan_matches_native(ray_session, monkeypatch):
    """Force the coarse-bucket message/update plan (int keys past
    _COMPONENTS_NATIVE_LIMIT) on a graph mixing a chain, a star, a
    clique and isolated nodes; labels must equal the native per-node
    plan and the known components."""
    import random

    from ocr_dataset_builder_ray.stages import components as C

    rng = random.Random(7)
    edges_py = [(1, 2), (2, 3), (3, 4), (4, 5)]  # chain -> 1
    edges_py += [(100, p) for p in range(101, 110)]  # star -> 100
    edges_py += [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    nodes_py = sorted({k for e in edges_py for k in e} | {999, 1000})
    rng.shuffle(edges_py)
    edges = _ds(edges_py, ["a", "b"])
    nodes = _ds([(k,) for k in nodes_py], ["key"])

    native = (
        min_label_components(edges, nodes).to_pandas().sort_values("node")
    )
    monkeypatch.setattr(C, "_COMPONENTS_NATIVE_LIMIT", 0)
    coarse = (
        min_label_components(edges, nodes).to_pandas().sort_values("node")
    )
    assert native["node"].tolist() == coarse["node"].tolist()
    assert native["component"].tolist() == coarse["component"].tolist()
    got = dict(zip(coarse["node"], coarse["component"]))
    assert got[5] == 1 and got[109] == 100 and got[204] == 200
    assert got[999] == 999 and got[1000] == 1000


def test_coarse_plan_string_keys_stay_native(ray_session, monkeypatch):
    """String node ids must not engage the coarse plan (int-key
    contract) and still resolve correctly with the limit forced to 0."""
    from ocr_dataset_builder_ray.stages import components as C

    monkeypatch.setattr(C, "_COMPONENTS_NATIVE_LIMIT", 0)
    edges = _ds([("z", "m"), ("m", "a")], ["a", "b"])
    nodes = _ds([(k,) for k in ("a", "m", "z", "solo")], ["key"])
    out = min_label_components(edges, nodes).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {"a": "a", "m": "a", "z": "a", "solo": "solo"}


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


def test_minhash_distributed_all_coarse_matches_driver(
    ray_session, sf_dir, monkeypatch
):
    """components='distributed' with every coarse plan forced (node
    distinct, message/update exchanges) must still equal the driver
    union-find survivors."""
    from ocr_dataset_builder_ray.stages import components as C
    from ocr_dataset_builder_ray.stages import dedup as D

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        D.minhash_lsh_dedup(ds, "text", "doc_id", components="driver")
        .select_columns(["doc_id"]).to_pandas()["doc_id"].sort_values().tolist()
    )
    monkeypatch.setattr(D, "_DISTINCT_PAIRS_NATIVE_LIMIT", 0)
    monkeypatch.setattr(C, "_COMPONENTS_NATIVE_LIMIT", 0)
    b = (
        D.minhash_lsh_dedup(ds, "text", "doc_id", components="distributed")
        .select_columns(["doc_id"]).to_pandas()["doc_id"].sort_values().tolist()
    )
    assert a == b


def test_coarse_plan_int32_keys(ray_session, monkeypatch):
    """int32 node ids pass the use_coarse gate; the int64-max null
    sentinel must not be forced into the narrow label column (it
    crashed pc.fill_null with ArrowInvalid before the cast fix)."""
    from ocr_dataset_builder_ray.stages import components as C

    monkeypatch.setattr(C, "_COMPONENTS_NATIVE_LIMIT", 0)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 100], type=pa.int32()),
                "b": pa.array([2, 3, 101], type=pa.int32()),
            }
        )
    )
    nodes = ray.data.from_arrow(
        pa.table({"key": pa.array([1, 2, 3, 100, 101, 999], type=pa.int32())})
    )
    out = min_label_components(edges, nodes).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 100: 100, 101: 100, 999: 999}
    assert out["component"].dtype == out["node"].dtype


def test_empty_nodes_keeps_component_schema(ray_session):
    """Empty node set + nonempty edges: the early return must still
    present the documented (node, component) schema, not (node, label)."""
    edges = _ds([(1, 2)], ["a", "b"])
    nodes = ray.data.from_arrow(
        pa.table({"key": pa.array([], type=pa.int64())})
    )
    out = min_label_components(edges, nodes)
    assert set(out.schema().names) == {"node", "component"}
    assert out.count() == 0
