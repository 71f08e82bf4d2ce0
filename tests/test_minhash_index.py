"""Incremental MinHash index (state/minhash_index.py): old-wins
semantics, within-batch dedup, batch-equivalence with
minhash_lsh_dedup, index growth and idempotent re-offer."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from ocr_dataset_builder_ray.stages.dedup import minhash_lsh_dedup
from ocr_dataset_builder_ray.state.minhash_index import (
    build_minhash_index,
    incremental_minhash_dedup,
    load_index_params,
)


def _texts(n, seed, vocab_size=5000, words=80):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(vocab_size)])
    return [" ".join(rng.choice(vocab, words, replace=False)) for _ in range(n)]


def _df(keys, texts):
    return pd.DataFrame(
        {"doc_id": np.asarray(keys, dtype=np.int64), "text": texts}
    )


@pytest.fixture()
def index_env(ray_session, tmp_path):
    """Index built over corpus A (keys 100..139, all distinct texts)."""
    a_texts = _texts(40, seed=1)
    a = _df(range(100, 140), a_texts)
    idx = str(tmp_path / "mhidx")
    build_minhash_index(
        ray.data.from_pandas(a), idx, "text", "doc_id", num_perm=64, bands=16
    )
    return idx, a


def test_old_wins_even_with_smaller_new_key(index_env):
    idx, a = index_env
    # new keys 1..3 are SMALLER than every indexed key: min-key logic
    # would keep the new doc; old-wins must drop it anyway
    new = _df(
        [1, 2, 3],
        [a["text"][0], a["text"][7], "totally novel document text " + _texts(1, 9)[0]],
    )
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(new), idx, "text", "doc_id", update=False
    )
    kept = sorted(surv.to_pandas()["doc_id"])
    assert kept == [3]
    assert rep == {
        "new_docs": 3,
        "dropped_vs_index": 2,
        "dropped_within_new": 0,
        "survivors": 1,
    }


def test_within_batch_and_chain(index_env):
    idx, a = index_env
    novel = _texts(1, 33)[0]
    # 201/205 duplicate each other (min 201 wins); 210 duplicates an
    # indexed doc AND 211 duplicates 210 -> both drop via the chain
    new = _df(
        [201, 205, 210, 211],
        [novel, novel, a["text"][3], a["text"][3]],
    )
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(new), idx, "text", "doc_id", update=False
    )
    assert sorted(surv.to_pandas()["doc_id"]) == [201]
    assert rep["dropped_vs_index"] == 2  # 210 and 211 root to the old doc
    assert rep["dropped_within_new"] == 1  # 205 roots to 201
    assert rep["survivors"] == 1


def test_batch_equivalence(ray_session, tmp_path, index_env):
    idx, a = index_env
    # when all new keys exceed the indexed keys, incremental == batch
    # dedup over A ∪ B restricted to B
    b_texts = _texts(20, seed=2)
    b_texts[4] = a["text"][10]   # dup vs index
    b_texts[9] = b_texts[3]      # dup within batch
    b = _df(range(500, 520), b_texts)
    surv, _ = incremental_minhash_dedup(
        ray.data.from_pandas(b), idx, "text", "doc_id", update=False
    )
    got = sorted(surv.to_pandas()["doc_id"])
    batch = minhash_lsh_dedup(
        ray.data.from_pandas(pd.concat([a, b], ignore_index=True)),
        "text",
        "doc_id",
    ).to_pandas()
    want = sorted(k for k in batch["doc_id"] if k >= 500)
    assert got == want


def test_update_grows_index_and_rejects_reoffers(index_env):
    idx, a = index_env
    novel = _texts(2, seed=44)
    b = _df([300, 301, 302], [novel[0], novel[1], a["text"][5]])
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(b), idx, "text", "doc_id", update=True
    )
    assert sorted(surv.to_pandas()["doc_id"]) == [300, 301]
    assert load_index_params(idx)["n_passes"] == 2
    # the same content re-offered under fresh keys now dups the INDEX
    c = _df([400, 401], [novel[0], novel[1]])
    surv2, rep2 = incremental_minhash_dedup(
        ray.data.from_pandas(c), idx, "text", "doc_id", update=True
    )
    assert len(surv2.to_pandas()) == 0
    assert rep2["dropped_vs_index"] == 2
    assert load_index_params(idx)["n_passes"] == 3
    # a dropped doc's bands were NOT indexed: novel content still passes
    d = _df([600], [_texts(1, seed=77)[0]])
    surv3, rep3 = incremental_minhash_dedup(
        ray.data.from_pandas(d), idx, "text", "doc_id", update=False
    )
    assert sorted(surv3.to_pandas()["doc_id"]) == [600]


def test_all_novel_batch_unchanged(index_env):
    idx, _ = index_env
    b = _df(range(700, 710), _texts(10, seed=55))
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(b), idx, "text", "doc_id", update=False
    )
    assert sorted(surv.to_pandas()["doc_id"]) == list(range(700, 710))
    assert rep["dropped_vs_index"] == 0 and rep["dropped_within_new"] == 0


def test_empty_batch(index_env):
    idx, _ = index_env
    b = _df([], [])
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(b), idx, "text", "doc_id", update=False
    )
    assert rep["new_docs"] == 0 and rep["survivors"] == 0


def test_cli_dedup_index_and_classify(ray_session, tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_dataset_builder_ray.cli import main

    a = _df(range(0, 30), _texts(30, seed=91))
    b_texts = _texts(10, seed=92)
    b_texts[0] = a["text"][4]  # one re-offer
    b = _df(range(100, 110), b_texts)
    src_a, src_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(a, preserve_index=False), src_a)
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False), src_b)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "surv")

    assert main(["dedup-index", "--mode", "build",
                 "--input", src_a, "--index", idx]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_passes"] == 1
    assert main(["dedup-index", "--mode", "pass", "--input", src_b,
                 "--index", idx, "--output", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["new_docs"] == 10 and rep["dropped_vs_index"] == 1
    import ray.data

    assert ray.data.read_parquet(out).count() == 9

    # classify: label = parity of a text marker; train & score the
    # same table, then gate
    lab = a.copy()
    lab["label"] = ["even" if i % 2 == 0 else "odd" for i in range(30)]
    src_l = str(tmp_path / "lab.parquet")
    pq.write_table(pa.Table.from_pandas(lab, preserve_index=False), src_l)
    scored = str(tmp_path / "scored")
    assert main(["classify", "--input", src_l, "--output", scored,
                 "--label", "label"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 30 and info["classes"] == ["even", "odd"]
    gated = str(tmp_path / "gated")
    assert main(["classify", "--input", src_l, "--output", gated,
                 "--label", "label", "--keep-label", "even"]) == 0
    info2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info2["mode"] == "filter" and 0 < info2["rows"] <= 30


def test_distributed_engine_equals_driver(index_env):
    idx, a = index_env
    novel = _texts(1, 63)[0]
    new = _df(
        [1, 205, 210, 211, 300],
        [a["text"][0], novel, a["text"][3], a["text"][3], novel],
    )
    ds = ray.data.from_pandas(new)
    s_drv, r_drv = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="driver"
    )
    s_dist, r_dist = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="distributed"
    )
    assert sorted(s_drv.to_pandas()["doc_id"]) == sorted(
        s_dist.to_pandas()["doc_id"]
    )
    assert r_drv == r_dist
    # old-wins held in the distributed encoding: key 1 < every old key
    # yet drops against the index
    assert 1 not in set(s_dist.to_pandas()["doc_id"])


def test_negative_keys_engine_equality(index_env):
    # ADVICE r4 (high): hash-derived int64 keys are negative half the
    # time; the old +2^62 offset encoding silently classified negative
    # new keys as old and never dropped them. Rank encoding must give
    # identical results on both engines across the full signed range.
    idx, a = index_env
    novel = _texts(1, 83)[0]
    new = _df(
        [-5, -4, -3, -2, 7],
        [a["text"][0], a["text"][1], a["text"][2], novel, novel],
    )
    ds = ray.data.from_pandas(new)
    s_drv, r_drv = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="driver"
    )
    s_dist, r_dist = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="distributed"
    )
    got_drv = sorted(s_drv.to_pandas()["doc_id"])
    got_dist = sorted(s_dist.to_pandas()["doc_id"])
    assert got_drv == got_dist == [-2]
    assert r_drv == r_dist
    assert r_drv["dropped_vs_index"] == 3
    assert r_drv["dropped_within_new"] == 1  # 7 roots to -2


def test_negative_old_keys_distributed(ray_session, tmp_path):
    # index itself holds negative keys; a mixed-sign batch must still
    # resolve old-wins correctly on the distributed engine
    a_texts = _texts(10, seed=5)
    a = _df(range(-10, 0), a_texts)
    idx = str(tmp_path / "negidx")
    build_minhash_index(
        ray.data.from_pandas(a), idx, "text", "doc_id", num_perm=64, bands=16
    )
    new = _df([-100, 50], [a_texts[0], a_texts[9]])
    for engine in ("driver", "distributed"):
        surv, rep = incremental_minhash_dedup(
            ray.data.from_pandas(new), idx, "text", "doc_id",
            update=False, engine=engine,
        )
        assert len(surv.to_pandas()) == 0, engine
        assert rep["dropped_vs_index"] == 2, engine


def test_degenerate_small_batch_guard(index_env, monkeypatch):
    # ADVICE r4 (low): the sub-200k-row small path must refuse/escalate
    # on the SKINNY bucket-size estimate, before expanding pairs
    import ocr_dataset_builder_ray.state.minhash_index as mhi
    from ocr_dataset_builder_ray.stages import dedup as dd

    idx, a = index_env
    same = _texts(1, 99)[0]
    new = _df(range(1000, 1012), [same] * 12)  # fully degenerate batch
    ds = ray.data.from_pandas(new)
    monkeypatch.setattr(mhi, "_DRIVER_CANDIDATE_LIMIT", 10)

    def _boom(*args, **kwargs):
        raise AssertionError("pairs expanded on the driver despite guard")

    monkeypatch.setattr(mhi, "_driver_candidate_pairs", _boom)
    with pytest.raises(ValueError, match="driver bound"):
        incremental_minhash_dedup(
            ds, idx, "text", "doc_id", update=False, engine="driver"
        )
    surv, rep = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="auto"
    )
    assert sorted(surv.to_pandas()["doc_id"]) == [1000]
    assert rep["dropped_within_new"] == 11


def test_bucket_pair_count_matches_expansion():
    import pandas as pd

    from ocr_dataset_builder_ray.stages.dedup import (
        _bucket_pair_count,
        _driver_candidate_pairs,
    )

    rng = np.random.default_rng(7)
    bdf = pd.DataFrame(
        {
            "key": rng.integers(-50, 50, 400),
            "band_id": rng.integers(0, 4, 400),
            "band_hash": rng.integers(0, 12, 400),
        }
    )
    est = _bucket_pair_count(bdf, "band_id", "band_hash")
    got = len(_driver_candidate_pairs(bdf, "band_id", "band_hash"))
    # upper bound (distinct pairs can repeat across buckets), tight
    # enough to act as the memory guard
    assert est >= got > 0
    assert _bucket_pair_count(bdf.iloc[:0], "band_id", "band_hash") == 0


def test_auto_escalates_past_driver_bound(index_env, monkeypatch):
    import ocr_dataset_builder_ray.state.minhash_index as mhi

    idx, a = index_env
    new = _df([400, 401, 402], [a["text"][0], a["text"][1], _texts(1, 71)[0]])
    ds = ray.data.from_pandas(new)
    want_s, want_r = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="driver"
    )
    monkeypatch.setattr(mhi, "_DRIVER_CANDIDATE_LIMIT", 0)
    got_s, got_r = incremental_minhash_dedup(
        ds, idx, "text", "doc_id", update=False, engine="auto"
    )
    assert sorted(got_s.to_pandas()["doc_id"]) == sorted(
        want_s.to_pandas()["doc_id"]
    )
    assert got_r == want_r
    # explicit driver engine refuses instead of collecting
    with pytest.raises(ValueError):
        incremental_minhash_dedup(
            ds, idx, "text", "doc_id", update=False, engine="driver"
        )


def test_compaction_preserves_pass_results_and_bounds_files(index_env, tmp_path):
    from ocr_dataset_builder_ray.state.minhash_index import (
        compact_minhash_index,
    )

    idx, a = index_env
    # N simulated daily passes, each appending a pass directory
    n_passes = 6
    for p in range(n_passes):
        batch = _df(
            range(1000 + 10 * p, 1000 + 10 * p + 10), _texts(10, seed=50 + p)
        )
        incremental_minhash_dedup(
            ray.data.from_pandas(batch), idx, "text", "doc_id", update=True
        )
    assert load_index_params(idx)["n_passes"] == 1 + n_passes

    # the probe batch: one dup-of-index, one fresh doc
    probe = _df([7001, 7002], [a["text"][5], _texts(1, seed=99)[0]])

    def _run_probe():
        surv, rep = incremental_minhash_dedup(
            ray.data.from_pandas(probe), idx, "text", "doc_id", update=False
        )
        return sorted(surv.to_pandas()["doc_id"]), rep

    before_kept, before_rep = _run_probe()

    import os

    bands_root = os.path.join(idx, "bands")
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(bands_root)
    )
    stats = compact_minhash_index(idx)
    assert stats["files_before"] == files_before
    assert stats["passes_before"] == 1 + n_passes
    # bounded file count: all rows fit one target file here
    assert stats["files_after"] < files_before
    assert stats["files_after"] <= max(
        1, -(-stats["rows"] // 4_000_000)
    ) + 0  # ceil(rows / target)
    # one pass directory remains; params reset
    assert sorted(os.listdir(bands_root)) == ["pass=00000"]
    assert load_index_params(idx)["n_passes"] == 1

    # identical pass result on the compacted index
    after_kept, after_rep = _run_probe()
    assert after_kept == before_kept == [7002]
    assert after_rep == before_rep

    # row multiset preserved verbatim
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{bands_root}/pass=00000/*.parquet')"
    ).fetchone()[0]
    assert n_rows == stats["rows"]

    # the index still accepts new passes after compaction
    nxt = _df([8001], [_texts(1, seed=123)[0]])
    surv, rep = incremental_minhash_dedup(
        ray.data.from_pandas(nxt), idx, "text", "doc_id", update=True
    )
    assert sorted(surv.to_pandas()["doc_id"]) == [8001]
    assert load_index_params(idx)["n_passes"] == 2


def test_compaction_schema_stays_pure(index_env):
    """The compacted files must hold exactly the band schema — a bare
    hive-partitioned read would bake a stale string `pass` column into
    the rewrite and fork the index schema for every later append."""
    import os

    import pyarrow.parquet as pq

    from ocr_dataset_builder_ray.state.minhash_index import (
        compact_minhash_index,
    )

    idx, a = index_env
    incremental_minhash_dedup(
        ray.data.from_pandas(_df([900], _texts(1, seed=77))),
        idx, "text", "doc_id", update=True,
    )
    compact_minhash_index(idx)
    bands_root = os.path.join(idx, "bands")
    for root, _d, fs in os.walk(bands_root):
        for f in fs:
            if f.endswith(".parquet"):
                names = pq.read_schema(os.path.join(root, f)).names
                assert sorted(names) == ["band_hash", "band_id", "key", "sig"], names


def test_compaction_crash_window_heals(index_env):
    """Simulated crash between the two swap renames: no `bands` dir on
    disk, only bands.old / a marker-complete bands.compact. The next
    reader must self-heal to a complete tree (promote the marked
    compact tree; restore the old tree when no marker exists)."""
    import os
    import shutil

    idx, a = index_env
    bands_root = os.path.join(idx, "bands")

    def _probe():
        surv, _rep = incremental_minhash_dedup(
            ray.data.from_pandas(_df([7005, 7006], [a["text"][3], _texts(1, seed=101)[0]])),
            idx, "text", "doc_id", update=False,
        )
        return sorted(surv.to_pandas()["doc_id"])

    want = _probe()
    assert want == [7006]

    # crash case 1: renamed aside, compact tree complete (marker present)
    shutil.copytree(bands_root, bands_root + ".compact")
    open(os.path.join(bands_root + ".compact", "_COMPACT_COMPLETE"), "w").write("ok")
    os.replace(bands_root, bands_root + ".old")
    assert not os.path.isdir(bands_root)
    assert _probe() == want  # healed by promoting the compact tree
    assert os.path.isdir(bands_root)
    assert not os.path.isdir(bands_root + ".old")
    assert not os.path.exists(os.path.join(bands_root, "_COMPACT_COMPLETE"))

    # crash case 2: renamed aside, compact tree NOT marked complete
    shutil.copytree(bands_root, bands_root + ".compact")  # no marker
    os.replace(bands_root, bands_root + ".old")
    assert _probe() == want  # healed by restoring the old tree
    assert os.path.isdir(bands_root)
