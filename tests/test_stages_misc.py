"""Unit tests for metrics aggregations, export projections, and
multimodal plumbing (SURVEY.md G1-G4, K6, M1-M3 grafts)."""

import json
import os

import pyarrow as pa
import pytest

import ray.data

from ocr_dataset_builder_ray.pipelines.export import (
    EXPORT_MODES,
    export_dataset,
    register_export_mode,
)
from ocr_dataset_builder_ray.pipelines.extraction import extraction_pipeline
from ocr_dataset_builder_ray.pipelines.metrics import (
    cost_stats,
    extraction_metrics,
    per_lang_metrics,
)
from ocr_dataset_builder_ray.sources.pages import pages_parquet_files
from ocr_dataset_builder_ray.stages.multimodal import (
    DecodeMedia,
    ResizeMedia,
    decode_pipeline,
    sample_frames,
)


@pytest.fixture(scope="module")
def extracted(ray_session, pages_corpus):
    return extraction_pipeline(pages_parquet_files(pages_corpus)).materialize()


def test_extraction_metrics_single_pass(extracted):
    m = extraction_metrics(extracted)
    assert m["rows"] == m["ok_rows"] + m["failed_rows"]
    assert m["failed_rows"] >= 1  # empty-html sentinel row
    assert m["total_chars"] > 0 and m["total_spans"] > 0
    assert m["mean_chars"] == pytest.approx(m["total_chars"] / m["rows"])


def test_per_lang_metrics(extracted):
    df = per_lang_metrics(extracted)
    assert set(df["lang"]) == {"en", "de", "fr", "es", "ar"}
    assert (df["n_docs"] > 0).all()
    assert (df["max_chars"] >= df["min_chars"]).all()


def test_cost_stats(extracted):
    c = cost_stats(extracted, cost_col="html_bytes", unit_cost=1e-9)
    assert c["n"] == extracted.count()
    assert c["min_cost"] <= c["mean_cost"] <= c["max_cost"]
    assert c["total_cost"] == pytest.approx(c["mean_cost"] * c["n"], rel=1e-6)


def test_export_modes(extracted, tmp_path):
    out = str(tmp_path / "std")
    export_dataset(extracted, out, mode="standard", fmt="jsonl")
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files
    with open(os.path.join(out, files[0])) as f:
        rec = json.loads(f.readline())
    assert set(rec) == {"url", "warc_ts", "lang", "extracted_text", "status", "n_chars", "n_spans"}

    out2 = str(tmp_path / "pairs")
    export_dataset(extracted, out2, mode="cleaning_pairs", fmt="parquet")
    got = ray.data.read_parquet(out2)
    assert set(got.schema().names) == {"url", "noisy_text", "clean_text"}

    with pytest.raises(ValueError):
        export_dataset(extracted, str(tmp_path / "x"), fmt="xml")


def test_export_mode_registry(extracted, tmp_path):
    register_export_mode("urls_only", lambda ds: ds.select_columns(["url"]))
    try:
        out = str(tmp_path / "urls")
        export_dataset(extracted, out, mode="urls_only", fmt="parquet")
        assert ray.data.read_parquet(out).schema().names == ["url"]
    finally:
        EXPORT_MODES.pop("urls_only", None)


def _media_ds(n=20):
    rows = [
        {"media_id": f"m{i:03d}", "media": bytes([i]) * (10 + i), "media_type": "image"}
        for i in range(n)
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_decode_media_real_soft_fails_unknown():
    # real path: arbitrary bytes are not a decodable format -> M5 soft
    # fail (decoded_ok=False rows), never a raise
    out = DecodeMedia(fake=False)(
        pa.table({"media": pa.array([b"\x89PNG\r\n\x1a\n garbage", None], pa.binary())})
    )
    assert out["decoded_ok"].to_pylist() == [False, False]


def test_decode_pipeline_deterministic(ray_session):
    a = decode_pipeline(_media_ds(), fake=True).to_pandas().sort_values("media_id")
    b = decode_pipeline(_media_ds(), fake=True).to_pandas().sort_values("media_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a["width"] <= 1024).all() and (a["height"] <= 1024).all()
    assert a["decoded_ok"].all()


def test_resize_aspect_preserved():
    t = pa.table({"width": pa.array([2048], pa.int32()), "height": pa.array([1024], pa.int32())})
    out = ResizeMedia(max_dimension=512)(t)
    assert out["width"][0].as_py() == 512
    assert out["height"][0].as_py() == 256


def test_sample_frames_stride_and_cap(ray_session):
    rows = [
        {"media_id": "v1", "frame_idx": i} for i in range(20)
    ] + [{"media_id": "v2", "frame_idx": i} for i in range(4)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = sample_frames(ds, stride=2, max_per_group=5).to_pandas()
    v1 = out[out["media_id"] == "v1"]
    v2 = out[out["media_id"] == "v2"]
    assert len(v1) == 5  # 10 strided -> capped to 5 (seeded, sorted)
    assert list(v1["frame_idx"]) == sorted(v1["frame_idx"])
    assert list(v2["frame_idx"]) == [0, 2]
    # determinism of the seeded cap
    out2 = sample_frames(ds, stride=2, max_per_group=5).to_pandas()
    assert sorted(out["frame_idx"]) == sorted(out2["frame_idx"])


def test_humanize_bytes():
    from ocr_dataset_builder_ray.functions.util import humanize_bytes

    assert humanize_bytes(512) == "512 B"
    assert humanize_bytes(2048) == "2.0 KB"
    assert humanize_bytes(5 * 1024**3) == "5.0 GB"
