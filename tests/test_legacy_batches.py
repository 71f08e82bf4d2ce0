"""Migration-reader tests: the reference's on-disk artifact trees load
into Datasets with the reference's own validation semantics (S4/S5,
M9-M11 grafts; formats per docs/DATA_FORMATS.md)."""

import json
import os

import pytest

from ocr_dataset_builder_ray.sources.legacy_batches import (
    extract_frame_number,
    join_legacy,
    read_legacy_llm_batches,
    read_legacy_tesseract,
    read_legacy_text_batches,
)


def _write(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


@pytest.fixture()
def legacy_tree(tmp_path):
    root = str(tmp_path / "legacy")
    # video A: tesseract + 2 llm batches (one valid with F: refs, one
    # structurally invalid -> skipped) + a text-pipeline batch
    _write(
        os.path.join(root, "vidA", "tesseract_ocr.json"),
        {
            "frame_000000.png": "raw zero",
            "frame_000001.png": "raw one",
            "frame_000002.png": "<<< OCR_FAILED_EMPTY_TEXT >>>",
        },
    )
    _write(
        os.path.join(root, "vidA", "llm_output_batch_0001.json"),
        {
            "task1_raw_ocr": ["alpha", "F:0", "F:1 tail"],
            "task2_augmented_imperfections": ["a~", "b~", "c~"],  # alternate key
            "task3_cleaned": ["Alpha", "Alpha", "Alpha tail"],
            "task4_markdown": ["# A", "F:0", "F:1"],
            "task5_summary": "batch one summary",
        },
    )
    _write(
        os.path.join(root, "vidA", "llm_output_batch_0002.json"),
        {
            "task1_raw_ocr": ["x", "y"],
            "task2_augmented": ["x~"],  # WRONG length -> batch skipped
            "task3_cleaned": ["X", "Y"],
            "task4_markdown": ["#X", "#Y"],
            "task5_summary": "bad batch",
        },
    )
    _write(
        os.path.join(root, "vidA", "batch_000000_000002.json"),
        {
            "video_id": "vidA",
            "batch_info": {"start_frame_index": 0, "end_frame_index": 2, "num_frames_in_batch": 3},
            "llm_output": {
                "task3_cleaned_text": ["c0", "c1", "c2"],
                "task4_markdown_text": ["m0", "m1", "m2"],
                "task5_summary": "text batch summary",
            },
            "token_counts": {"input_tokens": 100, "output_tokens": 50},
            "processing_stats": {"timestamp": "2025-06-20T00:00:00Z", "duration_seconds": 1.5},
        },
    )
    # video B: llm only (no tesseract) -> dropped by the strict join
    _write(
        os.path.join(root, "vidB", "llm_output_batch_0001.json"),
        {
            "task1_raw_ocr": ["b-only"],
            "task2_augmented": ["b~"],
            "task3_cleaned": ["B"],
            "task4_markdown": ["#B"],
            "task5_summary": "b summary",
        },
    )
    return root


def test_frame_number_regex():
    assert extract_frame_number("frame_000123.png") == 123
    assert extract_frame_number("nope.txt") is None


def test_read_tesseract(ray_session, legacy_tree):
    df = read_legacy_tesseract(legacy_tree).to_pandas().sort_values("frame_name")
    assert list(df["video_id"].unique()) == ["vidA"]
    assert list(df["frame_idx"]) == [0, 1, 2]
    assert list(df["frame_number"]) == [0, 1, 2]
    assert "<<< OCR_FAILED_EMPTY_TEXT >>>" in set(df["ocr_text"])  # sentinel preserved


def test_join_alignment_nonconsecutive_seconds(ray_session, tmp_path):
    """target_fps != 1: frame files at second marks 0/5/10. The LLM
    reader emits positions 0/1/2, so the join must use the positional
    rank, not the parsed second mark."""
    root = str(tmp_path / "legacy2")
    _write(
        os.path.join(root, "vidC", "tesseract_ocr.json"),
        {
            "frame_000000.png": "sec zero",
            "frame_000005.png": "sec five",
            "frame_000010.png": "sec ten",
        },
    )
    _write(
        os.path.join(root, "vidC", "llm_output_batch_0001.json"),
        {
            "task1_raw_ocr": ["t0", "t5", "t10"],
            "task2_augmented": ["a", "b", "c"],
            "task3_cleaned": ["c0", "c5", "c10"],
            "task4_markdown": ["m0", "m5", "m10"],
            "task5_summary": "s",
        },
    )
    t = read_legacy_tesseract(root)
    l = read_legacy_llm_batches(root)
    j = join_legacy(t, l, num_partitions=2).to_pandas().sort_values("frame_idx")
    assert len(j) == 3  # round-1 bug: only second-mark 0 matched
    assert list(j["frame_number"]) == [0, 5, 10]
    assert list(j["ocr_text"]) == ["sec zero", "sec five", "sec ten"]
    assert list(j["task1_raw_ocr"]) == ["t0", "t5", "t10"]


def test_read_llm_batches_validation_and_decode(ray_session, legacy_tree):
    df = (
        read_legacy_llm_batches(legacy_tree)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    a = df[df["video_id"] == "vidA"]
    # invalid batch 0002 skipped: only 3 frames survive
    assert list(a["frame_idx"]) == [0, 1, 2]
    # F:i decode applied per task
    assert list(a["task1_raw_ocr"]) == ["alpha", "alpha", "alpha tail"]
    assert list(a["task4_markdown"]) == ["# A", "# A", "# A"]
    # alternate task2 key honored
    assert list(a["task2_augmented"]) == ["a~", "b~", "c~"]
    # summary replicated per frame
    assert set(a["task5_summary"]) == {"batch one summary"}
    assert list(df[df["video_id"] == "vidB"]["task1_raw_ocr"]) == ["b-only"]


def test_read_text_batches(ray_session, legacy_tree):
    df = read_legacy_text_batches(legacy_tree).to_pandas()
    assert len(df) == 3
    assert list(df["frame_idx"]) == [0, 1, 2]
    assert (df["input_tokens"] == 100).all()


def test_strict_inner_join(ray_session, legacy_tree):
    t = read_legacy_tesseract(legacy_tree)
    l = read_legacy_llm_batches(legacy_tree)
    j = join_legacy(t, l, num_partitions=2).to_pandas().sort_values("frame_idx")
    # vidB has no tesseract side -> dropped entirely (strict inner join)
    assert set(j["video_id"]) == {"vidA"}
    assert len(j) == 3
    assert "ocr_text" in j.columns and "task3_cleaned" in j.columns
