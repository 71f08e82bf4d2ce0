"""Migration readers for the reference engine's on-disk artifacts.

A user of ``pieces-app/ocr-dataset-builder`` has directory trees of
per-video outputs (docs/DATA_FORMATS.md). These readers ingest them as
``ray.data.Dataset``s so existing data migrates into this engine
without re-running the original pipelines:

* ``read_legacy_tesseract``     — ``{video_id}/tesseract_ocr.json``
  dicts of ``frame filename → OCR text`` (S4; format
  tesseract/pipeline.py:45-46,95-96), frame index parsed with the M7
  regex (llm/text_pipeline.py:47-55), failure sentinels preserved.
* ``read_legacy_llm_batches``   — ``{video_id}/llm_output_batch_*.json``
  per-task parallel lists (S5; validation semantics of
  data/pytorch_dataset.py:352-428: per-batch length check against the
  primary task, ``task2_augmented_imperfections`` alternate-key
  fallback, structurally invalid batches skipped, ``task5_summary``
  replicated per frame) with read-time F:i delta decode (M11).
* ``read_legacy_text_batches``  — ``{video_id}/batch_{s:06d}_{e:06d}.json``
  nested ``llm_output`` format incl. token counts
  (llm/text_pipeline.py:130-162).
* ``join_legacy``               — inner join of the tesseract and LLM
  views on (video_id, frame_idx): the J1 equi-join realized as a
  groupby co-partition (both sides shuffled once on the shared key).

File discovery is driver-side planning (sorted listing = S1); JSON
reading and parsing are distributed ``map_batches`` tasks over the
directory list.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pandas as pd

import ray.data

from ..functions.framerefs import decode_refs

TASK_KEYS = ["task1_raw_ocr", "task2_augmented", "task3_cleaned", "task4_markdown"]
ALT_TASK2_KEY = "task2_augmented_imperfections"
SUMMARY_KEY = "task5_summary"

# M7: frame number from filename (llm/text_pipeline.py:47-55 semantics)
_FRAME_NUM_RE = re.compile(r"frame_(\d+)\.")


def extract_frame_number(name: str) -> int | None:
    m = _FRAME_NUM_RE.search(name)
    return int(m.group(1)) if m else None


def _video_dirs(root: str) -> list[str]:
    return sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )


def read_legacy_tesseract(root: str) -> ray.data.Dataset:
    """``tesseract_ocr.json`` trees → (video_id, frame_name, frame_idx,
    frame_number, ocr_text) rows. Sentinel values ride along as data (M5).

    ``frame_idx`` is the POSITIONAL index (rank within the sorted frame
    list per video) — the reference aligns LLM outputs positionally with
    the sorted frame file list, so this is the join key that stays
    correct when second marks are not consecutive from 0 (target_fps !=
    1, or frames skipped during extraction). The second mark parsed from
    the filename (M7 regex) is kept as the informational
    ``frame_number`` column."""
    dirs = _video_dirs(root)

    def _load(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for vid in df["video_id"]:
            path = os.path.join(root, vid, "tesseract_ocr.json")
            if not os.path.isfile(path):
                continue  # strict inner-join semantics: missing side drops
            try:
                data = json.load(open(path))
            except json.JSONDecodeError:
                continue
            for pos, name in enumerate(sorted(data)):
                out.append(
                    {
                        "video_id": vid,
                        "frame_name": name,
                        "frame_idx": pos,
                        "frame_number": extract_frame_number(name),
                        "ocr_text": data[name],
                    }
                )
        return pd.DataFrame(
            out,
            columns=["video_id", "frame_name", "frame_idx", "frame_number", "ocr_text"],
        )

    return ray.data.from_items([{"video_id": d} for d in dirs]).map_batches(
        _load, batch_format="pandas"
    )


def _valid_batch(data: dict) -> dict | None:
    """Reference validation (data/pytorch_dataset.py:380-428): all task
    lists present (task2 may use the alternate key) with length equal
    to the primary task's; returns normalized dict or None."""
    primary = data.get(TASK_KEYS[0])
    if not isinstance(primary, list) or not primary:
        return None
    n = len(primary)
    norm: dict = {}
    for key in TASK_KEYS:
        lst = data.get(key)
        if key == "task2_augmented" and not lst:
            lst = data.get(ALT_TASK2_KEY)
        if not isinstance(lst, list) or len(lst) != n:
            return None
        norm[key] = lst
    if SUMMARY_KEY not in data:
        return None
    norm[SUMMARY_KEY] = data[SUMMARY_KEY]
    return norm


def read_legacy_llm_batches(root: str, decode_frame_refs: bool = True) -> ray.data.Dataset:
    """``llm_output_batch_*.json`` trees → one row per frame with the
    four task columns + the replicated batch summary."""
    dirs = _video_dirs(root)

    def _load(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for vid in df["video_id"]:
            files = sorted(glob.glob(os.path.join(root, vid, "llm_output_batch_*.json")))
            agg: dict[str, list[str]] = {k: [] for k in TASK_KEYS}
            summaries: list[str] = []
            for path in files:
                try:
                    data = json.load(open(path))
                except json.JSONDecodeError:
                    continue  # skip unreadable batch (reference behavior)
                norm = _valid_batch(data)
                if norm is None:
                    continue  # structurally invalid batch skipped
                n = len(norm[TASK_KEYS[0]])
                for k in TASK_KEYS:
                    agg[k].extend(norm[k])
                summaries.extend([norm[SUMMARY_KEY]] * n)
            if not summaries:
                continue
            decoded = {
                k: decode_refs(v) if decode_frame_refs else v for k, v in agg.items()
            }
            for i in range(len(summaries)):
                out.append(
                    {
                        "video_id": vid,
                        "frame_idx": i,
                        **{k: decoded[k][i] for k in TASK_KEYS},
                        SUMMARY_KEY: summaries[i],
                    }
                )
        return pd.DataFrame(
            out, columns=["video_id", "frame_idx", *TASK_KEYS, SUMMARY_KEY]
        )

    return ray.data.from_items([{"video_id": d} for d in dirs]).map_batches(
        _load, batch_format="pandas"
    )


def read_legacy_text_batches(root: str) -> ray.data.Dataset:
    """``batch_{s:06d}_{e:06d}.json`` trees (text-LLM pipeline output,
    llm/text_pipeline.py:130-162) → one row per frame with task3/task4
    columns, batch summary, and per-batch token-count metrics."""
    dirs = _video_dirs(root)

    def _load(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for vid in df["video_id"]:
            files = sorted(glob.glob(os.path.join(root, vid, "batch_*_*.json")))
            for path in files:
                try:
                    data = json.load(open(path))
                except json.JSONDecodeError:
                    continue
                info = data.get("batch_info", {})
                llm = data.get("llm_output", {})
                t3 = llm.get("task3_cleaned_text")
                t4 = llm.get("task4_markdown_text")
                if not isinstance(t3, list) or not isinstance(t4, list) or len(t3) != len(t4):
                    continue
                start = int(info.get("start_frame_index", 0))
                toks = data.get("token_counts", {})
                for j, (c, m) in enumerate(zip(t3, t4)):
                    out.append(
                        {
                            "video_id": data.get("video_id", vid),
                            "frame_idx": start + j,
                            "task3_cleaned": c,
                            "task4_markdown": m,
                            "task5_summary": llm.get("task5_summary", ""),
                            "input_tokens": int(toks.get("input_tokens", 0)),
                            "output_tokens": int(toks.get("output_tokens", 0)),
                        }
                    )
        return pd.DataFrame(
            out,
            columns=[
                "video_id",
                "frame_idx",
                "task3_cleaned",
                "task4_markdown",
                "task5_summary",
                "input_tokens",
                "output_tokens",
            ],
        )

    return ray.data.from_items([{"video_id": d} for d in dirs]).map_batches(
        _load, batch_format="pandas"
    )


def join_legacy(
    tesseract_ds: ray.data.Dataset,
    llm_ds: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Strict inner join on (video_id, frame_idx) — the reference's
    frame-level semi-join (data/pytorch_dataset.py:443-470) — via Ray
    Data's native hash-shuffle join; both sides move exactly once,
    co-partitioned on the shared key."""
    return tesseract_ds.join(
        llm_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("video_id", "frame_idx"),
    )
