"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's payloads are images (video frames) fed through
OCR (tesseract/processing.py:53-99) after a decode/resize stage
(video/processing.py:99-185). This module keeps that dataflow shape
for opaque ``binary`` media columns in the new engine:

* schema: ``media: binary`` + ``media_type: string`` + per-row typed
  metadata columns (width/height/duration as applicable);
* decode / feature-extract / resize / frame-sample are actor-pool
  ``map_batches`` stages whose Ray-side plumbing (batch sizing for
  multi-MB rows, actor ``__init__`` codec setup, Arrow binary in/out)
  is real and tested — the codec itself is STUBBED because no
  image/audio library exists in this container. ``DecodeMedia``
  raises ``NotImplementedError`` for real codecs unless constructed
  with ``fake=True``, which swaps in a deterministic fake decoder so
  the pipeline shape is exercisable end-to-end (SURVEY.md M1/M2
  graft: decode moves into the first map_batches).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import stable_hash64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("media", pa.binary()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
    ]
)


class DecodeMedia:
    """Actor-pool decode stage (callable class; one codec init per actor).

    Real decode requires an image/audio codec library that is NOT
    available in this environment — constructing with ``fake=False``
    raises ``NotImplementedError`` at init (fail-fast, per-actor, the
    same place the reference checks for a Tesseract install,
    tesseract/pipeline.py:319-324). ``fake=True`` installs a
    deterministic stand-in that "decodes" bytes into a stable
    (width, height, checksum) triple so tests can drive the plumbing.
    """

    def __init__(self, fake: bool = False) -> None:
        if not fake:
            raise NotImplementedError(
                "no image/audio codec library in this environment; "
                "construct DecodeMedia(fake=True) for the deterministic stub"
            )
        self._decode = self._fake_decode

    @staticmethod
    def _fake_decode(payload: bytes | None) -> tuple[int, int, int]:
        if not payload:
            return (0, 0, 0)
        h = stable_hash64(payload)
        return (64 + h % 1024, 64 + (h >> 16) % 1024, h & 0xFFFFFFFF)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, checks, ok = [], [], [], []
        for payload in batch["media"].to_pylist():
            w, h, c = self._decode(payload)
            widths.append(w)
            heights.append(h)
            checks.append(c)
            ok.append(bool(payload))
        return (
            batch.append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("height", pa.array(heights, type=pa.int32()))
            .append_column("checksum", pa.array(checks, type=pa.int64()))
            .append_column("decoded_ok", pa.array(ok, type=pa.bool_()))
        )


class ResizeMedia:
    """Resize stage stub: mirrors video/processing.py:163-185 semantics
    (downscale so max(h,w) <= max_dimension, aspect preserved) on the
    metadata columns; payload transform stubbed (no codec)."""

    def __init__(self, max_dimension: int = 1024) -> None:
        self.max_dimension = max_dimension

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out_w, out_h = [], []
        for w, h in zip(ws, hs):
            m = max(w, h)
            if m > self.max_dimension and m > 0:
                scale = self.max_dimension / m
                w, h = max(1, int(w * scale)), max(1, int(h * scale))
            out_w.append(w)
            out_h.append(h)
        return batch.set_column(
            batch.schema.get_field_index("width"), "width", pa.array(out_w, pa.int32())
        ).set_column(
            batch.schema.get_field_index("height"), "height", pa.array(out_h, pa.int32())
        )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    group_col: str = "media_id",
    order_col: str = "frame_idx",
    stride: int = 2,
    max_per_group: int | None = None,
    seed: int = 42,
) -> ray.data.Dataset:
    """Frame-sampling stage: per-group ordered stride sample + seeded cap.

    Graft of the reference's stride sampler + random down-sampler
    (video/processing.py:121-160,198-221) as a ``groupby().map_groups``:
    keep every ``stride``-th row in ``order_col`` order; if still over
    ``max_per_group``, keep a seeded sorted random subset (deterministic
    per group key — fixes the reference's unseeded sampling)."""
    import random

    import pandas as pd

    def _sample(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col)
        g = g.iloc[::stride]
        if max_per_group is not None and len(g) > max_per_group:
            key = str(g[group_col].iloc[0])
            rng = random.Random(stable_hash64(f"{seed}:{key}"))
            keep = sorted(rng.sample(range(len(g)), max_per_group))
            g = g.iloc[keep]
        return g

    return ds.groupby(group_col).map_groups(_sample, batch_format="pandas")


def decode_pipeline(
    ds: ray.data.Dataset,
    *,
    fake: bool = True,
    max_dimension: int = 1024,
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """decode → resize over small batches (multi-MB binary rows need
    small ``batch_size`` so batch × concurrency fits worker heap)."""
    ds = ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return ds.map_batches(
        ResizeMedia,
        fn_constructor_kwargs={"max_dimension": max_dimension},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
