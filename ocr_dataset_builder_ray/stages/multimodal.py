"""Multimodal column plumbing: binary payloads + typed metadata.

The reference's payloads are images (video frames) fed through
OCR (tesseract/processing.py:53-99) after a decode/resize stage
(video/processing.py:99-185). This module keeps that dataflow shape
for opaque ``binary`` media columns in the new engine:

* schema: ``media: binary`` + ``media_type: string`` + per-row typed
  metadata columns (width/height/sample_rate as applicable);
* decode / feature-extract / resize / frame-sample are actor-pool
  ``map_batches`` stages: batch sizing for multi-MB rows, actor
  ``__init__`` codec setup, Arrow binary in/out;
* ``DecodeMedia(fake=False)`` REALLY decodes the library-free formats
  (netpbm P6/P5, uncompressed BMP, PCM WAV, 8-bit non-interlaced PNG,
  baseline JPEG — functions/media_codecs.py + png_codec.py +
  jpeg_codec.py, pure numpy/stdlib) and soft-fails out-of-profile
  payloads per M5: ``decoded_ok=False`` rows, never a raise.
  ``fake=True`` keeps the deterministic hash-based stand-in used by
  the q33 golden. With ``emit_pixels=True`` the decoded raster rides
  along as a binary column so ``ResizeMedia`` performs a REAL
  aspect-preserving nearest-neighbor downscale
  (video/processing.py:163-185 semantics without cv2).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import stable_hash64
from ..functions.media_codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_pgm,
    decode_ppm,
    decode_wav,
    nearest_resize,
    sniff_media_format,
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("media", pa.binary()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
    ]
)


class DecodeMedia:
    """Actor-pool decode stage (callable class; one codec init per actor).

    ``fake=False`` (real path): decode netpbm/BMP images to pixel
    arrays and PCM WAV to sample arrays with the pure-numpy codecs;
    unknown/compressed/corrupt payloads emit ``decoded_ok=False`` rows
    (M5 — never raise; the reference instead fail-fast-checks its
    Tesseract install per actor, tesseract/pipeline.py:319-324, which
    here maps to the codec table built in ``__init__``).

    Output columns: ``width, height`` (images: pixels; audio:
    n_samples × channels), ``sample_rate`` (0 for images),
    ``checksum`` (over DECODED content, so e.g. the same image stored
    as PPM and BMP checksums identically), ``decoded_ok``; plus
    ``pixels, channels`` raster passthrough when ``emit_pixels=True``.

    ``fake=True``: deterministic hash-based stand-in (the q33 golden's
    codec) — exercises the plumbing with arbitrary payload bytes.
    """

    def __init__(self, fake: bool = False, emit_pixels: bool = False) -> None:
        from ..functions.jpeg_codec import decode_jpeg
        from ..functions.png_codec import decode_png

        self.fake = fake
        self.emit_pixels = emit_pixels and not fake
        self._image_codecs = {
            "ppm": decode_ppm,
            "pgm": decode_pgm,
            "bmp": decode_bmp,
            "png": decode_png,
            "jpeg": decode_jpeg,
        }

    @staticmethod
    def _fake_decode(payload: bytes | None) -> tuple[int, int, int]:
        if not payload:
            return (0, 0, 0)
        h = stable_hash64(payload)
        return (64 + h % 1024, 64 + (h >> 16) % 1024, h & 0xFFFFFFFF)

    def _real_decode(self, payload: bytes | None):
        """→ (width, height, sample_rate, checksum, ok, pixels, channels)."""
        fmt = sniff_media_format(payload or b"")
        try:
            if fmt in self._image_codecs:
                arr = self._image_codecs[fmt](payload)
                h, w = arr.shape[:2]
                ch = arr.shape[2] if arr.ndim == 3 else 1
                check = stable_hash64(arr.tobytes()) & 0xFFFFFFFF
                px = arr.tobytes() if self.emit_pixels else None
                return w, h, 0, check, True, px, ch
            if fmt == "wav":
                samples, rate = decode_wav(payload)
                check = stable_hash64(samples.tobytes()) & 0xFFFFFFFF
                return samples.shape[0], samples.shape[1], rate, check, True, None, 0
        except UnsupportedMediaError:
            pass
        except Exception:
            # defense in depth: the codecs convert parser edges to
            # UnsupportedMediaError themselves, but a decode bug must
            # flag the row (M5), never kill a 100-TB job's batch
            pass
        return 0, 0, 0, 0, False, None, 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, rates, checks, ok = [], [], [], [], []
        pixels, channels = [], []
        for payload in batch["media"].to_pylist():
            if self.fake:
                w, h, c = self._fake_decode(payload)
                r, good, px, ch = 0, bool(payload), None, 0
            else:
                w, h, r, c, good, px, ch = self._real_decode(payload)
            widths.append(w)
            heights.append(h)
            rates.append(r)
            checks.append(c)
            ok.append(good)
            pixels.append(px)
            channels.append(ch)
        out = (
            batch.append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("height", pa.array(heights, type=pa.int32()))
            .append_column("sample_rate", pa.array(rates, type=pa.int32()))
            .append_column("checksum", pa.array(checks, type=pa.int64()))
            .append_column("decoded_ok", pa.array(ok, type=pa.bool_()))
        )
        if self.emit_pixels:
            out = out.append_column(
                "pixels", pa.array(pixels, type=pa.binary())
            ).append_column("channels", pa.array(channels, type=pa.int32()))
        return out


class ResizeMedia:
    """Resize stage: downscale so max(h, w) <= max_dimension, aspect
    preserved (video/processing.py:163-185 semantics).

    When the batch carries a ``pixels`` raster column
    (``DecodeMedia(emit_pixels=True)``), the PIXELS are really resized
    (nearest-neighbor index striding — no cv2 needed) and the raster is
    replaced; otherwise only the metadata columns transform."""

    def __init__(self, max_dimension: int = 1024) -> None:
        self.max_dimension = max_dimension

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        real = "pixels" in batch.column_names
        px_in = batch["pixels"].to_pylist() if real else None
        ch_in = batch["channels"].to_pylist() if real else None
        rates = (
            batch["sample_rate"].to_pylist()
            if "sample_rate" in batch.column_names
            else [0] * len(ws)
        )
        out_w, out_h, out_px = [], [], []
        for i, (w, h) in enumerate(zip(ws, hs)):
            if rates[i]:  # audio: (n_samples, channels) is not a raster
                out_w.append(w)
                out_h.append(h)
                out_px.append(px_in[i] if real else None)
                continue
            if real and px_in[i] is not None and ch_in[i]:
                arr = np.frombuffer(px_in[i], dtype=np.uint8)
                arr = arr.reshape(h, w, ch_in[i]) if ch_in[i] > 1 else arr.reshape(h, w)
                arr = nearest_resize(arr, self.max_dimension)
                h, w = arr.shape[:2]
                out_px.append(arr.tobytes())
            else:
                m = max(w, h)
                if m > self.max_dimension and m > 0:
                    scale = self.max_dimension / m
                    w, h = max(1, int(w * scale)), max(1, int(h * scale))
                out_px.append(px_in[i] if real else None)
            out_w.append(w)
            out_h.append(h)
        out = batch.set_column(
            batch.schema.get_field_index("width"), "width", pa.array(out_w, pa.int32())
        ).set_column(
            batch.schema.get_field_index("height"), "height", pa.array(out_h, pa.int32())
        )
        if real:
            out = out.set_column(
                out.schema.get_field_index("pixels"), "pixels", pa.array(out_px, pa.binary())
            )
        return out


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
    emit_pixels: bool = False,
    max_dimension: int = 1024,
    batch_size: int = 16,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """decode → resize over small batches (multi-MB binary rows need
    small ``batch_size`` so batch × concurrency fits worker heap)."""
    ds = ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"fake": fake, "emit_pixels": emit_pixels},
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
