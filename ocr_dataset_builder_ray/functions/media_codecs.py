"""Pure-numpy/stdlib media codecs — the library-free real-decode path.

The reference decodes real video frames with OpenCV
(/root/reference/ocr_dataset_builder/video/processing.py:99-147) and
resizes them (163-185). No image/audio library exists in this
container, but several standard formats decode with nothing beyond
numpy and the stdlib:

* netpbm P6 (binary RGB) / P5 (binary grayscale) — header + raw bytes;
* BMP (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB) — fixed
  headers + 4-byte-padded bottom-up rows;
* WAV (PCM) — stdlib ``wave``;
* PNG (8-bit non-interlaced; DEFLATE via stdlib ``zlib`` + numpy
  unfilter) — ``png_codec.py``;
* baseline + progressive JPEG (SOF0/SOF2, 4:4:4/4:2:2/4:2:0; Python
  Huffman + numpy IDCT) — ``jpeg_codec.py``. PNG/JPEG are the
  reference's actual frame formats (video/processing.py:223-245).

These back ``DecodeMedia(fake=False)``: a *real* decode → resize path
for real payloads; out-of-profile payloads (arithmetic-coded JPEG,
16-bit PNG, unknown containers) still fail soft per M5 (flagged rows,
never a raise).
"""

from __future__ import annotations

import io
import struct

import numpy as np


class UnsupportedMediaError(ValueError):
    """Payload is not a format the library-free codecs can decode."""


def _soft(fn):
    """Decoder contract: arbitrary bytes raise UnsupportedMediaError,
    never another exception type — corrupted headers tripping a parser
    edge (int() of junk tokens, short struct reads, bad reshapes) are
    converted so M5 soft-fail holds for hostile payloads."""
    import functools

    @functools.wraps(fn)
    def wrapper(payload):
        try:
            return fn(payload)
        except UnsupportedMediaError:
            raise
        except Exception as e:
            raise UnsupportedMediaError(
                f"malformed {fn.__name__.removeprefix('decode_')}"
                f" ({type(e).__name__})"
            ) from e

    return wrapper


def sniff_media_format(payload: bytes) -> str | None:
    """'png' | 'jpeg' | 'ppm' | 'pgm' | 'bmp' | 'wav' | None (unknown)."""
    if not payload:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# --- netpbm ---------------------------------------------------------------


def _pnm_header(payload: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse whitespace/comment-separated header ints after the magic;
    returns (fields, offset_of_raster)."""
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < n_fields:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":  # comment to EOL
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise UnsupportedMediaError("truncated netpbm header")
        fields.append(int(payload[i:j]))
        i = j
    return fields, i + 1  # single whitespace byte separates header/raster


@_soft
def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary RGB → uint8 array (h, w, 3)."""
    if payload[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 ppm")
    (w, h, maxval), off = _pnm_header(payload, 3)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit ppm not supported")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) < need:
        raise UnsupportedMediaError("truncated ppm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


@_soft
def decode_pgm(payload: bytes) -> np.ndarray:
    """P5 binary grayscale → uint8 array (h, w)."""
    if payload[:2] != b"P5":
        raise UnsupportedMediaError("not a P5 pgm")
    (w, h, maxval), off = _pnm_header(payload, 3)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit pgm not supported")
    need = w * h
    raster = payload[off : off + need]
    if len(raster) < need:
        raise UnsupportedMediaError("truncated pgm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → P6 bytes (test/corpus generator)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


# --- BMP ------------------------------------------------------------------


@_soft
def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → uint8 RGB array (h, w, 3)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("pre-BITMAPINFOHEADER BMP")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    raster = payload[data_off : data_off + need]
    if len(raster) < need:
        raise UnsupportedMediaError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → 24-bit bottom-up BMP bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raster = rows.tobytes()
    file_size = 54 + len(raster)
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


# --- WAV ------------------------------------------------------------------


@_soft
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16/uint8 array (n_samples, channels), sample_rate)."""
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as f:
            rate = f.getframerate()
            channels = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError) as e:
        raise UnsupportedMediaError(f"bad wav: {e}") from e
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        arr = np.frombuffer(frames, dtype=np.uint8)
    else:
        raise UnsupportedMediaError(f"unsupported sample width {width}")
    return arr.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n, channels) → PCM WAV bytes."""
    import wave

    buf = io.BytesIO()
    arr = np.ascontiguousarray(samples, dtype="<i2")
    with wave.open(buf, "wb") as f:
        f.setnchannels(arr.shape[1] if arr.ndim == 2 else 1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(arr.tobytes())
    return buf.getvalue()


# --- resize ----------------------------------------------------------------


def nearest_resize(arr: np.ndarray, max_dimension: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale so max(h, w) <=
    max_dimension (reference video/processing.py:163-185 semantics,
    index-striding instead of cv2.resize). No-op when already small."""
    h, w = arr.shape[:2]
    m = max(h, w)
    if m <= max_dimension or m == 0:
        return arr
    scale = max_dimension / m
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yi][:, xi]
