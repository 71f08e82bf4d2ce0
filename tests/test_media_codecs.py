"""Library-free real media decode: netpbm/BMP/WAV codecs, cross-format
checksum identity, real pixel resize through the Ray stage pipeline."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ocr_dataset_builder_ray.functions.media_codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_pgm,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    nearest_resize,
    sniff_media_format,
)
from ocr_dataset_builder_ray.stages.multimodal import DecodeMedia, decode_pipeline


def _img(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    arr = _img(17, 23)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_ppm_header_comments():
    arr = _img(2, 3)
    payload = b"P6\n# a comment\n3 2\n# another\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(payload), arr)


def test_bmp_roundtrip_padded_rows():
    # width 3 -> 9-byte rows padded to 12: exercises stride handling
    arr = _img(5, 3, seed=1)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_bmp_rejects_compressed():
    bad = bytearray(encode_bmp(_img(4, 4)))
    bad[30] = 1  # BI_RLE8
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(bytes(bad))


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 20, 800))[:, None] * 3000).astype("<i2")
    stereo = np.hstack([samples, -samples])
    arr, rate = decode_wav(encode_wav(stereo, 16000))
    assert rate == 16000
    assert np.array_equal(arr, stereo)


def test_pgm_decode():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5\n4 3\n255\n" + gray.tobytes()
    assert np.array_equal(decode_pgm(payload), gray)


def test_sniff():
    assert sniff_media_format(encode_ppm(_img(2, 2))) == "ppm"
    assert sniff_media_format(encode_bmp(_img(2, 2))) == "bmp"
    assert sniff_media_format(encode_wav(np.zeros((4, 1), "<i2"), 8000)) == "wav"
    assert sniff_media_format(b"\x89PNG") is None
    assert sniff_media_format(b"") is None


def test_nearest_resize_semantics():
    arr = _img(100, 200)
    out = nearest_resize(arr, 50)
    assert out.shape == (25, 50, 3)  # aspect preserved
    assert np.array_equal(out[0, 0], arr[0, 0])  # corner pixel survives
    small = _img(10, 20)
    assert nearest_resize(small, 50) is small  # no-op passthrough


def test_same_image_ppm_bmp_checksum_identical():
    """Checksum is over DECODED pixels: the same image stored in two
    formats must checksum identically."""
    arr = _img(8, 8, seed=3)
    stage = DecodeMedia(fake=False)
    out = stage(
        pa.table(
            {"media": pa.array([encode_ppm(arr), encode_bmp(arr)], pa.binary())}
        )
    )
    checks = out["checksum"].to_pylist()
    assert out["decoded_ok"].to_pylist() == [True, True]
    assert checks[0] == checks[1]
    assert out["width"].to_pylist() == [8, 8]


def test_real_decode_resize_pipeline(ray_session):
    """End-to-end through the actor-pool stages: real decode with pixel
    passthrough, real nearest-neighbor downscale, audio + corrupt rows
    riding along."""
    rows = [
        {"media_id": "big", "media": encode_ppm(_img(200, 400, seed=5)), "media_type": "image"},
        {"media_id": "small", "media": encode_bmp(_img(30, 40, seed=6)), "media_type": "image"},
        {"media_id": "song", "media": encode_wav(np.zeros((1600, 2), "<i2"), 8000), "media_type": "audio"},
        {"media_id": "junk", "media": b"not media", "media_type": "image"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = (
        decode_pipeline(ds, fake=False, emit_pixels=True, max_dimension=100)
        .to_pandas()
        .set_index("media_id")
    )
    assert out.loc["big", "decoded_ok"] and (out.loc["big", "width"], out.loc["big", "height"]) == (100, 50)
    # really resized: raster byte count matches the new dims
    assert len(out.loc["big", "pixels"]) == 100 * 50 * 3
    assert (out.loc["small", "width"], out.loc["small", "height"]) == (40, 30)  # untouched
    assert out.loc["song", "sample_rate"] == 8000
    assert (out.loc["song", "width"], out.loc["song", "height"]) == (1600, 2)
    assert not out.loc["junk", "decoded_ok"]


def test_simple_decoders_arbitrary_corruption_only_raises_unsupported():
    """Same M5 contract as the PNG/JPEG/PDF fuzz pins: truncations and
    byte flips through ppm/pgm/bmp/wav either decode or raise
    UnsupportedMediaError — never int()/struct/reshape exceptions."""
    import random

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    wav = encode_wav(
        (rng.standard_normal(2000) * 8000).astype(np.int16).reshape(-1, 2),
        16000,
    )
    payloads = [
        (encode_ppm(img), decode_ppm),
        (b"P5\n17 13\n255\n" + img[..., 0].tobytes(), decode_pgm),
        (encode_bmp(img), decode_bmp),
        (wav, decode_wav),
    ]
    rnd = random.Random(4)
    for p, dec in payloads:
        cases = [p[:c] for c in range(2, len(p), max(1, len(p) // 40))]
        for _ in range(150):
            i = rnd.randrange(2, len(p))
            cases.append(p[:i] + bytes([rnd.randrange(256)]) + p[i + 1:])
        for q in cases:
            try:
                dec(q)
            except UnsupportedMediaError:
                pass
