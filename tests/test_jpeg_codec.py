"""Baseline + progressive JPEG codec tests.

Matched-pair risk (testing my decoder only against my encoder) is
mitigated by external cross-checks: the canonical Huffman code
assignments are asserted against values published in the JPEG spec
(ITU T.81 Annex K commentary — e.g. luminance AC EOB = '1010'), a
4:2:0 stream the encoder cannot produce is assembled by hand at the
bit level and decoded, and the progressive path is pinned to the
baseline path coefficient-for-coefficient: both encoders quantize
identically, so decodes of the same image must be byte-identical."""

import struct

import numpy as np
import pytest

from ocr_dataset_builder_ray.functions.jpeg_codec import (
    _HAC_L,
    _HDC_L,
    _IDENTITY_AC,
    _BitWriter,
    _huff_codes,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from ocr_dataset_builder_ray.functions.media_codecs import UnsupportedMediaError


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_known_huffman_codes_match_spec():
    """Published canonical codes for the Annex-K luminance tables:
    DC category 0 = '00' (2 bits), category 2 = '011' (3 bits);
    AC EOB (0x00) = '1010' (4 bits), ZRL (0xF0) = '11111111001' (11)."""
    dc = _huff_codes(*_HDC_L)
    assert dc[0] == (0b00, 2)
    assert dc[2] == (0b011, 3)
    ac = _huff_codes(*_HAC_L)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)
    assert ac[0x01] == (0b00, 2)


def test_solid_images_roundtrip_exact():
    for shape in [(16, 24), (8, 8, 3), (20, 20, 3)]:
        solid = np.full(shape, 128, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(solid, quality=85))
        assert out.shape == solid.shape
        assert (out == solid).all()


def test_lowfreq_roundtrip_high_psnr():
    rng = np.random.RandomState(0)
    base = rng.standard_normal((8, 12, 3))
    img = np.clip(np.kron(base, np.ones((8, 8, 1))) * 40 + 128, 0, 255).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 45


def test_textured_roundtrip_reasonable_psnr():
    rng = np.random.RandomState(1)
    img = np.clip(
        rng.standard_normal((40, 56)) * 12 + 128
        + np.kron(rng.standard_normal((5, 7)) * 40, np.ones((8, 8))),
        0,
        255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert _psnr(img, dec) > 30


def test_odd_dimensions_pad_and_crop():
    rng = np.random.RandomState(2)
    img = np.clip(
        np.kron(rng.standard_normal((3, 5, 3)), np.ones((8, 8, 1))) * 30 + 110,
        0,
        255,
    ).astype(np.uint8)[:19, :37]
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (19, 37, 3)
    assert _psnr(img, dec) > 40


def test_handbuilt_420_stream_decodes():
    """A 4:2:0 16x16 single-MCU stream the encoder cannot emit,
    assembled at the bit level: 4 Y blocks with distinct DC values + 1
    Cb + 1 Cr (neutral). Decoded output must show the four flat 8x8 Y
    quadrants in the right positions, chroma upsampled to neutral."""
    # quant: all ones so DC value IS the sample offset (x8 from IDCT norm)
    q_flat = bytes([1] * 64)
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + q_flat)
    # SOF0: 16x16, Y(h=v=2, q0), Cb(1,1,q0), Cr(1,1,q0)
    seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    from ocr_dataset_builder_ray.functions.jpeg_codec import _HAC_L, _HDC_L

    seg(0xC4, bytes([0x00]) + bytes(_HDC_L[0]) + _HDC_L[1])
    seg(0xC4, bytes([0x10]) + bytes(_HAC_L[0]) + _HAC_L[1])
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    dc = _huff_codes(*_HDC_L)
    ac = _huff_codes(*_HAC_L)
    wtr = _BitWriter()
    # DC diffs for the 4 Y blocks then Cb, Cr. Sample value ≈ dc/8 + 128
    # (orthonormal IDCT: spatial = DC/8). Use diffs of ±80 → ±10 levels.
    prev = 0
    for target in (80, -80, 160, -160):  # Y quadrant DCs
        diff = target - prev
        prev = target
        t = abs(diff).bit_length()
        code, ln = dc[t]
        wtr.write(code, ln)
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac[0x00]
        wtr.write(code, ln)  # EOB
    for _ in range(2):  # Cb, Cr: DC diff 0
        code, ln = dc[0]
        wtr.write(code, ln)
        code, ln = ac[0x00]
        wtr.write(code, ln)
    out.extend(wtr.flush())
    out.extend(b"\xff\xd9")

    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    # quadrant luminance ordering: 128+10, 128-10, 128+20, 128-20
    quads = [img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:]]
    means = [float(q.mean()) for q in quads]
    assert means[0] > 133 and means[1] < 123
    assert means[2] > 143 and means[3] < 113
    # neutral chroma: R ≈ G ≈ B within rounding
    assert int(np.abs(img[..., 0].astype(int) - img[..., 2].astype(int)).max()) <= 2


def test_unsupported_profiles_raise():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = encode_jpeg(img)
    # SOF2 swapped onto a baseline stream → the full-band Ss=0/Se=63
    # scan header is malformed for progressive and must raise
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # arithmetic-coded (SOF9) stays rejected
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9", 1))
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"not a jpeg at all")


def test_progressive_matches_baseline_exactly():
    """Same quantized coefficients → decoding the progressive stream
    must reproduce the baseline decode bit-for-bit, across gray/RGB,
    odd dimensions, noise (dense AC) and quality levels."""
    rng = np.random.RandomState(7)
    cases = [
        np.full((20, 20, 3), 77, np.uint8),
        np.clip(
            np.kron(rng.standard_normal((8, 12, 3)), np.ones((8, 8, 1))) * 40
            + 128,
            0,
            255,
        ).astype(np.uint8),
        rng.randint(0, 256, (33, 47, 3)).astype(np.uint8),
        np.clip(
            rng.standard_normal((40, 56)) * 12
            + 128
            + np.kron(rng.standard_normal((5, 7)) * 40, np.ones((8, 8))),
            0,
            255,
        ).astype(np.uint8),
    ]
    for q in (50, 90):
        for img in cases:
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert prog.shape == base.shape
            assert (prog == base).all()


def test_progressive_eob_runs_across_blocks():
    """A nearly-empty 64x64 image: one hot pixel among 64 blocks forces
    multi-block EOBn symbols with extra bits (the identity AC table has
    them; Annex-K does not) plus refinement correction bits."""
    img = np.zeros((64, 64), np.uint8)
    img[5, 9] = 255
    payload = encode_jpeg_progressive(img, quality=85)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert (decode_jpeg(payload) == base).all()


def test_progressive_malformed_refine_raises():
    """Corrupting the DC refinement SOS from Ah=1 to Ah=2 (a two-bit
    approximation step, illegal) must raise, not corrupt silently."""
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    sos_dc_refine = b"\xff\xda\x00\x08\x01\x01\x00\x00\x00\x10"
    assert sos_dc_refine in payload
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(payload.replace(sos_dc_refine, sos_dc_refine[:-1] + b"\x20"))


def test_identity_ac_table_is_canonical():
    """255 codes at 9 bits + one at 10: symbol k gets code k, the last
    code 0b0111111110 is not the reserved all-ones pattern."""
    codes = _huff_codes(*_IDENTITY_AC)
    assert codes[0x00] == (0, 9)
    assert codes[0xFE] == (254, 9)
    assert codes[0xFF] == (0b0111111110, 10)


def test_decode_media_integration(ray_session):
    """JPEG payloads flow through DecodeMedia(fake=False): sniffed,
    decoded, checksummed, resized — the last payload format unlocked."""
    import pyarrow as pa
    import ray.data

    from ocr_dataset_builder_ray.functions.media_codecs import sniff_media_format
    from ocr_dataset_builder_ray.stages.multimodal import decode_pipeline

    rng = np.random.RandomState(5)
    img = np.clip(
        np.kron(rng.standard_normal((4, 3, 3)), np.ones((8, 8, 1))) * 30 + 128,
        0,
        255,
    ).astype(np.uint8)
    payload = encode_jpeg(img, quality=90)
    assert sniff_media_format(payload) == "jpeg"
    ds = ray.data.from_arrow(
        pa.table(
            {"media_id": ["j0"], "media": [payload], "media_type": ["image"]}
        )
    )
    row = decode_pipeline(ds, fake=False, emit_pixels=True, max_dimension=8).to_pandas().iloc[0]
    assert bool(row["decoded_ok"])
    assert max(row["width"], row["height"]) <= 8
