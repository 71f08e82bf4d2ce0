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


def test_handbuilt_420_progressive_matches_baseline():
    """24x16 4:2:0 — a shape where the Y component's non-interleaved
    scan grid (3x2 blocks) is SMALLER than its MCU-padded store (4x2):
    progressive AC scans must skip the padding column while the
    interleaved DC scans cover it. Assembled at the bit level twice —
    once baseline, once progressive — from ONE coefficient spec; the
    decodes must be byte-identical, with block means anchored to the
    chosen DC ramp."""
    from ocr_dataset_builder_ray.functions.jpeg_codec import (
        _HAC_L as HAC,
        _HDC_L as HDC,
        _category,
        _emit_ac_first,
        _emit_ac_refine,
    )

    dc_codes = _huff_codes(*HDC)
    ac_codes = _huff_codes(*HAC)
    h, w = 16, 24  # Y: mcu grid 2x1 → store 4x2 blocks, scan grid 3x2

    # coefficient stores in zigzag order, (n_blocks, 64) row-major
    zz_y = np.zeros((8, 64), np.int32)  # bw=4, bh=2
    y_dcs = [17, 48, 81, 112, 145, 176]  # visible blocks, mixed parity
    for r in range(2):
        for c in range(3):
            zz_y[r * 4 + c, 0] = y_dcs[r * 3 + c]
            zz_y[r * 4 + c, 1] = 5 + r * 3 + c  # AC(0,1), values 5..10
    zz_cb = np.zeros((2, 64), np.int32)
    zz_cb[0, 0], zz_cb[0, 1] = 9, 3
    zz_cb[1, 0], zz_cb[1, 1] = -8, -4
    zz_cr = np.zeros((2, 64), np.int32)
    zz_cr[0, 0] = -7  # no AC → all-zero band in AC scans (EOB path)
    zz_cr[1, 0], zz_cr[1, 1] = 6, 5

    def headers(sof_marker, hac):
        out = bytearray(b"\xff\xd8")

        def seg(marker, body):
            out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
            out.extend(body)

        seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # flat quant
        seg(sof_marker, struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
        seg(0xC4, bytes([0x00]) + bytes(HDC[0]) + HDC[1])
        seg(0xC4, bytes([0x10]) + bytes(hac[0]) + hac[1])
        return out, seg

    def mcu_blocks():
        """(store, store_bw, row, col) per block in interleaved order."""
        for mx in range(2):  # mcux=2, mcuy=1
            for by in range(2):
                for bx in range(2):
                    yield 0, zz_y, 4, by, mx * 2 + bx
            yield 1, zz_cb, 2, 0, mx
            yield 2, zz_cr, 2, 0, mx

    def put_dc(wtr, diff):
        t = _category(diff)
        code, ln = dc_codes[t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    # --- baseline stream: one interleaved full-band scan
    base, seg = headers(0xC0, HAC)
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for ci, zz, bw, r, c in mcu_blocks():
        row = zz[r * bw + c]
        put_dc(wtr, int(row[0]) - preds[ci])
        preds[ci] = int(row[0])
        v = int(row[1])
        if v:
            t = _category(v)
            code, ln = ac_codes[t]  # run 0
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << t) - 1, t)
        code, ln = ac_codes[0x00]
        wtr.write(code, ln)  # EOB
    base.extend(wtr.flush())
    base.extend(b"\xff\xd9")

    # --- progressive stream: DC first/refine interleaved + per-comp
    # AC first/refine over the NON-INTERLEAVED grids (Y skips col 3).
    # AC scans need the identity table: the Y refine scan has no
    # newly-significant coefficients, so the whole component is one
    # 6-block EOB run (EOB2 + extra bits — symbols Annex-K lacks).
    prog, seg = headers(0xC2, _IDENTITY_AC)
    id_codes = _huff_codes(*_IDENTITY_AC)
    scans = []  # non-interleaved block rasters per component
    scans.append(zz_y.reshape(2, 4, 64)[:, :3].reshape(-1, 64))  # nbw=3
    scans.append(zz_cb)
    scans.append(zz_cr)

    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))  # DC Al=1
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for ci, zz, bw, r, c in mcu_blocks():
        dc = int(zz[r * bw + c, 0]) >> 1
        put_dc(wtr, dc - preds[ci])
        preds[ci] = dc
    prog.extend(wtr.flush())
    for ci in range(3):  # AC first, Al=1
        seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0x01]))
        wtr = _BitWriter()
        _emit_ac_first(wtr, scans[ci], 1, 63, 1, id_codes)
        prog.extend(wtr.flush())
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))  # DC refine
    wtr = _BitWriter()
    for ci, zz, bw, r, c in mcu_blocks():
        wtr.write(int(zz[r * bw + c, 0]) & 1, 1)
    prog.extend(wtr.flush())
    for ci in range(3):  # AC refine, Ah=1 Al=0
        seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0x10]))
        wtr = _BitWriter()
        _emit_ac_refine(wtr, scans[ci], 1, 63, 0, id_codes)
        prog.extend(wtr.flush())
    prog.extend(b"\xff\xd9")

    img_b = decode_jpeg(bytes(base))
    img_p = decode_jpeg(bytes(prog))
    assert img_b.shape == (16, 24, 3) and (img_b == img_p).all()
    # anchor: visible Y-block means follow the DC ramp (step 31/8 ≈ 3.9
    # levels, far above the ±1-level chroma wobble)
    means = [
        img_b[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8].mean()
        for r in range(2)
        for c in range(3)
    ]
    assert all(b - a > 2 for a, b in zip(means, means[1:]))


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


def test_arbitrary_corruption_only_raises_unsupported():
    """The M5 contract for hostile bytes: truncations and single-byte
    flips anywhere in a stream either decode or raise
    UnsupportedMediaError — never another exception type, never a
    spin (a corrupted DHT symbol used to drive read_bits(n>25) into an
    infinite _fill loop)."""
    import random

    img = np.clip(
        np.kron(np.random.RandomState(3).standard_normal((2, 3, 3)),
                np.ones((8, 8, 1))) * 30 + 128, 0, 255).astype(np.uint8)
    for payload in (encode_jpeg(img), encode_jpeg_progressive(img)):
        rnd = random.Random(1)
        cases = [payload[:c] for c in range(2, len(payload), len(payload) // 40)]
        for _ in range(150):
            i = rnd.randrange(2, len(payload))
            cases.append(
                payload[:i] + bytes([rnd.randrange(256)]) + payload[i + 1:]
            )
        for q in cases:
            try:
                decode_jpeg(q)
            except UnsupportedMediaError:
                pass


def test_oversized_dimensions_rejected():
    """A corrupted SOF claiming huge dims must raise, not allocate a
    multi-GB coefficient store (one poisoned payload must not OOM a
    worker)."""
    img = np.full((8, 8), 90, np.uint8)
    for enc, marker in ((encode_jpeg, b"\xff\xc0"), (encode_jpeg_progressive, b"\xff\xc2")):
        p = enc(img)
        i = p.find(marker)
        huge = p[: i + 5] + b"\xff\xff\xff\xff" + p[i + 9 :]  # h=w=65535
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(huge)


def test_restart_intervals_roundtrip_both_modes():
    """DRI/RSTn paths: restart markers (byte-aligned, DC preds and EOB
    runs reset) must not change decoded pixels in either mode, down to
    the degenerate 1-MCU interval."""
    rng = np.random.RandomState(4)
    img = np.clip(
        rng.standard_normal((40, 56, 3)) * 12 + 128
        + np.kron(rng.standard_normal((5, 7, 3)) * 40, np.ones((8, 8, 1))),
        0,
        255,
    ).astype(np.uint8)
    ref = decode_jpeg(encode_jpeg(img, 85))
    for ri in (1, 3, 9):
        assert (decode_jpeg(encode_jpeg(img, 85, restart_interval=ri)) == ref).all()
        assert (
            decode_jpeg(encode_jpeg_progressive(img, 85, restart_interval=ri))
            == ref
        ).all()
    # sparse gray: EOB runs truncated by restart boundaries
    sp = np.zeros((64, 64), np.uint8)
    sp[5, 9], sp[40, 50] = 255, 200
    refs = decode_jpeg(encode_jpeg(sp, 85))
    for ri in (1, 3, 7):
        assert (
            decode_jpeg(encode_jpeg_progressive(sp, 85, restart_interval=ri))
            == refs
        ).all()
