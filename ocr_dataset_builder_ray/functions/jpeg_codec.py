"""Pure-Python/numpy baseline JPEG codec (decode + minimal encode).

Closes the last library-gated payload format (the reference's frames
are written as ``.jpg``/``.png``, video/processing.py:223-245): no DCT
library exists in this container, but baseline sequential JPEG needs
only a Huffman bit-reader (Python), an 8x8 IDCT (one numpy matmul
pair), and YCbCr color conversion.

Supported decode profile — everything else raises
``UnsupportedMediaError`` (soft-failed per M5 by the decode stage):

* baseline sequential DCT (SOF0), 8-bit precision;
* progressive DCT (SOF2): spectral selection, successive
  approximation, EOB runs, all four scan kinds (DC/AC x
  first/refine), interleaved and non-interleaved scans;
* grayscale or YCbCr with 4:4:4, 4:2:2, 4:2:0 sampling;
* restart intervals (DRI / RSTn) and byte stuffing;
* arithmetic coding, lossless/hierarchical, 12-bit, CMYK rejected.

The encoders (``encode_jpeg`` baseline, ``encode_jpeg_progressive``)
are minimal writers — 4:4:4, Annex-K quantization tables scaled by
``quality`` — used by tests and corpus generators. JPEG is lossy, so
round-trip tests assert PSNR bounds (plus exactness on solid images,
where every AC coefficient is zero and DC survives quantization);
the two encoders quantize identically, so baseline and progressive
decodes of the same image must be byte-identical.

Performance is honest-costed: entropy decoding is a per-bit Python
loop (~1-2 MB/s of compressed data); the IDCT and color transform are
vectorized over all blocks at once. Real deployments would swap in a
C codec behind the same ``decode_jpeg`` seam; the Ray-side plumbing
(schema, batch sizing, actor signature) is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import UnsupportedMediaError

# zigzag order: index i of the scan -> (row, col) flat index
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II basis: A[k, n] = c(k) cos((2n+1) k pi / 16) / 2
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    _A[_k] = _c * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples."""
    return _A.T @ blocks @ _A


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return _A @ blocks @ _A.T


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with FF00
    byte-unstuffing and RSTn awareness."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bits = (self.bits << 8) | 0xFF  # pad past EOI
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                else:
                    # any real marker (RSTn, EOI, or the next scan's
                    # DHT/SOS in a progressive file) ends this scan's
                    # data: stop filling, pad with 1s, leave pos on it
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 25:
            # legit reads are <= 16 bits (magnitude/EOBn extras); a
            # larger n comes from a corrupted Huffman symbol and would
            # spin _fill() forever (it stops adding bits past 25)
            raise UnsupportedMediaError(f"oversized bit-field read ({n})")
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bits >> self.nbits) & ((1 << n) - 1)

    def align_restart(self) -> None:
        """Discard partial byte and consume an RSTn marker."""
        self.nbits = 0
        self.bits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise UnsupportedMediaError("missing restart marker")


class _Huffman:
    """Canonical JPEG Huffman table: decode one symbol from the reader."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        # min/max code per length (JPEG F.2.2.3 DECODE procedure)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if counts[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += counts[length - 1]
                k += counts[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.symbols = symbols

    def decode(self, r: _BitReader) -> int:
        code = r.read_bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | r.read_bit()
            length += 1
            if length > 16:
                raise UnsupportedMediaError("bad Huffman code in scan")
        return self.symbols[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 EXTEND: t-bit magnitude v → signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# decoded-image size cap: bounds decoder memory/work against crafted
# or corrupted dimension fields (a 100-TB run must survive any payload)
_MAX_PIXELS = 1 << 26  # 67M pixels ≈ 8192x8192


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → uint8 (h, w) grayscale or (h, w, 3) RGB.

    Never raises anything but ``UnsupportedMediaError``: corrupted
    streams that trip a parser edge (bad table sizes, truncated
    segments, zero sampling factors, ...) are converted, so the M5
    soft-fail contract holds for arbitrary bytes."""
    try:
        return _decode_jpeg(payload)
    except UnsupportedMediaError:
        raise
    except Exception as e:
        raise UnsupportedMediaError(
            f"malformed JPEG ({type(e).__name__})"
        ) from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    restart_interval = 0
    frame = None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise UnsupportedMediaError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                symbols = seg[i + 17 : i + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(counts, symbols)
                i += 17 + total
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise UnsupportedMediaError(f"{precision}-bit JPEG")
            h, w = struct.unpack_from(">HH", seg, 1)
            if h == 0 or w == 0 or h * w > _MAX_PIXELS:
                raise UnsupportedMediaError(f"JPEG dimensions {w}x{h} out of profile")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise UnsupportedMediaError(f"{ncomp}-component JPEG (CMYK?)")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise UnsupportedMediaError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/lossless/hierarchical)"
                " not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedMediaError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tables >> 4, tables & 0xF)
            if not frame["progressive"]:
                return _decode_scan(
                    payload, pos + 2 + seglen, frame, sel, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + 2 + seglen, frame, sel, huff_dc, huff_ac,
                restart_interval, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue  # pos now sits on the next marker
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and "coef" in frame["comps"][0]:
        return _assemble_image(frame, qt)
    raise UnsupportedMediaError("no scan data found")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # per component: coefficient store sized to the MCU grid
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
        dc_id, ac_id = sel[c["id"]]
        c["hdc"], c["hac"] = huff_dc[dc_id], huff_ac[ac_id]

    r = _BitReader(data, pos)
    mcu = 0
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block = np.zeros(64, dtype=np.int32)
                    t = c["hdc"].decode(r)
                    diff = _extend(r.read_bits(t), t)
                    c["pred"] += diff
                    block[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = c["hac"].decode(r)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise UnsupportedMediaError("AC index overflow")
                        block[_ZIGZAG[k]] = _extend(r.read_bits(size), size)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = block
        mcu += 1

    return _assemble_image(frame, qt)


def _assemble_image(frame, qt) -> np.ndarray:
    """Dequantize each component's coefficient store, IDCT, upsample to
    the MCU grid, crop, and color-convert. Shared by the baseline and
    progressive paths."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt[c["tq"]].reshape(64).astype(np.int32)
        blocks = (c["coef"] * q).reshape(-1, 8, 8).astype(np.float64)
        spatial = _idct2(blocks) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive (SOF2) scan decoding ---------------------------------------


def _ensure_coef_stores(frame) -> None:
    """Size per-component coefficient stores to the MCU grid once; they
    accumulate across the frame's scans."""
    if "coef" in frame["comps"][0]:
        return
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        # non-interleaved scan grid: the component's OWN sample extent
        c["nbw"] = -(-(frame["w"] * c["h"]) // (8 * hmax))
        c["nbh"] = -(-(frame["h"] * c["v"]) // (8 * vmax))


def _first_ac(r, block, hac, ss, se, al, eobrun) -> int:
    """AC first scan (Ah=0) for one block; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = hac.decode(r)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.read_bits(run)
            break
        k += run
        if k > se:
            raise UnsupportedMediaError("AC index overflow")
        block[_ZIGZAG[k]] = _extend(r.read_bits(size), size) << al
        k += 1
    return eobrun


def _refine_ac(r, block, hac, ss, se, al, eobrun) -> int:
    """AC refinement scan (Ah=Al+1) for one block: one more magnitude
    bit for already-nonzero coefficients, new +-1<<Al significances
    elsewhere (ITU T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = hac.decode(r)
            run, size = rs >> 4, rs & 0xF
            val = 0
            if size:
                if size != 1:
                    raise UnsupportedMediaError("bad AC-refine magnitude")
                val = p1 if r.read_bit() else m1
            elif run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += r.read_bits(run)
                break
            # advance over `run` zero-history coefficients, emitting a
            # correction bit for every nonzero-history one passed
            while k <= se:
                z = _ZIGZAG[k]
                if block[z] != 0:
                    if r.read_bit() and not (block[z] & p1):
                        block[z] += p1 if block[z] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                block[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        # rest of the band: correction bits only
        while k <= se:
            z = _ZIGZAG[k]
            if block[z] != 0:
                if r.read_bit() and not (block[z] & p1):
                    block[z] += p1 if block[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, sel, huff_dc, huff_ac, restart_interval, ss, se, ah, al
) -> int:
    """Decode ONE progressive scan into the frame's coefficient stores;
    returns the byte offset of the next marker."""
    if (ss == 0) != (se == 0) or se > 63 or (ah and ah != al + 1) or al > 13:
        raise UnsupportedMediaError(
            f"malformed progressive scan header Ss={ss} Se={se} Ah={ah} Al={al}"
        )
    _ensure_coef_stores(frame)
    comps = [c for c in frame["comps"] if c["id"] in sel]
    for c in comps:
        dc_id, ac_id = sel[c["id"]]
        if ss == 0 and ah == 0:
            c["hdc"] = huff_dc[dc_id]
        if ss > 0:
            c["hac"] = huff_ac[ac_id]
        c["pred"] = 0
    if ss > 0 and (len(comps) != 1 or se < ss):
        raise UnsupportedMediaError("malformed progressive AC scan")
    r = _BitReader(data, pos)
    eobrun = 0

    def _restart() -> None:
        nonlocal eobrun
        r.align_restart()
        eobrun = 0
        for c in comps:
            c["pred"] = 0

    if len(comps) > 1:  # interleaved (DC scans only)
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        n_mcu = mcux * mcuy
        for mcu in range(n_mcu):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _restart()
            my, mx = divmod(mcu, mcux)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        block = c["coef"][row * c["bw"] + col]
                        if ah == 0:
                            t = c["hdc"].decode(r)
                            c["pred"] += _extend(r.read_bits(t), t)
                            block[0] = c["pred"] << al
                        else:
                            block[0] |= r.read_bit() << al
    else:  # single component: raster over its own block grid
        c = comps[0]
        nb = c["nbh"] * c["nbw"]
        for i in range(nb):
            if restart_interval and i and i % restart_interval == 0:
                _restart()
            row, col = divmod(i, c["nbw"])
            block = c["coef"][row * c["bw"] + col]
            if ss == 0:
                if ah == 0:
                    t = c["hdc"].decode(r)
                    c["pred"] += _extend(r.read_bits(t), t)
                    block[0] = c["pred"] << al
                else:
                    block[0] |= r.read_bit() << al
            elif ah == 0:
                eobrun = _first_ac(r, block, c["hac"], ss, se, al, eobrun)
            else:
                eobrun = _refine_ac(r, block, c["hac"], ss, se, al, eobrun)

    # skip any padding to the next marker (not a stuffed FF00 / RSTn)
    p = r.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


# --- minimal baseline encoder (tests / corpus generation) -------------------

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (counts per length 1..16, symbols)
_HDC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          bytes(range(12)))
_HDC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          bytes(range(12)))
_HAC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_HAC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _huff_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """→ {symbol: (code, length)} for canonical tables."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align with 1-padding and emit an RSTn marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out.extend((0xFF, 0xD0 + (n & 7)))


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32).reshape(8, 8)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_blocks(wtr, blocks, q, dc_codes, ac_codes, pred):
    """blocks: (n, 8, 8) level-shifted samples; returns new DC pred."""
    coefs = np.round(_dct2(blocks) / q).astype(np.int32).reshape(-1, 64)
    zz = coefs[:, _ZIGZAG]
    for row in zz:
        dc = int(row[0])
        diff = dc - pred
        pred = dc
        t = _category(diff)
        code, length = dc_codes[t]
        wtr.write(code, length)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        # AC run-length
        run = 0
        last_nz = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                wtr.write(code, length)
                run -= 16
            t = _category(v)
            code, length = ac_codes[(run << 4) | t]
            wtr.write(code, length)
            wtr.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            wtr.write(code, length)
    return pred


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """One sample plane → (n, 8, 8) level-shifted blocks, edge-padded."""
    ph = -(-plane.shape[0] // 8) * 8
    pw = -(-plane.shape[1] // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[: plane.shape[0], : plane.shape[1]] = plane
    padded[plane.shape[0] :, : plane.shape[1]] = plane[-1:]
    padded[:, plane.shape[1] :] = padded[:, plane.shape[1] - 1 : plane.shape[1]]
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0


def _split_planes(arr: np.ndarray, ql: np.ndarray, qc: np.ndarray):
    """uint8 gray/RGB → [(blocks, qtable), ...] per component (4:4:4)."""
    if arr.ndim == 2:
        return [(_plane_blocks(arr.astype(np.float64)), ql)]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    return [(_plane_blocks(y), ql), (_plane_blocks(cb), qc), (_plane_blocks(cr), qc)]


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JPEG (4:4:4).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    planes = _split_planes(arr, ql, qc)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zzl = np.empty(64, dtype=np.uint8)
    zzl[np.arange(64)] = ql.reshape(64)[_ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(zzl))
    if not gray:
        zzc = np.empty(64, dtype=np.uint8)
        zzc[np.arange(64)] = qc.reshape(64)[_ZIGZAG]
        seg(0xDB, bytes([0x01]) + bytes(zzc))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(0xC0, sof)
    for tc_th, (counts, symbols) in (
        ((0x00, _HDC_L), (0x10, _HAC_L)) if gray
        else ((0x00, _HDC_L), (0x10, _HAC_L), (0x01, _HDC_C), (0x11, _HAC_C))
    ):
        seg(0xC4, bytes([tc_th]) + bytes(counts) + symbols)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    wtr = _BitWriter()
    # 4:4:4 → MCU = one block per component, interleaved
    nblk = planes[0][0].shape[0]
    preds = [0] * len(planes)
    dc_tabs = [_huff_codes(*_HDC_L)] + [_huff_codes(*_HDC_C)] * (len(planes) - 1)
    ac_tabs = [_huff_codes(*_HAC_L)] + [_huff_codes(*_HAC_C)] * (len(planes) - 1)
    for b in range(nblk):
        if restart_interval and b and b % restart_interval == 0:
            wtr.restart(b // restart_interval - 1)
            preds = [0] * len(planes)
        for ci, (blocks, q) in enumerate(planes):
            preds[ci] = _encode_blocks(
                wtr, blocks[b : b + 1], q, dc_tabs[ci], ac_tabs[ci], preds[ci]
            )
    out.extend(wtr.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- minimal progressive encoder (tests / corpus generation) -----------------

# "identity" AC Huffman table: every byte symbol gets a code (255 at 9
# bits + one at 10), so the encoder can emit EOBn run symbols (0x10..
# 0xE0) that the Annex-K baseline tables lack. Canonical and legal
# (last code 0b1111111110 is not all-ones).
_IDENTITY_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    bytes(range(256)),
)


def _emit_dc_first(wtr, zzs, dc_tabs, al, restart_interval=0) -> None:
    """Interleaved DC first scan (Ah=0): diff-code dc >> al (arithmetic
    shift per T.81 G.1.2.1). 4:4:4 → one block per component per MCU."""
    preds = [0] * len(zzs)
    for b in range(zzs[0].shape[0]):
        if restart_interval and b and b % restart_interval == 0:
            wtr.restart(b // restart_interval - 1)
            preds = [0] * len(zzs)
        for ci, zz in enumerate(zzs):
            dc = int(zz[b, 0]) >> al
            diff = dc - preds[ci]
            preds[ci] = dc
            t = _category(diff)
            code, ln = dc_tabs[ci][t]
            wtr.write(code, ln)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(wtr, zzs, al, restart_interval=0) -> None:
    """Interleaved DC refinement scan (Ah=Al+1): raw bit al of each DC."""
    for b in range(zzs[0].shape[0]):
        if restart_interval and b and b % restart_interval == 0:
            wtr.restart(b // restart_interval - 1)
        for zz in zzs:
            wtr.write((int(zz[b, 0]) >> al) & 1, 1)


def _emit_ac_first(wtr, zz, ss, se, al, ac_codes, restart_interval=0) -> None:
    """Single-component AC first scan (Ah=0) with cross-block EOB runs.
    Point transform truncates toward zero (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(eobrun - (1 << r), r)
        eobrun = 0

    for b, row in enumerate(zz):
        if restart_interval and b and b % restart_interval == 0:
            flush_eob()
            wtr.restart(b // restart_interval - 1)
        band = row[ss : se + 1]
        vals = np.sign(band) * (np.abs(band) >> al)
        nzi = np.nonzero(vals)[0]
        if len(nzi) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(nzi[-1] + 1):
            v = int(vals[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                run -= 16
            t = _category(v)
            code, ln = ac_codes[(run << 4) | t]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if nzi[-1] < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(wtr, zz, ss, se, al, ac_codes, restart_interval=0) -> None:
    """Single-component AC refinement scan (Ah=Al+1), mirroring libjpeg
    encode_mcu_AC_refine: correction bits for already-nonzero history
    buffer until the next symbol (or ride the pending EOB run), runs
    count only zero-history coefficients, trailing ZRLs fold into EOB."""
    eobrun = 0
    be_bits: list[int] = []  # corrections owned by the pending EOB run

    def flush_eob() -> None:
        nonlocal eobrun, be_bits
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(eobrun - (1 << r), r)
        for b in be_bits:
            wtr.write(b, 1)
        eobrun = 0
        be_bits = []

    for b, row in enumerate(zz):
        if restart_interval and b and b % restart_interval == 0:
            flush_eob()
            wtr.restart(b // restart_interval - 1)
        band = row[ss : se + 1]
        absv = np.abs(band)
        t = absv >> al
        newly = np.nonzero(t == 1)[0]
        eob_idx = int(newly[-1]) if len(newly) else -1
        run = 0
        bitbuf: list[int] = []
        for i in range(len(band)):
            ti = int(t[i])
            if ti == 0:
                run += 1
                continue
            while run > 15 and i <= eob_idx:
                flush_eob()
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                run -= 16
                for b in bitbuf:
                    wtr.write(b, 1)
                bitbuf = []
            if ti > 1:  # already significant: buffer one correction bit
                bitbuf.append(ti & 1)
                continue
            flush_eob()
            code, ln = ac_codes[(run << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if int(band[i]) > 0 else 0, 1)
            for b in bitbuf:
                wtr.write(b, 1)
            bitbuf = []
            run = 0
        if run > 0 or bitbuf:
            eobrun += 1
            be_bits.extend(bitbuf)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → progressive (SOF2) JPEG,
    4:4:4, two AC bands (1-5, 6-63) x 1-bit successive approximation:
    DC first (Al=1) → AC firsts (Al=1) → DC refine → AC refines. Emits
    every decoder scan kind including EOBn runs, ZRL and buffered
    correction bits; ``restart_interval`` > 0 adds DRI + RSTn markers
    (EOB runs never cross a restart). Quantizes identically to
    ``encode_jpeg``, so decoding both streams of one image yields
    identical pixels."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    planes = _split_planes(arr, ql, qc)
    zzs = []
    for blocks, q in planes:
        coefs = np.round(_dct2(blocks) / q).astype(np.int32).reshape(-1, 64)
        zzs.append(coefs[:, _ZIGZAG])
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zzl = np.empty(64, dtype=np.uint8)
    zzl[np.arange(64)] = ql.reshape(64)[_ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(zzl))
    if not gray:
        zzc = np.empty(64, dtype=np.uint8)
        zzc[np.arange(64)] = qc.reshape(64)[_ZIGZAG]
        seg(0xDB, bytes([0x01]) + bytes(zzc))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    seg(0xC2, sof)  # SOF2
    seg(0xC4, bytes([0x00]) + bytes(_HDC_L[0]) + _HDC_L[1])
    if not gray:
        seg(0xC4, bytes([0x01]) + bytes(_HDC_C[0]) + _HDC_C[1])
    seg(0xC4, bytes([0x10]) + bytes(_IDENTITY_AC[0]) + _IDENTITY_AC[1])

    dc_tabs = [_huff_codes(*_HDC_L)] + [_huff_codes(*_HDC_C)] * (ncomp - 1)
    ac_codes = _huff_codes(*_IDENTITY_AC)
    all_ids = list(range(1, ncomp + 1))
    dc_tables = [0x00] + [0x10] * (ncomp - 1)  # (dc_id<<4)|ac_id

    def sos(cids, tables, ss, se, ah, al) -> None:
        body = bytes([len(cids)])
        for cid, tb in zip(cids, tables):
            body += bytes([cid, tb])
        seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def scan(emit, *args) -> None:
        wtr = _BitWriter()
        emit(wtr, *args)
        out.extend(wtr.flush())

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    bands = ((1, 5), (6, 63))
    sos(all_ids, dc_tables, 0, 0, 0, 1)
    scan(_emit_dc_first, zzs, dc_tabs, 1, restart_interval)
    for ci in range(ncomp):
        for ss, se in bands:
            sos([ci + 1], [0x00], ss, se, 0, 1)
            scan(_emit_ac_first, zzs[ci], ss, se, 1, ac_codes, restart_interval)
    sos(all_ids, dc_tables, 0, 0, 1, 0)
    scan(_emit_dc_refine, zzs, 0, restart_interval)
    for ci in range(ncomp):
        for ss, se in bands:
            sos([ci + 1], [0x00], ss, se, 1, 0)
            scan(_emit_ac_refine, zzs[ci], ss, se, 0, ac_codes, restart_interval)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
