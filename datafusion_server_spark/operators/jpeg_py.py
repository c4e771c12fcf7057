"""Pure-stdlib baseline JPEG decode (JFIF / ITU-T T.81 sequential DCT,
SOF0) — closes the last image-format gap in the multimodal decode stage
(reference ingests media as opaque binaries; the decode parity target is
real pixel statistics without external imaging libraries).

Implemented straight from the public spec:

- marker segment parse: DQT (quantization tables), DHT (huffman tables),
  SOF0 (frame: dims, components, sampling factors), SOS (scan), DRI
  (restart interval);
- entropy decode: canonical huffman per T.81 Annex C (code lengths ->
  codes in order), DC prediction per component, AC run-length/ZRL/EOB,
  byte-stuffing (FF 00) and restart-marker handling;
- block reconstruction: dequantize, de-zigzag, separable 8x8 float IDCT,
  +128 level shift, clamp;
- layout: generic MCU interleave for any sampling factors (4:4:4, 4:2:0,
  4:2:2, grayscale); chroma upsampling by nearest-neighbor replication;
- color: YCbCr -> RGB (JFIF full-range) for 3-component frames.

Progressive (SOF2), arithmetic coding, and 12-bit precision are out of
scope and reported as undecodable ({}), never as wrong values.

``encode_baseline_grayscale`` is the symmetric minimal encoder (forward
DCT, flat quant, the T.81 Annex K example huffman tables) so tests can
build REAL spec-valid JPEGs without any third-party library.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 example huffman tables (the de-facto standard tables):
# (bits[1..16], values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


class JpegError(ValueError):
    pass


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """T.81 Annex C canonical code assignment -> {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker. ``restart()`` skips to the next RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("truncated entropy data")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise JpegError("hit restart marker mid-symbol")
            else:
                raise JpegError("hit segment marker mid-symbol")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Align to byte boundary and consume the expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("missing restart marker")


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: n-bit magnitude -> signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _idct_2d(block: list[float]) -> list[float]:
    """Separable 8x8 inverse DCT (T.81 A.3.3), float reference shape."""
    tmp = [0.0] * 64
    for y in range(8):
        row = block[8 * y : 8 * y + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _IDCT_COS[x][u]
            tmp[8 * y + x] = s / 2
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[8 * y + x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * col[v] * _IDCT_COS[y][v]
            out[8 * y + x] = s / 2
    return out


def decode_baseline(data: bytes) -> tuple[int, int, list[list[int]]]:
    """Baseline JPEG bytes -> (width, height, channel planes).

    Planes are full-resolution (chroma replicated), one flat
    ``width*height`` list per channel: [Y] for grayscale, [R, G, B] for
    3-component frames. Raises JpegError for non-baseline streams.
    """
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    quant[tq] = list(seg[p : p + 64])
                    p += 64
                else:  # 16-bit table
                    quant[tq] = [
                        struct.unpack_from(">H", seg, p + 2 * i)[0] for i in range(64)
                    ]
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                count = sum(bits)
                vals = list(seg[p + 17 : p + 17 + count])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + count
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                data, pos + 2 + seg_len, frame, quant, huff, scan_sel,
                restart_interval,
            )
        pos += 2 + seg_len
    raise JpegError("no scan data found")


def _decode_scan(data, pos, frame, quant, huff, scan_sel, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(scan_sel) != len(comps):
        raise JpegError("multi-scan streams unsupported (progressive?)")
    if any(not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) for c in comps):
        raise JpegError("invalid sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row incl. MCU padding
        c["bh"] = mcus_y * c["v"]
        c["plane"] = [0.0] * (c["bw"] * 8 * c["bh"] * 8)
        sel = next((s for s in scan_sel if s[0] == c["id"]), None)
        if sel is None:
            raise JpegError(f"scan selects unknown component id {c['id']}")
        c["dc_t"] = huff.get((0, sel[1]))
        c["ac_t"] = huff.get((1, sel[2]))
        if c["dc_t"] is None or c["ac_t"] is None:
            raise JpegError("missing huffman table")
        if c["tq"] not in quant:
            raise JpegError("missing quant table")
        c["pred"] = 0
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = [0.0] * 64
                        t = _decode_huffman(reader, c["dc_t"])
                        diff = _extend(reader.receive(t), t)
                        c["pred"] += diff
                        coeffs[0] = c["pred"] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(reader, c["ac_t"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index overflow")
                            coeffs[ZIGZAG[k]] = _extend(reader.receive(s), s) * q[k]
                            k += 1
                        px = _idct_2d(coeffs)
                        row0 = (my * c["v"] + by) * 8
                        col0 = (mx * c["h"] + bx) * 8
                        stride = c["bw"] * 8
                        for yy in range(8):
                            base = (row0 + yy) * stride + col0
                            pb = 8 * yy
                            for xx in range(8):
                                c["plane"][base + xx] = px[pb + xx]
            mcu_count += 1

    def sample(c, x, y):
        cx = x * c["h"] // hmax
        cy = y * c["v"] // vmax
        v = int(c["plane"][cy * c["bw"] * 8 + cx] + 128.5)
        return 0 if v < 0 else 255 if v > 255 else v

    if len(comps) == 1:
        cy = comps[0]
        plane = [sample(cy, x, y) for y in range(h) for x in range(w)]
        return w, h, [plane]
    if len(comps) != 3:
        raise JpegError(f"unsupported component count {len(comps)}")
    Y, Cb, Cr = comps
    rpl, gpl, bpl = [], [], []
    for y in range(h):
        for x in range(w):
            yy = sample(Y, x, y)
            cb = sample(Cb, x, y) - 128
            cr = sample(Cr, x, y) - 128
            r = yy + 1.402 * cr
            g = yy - 0.344136 * cb - 0.714136 * cr
            b = yy + 1.772 * cb
            rpl.append(0 if r < 0 else 255 if r > 255 else int(r + 0.5))
            gpl.append(0 if g < 0 else 255 if g > 255 else int(g + 0.5))
            bpl.append(0 if b < 0 else 255 if b > 255 else int(b + 0.5))
    return w, h, [rpl, gpl, bpl]


# -- minimal symmetric encoder (test fixtures) --------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _encode_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _fdct_2d(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[8 * y + x]
                        * _IDCT_COS[x][u]
                        * _IDCT_COS[y][v]
                    )
            out[8 * v + u] = s * _C[u] * _C[v] / 4
    return out


def _write_block(writer, dc_codes, ac_codes, qz: list[int], pred: int) -> int:
    """Entropy-encode one quantized zigzag block; returns the new DC
    predictor."""
    diff = qz[0] - pred
    mag = abs(diff).bit_length()
    length, code = dc_codes[mag]
    writer.write(code, length)
    if mag:
        writer.write(diff if diff >= 0 else diff + (1 << mag) - 1, mag)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and qz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            length, code = ac_codes[0x00]  # EOB
            writer.write(code, length)
            break
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        val = qz[k]
        mag = abs(val).bit_length()
        length, code = ac_codes[(run << 4) | mag]
        writer.write(code, length)
        writer.write(val if val >= 0 else val + (1 << mag) - 1, mag)
        k += 1
    return qz[0]


def _quantized_block(pixels, width, bx, by) -> list[int]:
    block = [
        float(pixels[(8 * by + y) * width + 8 * bx + x]) - 128.0
        for y in range(8)
        for x in range(8)
    ]
    co = _fdct_2d(block)
    return [int(round(co[ZIGZAG[k]])) for k in range(64)]


def _encode_headers(width: int, height: int, ncomp: int) -> bytearray:
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, 8-bit, all ones (flat — only DCT rounding loss)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF0: 8-bit, ncomp components, all sampling 1x1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x11, 0])
    # DHT: DC table 0 and AC table 0 (Annex K luma; legal for any comp)
    for tc, bits, vals in ((0, _DC_LUM_BITS, _DC_LUM_VALS), (1, _AC_LUM_BITS, _AC_LUM_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    # SOS: every component uses DC/AC table 0
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00])
    out += bytes([0, 63, 0])
    return out


def encode_baseline_grayscale(pixels: list[int], width: int, height: int) -> bytes:
    """Spec-valid baseline grayscale JPEG: flat quant table (all 1s — the
    only loss is DCT-coefficient rounding), Annex K huffman tables.
    width/height must be multiples of 8 (fixture simplicity)."""
    if width % 8 or height % 8:
        raise ValueError("fixture encoder needs multiple-of-8 dimensions")
    out = _encode_headers(width, height, 1)
    dc_codes = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    writer = _BitWriter()
    pred = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            pred = _write_block(
                writer, dc_codes, ac_codes, _quantized_block(pixels, width, bx, by), pred
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_baseline_ycc444(y_pixels: list[int], width: int, height: int) -> bytes:
    """3-component 4:4:4 baseline JPEG with NEUTRAL chroma (Cb=Cr=128):
    decodes to gray RGB with R=G=B=Y — exercises the interleaved-MCU and
    YCbCr->RGB paths with a fixture whose expected output is computable."""
    if width % 8 or height % 8:
        raise ValueError("fixture encoder needs multiple-of-8 dimensions")
    out = _encode_headers(width, height, 3)
    dc_codes = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    writer = _BitWriter()
    neutral = [0] * 64  # 128 - 128 level shift -> all-zero block
    preds = [0, 0, 0]
    for by in range(height // 8):
        for bx in range(width // 8):
            preds[0] = _write_block(
                writer, dc_codes, ac_codes, _quantized_block(y_pixels, width, bx, by),
                preds[0],
            )
            for c in (1, 2):
                preds[c] = _write_block(writer, dc_codes, ac_codes, neutral, preds[c])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
