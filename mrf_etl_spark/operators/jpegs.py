"""Pure-stdlib baseline JPEG codec (ITU-T T.81) — grayscale decode path.

VERDICT r8 #7 asked for a JPEG tier for m1/m5: JPEG is the likeliest
codec in any real multimodal corpus, Pillow is absent from this
container, and the previous contract was an honest NotImplementedError.
This module removes the gap the same way the PNG decoder did — a REAL
decoder with no dependencies — so `decode_media` and `gray_pixels`
handle `image/jpeg` in every environment.

Scope (named errors outside it, the module's explicit-failure doctrine):

* decode: BASELINE sequential DCT (SOF0), 8-bit, grayscale or YCbCr
  with any h/v sampling factors where Y carries the maximum (true of
  every camera/Pillow/libjpeg emission: 4:4:4, 4:2:2, 4:2:0), restart
  intervals (DRI/RSTn), multi-segment DQT/DHT. Output is the Y plane —
  exactly what the gray featurizer and perceptual hash consume — so
  chroma blocks are entropy-PARSED (the stream can't be skipped) but
  never IDCT'd.
* progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision, and
  hierarchical modes raise NotImplementedError naming the mode.
* encode: grayscale baseline with the flat quant table below and the
  Annex K luminance Huffman tables — the deterministic fixture
  generator for round-trip tests (a solid image round-trips exactly;
  smooth gradients within a few levels).

The arithmetic is plain IEEE doubles for the IDCT/FDCT; decode output
feeds approximate features (byte means, average-hash bits), never a
bit-compared parity surface — the sketch-bound doctrine
(PLANS.md) keeps lossy-codec floats off the oracle compare.
"""

from __future__ import annotations

import math
import struct

# zig-zag index: ZIGZAG[k] = natural (row*8+col) position of the k-th
# coefficient in transmission order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K (T.81 K.3) luminance Huffman table specs: (BITS counts, HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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
]

# the encoder's flat quantization table: divisor 2 for every coefficient
# keeps quantized magnitudes inside the Annex K size categories while
# bounding reconstruction error to ~one level per coefficient
_ENC_QTAB = [2] * 64

_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 C.2: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers end the current run (restart())."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None  # marker that ended the stream

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past-EOI reads with zeros (T.81 F.2.2.5 allows)
                continue
            b = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.marker = nxt
                    self.pos += 1
                    self.buf = (self.buf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        out = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return out

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG entropy stream")

    def restart(self) -> None:
        """Consume the pending RSTn and realign (byte boundary)."""
        self.buf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib baseline-JPEG decode → (width, height, row-major Y
    pixels as floats in [0, 255]). See the module docstring for scope;
    unsupported modes raise NotImplementedError naming the mode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    scan_order: list[dict] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qtabs[tq] = list(seg[i : i + 64])
                    i += 64
                else:
                    qtabs[tq] = [
                        struct.unpack(">H", seg[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG (only 8-bit)")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG (SOF2/6/10/14)")
        elif marker in (0xC9, 0xCB, 0xCD, 0xCF, 0xC3, 0xC5, 0xC7):
            raise NotImplementedError(
                f"JPEG mode SOF{marker - 0xC0} (arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            for c in range(ns):
                cid, tda = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["td"], comp["ta"] = tda >> 4, tda & 15
                scan_order.append(comp)
            pos = pos + 2 + seglen
            break
        pos = pos + 2 + seglen
    if not scan_order or not w or not h:
        raise ValueError("truncated JPEG (no SOS/SOF)")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if comps[0]["h"] != hmax or comps[0]["v"] != vmax:
        raise NotImplementedError(
            "JPEG whose first (luma) component is subsampled"
        )
    y = comps[0]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    yw, yh = mcux * 8 * y["h"], mcuy * 8 * y["v"]
    plane = [0.0] * (yw * yh)
    reader = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                preds = {c["id"]: 0 for c in comps}
            for comp in scan_order:
                qt = qtabs[comp["tq"]]
                dct = huff_dc[comp["td"]]
                act = huff_ac[comp["ta"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = [0.0] * 64
                        t = reader.huff(dct)
                        diff = _extend(reader.bits(t), t)
                        preds[comp["id"]] += diff
                        coef[0] = preds[comp["id"]] * qt[0]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = _extend(reader.bits(s), s) * qt[k]
                            k += 1
                        if comp is not y:
                            continue  # chroma parsed, never rendered
                        # separable 2D IDCT + level shift
                        tmp = [0.0] * 64
                        for row in range(8):
                            for col in range(8):
                                acc = 0.0
                                for u in range(8):
                                    acc += _C[u] * coef[row * 8 + u] * _IDCT_COS[col][u]
                                tmp[row * 8 + col] = acc
                        ox = (mx * y["h"] + bx) * 8
                        oy = (my * y["v"] + by) * 8
                        for col in range(8):
                            for row in range(8):
                                acc = 0.0
                                for u in range(8):
                                    acc += _C[u] * tmp[u * 8 + col] * _IDCT_COS[row][u]
                                v = acc / 4.0 + 128.0
                                plane[(oy + row) * yw + ox + col] = (
                                    0.0 if v < 0.0 else 255.0 if v > 255.0 else v
                                )
            n_mcu += 1
    # crop the padded plane to the declared geometry
    return w, h, [plane[r * yw + c] for r in range(h) for c in range(w)]


def decode_jpeg_gray_mean(payload: bytes) -> float:
    w, h, px = decode_jpeg_gray(payload)
    return (sum(px) / (w * h)) if w and h else 0.0


# ------------------------------------------------------------- encoder

def _fdct_block(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for x in range(8):
                for yy in range(8):
                    acc += (
                        block[x * 8 + yy]
                        * _IDCT_COS[x][u]
                        * _IDCT_COS[yy][v]
                    )
            out[u * 8 + v] = acc * _C[u] * _C[v] / 4.0
    return out


def _huff_encode_spec(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    enc: dict[int, tuple[int, int]] = {}
    for (length, code), sym in _build_huffman(bits, vals).items():
        enc[sym] = (length, code)
    return enc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _category(v: int) -> int:
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def encode_jpeg_gray(
    pixels: list[int], w: int, h: int, restart_interval: int = 0
) -> bytes:
    """Minimal deterministic baseline grayscale JPEG encoder — the
    fixture generator for the decoder's round-trip tests (and any
    environment that needs a real JPEG without Pillow). Flat quant
    table of 2s: a solid image round-trips exactly, smooth content
    within ~2 levels. ``restart_interval`` > 0 emits DRI + RSTn markers
    every N MCUs (and resets the DC predictor), so the decoder's
    restart path has a fixture too."""
    if len(pixels) != w * h:
        raise ValueError("pixels length != w*h")
    dc_enc = _huff_encode_spec(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_enc = _huff_encode_spec(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    pred = 0
    n_mcu = 0
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (n_mcu // restart_interval - 1) % 8]
                )
                pred = 0
            n_mcu += 1
            block = [
                float(
                    pixels[min(by * 8 + r, h - 1) * w + min(bx * 8 + c, w - 1)]
                )
                - 128.0
                for r in range(8)
                for c in range(8)
            ]
            coef = _fdct_block(block)
            q = [
                int(round(coef[ZIGZAG[k]] / _ENC_QTAB[k])) for k in range(64)
            ]
            diff = q[0] - pred
            pred = q[0]
            t = _category(diff)
            ln, code = dc_enc[t]
            bw.put(code, ln)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((k for k in range(1, 64) if q[k]), default=0)
            for k in range(1, last_nz + 1):
                if q[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_enc[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s = _category(q[k])
                ln, code = ac_enc[(run << 4) | s]
                bw.put(code, ln)
                bw.put(q[k] if q[k] >= 0 else q[k] + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                ln, code = ac_enc[0x00]  # EOB
                bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(_ENC_QTAB))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sof = seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + dri + sof + dht + sos + bytes(bw.out)
        + b"\xff\xd9"
    )
