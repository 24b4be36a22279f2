"""Vendored pure-Python/numpy baseline JPEG codec (JFIF).

Written from the public ITU-T T.81 / JFIF specifications so the
input_hint's lossy-codec gate — decoded-pixel PSNR >= 40 dB on REAL
bytes — executes in containers without Pillow, the same pattern as
the vendored PNG codec (functions/pngcodec.py). Reference parity
anchor: the reference's featured-image pipeline decodes real image
bytes via ImageIO (web/.../image/impl/FeaturedImageResolver.java:
99-254); this module is the dependency-free stand-in for the JPEG
leg of that contract.

Encoder: baseline sequential DCT, 8-bit, 4:4:4 (no subsampling),
standard Annex-K quantization tables scaled by the libjpeg quality
formula, flat canonical Huffman tables (every DC symbol 4 bits,
every AC symbol 8 bits — valid prefix codes declared in DHT, chosen
to avoid hand-typing the 324 Annex-K Huffman constants; file size is
a non-goal, spec-validity and pixel fidelity are the goals).

Decoder: general baseline — reads DQT/DHT/SOF0/SOS/DRI from the
stream, supports arbitrary h/v sampling factors (4:4:4, 4:2:2,
4:2:0), restart markers, and byte-stuffing, so it also decodes
Pillow/libjpeg output, not just this encoder's.

Not supported (raises ValueError): progressive (SOF2), arithmetic
coding, 12-bit precision, CMYK.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Scan position -> linear (row*8+col) block index, per T.81."""
    out = []
    r = c = 0
    for _ in range(64):
        out.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 example quantization tables (natural order)
Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 = the Annex-K table verbatim."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: dct2(B) = D @ B @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d *= np.sqrt(2.0 / 8)
    d[0, :] = 1.0 / np.sqrt(8)
    return d


_DCT = _dct_matrix()

# flat canonical Huffman tables (encoder side): DC symbols 0..11 all
# at 4 bits, AC symbols all at 8 bits — 12 < 2^4 and 162 < 2^8 leave
# the all-ones code unused, as T.81 requires
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    {0x00, 0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
assert len(_AC_SYMBOLS) == 162


def _flat_code(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) for an all-one-length canonical code."""
    return {s: (i, length) for i, s in enumerate(symbols)}


_DC_CODE = _flat_code(_DC_SYMBOLS, 4)
_AC_CODE = _flat_code(_AC_SYMBOLS, 8)


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bytes([(tc << 4) | th] + bits + symbols)


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 amplitude coding: value -> (size category, extra bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad, per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at
    markers (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Drop pad bits and consume an RSTn marker."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("jpegcodec: expected restart marker")


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601 full-range)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y, cb, cr]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (n_blocks_v, n_blocks_h, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes, 4:4:4."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("jpegcodec: expected (h, w, 3) RGB")
    h, w = pixels.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("jpegcodec: dimensions out of range")
    qy = _scaled_table(Q_LUMA, quality)
    qc = _scaled_table(Q_CHROMA, quality)

    # pad to block multiples by edge replication
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.pad(
        pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    planes = _rgb_to_ycbcr(padded)

    # DCT + quantize, all blocks at once per component
    coefs = []
    for ci, plane in enumerate(planes):
        q = qy if ci == 0 else qc
        b = _blocks(plane - 128.0)
        d = np.einsum("ij,xyjk,lk->xyil", _DCT, b, _DCT)
        qd = np.round(d / q.reshape(8, 8)).astype(np.int64)
        coefs.append(qd.reshape(-1, 64)[:, ZIGZAG])

    # entropy-code interleaved MCUs (4:4:4 -> one block per comp)
    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = (ph // 8) * (pw // 8)
    for m in range(n_mcu):
        for ci in range(3):
            blk = coefs[ci][m]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size, extra = _magnitude(diff)
            code, nb = _DC_CODE[size]
            bw.write(code, nb)
            if size:
                bw.write(extra, size)
            run = 0
            last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, nb = _AC_CODE[0xF0]  # ZRL
                    bw.write(code, nb)
                    run -= 16
                size, extra = _magnitude(v)
                code, nb = _AC_CODE[(run << 4) | size]
                bw.write(code, nb)
                bw.write(extra, size)
                run = 0
            if last_nz < 63:
                code, nb = _AC_CODE[0x00]  # EOB
                bw.write(code, nb)
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )  # APP0
    for tid, q in ((0, qy), (1, qc)):
        body = bytes([tid]) + bytes(int(x) for x in q[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0: 3 components, all 1x1 sampling (4:4:4)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, syms, ln in (
        (0, 0, _DC_SYMBOLS, 4),
        (0, 1, _DC_SYMBOLS, 4),
        (1, 0, _AC_SYMBOLS, 8),
        (1, 1, _AC_SYMBOLS, 8),
    ):
        body = _dht_segment(tc, th, syms, ln)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode table from a DHT segment."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # per-length first code / first index (canonical ranges)
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += n
                k += n
                self.max_code[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.vals[
                    self.val_ptr[ln] + code - self.min_code[ln]
                ]
        raise ValueError("jpegcodec: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size` raw bits back to a signed amplitude."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpegcodec: not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("jpegcodec: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    t = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    t = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                qtables[tq] = t[UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                cnt = sum(bits)
                vals = list(seg[p:p + cnt])
                p += cnt
                htables[(tc, th)] = _HuffTable(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/ext sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("jpegcodec: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpegcodec: only baseline sequential DCT supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpegcodec: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan_comps.append(
                    {**comp, "td": tt >> 4, "ta": tt & 0xF}
                )
            pos = _decode_scan(
                data, pos, frame, scan_comps, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skipped
    if frame is None or "pixels" not in frame:
        raise ValueError("jpegcodec: no decoded scan")
    return frame["pixels"]


def _decode_scan(data, pos, frame, comps, qtables, htables,
                 restart_interval) -> int:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
            dtype=np.float64,
        ))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    dct_t = _DCT.T
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                br.align_restart()
                pred = [0] * len(comps)
            mcu_index += 1
            for ci, c in enumerate(comps):
                dc_t = htables[(0, c["td"])]
                ac_t = htables[(1, c["ta"])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_t.decode(br)
                        diff = _extend(br.bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "jpegcodec: AC index overflow"
                                )
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        # zz is zigzag-ordered; q is natural-ordered
                        blk = (zz[UNZIGZAG] * q).reshape(8, 8)
                        sp = dct_t @ blk @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = sp
    # upsample to full resolution and crop
    full = []
    for c, plane in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1,
            )
        full.append(plane[:fh, :fw])
    if len(full) == 3:
        frame["pixels"] = _ycbcr_to_rgb(*full)
    elif len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        frame["pixels"] = np.stack([g, g, g], axis=-1)
    else:
        raise ValueError("jpegcodec: unsupported component count")
    # resync the outer marker loop: skip any pad 0xFF fill bytes
    pos = br.pos
    return pos
