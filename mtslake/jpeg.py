"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Retires the last multimodal decode stub (the reference analogue is the
dtype-generic decode matrix, mtscomp tests.py:240-243): baseline
sequential DCT, 8-bit, Huffman entropy coding, grayscale or YCbCr
4:4:4. Everything is implemented from the public spec — marker parse,
canonical Huffman construction from DHT counts (Annex C), zigzag,
dequantize, exact float64 IDCT (matrix form of A.3.3), JFIF YCbCr →
RGB — with numpy doing the per-block math (entropy coding walks
blocks in Python; the DCT/color stages are vectorized over all blocks
at once).

Scope is the honest web-crawl subset, enforced loudly like the PNG
decoder: baseline DCT (SOF0) only, 8-bit precision, no subsampling
(4:4:4), no restart intervals, no progressive/arithmetic coding.
A Pillow/libjpeg call drops into the same ``_decode_image_bytes``
seam when those exist.

The encoder exists to synthesize REAL deterministic payloads for
tests/contract queries (quality-scaled Annex K quantization tables,
Annex-K-style Huffman tables carried in DHT — the stream is fully
self-describing, so any table set that is a valid prefix code is a
valid JPEG).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (Annex K of the public spec)

# K.1 / K.2 base quantization tables, natural (row-major) order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# K.3 Huffman table shapes: (counts per code length 1..16, symbols)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
])

for _c, _s in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_c) == len(_s), "inconsistent Huffman table shape"


def _zigzag_index() -> np.ndarray:
    """Natural-order index for each zigzag position (spec Figure 5)."""
    idx = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rows = reversed(list(rows))
        idx.extend(r * 8 + (s - r) for r in rows)
    return np.asarray(idx, dtype=np.int64)


ZIGZAG = _zigzag_index()          # zigzag pos -> natural index
UNZIGZAG = np.argsort(ZIGZAG)     # natural index -> zigzag pos


def _dct_basis() -> np.ndarray:
    """8x8 DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1)u*pi/16)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    b = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    b[0] *= 1 / np.sqrt(2)
    return b


_B = _dct_basis()


def _canonical_codes(counts, symbols):
    """Annex C: canonical Huffman (code, length) per symbol."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(counts, symbols):
    """(length, code) -> symbol for the bit-walking decoder."""
    return {(ln, c): s for s, (c, ln) in
            _canonical_codes(counts, symbols).items()}


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# bit i/o


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (spec F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1          # unstuff
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data "
                    "(restart intervals unsupported)"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """Spec F.12: map t received bits to a signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y, cb, cr = (planes[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate a plane to 8-multiples and cut into
    (n_blocks, 8, 8) raster order."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)),
                    mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        .reshape(bh * bw, 8, 8)
    )
    return blocks, bh, bw


def _blocks_to_plane(blocks: np.ndarray, bh: int, bw: int,
                     h: int, w: int) -> np.ndarray:
    full = (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    return full[:h, :w]


def _encode_scan(qblocks: list[np.ndarray], dc_maps, ac_maps) -> bytes:
    """qblocks: per component, (n_blocks, 64) zigzag-ordered quantized
    coefficients. Interleaved 4:4:4 MCUs = one block per component."""
    ncomp = len(qblocks)
    n_mcu = qblocks[0].shape[0]
    wr = _BitWriter()
    prev_dc = [0] * ncomp
    for m in range(n_mcu):
        for ci in range(ncomp):
            blk = qblocks[ci][m]
            dc_tab, ac_tab = dc_maps[ci], ac_maps[ci]
            diff = int(blk[0]) - prev_dc[ci]
            prev_dc[ci] = int(blk[0])
            t = _category(diff)
            code, ln = dc_tab[t]
            wr.put(code, ln)
            if t:
                wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            nz = np.flatnonzero(blk[1:])
            last = int(nz[-1]) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]      # ZRL
                    wr.put(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_tab[(run << 4) | s]
                wr.put(code, ln)
                wr.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                code, ln = ac_tab[0x00]          # EOB
                wr.put(code, ln)
    return wr.flush()


def _dht_segment(tc: int, th: int, table) -> bytes:
    counts, symbols = table
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, tbl: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in tbl[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) -> baseline JFIF-style
    JPEG bytes: level shift, exact float64 FDCT, quality-scaled Annex K
    quantization, standard-table Huffman coding, 4:4:4 (no
    subsampling)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError(f"bad image shape {arr.shape}")
    qt_l, qt_c = _quant_tables(quality)
    planes = (
        [arr.astype(np.float64)] if gray
        else [p for p in np.moveaxis(_rgb_to_ycbcr(arr), -1, 0)]
    )
    qts = [qt_l] + ([] if gray else [qt_c, qt_c])
    qblocks = []
    for plane, qt in zip(planes, qts):
        blocks, bh, bw = _plane_blocks(plane)
        shifted = blocks - 128.0
        coeff = np.einsum("ux,nxy,vy->nuv", _B, shifted, _B)
        q = np.round(coeff / qt.reshape(8, 8)).astype(np.int64)
        qblocks.append(q.reshape(-1, 64)[:, ZIGZAG])

    dc_tabs = [_DC_LUMA] + ([] if gray else [_DC_CHROMA, _DC_CHROMA])
    ac_tabs = [_AC_LUMA] + ([] if gray else [_AC_CHROMA, _AC_CHROMA])
    scan = _encode_scan(
        qblocks,
        [_canonical_codes(*t) for t in dc_tabs],
        [_canonical_codes(*t) for t in ac_tabs],
    )

    ncomp = 1 if gray else 3
    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
        for cid in range(ncomp)
    )
    sof = (b"\xff\xc0"
           + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
           + sof_comps)
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11])
        for cid in range(ncomp)
    )
    sos = (b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
           + sos_comps + bytes([0, 63, 0]))

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, qt_l)
    if not gray:
        out += _dqt_segment(1, qt_c)
    out += sof
    out += _dht_segment(0, 0, _DC_LUMA)
    out += _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA)
        out += _dht_segment(1, 1, _AC_CHROMA)
    out += sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg_coeffs(payload: bytes):
    """Parse + entropy-decode to DEQUANTIZED coefficient blocks.

    Returns (coeff_planes, h, w, n_components) where coeff_planes is a
    list per component of (n_blocks, 8, 8) int64 natural-order
    dequantized coefficients. Split out so tests can grade the exact
    integer entropy layer separately from the float IDCT."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:            # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:            # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC4:          # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                syms = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _decode_map(counts, syms)
                p += 17 + n
        elif marker == 0xC0:          # SOF0 baseline
            prec, fh, fw, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported ({prec})")
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:          # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
            if ri:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:          # SOS
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                 seg[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            scan_start = pos + 2 + seglen
            break
        # APPn/COM/etc: skipped
        pos += 2 + seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    fh, fw, comps = frame
    bh, bw = -(-fh // 8), -(-fw // 8)
    n_mcu = bh * bw
    qt_of = {cid: qtables[tq] for cid, tq in comps}

    rd = _BitReader(payload[scan_start:])
    out = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in scan_comps]
    prev_dc = [0] * len(scan_comps)

    def huff(tab) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | rd.bit()
            ln += 1
            sym = tab.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    for m in range(n_mcu):
        for ci, (cid, td, ta) in enumerate(scan_comps):
            dct, act = htables[(0, td)], htables[(1, ta)]
            t = huff(dct)
            diff = _extend(rd.bits(t), t) if t else 0
            prev_dc[ci] += diff
            blk = out[ci][m]
            blk[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = huff(act)
                if sym == 0x00:       # EOB
                    break
                if sym == 0xF0:       # ZRL
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                blk[k] = _extend(rd.bits(s), s)
                k += 1

    planes = []
    for ci, (cid, _, _) in enumerate(scan_comps):
        deq = np.zeros((n_mcu, 64), dtype=np.int64)
        deq[:, ZIGZAG] = out[ci]
        deq *= qt_of[cid]
        planes.append(deq.reshape(n_mcu, 8, 8))
    return planes, fh, fw, len(scan_comps)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (or (h, w) grayscale):
    entropy decode + dequantize (exact integer layer), vectorized
    float64 IDCT over all blocks, JFIF YCbCr -> RGB, clip."""
    planes, h, w, ncomp = decode_jpeg_coeffs(payload)
    bh, bw = -(-h // 8), -(-w // 8)
    spatial = []
    for deq in planes:
        blocks = np.einsum("ux,nuv,vy->nxy", _B,
                           deq.astype(np.float64), _B)
        spatial.append(_blocks_to_plane(blocks + 128.0, bh, bw, h, w))
    if ncomp == 1:
        return np.clip(np.round(spatial[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        raise ValueError(f"unsupported component count {ncomp}")
    rgb = _ycbcr_to_rgb(np.stack(spatial, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
