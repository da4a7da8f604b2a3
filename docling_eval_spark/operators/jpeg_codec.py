"""Pure-Python + numpy baseline JPEG codec (decoder + encoder).

Baseline sequential JPEG (ITU-T T.81, public) decodes with stdlib +
numpy: segment parsing, canonical Huffman tables read FROM THE STREAM
(DHT), dequantization (DQT), inverse zigzag, 8×8 IDCT as two matrix
multiplies, YCbCr→RGB. Supported: 8-bit baseline (SOF0), 1 or 3
components with 1×1 sampling (no chroma subsampling), no restart
markers — enough for the codec-complete multimodal path; anything
else raises ValueError and the caller degrades to the fake path.

The encoder exists for round-trip tests and thumbnail re-encoding: it
writes flat quantization tables and deliberately simple fixed-length
canonical Huffman tables (every table is embedded in the stream, so
no Annex-K recall is needed; the output is spec-valid, just not
size-optimal).
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II matrix — identical to T.81's FDCT scaling
_D = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _zigzag() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        # T.81 order: odd diagonals walk down-left (row ascending),
        # even diagonals walk up-right (column ascending)
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


_ZZ = _zigzag()


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(a: np.ndarray) -> np.ndarray:
    y, cb, cr = a[..., 0], a[..., 1] - 128.0, a[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder

_Q_FLAT = np.full(64, 16, dtype=np.int32)  # flat table: error ≤ ~q/2 per coeff


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _canonical(lengths_by_symbol: list[tuple[int, int]]):
    """[(symbol, length)] → (bits[16] counts, symbols order, code map)."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths_by_symbol:
        by_len.setdefault(ln, []).append(sym)
    bits = [0] * 16
    symbols: list[int] = []
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    for ln in range(1, 17):
        for sym in by_len.get(ln, []):
            codes[sym] = (code, ln)
            code += 1
            bits[ln - 1] += 1
            symbols.append(sym)
        code <<= 1
    return bits, symbols, codes


# DC categories 0..11 at a fixed 4-bit length (12 ≤ 15 codes available);
# AC: all 162 baseline symbols at 8 bits (162 ≤ 255). Spec-valid prefix
# codes, embedded in DHT — optimality is irrelevant for the tests.
_DC_SPEC = [(s, 4) for s in range(12)]
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SPEC = [(s, 8) for s in _AC_SYMBOLS]


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter, coefs: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    zz = np.array([coefs[r, c] for r, c in _ZZ], dtype=np.int32)
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac_codes[0xF0]
            bw.write(c, l)
            run -= 16
        s = _category(v)
        c, l = ac_codes[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]
        bw.write(c, l)
    return int(zz[0])


def jpeg_encode(arr: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JPEG bytes
    (flat q=16 tables, 4:4:4, simple embedded Huffman tables)."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    planes = [a] if gray else list(np.moveaxis(_rgb_to_ycbcr(a), -1, 0))
    h, w = a.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    q = _Q_FLAT.reshape(8, 8)

    dc_bits, dc_syms, dc_codes = _canonical(_DC_SPEC)
    ac_bits, ac_syms, ac_codes = _canonical(_AC_SPEC)

    out = bytearray(b"\xff\xd8")  # SOI
    zz_q = bytes(int(_Q_FLAT[i]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + sof
    for cls, (bits, syms) in ((0, (dc_bits, dc_syms)), (1, (ac_bits, ac_syms))):
        body = bytes([cls << 4]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0 for p in planes
    ]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(ncomp):
                block = padded[ci][by : by + 8, bx : bx + 8]
                coefs = np.rint((_D @ block @ _D.T) / q).astype(np.int32)
                preds[ci] = _encode_block(bw, coefs, preds[ci], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) or (H, W, 3) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (component id, quant id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.int32
                )
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 is supported")
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported")
                comps.append((cid, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = body[i + 1 : i + 17]
                nsyms = sum(bits)
                syms = body[i + 17 : i + 17 + nsyms]
                tbl: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        tbl[(ln, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = tbl
                i += 17 + nsyms
        elif marker == 0xDA:
            ns = body[0]
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                ci = next(i for i, (c, _) in enumerate(comps) if c == cid)
                scan.append((ci, tids >> 4, tids & 0x0F))
            ent_start = pos
            # entropy data runs until the next real marker (EOI)
            j = ent_start
            while j + 1 < len(data):
                if data[j] == 0xFF and data[j + 1] not in (0x00,) and not (
                    0xD0 <= data[j + 1] <= 0xD7
                ):
                    break
                j += 1
            ent = data[ent_start:j]
            pos = j
            return _decode_scan(ent, h, w, comps, scan, qt, huff)
    raise ValueError("no scan in JPEG")


def _decode_scan(ent, h, w, comps, scan, qt, huff) -> np.ndarray:
    br = _BitReader(ent)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ncomp = len(scan)
    planes = [np.zeros((ph, pw)) for _ in range(ncomp)]
    preds = [0] * ncomp
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for si, (ci, dct, act) in enumerate(scan):
                zz = np.zeros(64, dtype=np.int32)
                t = _decode_huff(br, huff[(0, dct)])
                diff = _extend(br.bits(t), t) if t else 0
                preds[si] += diff
                zz[0] = preds[si]
                i = 1
                while i < 64:
                    sym = _decode_huff(br, huff[(1, act)])
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    i += run
                    if i > 63:
                        raise ValueError("AC run overflow")
                    zz[i] = _extend(br.bits(size), size)
                    i += 1
                deq = zz * qt[comps[ci][1]]
                block = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZZ):
                    block[r, c] = deq[k]
                planes[si][by : by + 8, bx : bx + 8] = _D.T @ block @ _D + 128.0
    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
