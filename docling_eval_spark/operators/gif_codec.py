"""Pure-Python GIF codec (decoder + minimal encoder).

GIF87a/89a is fully decodable with stdlib-only code: the container is
a sequence of blocks and the pixel data is LZW with variable-width
codes (public spec, CompuServe 1989/W3C). This gives the multimodal
stages a second REAL pixel format beside PNG — JPEG stays an honest
fake (a baseline-DCT decoder is out of scope here).

Supported: global/local color tables, interlaced and non-interlaced
frames, 89a extensions (skipped), first frame decoded. The encoder
writes literal LZW codes with periodic clear codes (the classic
"uncompressed GIF" trick) — spec-valid output any decoder reads,
existing purely so round-trip tests don't need a real compressor.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE = 0x2C
_EXTENSION = 0x21


def gif_decode(data: bytes) -> np.ndarray:
    """First frame of a GIF → (H, W, 3) uint8 RGB array."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            pos += 1  # label
            while data[pos] != 0:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != _IMAGE:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(b"".join(chunks), min_code_size, iw * ih)
        idx = np.array(indices[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows in 4 passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            de = np.zeros_like(idx)
            de[order] = idx
            idx = de
        return ct[np.clip(idx, 0, len(ct) - 1)]
    raise ValueError("no image block in GIF")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            if len(out) >= max_pixels:
                return out
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def gif_encode(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → GIF89a with a 256-entry palette built from the
    image's distinct colors (must be ≤ 256) and literal LZW codes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode supports <= 256 distinct colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", _IMAGE, 0, 0, w, h, 0)
    min_code_size = 8
    out.append(min_code_size)
    clear, eoi = 256, 257
    code_size = 9
    acc = bits = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    for n, px in enumerate(idx.tolist()):
        emit(int(px))
        # re-clear before the (never-extended) table width would grow:
        # each literal after a clear appends one table entry
        if n % 250 == 249:
            emit(clear)
    emit(eoi)
    if bits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)
