"""Minimal pure-python GIF codec — stdlib ``struct`` + numpy only.

Implements the public GIF87a/GIF89a format (CompuServe spec / W3C note):
LZW-compressed palette-indexed images, global/local color tables,
interlaced and non-interlaced rows, extension blocks skipped (the first
image frame is decoded; animation frames beyond it are out of scope —
production pipelines swap in Pillow through multimodal's
``decode_image_bytes`` hook for animated GIFs).

Purpose: completes the r5 verdict's "real decode for JPEG/GIF" item —
png.py (lossless filters+zlib), jpeg.py (lossy huffman+DCT), and this
(lossless LZW) cover the three dominant crawl image formats without
Pillow. GIF is LOSSLESS: with an identity grayscale palette the decoded
pixel EQUALS the encoded index, so fixture formulas replay exactly in a
SQL oracle — the same proof structure as png.py, no DC-only trick needed.

The encoder writes a single non-interlaced frame with a 256-entry global
color table and a REAL variable-width LZW compressor (dictionary up to
4096 codes, clear-code reset on overflow) — so decoding a vendored
fixture exercises the same code-width growth path as external GIFs.

Reference parity anchor: none (the reference has no image surface);
driver-mandate multimodal surface. Format facts from the public GIF89a
specification (1990) and the original Welch LZW paper.
"""

from __future__ import annotations

import struct

import numpy as np

SIGNATURES = (b"GIF87a", b"GIF89a")


def _interlace_rows(h: int) -> list[int]:
    """GIF 4-pass interlace row order."""
    rows = list(range(0, h, 8))
    rows += list(range(4, h, 8))
    rows += list(range(2, h, 4))
    rows += list(range(1, h, 2))
    return rows


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): clear/end codes, dict cap 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: bytes | None = None
    reset()
    while n_out < n_pixels:
        code = read(width)
        if code is None or code == end:
            break
        if code == clear:
            reset()
            continue
        if code < len(table) and (code < clear or code > end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]     # the KwKwK case
        else:
            raise ValueError("gif: corrupt LZW stream (code out of range)")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("gif: truncated LZW stream")
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real variable-width LZW compressor (dict growth + clear resets)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}

    def reset():
        nonlocal table, next_code, width
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1

    next_code = end + 1
    width = min_code_size + 1
    reset()
    emit(clear, width)
    buf = b""
    for b in indices.astype(np.uint8).tobytes():
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            reset()
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode(arr: np.ndarray, *, palette: np.ndarray | None = None) -> bytes:
    """Index array -> single-frame GIF89a.

    ``arr``: uint8 (h, w) palette INDICES. ``palette``: (256, 3) uint8
    color table; default is the grayscale identity (index i -> (i,i,i)),
    which makes the codec LOSSLESS on pixel values — decode(encode(a))
    returns (h, w, 3) with every channel equal to ``a``.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encode expects a uint8 (h, w) index array")
    h, w = arr.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])          # GCT present, 256 entries
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])                    # LZW min code size
    lzw = _lzw_encode(8, arr.ravel())
    for i in range(0, len(lzw), 255):   # data sub-blocks
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"                   # block terminator + trailer
    return bytes(out)


def decode(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (h, w, 3) RGB of the FIRST image frame."""
    if data[:6] not in SIGNATURES:
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, _bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                   # trailer
            break
        if b == 0x21:                   # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[pos + 1:pos + 9])
        if w * h > 80_000_000:
            # decompression-bomb guard (the Pillow MAX_IMAGE_PIXELS
            # idea): corrupt/hostile crawl bytes must not allocate GBs
            raise ValueError(f"gif: frame {w}x{h} exceeds the "
                             "80M-pixel decompression-bomb guard")
        ipacked = data[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table for image frame")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, bytes(lzw), w * h).reshape(h, w)
        if ipacked & 0x40:              # interlaced: undo 4-pass order
            deinter = np.empty_like(idx)
            deinter[_interlace_rows(h)] = idx
            idx = deinter
        # render the first frame onto the logical screen slice it covers
        return ct[np.minimum(idx, len(ct) - 1)].astype(np.uint8)
    raise ValueError("gif: no image frame found")
