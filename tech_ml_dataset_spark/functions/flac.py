"""Minimal pure-python FLAC decoder + fixture encoder — stdlib + numpy.

Implements the public FLAC format (the xiph.org specification, now
RFC 9639): ``fLaC`` magic, STREAMINFO metadata, frames with CRC-8
headers / CRC-16 footers (both verified, loudly), UTF-8-coded frame
numbers, and ALL four subframe types — CONSTANT, VERBATIM, FIXED
(orders 0-4) and LPC (any order; decode-side LPC is plain integer
arithmetic: ``x[i] = e[i] + (sum c[j]*x[i-1-j]) >> shift``) — with
Rice-coded residuals (4- and 5-bit parameter variants, partition
orders, raw-bits escape) and every channel assignment (independent,
left/side, right/side, mid/side — the inter-channel decorrelation real
encoders emit for stereo).

Role: the same vendored-codec pattern as jpeg/gif/png/pdf — FLAC is
the common lossless audio format in crawl corpora, and this container
has no codec libs, so :mod:`.multimodal`'s audio operators get a REAL
decode path for it next to stdlib-``wave`` PCM (mp3/ogg stay documented
stubs: lossy psychoacoustic decoders are out of scope).

The fixture encoder (:func:`encode`) emits spec-valid streams through
the SAME bit-level writer laws the decoder parses — subframe types
``constant`` / ``verbatim`` / ``fixed`` (order 0-2, Rice partition
order 0) and all four stereo assignments — so every decode path is
exercised by exact roundtrips, not just self-agreement on one shape.

Reference parity anchor: none — tech.ml.dataset has no audio surface;
driver-mandate (multimodal pipeline) function. Format facts from the
public FLAC specification only.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

#: frame-header block-size codes (index 2..15), spec table
_BLOCKSIZE = [0, 192, 576, 1152, 2304, 4608, -1, -2,
              256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
#: frame-header sample-rate codes (0 = STREAMINFO; 12-14 read inline)
_RATES = [0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
          32000, 44100, 48000, 96000, -1, -2, -3, None]
#: frame-header sample-size codes (0 = STREAMINFO)
_BITS = [0, 8, 12, None, 16, 20, 24, 32]


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (frame-header checksum)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (whole-frame checksum)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes, with byte-position access for
    the CRC spans."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos                      # byte position
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flac: runaway unary code")
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _read_utf8_number(r: _Bits) -> int:
    """The frame header's UTF-8-style coded number (up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("flac: invalid UTF-8 coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if blocksize % (1 << po):
        raise ValueError("flac: partition order does not divide "
                         "the block size")
    out: list[int] = []
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds the first "
                             "partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out += [r.sread(raw) if raw else 0 for _ in range(n)]
            continue
        for _ in range(n):
            q = r.unary()
            v = (q << param) | r.read(param)
            out.append((v >> 1) ^ -(v & 1))     # zigzag
    return out


def _read_subframe(r: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    kind = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
    if kind == 0:                           # CONSTANT
        out = np.full(blocksize, r.sread(bps), dtype=np.int64)
    elif kind == 1:                         # VERBATIM
        out = np.array([r.sread(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= kind <= 12:                   # FIXED order kind-8
        order = kind - 8
        warm = np.array([r.sread(bps) for _ in range(order)],
                        dtype=np.int64)
        resid = _read_residual(r, blocksize, order)
        # the fixed predictor of order k makes the residual exactly the
        # k-th finite difference of the signal (RFC 9639 §4.2.2), so
        # reconstruction is k stacked cumulative sums seeded from the
        # warm-up samples' difference pyramid — numpy scans instead of
        # a per-sample Python loop (r9, verdict #7: this path carried
        # ~1.9 s of the sf0.1 bench)
        out = np.asarray(resid, dtype=np.int64)
        for j in range(order - 1, -1, -1):
            head = np.diff(warm, n=j)       # s^j[:order-j] from warm-up
            out = np.concatenate(
                [head, head[-1] + np.cumsum(out[order - j - 1:])])
    elif kind >= 32:                        # LPC order kind-31
        order = kind - 31
        warm = [r.sread(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision code")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coef = [r.sread(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = sum(c * int(out[i - 1 - j])
                       for j, c in enumerate(coef)) >> shift
            out[i] = resid[i - order] + pred
    else:
        raise ValueError(f"flac: reserved subframe type {kind}")
    return out << wasted if wasted else out


def decode(data: bytes):
    """FLAC bytes -> (sample_rate, n_channels, bits_per_sample,
    samples int32 array of shape (n_samples, n_channels)). Verifies
    magic, both frame CRCs, and the STREAMINFO sample count; raises
    ValueError naming any unsupported/reserved feature."""
    if data[:4] != MAGIC:
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = struct.unpack(">I", data[pos:pos + 4])[0]
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:                      # STREAMINFO
            if blen != 34:
                raise ValueError("flac: bad STREAMINFO length")
            r = _Bits(body)
            r.read(16), r.read(16)          # min/max blocksize
            r.read(24), r.read(24)          # min/max framesize
            sr = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (sr, nch, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    sr0, nch0, bps0, total = info

    channels_out: list[np.ndarray] = []
    done = 0
    while pos < len(data) and (total == 0 or done < total):
        frame_start = pos
        r = _Bits(data, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte "
                             f"{frame_start}")
        if r.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        r.read(1)                           # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block-size code 0")
        blocksize = _BLOCKSIZE[bs_code]
        if blocksize == -1:
            blocksize = r.read(8) + 1
        elif blocksize == -2:
            blocksize = r.read(16) + 1
        rate = _RATES[sr_code]
        if rate is None:
            raise ValueError("flac: invalid sample-rate code")
        if rate == 0:
            rate = sr0
        elif rate == -1:
            rate = r.read(8) * 1000
        elif rate == -2:
            rate = r.read(16)
        elif rate == -3:
            rate = r.read(16) * 10
        bps = _BITS[ss_code]
        if bps is None:
            raise ValueError("flac: reserved sample-size code")
        bps = bps or bps0
        crc8_at = r.pos
        if r.read(8) != _crc8(data[frame_start:crc8_at]):
            raise ValueError("flac: frame-header CRC-8 mismatch")

        if ch_code <= 7:
            nch, mode = ch_code + 1, "indep"
        elif ch_code == 8:
            nch, mode = 2, "left_side"
        elif ch_code == 9:
            nch, mode = 2, "right_side"
        elif ch_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise ValueError("flac: reserved channel assignment")
        if nch != nch0:
            raise ValueError("flac: frame channel count differs from "
                             "STREAMINFO")

        subs = []
        for c in range(nch):
            side = (mode == "left_side" and c == 1) or \
                   (mode == "right_side" and c == 0) or \
                   (mode == "mid_side" and c == 1)
            subs.append(_read_subframe(r, blocksize,
                                       bps + (1 if side else 0)))
        r.align()
        crc16_at = r.pos
        if r.read(16) != _crc16(data[frame_start:crc16_at]):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.pos

        if mode == "left_side":
            left, side = subs
            subs = [left, left - side]
        elif mode == "right_side":
            side, right = subs
            subs = [side + right, right]
        elif mode == "mid_side":
            mid, side = subs
            lr = (mid << 1) | (side & 1)
            subs = [(lr + side) >> 1, (lr - side) >> 1]
        channels_out += subs
        done += blocksize

    if not channels_out:
        raise ValueError("flac: no audio frames")
    planes = [np.concatenate(channels_out[c::nch0])
              for c in range(nch0)]
    n = min(len(p) for p in planes)
    if total:
        n = min(n, total)
    out = np.stack([p[:n] for p in planes], axis=1).astype(np.int32)
    return sr0, nch0, bps0, out


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_rice(w: _BitW, resid, param: int) -> None:
    for e in resid:
        v = (e << 1) if e >= 0 else ((-e) << 1) - 1   # zigzag
        q = v >> param
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        w.write(v & ((1 << param) - 1), param)


def encode(samples: np.ndarray, *, sample_rate: int = 8000,
           bps: int = 16, subframe: str = "verbatim",
           stereo_mode: str = "indep",
           block_size: int = 4096) -> bytes:
    """Spec-valid FLAC fixture encoder: int arrays of shape (n,) or
    (n, channels) -> fLaC bytes. ``subframe``: 'constant' (requires
    constant input), 'verbatim', or 'fixed2' (order-2 fixed predictor,
    Rice partition order 0 — exercises the residual decoder).
    ``stereo_mode`` for 2-channel input: 'indep', 'left_side',
    'right_side', 'mid_side' — the inter-channel paths real encoders
    emit. Exact lossless roundtrip through :func:`decode` by
    construction."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if not (1 <= nch <= 8):
        raise ValueError("flac: 1..8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min(initial=0) < lo or arr.max(initial=0) > hi:
        raise ValueError(f"flac: samples exceed {bps}-bit range")
    if stereo_mode != "indep" and nch != 2:
        raise ValueError("flac: stereo_mode needs 2 channels")

    out = bytearray(MAGIC)
    si = _BitW()
    si.write(block_size, 16), si.write(block_size, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16     # md5 unset (spec-legal)
    out += struct.pack(">I", (1 << 31) | (0 << 24) | len(body)) + body

    ch_code = {"indep": nch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]

    def write_sub(w: _BitW, x: np.ndarray, sbps: int) -> None:
        if subframe == "constant":
            if not (x == x[0]).all():
                raise ValueError("flac: constant subframe needs "
                                 "constant input")
            w.write(0, 1), w.write(0, 6), w.write(0, 1)
            w.write(int(x[0]) & ((1 << sbps) - 1), sbps)
        elif subframe == "verbatim":
            w.write(0, 1), w.write(1, 6), w.write(0, 1)
            for v in x:
                w.write(int(v) & ((1 << sbps) - 1), sbps)
        elif subframe.startswith("fixed") and subframe[5:].isdigit() \
                and int(subframe[5:]) <= 4:
            order = min(int(subframe[5:]), len(x))
            w.write(0, 1), w.write(8 + order, 6), w.write(0, 1)
            for v in x[:order]:
                w.write(int(v) & ((1 << sbps) - 1), sbps)
            coef = _FIXED_COEF[order]
            resid = [int(x[i]) - sum(c * int(x[i - 1 - j])
                                     for j, c in enumerate(coef))
                     for i in range(order, len(x))]
            w.write(0, 2)                   # rice, 4-bit params
            w.write(0, 4)                   # partition order 0
            maxa = max((abs(e) for e in resid), default=0)
            param = min(14, max(0, (2 * maxa + 1).bit_length() - 1))
            w.write(param, 4)
            _write_rice(w, resid, param)
        else:
            raise ValueError(f"flac: unknown subframe {subframe!r}")

    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = arr[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitW()
        w.write(0x3FFE, 14), w.write(0, 1), w.write(0, 1)
        w.write(7, 4)                       # 16-bit blocksize-1 follows
        w.write(0, 4)                       # sample rate: STREAMINFO
        w.write(ch_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.write(0, 1)
        # UTF-8 coded frame number (fixed blocking): 7-bit fast path
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.out)
        if w.nbits:
            raise AssertionError("header must be byte-aligned")
        w.write(_crc8(hdr), 8)

        if stereo_mode == "indep":
            chans = [(blk[:, c], bps) for c in range(nch)]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                chans = [((left + right) >> 1, bps), (side, bps + 1)]
        for x, sbps in chans:
            write_sub(w, np.asarray(x), sbps)
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)
