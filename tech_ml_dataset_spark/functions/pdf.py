"""Minimal pure-python PDF text extraction — stdlib ``zlib`` + ``re``.

Implements the subset of ISO 32000 (PDF 1.7, the public spec) that a
crawl pipeline's text-ripper needs: locate ``stream``/``endstream``
objects by raw scan (no xref table required — robust to the truncated /
appended files a crawl actually sees), FlateDecode them, and replay the
text-showing operators of every content stream — ``Tj``, ``TJ`` (with
the kerning-offset space law), ``'`` and ``"``, with line structure
from ``Td``/``TD`` (vertical moves), ``T*``, ``Tm``, and ``BT``/``ET``
blocks. Literal strings decode the full escape table (``\\n \\r \\t \\b
\\f \\( \\) \\\\``, octal, line continuations) plus hex strings.

Stream filters (r8): FlateDecode, LZWDecode (EarlyChange 0/1),
ASCII85Decode, RunLengthDecode, and chains ([/ASCII85Decode
/FlateDecode]) all decode — plus /Predictor DecodeParms (r9: TIFF
horizontal differencing and the PNG None/Sub/Up/Average/Paeth row
filters, which real writers apply to xref and content streams).
Fonts carrying a /ToUnicode CMap (bfchar/bfrange, 1/2-byte
codespaces, surrogate pairs) decode EXACTLY — the composite-font
shape real non-Latin PDFs use — including fonts and resources packed
into PDF 1.5+ /Type /ObjStm compressed object streams
(:func:`_objstm_objects`); legacy simple fonts with an /Encoding —
a bare /WinAnsiEncoding or /MacRomanEncoding name, or a dict with
/BaseEncoding + /Differences — decode through the public encoding
tables and the AGL glyph-name subset + uniXXXX/uXXXXXX forms (r9). Honest limits, all named: encrypted PDFs
raise (``/Encrypt``); image filters (DCT/JBIG2/JPX/CCITT) are
SKIPPED, not mis-parsed; fonts with neither a CMap nor /Differences
decode Latin-1 — exact for the Standard-14/ASCII fixtures this repo
synthesizes, a documented approximation otherwise.

The same vendored-codec pattern as jpeg/gif/png/xlsx: the synthesizer
(:func:`build_pdf`) emits spec-valid single-page PDFs with a
closed-form text law, so a SQL oracle can replay any downstream feature
without a PDF library, while the extractor exercises the REAL byte
path (object scan, inflate, operator replay).

Reference parity anchor: none — the reference (tech.ml.dataset) has no
PDF surface; driver-mandate (multimodal/document pipeline) surface.
Format facts from the public ISO 32000 spec only.
"""

from __future__ import annotations

import re
import zlib

#: TJ kerning offsets at or below this (thousandths of an em, negative =
#: rightward gap) render as a word gap — emitted as ONE space. The
#: -180 threshold is the common text-ripper convention (~18% of an em).
TJ_SPACE_THRESHOLD = -180.0

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)

#: /Length N  (direct) vs /Length N 0 R (indirect reference — group 2 set).
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")

#: /Filter /Name  or  /Filter [/A /B ...] — applied in array order.
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _decode_parms_list(d: bytes, n: int) -> list[bytes | None]:
    """Parse /DecodeParms (or its /DP alias) into a list of per-filter
    parameter dicts aligned with an ``n``-entry /Filter chain (ISO
    32000 §7.3.8.2: when /Filter is an array, /DecodeParms is a
    parallel array of dicts-or-null). A single dict with a multi-
    filter chain is malformed per spec; real writers that emit it
    mean the FINAL (usually Flate) filter, so it lands on the last
    slot. Dicts here are flat (/Predictor /Colors /Columns /Bits
    PerComponent /EarlyChange), so the non-greedy ``<<.*?>>`` match
    is exact."""
    m = re.search(rb"/(?:DecodeParms|DP)\s*(\[|<<|null)", d)
    if not m or m.group(1) == b"null":
        return [None] * n
    if m.group(1) == b"<<":
        dm = re.compile(rb"<<.*?>>", re.S).match(d, m.start(1))
        entry = dm.group(0) if dm else None
        return [None] * (n - 1) + [entry]
    out: list[bytes | None] = []
    pos = m.end(1)
    tok_re = re.compile(rb"\s*(<<.*?>>|null|\])", re.S)
    while len(out) < n:
        c = tok_re.match(d, pos)
        if c is None or c.group(1) == b"]":
            break
        out.append(None if c.group(1) == b"null" else c.group(1))
        pos = c.end()
    return out + [None] * (n - len(out))


def _decode_filters(d: bytes, raw: bytes) -> bytes | None:
    """Apply the stream dict's /Filter chain (array order). Supported:
    FlateDecode, LZWDecode (honoring /EarlyChange 0), ASCII85Decode,
    RunLengthDecode — chains like [/ASCII85Decode /FlateDecode]
    included — plus /Predictor DecodeParms (r9): TIFF horizontal
    differencing (2) and the PNG row predictors (10-15: None/Sub/Up/
    Average/Paeth per the row tag byte). Per r10 ADVICE, /DecodeParms
    is parsed as the PARALLEL ARRAY ISO 32000 §7.3.8.2 defines, and
    each entry's predictor (and /EarlyChange) is un-applied right
    after ITS OWN filter — a predictor belonging to a non-final
    filter in a chain no longer runs at the wrong stage. Returns None
    (caller skips the stream, never mis-parses) for image filters
    (DCT/JBIG2/JPX/CCITT), unknown predictors, or undecodable
    payloads."""
    m = _FILTER_RE.search(d)
    if not m:
        return raw
    names = re.findall(rb"/([A-Za-z0-9]+)", m.group(1))
    parms = _decode_parms_list(d, len(names))

    def param(entry: bytes | None, name: bytes, default: int) -> int:
        g = re.search(rb"/" + name + rb"\s+(\d+)", entry or b"")
        return int(g.group(1)) if g else default

    body = raw
    for nm, entry in zip(names, parms):
        if nm in (b"FlateDecode", b"Fl"):
            body = _inflate(body)
            if body is None:
                return None
        elif nm in (b"LZWDecode", b"LZW"):
            em = re.search(rb"/EarlyChange\s+(\d+)", entry or d)
            try:
                body = _lzw_decode(body,
                                   early=int(em.group(1)) if em else 1)
            except (ValueError, KeyError):
                return None
        elif nm in (b"ASCII85Decode", b"A85"):
            try:
                body = _ascii85_decode(body)
            except ValueError:
                return None
        elif nm in (b"RunLengthDecode", b"RL"):
            try:
                body = _rle_decode(body)
            except ValueError:
                return None
        else:
            return None                     # image/other filter: skip
        pred = param(entry, b"Predictor", 1)
        if pred > 1:
            try:
                body = _unpredict(body, pred, param(entry, b"Colors", 1),
                                  param(entry, b"BitsPerComponent", 8),
                                  param(entry, b"Columns", 1))
            except ValueError:
                return None
    if not any(parms):
        # nonstandard bare /Predictor outside DecodeParms: honor it
        # after the chain (pre-r10 behavior) rather than mis-parse
        pm = re.search(rb"/Predictor\s+(\d+)", d)
        if pm and int(pm.group(1)) > 1:
            try:
                body = _unpredict(body, int(pm.group(1)),
                                  param(d, b"Colors", 1),
                                  param(d, b"BitsPerComponent", 8),
                                  param(d, b"Columns", 1))
            except ValueError:
                return None
    return body


def _unpredict(data: bytes, predictor: int, colors: int, bpc: int,
               columns: int) -> bytes:
    """Un-apply a /Predictor (ISO 32000 §7.4.4.4). TIFF predictor 2 =
    per-row horizontal component differencing (8-bit components only —
    the case real writers emit); 10-15 = PNG filters (RFC 2083 §6),
    where each row carries its own filter-type tag byte and the
    DecodeParms value only declares 'PNG family'. Rows are
    ``ceil(columns*colors*bpc/8)`` bytes; a short final row (stream
    length not a row multiple) is processed at its own length."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if predictor == 2:
        if bpc != 8:
            raise ValueError("pdf predictor: TIFF differencing with "
                             f"BitsPerComponent {bpc} unsupported")
        out = bytearray(data)
        for r0 in range(0, len(out), rowlen):
            end = min(r0 + rowlen, len(out))
            for i in range(r0 + colors, end):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    if not 10 <= predictor <= 15:
        raise ValueError(f"pdf predictor: unknown /Predictor {predictor}")
    out = bytearray()
    prev = bytes(rowlen)
    pos, n = 0, len(data)
    while pos < n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos:pos + rowlen])
        pos += len(row)
        if ft == 0:                          # None
            pass
        elif ft == 1:                        # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:                        # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:                        # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                        # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc
                                                      else c)
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise ValueError(f"pdf predictor: bad PNG filter tag {ft}")
        out += row
        prev = bytes(row) + bytes(rowlen - len(row))
    return bytes(out)


def _predict_encode(data: bytes, predictor: int, colors: int, bpc: int,
                    columns: int) -> bytes:
    """Fixture-side inverse of :func:`_unpredict`. PNG rows cycle the
    five filter types deterministically (row index % 5) so one encoded
    fixture exercises None/Sub/Up/Average/Paeth."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if predictor == 2:
        out = bytearray(data)
        for r0 in range(0, len(out), rowlen):
            end = min(r0 + rowlen, len(out))
            for i in range(end - 1, r0 + colors - 1, -1):
                out[i] = (out[i] - out[i - colors]) & 0xFF
        return bytes(out)
    out = bytearray()
    prev = bytes(rowlen)
    for ri, r0 in enumerate(range(0, len(data), rowlen)):
        row = data[r0:r0 + rowlen]
        ft = ri % 5
        enc = bytearray(row)
        if ft == 1:
            for i in range(len(row) - 1, bpp - 1, -1):
                enc[i] = (enc[i] - row[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(len(row)):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc
                                                      else c)
                enc[i] = (enc[i] - pr) & 0xFF
        out += bytes([ft]) + enc
        prev = bytes(row) + bytes(rowlen - len(row))
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000 §7.4.5): length byte L — 0..127 copies
    L+1 literal bytes, 129..255 repeats the next byte 257-L times,
    128 = EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            if i + ln + 1 > n:
                raise ValueError("pdf rle: truncated literal run")
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise ValueError("pdf rle: truncated repeat run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Fixture-side inverse of :func:`_rle_decode`."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while j < n and j - i < 128 and (j + 1 >= n
                                         or data[j] != data[j + 1]):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


def _inflate(raw: bytes) -> bytes | None:
    try:
        return zlib.decompress(raw)
    except zlib.error:
        try:  # some writers emit raw deflate
            return zlib.decompress(raw, wbits=-15)
        except zlib.error:
            return None


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (ISO 32000 §7.4.3): 5 chars '!'..'u' -> 4 bytes
    base-85, 'z' -> four zero bytes, whitespace ignored, '~>' EOD,
    partial final group of n chars -> n-1 bytes (pad with 'u')."""
    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c == 0x7A:                       # 'z'
            if group:
                raise ValueError("pdf ascii85: 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (33 <= c <= 117):
            raise ValueError(f"pdf ascii85: invalid byte {c}")
        group.append(c - 33)
        if len(group) == 5:
            acc = 0
            for g in group:
                acc = acc * 85 + g
            if acc > 0xFFFFFFFF:
                raise ValueError("pdf ascii85: group overflow")
            out += acc.to_bytes(4, "big")
            group = []
    if group:
        n = len(group)
        if n == 1:
            raise ValueError("pdf ascii85: lone trailing digit")
        group += [84] * (5 - n)             # pad with 'u'
        acc = 0
        for g in group:
            acc = acc * 85 + g
        out += acc.to_bytes(4, "big")[:n - 1]
    return bytes(out)


def _ascii85_encode(data: bytes) -> bytes:
    """Fixture-side inverse of :func:`_ascii85_decode` ('z' shorthand
    emitted for zero groups, '~>' terminator)."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        n = len(chunk)
        acc = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        if acc == 0 and n == 4:
            out.append(0x7A)
            continue
        digits = []
        for _ in range(5):
            digits.append(acc % 85)
            acc //= 85
        enc = bytes(d + 33 for d in reversed(digits))
        out += enc if n == 4 else enc[:n + 1]
    return bytes(out) + b"~>"


def _lzw_decode(data: bytes, *, early: int = 1) -> bytes:
    """LZWDecode (ISO 32000 §7.4.4 / TIFF variant): MSB-first packed
    codes, 256=clear, 257=EOD, 9->12 bit widths, EarlyChange=1 default
    (width bumps one code early)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:                 # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:                 # EOD
                return bytes(out)
            if prev is None:
                if code not in table:
                    raise ValueError("pdf lzw: bad first code")
                entry = table[code]
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:     # KwKwK case
                    entry = prev + prev[:1]
                else:
                    raise ValueError("pdf lzw: code out of range")
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            out += entry
            prev = entry
            # the decoder's table lags the encoder's by ONE entry (the
            # classic LZW lag), so its bump threshold sits one lower
            # than the encoder's. early=1: bump at next_code 511/1023/
            # 2047 — the de-facto PDF rule (pdf.js, libtiff compat).
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, *, early: int = 1) -> bytes:
    """Fixture-side inverse of :func:`_lzw_decode` (leading clear code,
    trailing EOD, same EarlyChange width law)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # one above the decoder's threshold (see _lzw_decode)
            if next_code - 1 + early >= (1 << width) and width < 12:
                width += 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at the '('; returns
    (decoded bytes, index past the closing ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:                       # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:         # octal, 1-3 digits
                o = 0
                for _ in range(3):
                    if i < n and 0x30 <= data[i] <= 0x37:
                        o = o * 8 + (data[i] - 0x30)
                        i += 1
                    else:
                        break
                out.append(o & 0xFF)
            elif e in b"\r\n":              # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:                           # unknown escape: literal
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    j = data.find(b">", i)
    if j == -1:
        j = len(data)
    hx = re.sub(rb"\s", b"", data[i + 1:j])
    if len(hx) % 2:
        hx += b"0"                          # spec: odd final digit -> 0
    return bytes.fromhex(hx.decode("ascii", "ignore")), j + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _parse_cmap(body: bytes):
    """Parse a /ToUnicode CMap stream (ISO 32000 §9.10.3 / Adobe CMap
    syntax): ``begincodespacerange`` fixes the code byte-width,
    ``bfchar`` maps single codes, ``bfrange`` maps runs (scalar-dst
    increment form and array-dst form). Destinations are UTF-16BE hex
    (surrogate pairs included). Returns (code_width_bytes,
    {code: str}) or None when the stream has no bf sections."""
    width = 1
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", body)
    if m:
        width = max(1, len(m.group(1)) // 2)
    mapping: dict[int, str] = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", body, re.S):
        for pm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>",
                              sec.group(1)):
            dst = bytes.fromhex(pm.group(2).decode("ascii"))
            mapping[int(pm.group(1), 16)] = dst.decode(
                "utf-16-be", "surrogatepass")
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", body, re.S):
        for pm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(\[[^\]]*\]|<[0-9A-Fa-f]*>)", sec.group(1)):
            lo, hi = int(pm.group(1), 16), int(pm.group(2), 16)
            tgt = pm.group(3)
            if tgt.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]*)>", tgt)
                for k, dh in enumerate(dsts):
                    if lo + k > hi:
                        break
                    mapping[lo + k] = bytes.fromhex(
                        dh.decode("ascii")).decode("utf-16-be",
                                                   "surrogatepass")
            else:
                base = bytes.fromhex(tgt[1:-1].decode("ascii"))
                if not base:
                    continue
                start = int.from_bytes(base, "big")
                for k in range(hi - lo + 1):
                    mapping[lo + k] = (start + k).to_bytes(
                        len(base), "big").decode("utf-16-be",
                                                 "surrogatepass")
    if not mapping:
        return None
    return width, mapping


def _agl_table() -> dict[str, str]:
    """Adobe Glyph List subset (public AGL 2.0): the Standard-14 /
    Latin-1 range plus the common typographic specials — every name a
    legacy simple-font /Differences array realistically carries.
    Accented-letter names follow the AGL ``<base><accent>`` pattern
    and are generated via NFC composition."""
    import unicodedata as ud

    t = {c: c for c in
         "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"}
    t.update({
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&",
        "quotesingle": "'", "parenleft": "(", "parenright": ")",
        "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
        "period": ".", "slash": "/", "zero": "0", "one": "1",
        "two": "2", "three": "3", "four": "4", "five": "5", "six": "6",
        "seven": "7", "eight": "8", "nine": "9", "colon": ":",
        "semicolon": ";", "less": "<", "equal": "=", "greater": ">",
        "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
        "exclamdown": "¡", "cent": "¢", "sterling": "£",
        "currency": "¤", "yen": "¥", "brokenbar": "¦",
        "section": "§", "dieresis": "¨",
        "copyright": "©", "ordfeminine": "ª",
        "guillemotleft": "«", "logicalnot": "¬",
        "registered": "®", "macron": "¯",
        "degree": "°", "plusminus": "±", "acute": "´",
        "mu": "µ", "paragraph": "¶",
        "periodcentered": "·", "cedilla": "¸",
        "ordmasculine": "º", "guillemotright": "»",
        "onequarter": "¼", "onehalf": "½",
        "threequarters": "¾", "questiondown": "¿",
        "multiply": "×", "divide": "÷",
        "ae": "æ", "AE": "Æ", "oslash": "ø",
        "Oslash": "Ø", "thorn": "þ", "Thorn": "Þ",
        "eth": "ð", "Eth": "Ð", "germandbls": "ß",
        "bullet": "•", "endash": "–", "emdash": "—",
        "quoteleft": "‘", "quoteright": "’",
        "quotedblleft": "“", "quotedblright": "”",
        "quotesinglbase": "‚", "quotedblbase": "„",
        "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
        "perthousand": "‰", "trademark": "™",
        "Euro": "€", "florin": "ƒ", "fi": "ﬁ",
        "fl": "ﬂ", "fraction": "⁄", "minus": "−",
        "OE": "Œ", "oe": "œ", "Scaron": "Š",
        "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
        "Ydieresis": "Ÿ", "dotlessi": "ı",
        "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
        "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
        "tilde": "˜", "hungarumlaut": "˝",
    })
    marks = {"grave": "̀", "acute": "́",
             "circumflex": "̂", "tilde": "̃",
             "dieresis": "̈", "ring": "̊",
             "cedilla": "̧"}
    for base in "aeiouyncAEIOUYNC":
        for acc, mark in marks.items():
            ch = ud.normalize("NFC", base + mark)
            if len(ch) == 1:
                t[base + acc] = ch
    return t


_AGL = _agl_table()
_UNI_NAME_RE = re.compile(r"uni((?:[0-9A-Fa-f]{4})+)\Z")
_U_NAME_RE = re.compile(r"u([0-9A-Fa-f]{4,6})\Z")


def _glyph_char(name: str) -> str | None:
    """Glyph name -> unicode text per the public AGL algorithm: the
    table first, then ``uniXXXX`` (one or more UTF-16BE units) and
    ``uXXXX[XX]`` scalar forms. None for unknown names (caller falls
    through to the base-encoding byte)."""
    hit = _AGL.get(name)
    if hit is not None:
        return hit
    m = _UNI_NAME_RE.match(name)
    if m:
        hx = m.group(1)
        units = bytes.fromhex(hx)
        try:
            return units.decode("utf-16-be", "surrogatepass")
        except ValueError:
            return None
    m = _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp < 0x110000 else None
    return None


_DIFF_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)

#: named base encodings -> python codecs (public tables: WinAnsi IS
#: cp1252, MacRoman IS mac_roman; PDFDocEncoding ~ latin-1 in the
#: ranges fonts actually show).
_BASE_ENCODINGS = {b"WinAnsiEncoding": "cp1252",
                   b"MacRomanEncoding": "mac_roman"}


def _base_encoding_map(codec: str) -> dict[int, str]:
    """{code: char} for the bytes where a named base encoding differs
    from the Latin-1 fallback (only 0x80..0xFF can; undefined bytes
    stay unmapped and fall through)."""
    out: dict[int, str] = {}
    for b in range(0x80, 0x100):
        try:
            ch = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue
        if ch != chr(b):
            out[b] = ch
    return out


def _parse_encoding(enc_body: bytes):
    """Parse a simple-font /Encoding value — a bare base-encoding name
    (``/WinAnsiEncoding`` / ``/MacRomanEncoding``: the common real-web
    Latin shape) or a dict whose optional /BaseEncoding seeds the map
    and whose /Differences array (ISO 32000 §9.6.5.2: an int sets the
    next code, each following /name maps that code and increments)
    overrides it — into the same (width=1, {code: str}) shape as a
    parsed CMap, so :func:`_show` needs no second decode path. Names
    the AGL subset can't resolve are left unmapped — those codes fall
    through to the Latin-1 byte, the documented approximation."""
    mapping: dict[int, str] = {}
    nm = re.match(rb"\s*/([A-Za-z]+)\s*\Z", enc_body) \
        if not enc_body.lstrip().startswith(b"<<") else None
    base_name = nm.group(1) if nm else None
    if base_name is None:
        bm = re.search(rb"/BaseEncoding\s*/([A-Za-z]+)", enc_body)
        base_name = bm.group(1) if bm else None
    codec = _BASE_ENCODINGS.get(base_name or b"")
    if codec:
        mapping.update(_base_encoding_map(codec))
    m = _DIFF_RE.search(enc_body)
    if m:
        code = 0
        for tok in re.finditer(rb"(\d+)|/([^\s/<>\[\]()%]+)",
                               m.group(1)):
            if tok.group(1) is not None:
                code = int(tok.group(1))
                continue
            ch = _glyph_char(tok.group(2).decode("latin-1"))
            if ch is not None:
                mapping[code] = ch
            code += 1
    return (1, mapping) if mapping else None


def _show(s: bytes, cmap) -> str:
    """Decode one shown string: through the active font's /ToUnicode
    CMap when present (codes consumed ``width`` bytes at a time,
    unmapped codes pass through as their code point), else Latin-1 —
    the documented Standard-14 approximation."""
    if cmap is None:
        return s.decode("latin-1")
    width, mapping = cmap
    out = []
    j, n = 0, len(s)
    while j + width <= n:
        code = int.from_bytes(s[j:j + width], "big")
        out.append(mapping.get(code,
                               chr(code) if code < 0x110000 else ""))
        j += width
    if j < n:                               # trailing partial code
        out.append(s[j:].decode("latin-1"))
    return "".join(out)


def _content_lines(cs: bytes, fonts=None) -> list[str]:
    """Replay the text operators of one content stream into lines.
    ``fonts`` maps /Name resource tokens to parsed CMaps; ``Tf``
    switches the active decode accordingly."""
    fonts = fonts or {}
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []                        # operands since last operator
    in_text = False
    cmap = None                             # active font's /ToUnicode
    i, n = 0, len(cs)

    def newline():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = cs[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
            continue
        if c == 0x25:                       # % comment to EOL
            j = cs.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == 0x28:                       # (
            s, i = _literal_string(cs, i)
            stack.append(s)
            continue
        if c == 0x3C:                       # < or <<
            if cs[i:i + 2] == b"<<":
                j = cs.find(b">>", i)
                i = n if j == -1 else j + 2
                stack.append(None)          # dict operand (ignored)
                continue
            s, i = _hex_string(cs, i)
            stack.append(s)
            continue
        if c == 0x5B:                       # [ array — collect in place
            stack.append("[")
            i += 1
            continue
        if c == 0x5D:                       # ]
            arr = []
            while stack and stack[-1] != "[":
                arr.append(stack.pop())
            if stack:
                stack.pop()
            stack.append(list(reversed(arr)))
            i += 1
            continue
        if c == 0x2F:                       # /Name
            m = re.match(rb"/[^\s/<>\[\]()%]*", cs[i:])
            stack.append(cs[i:i + m.end()])
            i += m.end()
            continue
        m = _NUM_RE.match(cs, i)
        if m and (c in b"+-.0123456789"):
            stack.append(float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(cs, i)
        if not m:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"BT":
            in_text = True
            stack.clear()
            continue
        if op == b"ET":
            newline()
            in_text = False
            stack.clear()
            continue
        if op == b"Tf":                     # font switch (also outside BT)
            for el in reversed(stack):
                if isinstance(el, bytes) and el.startswith(b"/"):
                    cmap = fonts.get(el)
                    break
            stack.clear()
            continue
        if not in_text:
            stack.clear()
            continue
        if op == b"Tj" and stack and isinstance(stack[-1], bytes):
            cur.append(_show(stack[-1], cmap))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(_show(el, cmap))
                elif isinstance(el, float) and el <= TJ_SPACE_THRESHOLD:
                    # kerning gap wide enough to read as a word break
                    if not (cur and cur[-1].endswith(" ")):
                        cur.append(" ")
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            newline()
            cur.append(_show(stack[-1], cmap))
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            newline()                       # aw ac string "
            cur.append(_show(stack[-1], cmap))
        elif op in (b"Td", b"TD"):
            # vertical move -> new visual line; pure-horizontal Td is a
            # column move within the line
            if len(stack) >= 2 and isinstance(stack[-1], float) \
                    and stack[-1] != 0.0:
                newline()
        elif op in (b"T*", b"Tm"):
            newline()
        stack.clear()
    newline()
    return lines


def _stream_payload(data: bytes, m) -> bytes | None:
    """Slice + decode ONE stream object (``m`` is a _STREAM_RE match).

    Slice candidates, best-evidence first. A direct /Length N is exact
    per ISO 32000 §7.3.8 (the EOL before ``endstream`` is NOT part of
    the stream), so it is immune to the payload-ends-in-0x0D ambiguity
    that EOL-stripping hits: a deflate body whose last byte is \\r
    followed by the writer's \\n terminator looks exactly like a \\r\\n
    terminator. When /Length is an indirect reference (or absent /
    oversized), fall back to scanning for ``endstream`` and stripping
    at most one spec EOL — trying BOTH widths of a trailing \\r\\n,
    since inflate failure reliably rejects the wrong guess for Flate
    streams. Returns None for non-Flate-filtered or undecodable
    streams (callers skip, never mis-parse)."""
    start = m.end()
    d = m.group(1)
    raws: list[bytes] = []
    lm = _LENGTH_RE.search(d)
    if lm and lm.group(2) is None:
        nbytes = int(lm.group(1))
        if start + nbytes <= len(data):
            raws.append(data[start:start + nbytes])
    end = data.find(b"endstream", start)
    if end != -1:
        raw = data[start:end]
        if raw.endswith(b"\r\n"):
            raws.extend((raw[:-2], raw[:-1]))
        elif raw.endswith(b"\n"):
            raws.append(raw[:-1])
        else:
            raws.append(raw)
        raws = list(dict.fromkeys(raws))    # dedup, keep order
    if not raws:
        return None
    if b"/Filter" in d:
        for raw in raws:                    # exact-length slice first;
            body = _decode_filters(d, raw)  # EOL-stripped scan as the
            if body is not None:            # malformed-/Length fallback
                return body
        return None
    return raws[0]


def _objstm_objects(data: bytes) -> dict[int, bytes]:
    """Unpack /Type /ObjStm compressed object streams (ISO 32000
    §7.5.7 — where PDF 1.5+ files keep their non-stream objects: font
    dicts, page dicts, resources): decoded layout is ``N`` pairs of
    ``objnum offset`` then the object bodies starting at /First.
    Returns {objnum: body bytes}. Streams cannot live inside an
    ObjStm, so /ToUnicode CMaps stay regular objects."""
    out: dict[int, bytes] = {}
    for m in _STREAM_RE.finditer(data):
        d = m.group(1)
        if not re.search(rb"/Type\s*/ObjStm", d):
            continue
        body = _stream_payload(data, m)
        if body is None:
            continue
        nm = re.search(rb"/N\s+(\d+)", d)
        fm = re.search(rb"/First\s+(\d+)", d)
        if not nm or not fm:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        head = re.findall(rb"(\d+)\s+(\d+)",
                          body[:first])[:n]
        offs = [(int(a), int(b)) for a, b in head]
        for i, (objn, off) in enumerate(offs):
            end = offs[i + 1][1] if i + 1 < len(offs) else \
                len(body) - first
            out[objn] = body[first + off:first + end]
    return out


def _font_cmaps(data: bytes) -> dict[bytes, tuple]:
    """Resolve /Font resource names to per-font decode maps: object
    table (raw ``N g obj`` scan, xref-free, PLUS /ObjStm members —
    r8) -> font dicts -> ``/ToUnicode M 0 R`` CMap streams
    (:func:`_parse_cmap`), or — r9, for legacy simple fonts without
    one — the /Encoding value (a bare base-encoding name, an inline
    dict with /BaseEncoding + /Differences, or an indirect
    ``/Encoding N 0 R`` object), normalized by :func:`_parse_encoding`
    to the same (width, {code: str}) shape. /ToUnicode wins when both exist (ISO 32000 §9.10.2's
    preferred path). ``/Font << /F1 N 0 R ... >>`` resource entries
    are searched in the raw file AND inside ObjStm bodies, where
    modern writers keep page dicts. Fonts with neither simply stay
    absent (Latin-1 path)."""
    spans: dict[int, tuple[int, int]] = {}
    for om in re.finditer(rb"(\d+)\s+\d+\s+obj\b", data):
        e = data.find(b"endobj", om.end())
        spans[int(om.group(1))] = (om.end(), e if e != -1 else len(data))
    stm_objs = _objstm_objects(data)

    def bodies():
        for num, (s, e) in spans.items():
            yield num, data[s:e]
        yield from stm_objs.items()

    def obj_body(num: int) -> bytes | None:
        if num in stm_objs:
            return stm_objs[num]
        span = spans.get(num)
        return data[span[0]:span[1]] if span else None

    cmap_of_obj: dict[int, tuple] = {}
    for num, body in bodies():
        if not re.search(rb"/Type\s*/Font", body):
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if tm:
            tspan = spans.get(int(tm.group(1)))
            if not tspan:
                continue
            sm = _STREAM_RE.search(data, tspan[0], tspan[1])
            if not sm:
                continue
            payload = _stream_payload(data, sm)
            if payload is None:
                continue
            cm = _parse_cmap(payload)
            if cm:
                cmap_of_obj[num] = cm
            continue
        em = re.search(
            rb"/Encoding\s*(<<.*?>>|\d+\s+\d+\s+R|/[A-Za-z]+)", body,
            re.S)
        if not em:
            continue
        enc = em.group(1)
        if enc[:1] == b"/":
            pass                            # bare base-encoding name
        elif not enc.startswith(b"<<"):
            ref = obj_body(int(enc.split()[0]))
            if ref is None:
                continue
            enc = ref
        dm = _parse_encoding(enc)
        if dm:
            cmap_of_obj[num] = dm
    if not cmap_of_obj:
        return {}
    fonts: dict[bytes, tuple] = {}
    sources = [data] + list(stm_objs.values())
    for src in sources:
        for rm in re.finditer(rb"/Font\s*<<(.*?)>>", src, re.S):
            for pm in re.finditer(
                    rb"/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R",
                    rm.group(1)):
                objn = int(pm.group(2))
                if objn in cmap_of_obj:
                    fonts[b"/" + pm.group(1)] = cmap_of_obj[objn]
    return fonts


def extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text, lines joined with ``\\n``.

    Raises ValueError (named) for encrypted files; skips streams with
    image filters; returns "" when no text-bearing content stream is
    found. Fonts carrying a /ToUnicode CMap decode exactly (full
    Unicode); legacy simple fonts with /Encoding /Differences decode
    via the AGL-name subset (r9); the rest decode Latin-1 (exact for
    Standard-14/ASCII, documented approximation otherwise)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("pdf: missing %PDF- header")
    if re.search(rb"/Encrypt\b", data):
        raise ValueError("pdf: encrypted files unsupported — decrypt "
                         "upstream (or swap in a full PDF library at "
                         "extract_text)")
    fonts = _font_cmaps(data)
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        body = _stream_payload(data, m)
        if body is None:
            continue
        if b"BT" not in body or (b"Tj" not in body and b"TJ" not in body
                                 and b"'" not in body):
            continue                        # not a text content stream
        lines += _content_lines(body, fonts)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# deterministic synthesizer (fixture source, spec-valid single page)
# ---------------------------------------------------------------------------


def build_pdf(lines: list[str], *, compress: bool | str = True) -> bytes:
    """Spec-valid single-page PDF (Helvetica 12pt, one ``Td``-advanced
    text block) showing ``lines`` — the closed-form fixture source for
    :func:`extract_text` oracles. ``compress``: True/'flate' routes the
    content stream through FlateDecode; 'lzw' / 'a85' / 'a85+flate'
    (the [/ASCII85Decode /FlateDecode] chain) exercise the other
    vendored filters; 'flate+pred' / 'flate+tiff' (r9) predictor-
    encode the content before Flate (PNG row filters cycling all five
    types / TIFF horizontal differencing) and declare the matching
    /DecodeParms; False/'none' writes it raw."""
    def esc(s: str) -> bytes:
        return (s.replace("\\", "\\\\").replace("(", "\\(")
                 .replace(")", "\\)").encode("latin-1"))

    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for k, ln in enumerate(lines):
        if k:
            parts.append(b"0 -14 Td")
        parts.append(b"(" + esc(ln) + b") Tj")
    parts.append(b"ET")
    content = b" ".join(parts)
    mode = {True: "flate", False: "none"}.get(compress, compress)
    if mode == "flate":
        body = zlib.compress(content, 6)
        sdict = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
    elif mode == "lzw":
        body = _lzw_encode(content)
        sdict = b"<< /Length %d /Filter /LZWDecode >>" % len(body)
    elif mode == "a85":
        body = _ascii85_encode(content)
        sdict = b"<< /Length %d /Filter /ASCII85Decode >>" % len(body)
    elif mode == "a85+flate":
        body = _ascii85_encode(zlib.compress(content, 6))
        sdict = (b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode]"
                 b" >>" % len(body))
    elif mode == "flate+pred":
        body = zlib.compress(_predict_encode(content, 12, 1, 8, 24), 6)
        sdict = (b"<< /Length %d /Filter /FlateDecode /DecodeParms "
                 b"<< /Predictor 12 /Columns 24 >> >>" % len(body))
    elif mode == "flate+tiff":
        body = zlib.compress(_predict_encode(content, 2, 1, 8, 16), 6)
        sdict = (b"<< /Length %d /Filter /FlateDecode /DecodeParms "
                 b"<< /Predictor 2 /Columns 16 >> >>" % len(body))
    elif mode == "none":
        body = content
        sdict = b"<< /Length %d >>" % len(body)
    else:
        raise ValueError(f"build_pdf: unknown compress mode {compress!r}")

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        sdict + b"\nstream\n" + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def build_pdf_unicode(lines: list[str], *, compress: bool = True,
                      objstm: bool = False) -> bytes:
    """Spec-valid single-page PDF whose text rides a Type0 composite
    font with 2-byte codes and a /ToUnicode CMap — the shape real
    non-Latin (CJK/Cyrillic/Arabic) PDFs use, and the fixture source
    for the CMap decode path. Each distinct character gets a
    sequential 2-byte code; text shows as hex strings; the CMap stream
    carries ``bfchar`` entries mapping codes to UTF-16BE (surrogate
    pairs for astral chars). Round-trips ANY unicode text through
    :func:`extract_text` exactly.

    ``objstm=True`` (r8) emits the PDF 1.5+ layout real modern writers
    use: catalog/pages/page/font dicts packed into a /Type /ObjStm
    compressed object stream, cross-referenced by a /Type /XRef stream
    with type-2 entries (W [1 2 2]) — exercising the extractor's
    ObjStm unpacking (the font dict and /Font resources are only
    reachable through it)."""
    chars = sorted({c for ln in lines for c in ln})
    if len(chars) > 0xFFFE:
        raise ValueError("pdf: >65534 distinct characters")
    code_of = {c: i + 1 for i, c in enumerate(chars)}

    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for k, ln in enumerate(lines):
        if k:
            parts.append(b"0 -14 Td")
        hx = "".join("%04X" % code_of[c] for c in ln)
        parts.append(b"<" + hx.encode("ascii") + b"> Tj")
    parts.append(b"ET")
    content = b" ".join(parts)

    bf = ["<%04X> <%s>" % (code_of[c],
                           c.encode("utf-16-be").hex().upper())
          for c in chars]
    blocks = []                 # spec: <=100 entries per bfchar block
    for i in range(0, len(bf), 100):
        chunk = bf[i:i + 100]
        blocks.append("%d beginbfchar\n%s\nendbfchar"
                      % (len(chunk), "\n".join(chunk)))
    cmap = ("/CIDInit /ProcSet findresource begin\n12 dict begin\n"
            "begincmap\n"
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            + "\n".join(blocks) +
            "\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
            "end\nend").encode("ascii")

    def stream_obj(body: bytes) -> bytes:
        if compress:
            z = zlib.compress(body, 6)
            return (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                    % len(z)) + z + b"\nendstream"
        return (b"<< /Length %d >>\nstream\n" % len(body)) + body \
            + b"\nendstream"

    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    pages = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    page = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>")

    if not objstm:
        objs = [catalog, pages, page, stream_obj(content), font,
                stream_obj(cmap)]
        out = bytearray(b"%PDF-1.4\n")
        offsets = [0]
        for i, o in enumerate(objs, 1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
                b"%%%%EOF" % (len(objs) + 1, xref_at))
        return bytes(out)

    # PDF 1.5 layout: dict objects 1/2/3/5 pack into ObjStm obj 7,
    # streams stay regular (4 content, 6 cmap), obj 8 is the xref stream
    members = [(1, catalog), (2, pages), (3, page), (5, font)]
    header, off = [], 0
    for objn, body in members:
        header.append(b"%d %d" % (objn, off))
        off += len(body) + 1
    head = b" ".join(header) + b"\n"
    stm_body = head + b"\n".join(b for _, b in members) + b"\n"
    objstm_obj = (b"<< /Type /ObjStm /N %d /First %d /Length %d >>"
                  b"\nstream\n" % (len(members), len(head), len(stm_body))
                  ) + stm_body + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for objn, o in ((4, stream_obj(content)), (6, stream_obj(cmap)),
                    (7, objstm_obj)):
        offsets[objn] = len(out)
        out += b"%d 0 obj\n" % objn + o + b"\nendobj\n"
    xref_at = len(out)
    # xref stream entries, W [1 4 2]: (type, f2, f3) for obj 0..8 —
    # 4-byte offsets so a large CMap/content fixture can't overflow
    idx_of = {objn: i for i, (objn, _) in enumerate(members)}
    rows = []
    for objn in range(9):
        if objn == 0:
            rows.append((0, 0, 65535))
        elif objn in idx_of:
            rows.append((2, 7, idx_of[objn]))       # in ObjStm 7
        elif objn == 8:
            rows.append((1, xref_at, 0))
        else:
            rows.append((1, offsets[objn], 0))
    xdata = b"".join(t.to_bytes(1, "big") + a.to_bytes(4, "big")
                     + b.to_bytes(2, "big") for t, a, b in rows)
    xz = zlib.compress(xdata, 6)
    out += (b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] /Root 1 0 R "
            b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(xz)
            ) + xz + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF" % xref_at
    return bytes(out)


_AGL_NAME_OF: dict[str, str] = {}
for _n, _c in sorted(_AGL.items()):
    _AGL_NAME_OF.setdefault(_c, _n)         # deterministic first name


def build_pdf_differences(lines: list[str], *, compress: bool = True,
                          indirect_encoding: bool = False) -> bytes:
    """Spec-valid single-page PDF whose text rides a LEGACY simple
    Type1 font with a custom /Encoding /Differences array — the
    pre-ToUnicode shape symbolic and subset fonts use (r9, the CMap
    work's legacy analog). Every distinct character gets a sequential
    1-byte code from 32; the /Differences array names it with its AGL
    glyph name when one exists at an even char index and the
    ``uniXXXX`` form otherwise (both resolution paths exercised in
    every fixture); text shows as 1-byte hex strings. Astral chars
    use the ``uXXXXXX`` scalar form. ``indirect_encoding`` moves the
    encoding dict into its own ``N 0 R`` object (both layouts appear
    in the wild). Round-trips any text whose distinct-char count fits
    224 codes through :func:`extract_text` exactly."""
    chars = sorted({c for ln in lines for c in ln})
    if len(chars) > 224:
        raise ValueError("pdf differences: >224 distinct characters")
    code_of = {c: i + 32 for i, c in enumerate(chars)}

    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for k, ln in enumerate(lines):
        if k:
            parts.append(b"0 -14 Td")
        hx = "".join("%02X" % code_of[c] for c in ln)
        parts.append(b"<" + hx.encode("ascii") + b"> Tj")
    parts.append(b"ET")
    content = b" ".join(parts)

    names = []
    for i, c in enumerate(chars):
        if ord(c) > 0xFFFF:
            names.append("u%06X" % ord(c))
        elif i % 2 == 0 and c in _AGL_NAME_OF:
            names.append(_AGL_NAME_OF[c])
        else:
            names.append("uni%04X" % ord(c))
    diff = ("[ 32 " + " ".join("/" + n for n in names)
            + " ]").encode("ascii")
    encdict = (b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
               b"/Differences " + diff + b" >>")

    if compress:
        z = zlib.compress(content, 6)
        stream = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                  % len(z)) + z + b"\nendstream"
    else:
        stream = (b"<< /Length %d >>\nstream\n" % len(content)
                  ) + content + b"\nendstream"

    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding " + (b"6 0 R" if indirect_encoding else encdict)
            + b" >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream,
        font,
    ]
    if indirect_encoding:
        objs.append(encdict)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, o in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)
