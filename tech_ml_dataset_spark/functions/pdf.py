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

Honest limits, all named: encrypted PDFs raise (``/Encrypt``); streams
with non-Flate filters (DCTDecode images, LZW, ASCII85) are SKIPPED,
not mis-parsed; bytes decode as Latin-1 — exact for the Standard-14-
font / ASCII fixtures this repo synthesizes and a documented
approximation for embedded fonts with custom encodings (full fidelity
needs /ToUnicode CMap parsing — the Pillow-style swap-in point is
:func:`extract_text`).

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


def _inflate(raw: bytes) -> bytes | None:
    try:
        return zlib.decompress(raw)
    except zlib.error:
        try:  # some writers emit raw deflate
            return zlib.decompress(raw, wbits=-15)
        except zlib.error:
            return None


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
        if b"/FlateDecode" not in d:
            return None                     # image/LZW/A85 stream: skip
        for raw in raws:                    # exact-length slice first;
            body = _inflate(raw)            # EOL-stripped scan as the
            if body is not None:            # malformed-/Length fallback
                return body
        return None
    return raws[0]


def _font_cmaps(data: bytes) -> dict[bytes, tuple]:
    """Resolve /Font resource names to parsed /ToUnicode CMaps:
    object table (raw ``N g obj`` scan, xref-free) -> font dicts with
    ``/ToUnicode M 0 R`` -> that object's stream -> :func:`_parse_cmap`
    -> ``/Font << /F1 N 0 R ... >>`` resource entries. Fonts without a
    CMap simply stay absent (Latin-1 path)."""
    spans: dict[int, tuple[int, int]] = {}
    for om in re.finditer(rb"(\d+)\s+\d+\s+obj\b", data):
        e = data.find(b"endobj", om.end())
        spans[int(om.group(1))] = (om.end(), e if e != -1 else len(data))
    cmap_of_obj: dict[int, tuple] = {}
    for num, (s, e) in spans.items():
        body = data[s:e]
        if not re.search(rb"/Type\s*/Font", body):
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if not tm:
            continue
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
    if not cmap_of_obj:
        return {}
    fonts: dict[bytes, tuple] = {}
    for rm in re.finditer(rb"/Font\s*<<(.*?)>>", data, re.S):
        for pm in re.finditer(rb"/([^\s/<>\[\]()%]+)\s+(\d+)\s+\d+\s+R",
                              rm.group(1)):
            objn = int(pm.group(2))
            if objn in cmap_of_obj:
                fonts[b"/" + pm.group(1)] = cmap_of_obj[objn]
    return fonts


def extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text, lines joined with ``\\n``.

    Raises ValueError (named) for encrypted files; skips non-Flate
    streams; returns "" when no text-bearing content stream is found.
    Fonts carrying a /ToUnicode CMap decode exactly (full Unicode);
    others decode Latin-1 (exact for Standard-14/ASCII, documented
    approximation for custom encodings without a CMap)."""
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


def build_pdf(lines: list[str], *, compress: bool = True) -> bytes:
    """Spec-valid single-page PDF (Helvetica 12pt, one ``Td``-advanced
    text block) showing ``lines`` — the closed-form fixture source for
    :func:`extract_text` oracles. ``compress`` routes the content
    stream through FlateDecode, exercising the inflate path."""
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
    if compress:
        body = zlib.compress(content, 6)
        sdict = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
    else:
        body = content
        sdict = b"<< /Length %d >>" % len(body)

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


def build_pdf_unicode(lines: list[str], *, compress: bool = True) -> bytes:
    """Spec-valid single-page PDF whose text rides a Type0 composite
    font with 2-byte codes and a /ToUnicode CMap — the shape real
    non-Latin (CJK/Cyrillic/Arabic) PDFs use, and the fixture source
    for the CMap decode path. Each distinct character gets a
    sequential 2-byte code; text shows as hex strings; the CMap stream
    carries ``bfchar`` entries mapping codes to UTF-16BE (surrogate
    pairs for astral chars). Round-trips ANY unicode text through
    :func:`extract_text` exactly."""
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

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_obj(content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        stream_obj(cmap),
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
