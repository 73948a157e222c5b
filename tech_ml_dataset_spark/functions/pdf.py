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


def _content_lines(cs: bytes) -> list[str]:
    """Replay the text operators of one content stream into lines."""
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []                        # operands since last operator
    in_text = False
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
        if not in_text:
            stack.clear()
            continue
        if op == b"Tj" and stack and isinstance(stack[-1], bytes):
            cur.append(stack[-1].decode("latin-1"))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(el.decode("latin-1"))
                elif isinstance(el, float) and el <= TJ_SPACE_THRESHOLD:
                    # kerning gap wide enough to read as a word break
                    if not (cur and cur[-1].endswith(" ")):
                        cur.append(" ")
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            newline()
            cur.append(stack[-1].decode("latin-1"))
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            newline()                       # aw ac string "
            cur.append(stack[-1].decode("latin-1"))
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


def extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text, lines joined with ``\\n``.

    Raises ValueError (named) for encrypted files; skips non-Flate
    streams; returns "" when no text-bearing content stream is found."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("pdf: missing %PDF- header")
    if re.search(rb"/Encrypt\b", data):
        raise ValueError("pdf: encrypted files unsupported — decrypt "
                         "upstream (or swap in a full PDF library at "
                         "extract_text)")
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end == -1:
            continue
        raw = data[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
        d = m.group(1)
        if b"/Filter" in d:
            if b"/FlateDecode" not in d:
                continue                    # image/LZW/A85 stream: skip
            body = _inflate(raw)
            if body is None:
                continue
        else:
            body = raw
        if b"BT" not in body or (b"Tj" not in body and b"TJ" not in body
                                 and b"'" not in body):
            continue                        # not a text content stream
        lines += _content_lines(body)
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
