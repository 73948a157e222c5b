"""WARC (Web ARChive, ISO 28500) container support — stdlib only.

The container format the real crawl corpora ship in (Common Crawl's
``.warc.gz`` files): WARC/1.0 records — a header block of
``Name: value`` lines, ``Content-Length``-delimited payload, blank-line
separators — with the per-record-gzip-member convention for ``.gz``
(each record its own deflate stream, so readers can skip records
without decompressing everything).

Every read path STREAMS: gzip members decompress chunk-at-a-time
through ``zlib.decompressobj(31)`` with length-capped output, and the
record parser buffers at most one record — peak task memory is
O(record + chunk), never O(archive). A real CC archive is ~1 GB
compressed / 4-5 GB decompressed; 32 concurrent whole-archive
materializations would OOM any executor.

Surfaces mirror the avro/arrow dataset shape:

* :func:`read_warc_dataset` — the file list becomes the plan source,
  one task per file (the ``.gz`` member structure is not exposed as
  byte splits without an external index — Common Crawl ships ``cdx``
  indexes for that; per-FILE parallelism matches how CC distributes
  work, ~1 GB per file x 64k files per crawl).
* ``response`` records surface as (target_uri, warc_date, record_type,
  http_status, content_type, payload bytes, content_decoded) — the
  HTTP header block is parsed off the payload, ``Transfer-Encoding:
  chunked`` framing is removed, and ``Content-Encoding: gzip/deflate``
  bodies decompress (r9 — what the WET format exists for; raw-bytes
  fallback on malformed framing, loud raise past the 1 GiB bomb
  guard). ``content_decoded`` (r10) is False when a layer was LEFT
  UNDECODED (``br``/``zstd``/unknown coding, malformed stream or
  framing) so a filter can gate out raw-fallback bodies; other
  record types (request, metadata, warcinfo) surface with NULL http
  fields and their raw payload.
* :func:`write_warc_dataset` — one ``part-NNNNN.warc.gz`` per
  partition, each record its own gzip member (the CC layout), written
  executor-side in a single ``mapInPandas`` pass.
* :func:`read_cdx_index` — parses the ``cdx-NNNNN.gz`` CDXJ index
  lines a real crawl ships (SURT key, timestamp, JSON payload with
  filename/offset/length) into the (path, offset, length) triples
  :func:`read_warc_records` consumes — record-level parallelism on
  real archives; :func:`build_cdx_index` is the fixture-side producer.
* :func:`read_cdx_meta` — the same index as a DataFrame (surt, ts,
  url, status, path, off, len), one task per index file: filter the
  INDEX with Spark predicates, then range-read only the survivors —
  the real CC filter-then-fetch pattern.
* :func:`build_columnar_index` / :func:`read_columnar_index` /
  :func:`fetch_index_records` (r10) — the PARQUET columnar index
  (the modern cc-index access path): index predicates run as
  Catalyst pushdown + row-group pruning instead of line-splitting
  gzip text, with a ``content_mime_detected`` sniff column and
  revisit rows typed for pre-fetch exclusion.
* :func:`write_wet_dataset` / :func:`read_wet_dataset` (r9) — the WET
  extracted-text sibling format (``conversion`` records, text/plain
  UTF-8 payloads).
* :func:`wat_metadata` / :func:`write_wat_dataset` /
  :func:`read_wat_dataset` (r9) — the WAT metadata sibling
  (``metadata`` records, JSON status/mime/title/links payloads),
  completing the Common Crawl WARC/WET/WAT triad.
* :func:`payload_text` / :func:`encode_text_payload` (r9) — charset-
  aware capture decode by the Content-Type label, pure Catalyst,
  never-throw; :func:`sniff_mime` / :func:`sniff_mime_bytes` —
  magic-byte format routing from one shared table.
* WARC 1.1 segmented records reassemble on read (r10,
  :func:`_assemble_segments`): a segment run surfaces as ONE record
  with the full payload; ``revisit`` records filter by default
  (``include_revisit=`` opt-in).

Chained with ``webtext.html_to_text`` + the C4/Gopher/dedup batteries,
this closes the pipeline at the true entry point: raw crawl archive in,
training text out, all Spark-side.

Reference parity anchor: none — tech.ml.dataset has no crawl surface;
driver-mandate (training-data pipeline) function. Format facts from the
public ISO 28500 / WARC 1.0 specification and Common Crawl's published
layout only.
"""

from __future__ import annotations

import os
import zlib

_CRLF = b"\r\n"


def _gzip_chunks(f, chunk_size: int = 1 << 20):
    """Yield decompressed chunks of a (possibly multi-member) gzip
    stream WITHOUT materializing the archive: member-at-a-time
    ``zlib.decompressobj(31)``, output bounded to ``chunk_size`` per
    call (``max_length``) — peak memory is O(chunk), not O(file).
    This is the streaming read the per-record-gzip-member layout
    exists for; corrupt member headers raise zlib.error loudly, and
    input that ends MID-member (a truncated download that happens to
    land between chunks — the trailer CRC32/ISIZE never checked)
    raises ValueError instead of silently dropping the tail records
    (r9, ADVICE: ``d.flush()`` at EOF used to paper over this)."""
    d = zlib.decompressobj(31)
    mid_member = False                  # d has consumed input, no trailer yet
    pending = b""
    while True:
        if not pending:
            pending = f.read(chunk_size)
            if not pending:
                if mid_member:
                    raise ValueError(
                        "truncated gzip member: input ended before the "
                        "member trailer (CRC32/ISIZE unverified)")
                return
        out = d.decompress(pending, chunk_size)
        mid_member = True
        if out:
            yield out
        if d.eof:                       # member boundary: fresh obj
            pending = d.unused_data
            d = zlib.decompressobj(31)
            mid_member = False
        elif d.unconsumed_tail:         # output-capped: more input left
            pending = d.unconsumed_tail
        else:
            pending = b""


def _file_chunks(f, chunk_size: int = 1 << 20):
    while True:
        b = f.read(chunk_size)
        if not b:
            return
        yield b


def _iter_records_stream(chunks):
    """Incremental WARC record parse over an iterable of byte chunks.
    Buffers AT MOST one record (header + Content-Length payload) plus
    one chunk — the bounded-memory core of every read path."""
    buf = bytearray()
    it = iter(chunks)
    done = False

    def fill() -> bool:
        nonlocal done
        if done:
            return False
        nxt = next(it, None)
        if nxt is None:
            done = True
            return False
        buf.extend(nxt)
        return True

    while True:
        # tolerate inter-record padding/newlines
        while True:
            pos = 0
            while pos < len(buf) and buf[pos] in (0x0D, 0x0A):
                pos += 1
            if pos:
                del buf[:pos]
            if buf or not fill():
                break
        if not buf:
            return
        # header block
        while True:
            he = buf.find(_CRLF + _CRLF)
            if he != -1 or not fill():
                break
        he = buf.find(_CRLF + _CRLF)
        if not buf.startswith(b"WARC/"):
            raise ValueError(f"warc: expected record header, found "
                             f"{bytes(buf[:12])!r}")
        if he == -1:
            raise ValueError("warc: truncated record header block")
        headers = {}
        for ln in bytes(buf[:he]).split(_CRLF)[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError("warc: record missing a numeric "
                             "Content-Length") from None
        body_start = he + 4
        while len(buf) < body_start + clen:
            if not fill():
                raise ValueError("warc: Content-Length runs past end "
                                 "of file (truncated download)")
        yield headers, bytes(buf[body_start:body_start + clen])
        del buf[:body_start + clen]


def _parse_records(data: bytes):
    """Yield (headers, payload) for each WARC record of an in-memory
    block — the one-chunk special case of :func:`_iter_records_stream`
    (kept for callers that already hold bounded bytes, e.g. CDX range
    slices)."""
    yield from _iter_records_stream((data,))


def _assemble_segments(records):
    """Reassemble WARC 1.1 segmented records (r10 — the last record
    shape that could silently surface WRONG-SHAPED payloads): a
    record carrying ``WARC-Segment-Number: 1`` holds only the FIRST
    fragment of its block, and the ``continuation`` records that
    follow (``WARC-Segment-Origin-ID`` naming the first segment's
    record id, the final one carrying ``WARC-Segment-Total-Length``)
    hold the rest. Without assembly, a segmented response's fragment-1
    bytes parse as a complete HTTP body — truncated content shaped
    like a document.

    Streaming contract preserved: segments of one record are written
    sequentially (the spec's storage convention), so at most ONE
    logical record is buffered — the same O(record) bound as the
    plain parser. Violations fail LOUDLY, matching the
    truncated-gzip-member precedent: an interleaved foreign record
    mid-assembly, a continuation with no open assembly, a total-length
    mismatch, or input ending mid-assembly all raise ValueError
    rather than emit truncated payloads."""
    open_headers = None                 # first segment's headers
    parts: list[bytes] = []
    origin_id = None
    total = None

    def finish():
        headers = dict(open_headers)
        payload = b"".join(parts)
        for k in ("warc-segment-number", "warc-segment-origin-id",
                  "warc-segment-total-length"):
            headers.pop(k, None)
        headers["content-length"] = str(len(payload))
        return headers, payload

    for headers, payload in records:
        seg = headers.get("warc-segment-number")
        if seg is None:
            if open_headers is not None:
                raise ValueError(
                    "warc: unsegmented record interleaved into an open "
                    "segment assembly (origin %r)" % origin_id)
            yield headers, payload
            continue
        try:
            seg_n = int(seg)
        except ValueError:
            raise ValueError(f"warc: non-numeric WARC-Segment-Number "
                             f"{seg!r}") from None
        if seg_n == 1:
            if open_headers is not None:
                raise ValueError(
                    "warc: new segment run started before the previous "
                    "assembly (origin %r) completed" % origin_id)
            open_headers = headers
            parts = [payload]
            origin_id = headers.get("warc-record-id")
            total = None
            continue
        if open_headers is None:
            raise ValueError(
                "warc: continuation segment %d with no open assembly"
                % seg_n)
        oid = headers.get("warc-segment-origin-id")
        if oid is not None and origin_id is not None and oid != origin_id:
            raise ValueError(
                "warc: continuation origin %r does not match the open "
                "assembly %r (interleaved segment runs unsupported)"
                % (oid, origin_id))
        parts.append(payload)
        tl = headers.get("warc-segment-total-length")
        if tl is not None:
            try:
                total = int(tl)
            except ValueError:
                raise ValueError(
                    f"warc: non-numeric WARC-Segment-Total-Length "
                    f"{tl!r}") from None
            got = sum(len(p) for p in parts)
            if got != total:
                raise ValueError(
                    "warc: segment total-length mismatch (declared %d, "
                    "assembled %d)" % (total, got))
            yield finish()
            open_headers, parts, origin_id, total = None, [], None, None
    if open_headers is not None:
        raise ValueError(
            "warc: input ended mid-segment-assembly (origin %r) — the "
            "final WARC-Segment-Total-Length record never arrived"
            % origin_id)


# Decompression-bomb guard for HTTP-level Content-Encoding: a single
# crawl capture legitimately reaches tens of MB decompressed; 1 GiB is
# far past any real page and bounds a crafted bomb to one task's heap.
_MAX_HTTP_BODY = 1 << 30


def _dechunk(body: bytes):
    """Decode ``Transfer-Encoding: chunked`` framing (RFC 9112 §7.1):
    hex size line (chunk extensions after ``;`` ignored), CRLF, chunk
    bytes, CRLF, ...; a ``0`` size line terminates (trailer fields, if
    any, are ignored). Returns the de-framed bytes, or ``None`` when
    the framing is malformed/truncated — the caller falls back to the
    raw payload rather than mis-parse."""
    out = bytearray()
    pos, n = 0, len(body)
    while True:
        eol = body.find(_CRLF, pos)
        if eol == -1:
            return None
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return None
        if size < 0:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)           # trailers (if present) ignored
        if pos + size + 2 > n or body[pos + size:pos + size + 2] != _CRLF:
            return None
        out += body[pos:pos + size]
        pos += size + 2


def _inflate_member(data: bytes, wbits: int,
                    budget: int = _MAX_HTTP_BODY):
    """Inflate one zlib/gzip stream bounded by ``budget`` (the
    REMAINING payload budget, so a multi-member chain shares one
    aggregate :data:`_MAX_HTTP_BODY` cap — r10 ADVICE: a per-member
    cap would let N concatenated ~1 GiB members decompress to N GiB
    in one task). Returns (decoded bytes, unused trailing input) or
    ``None`` on a truncated/corrupt stream; an output that would
    exceed the bomb guard raises loudly (it is not malformed input —
    it is an attack or a mis-sized capture, and silently truncating
    it would corrupt downstream text)."""
    d = zlib.decompressobj(wbits)
    out = bytearray()
    try:
        out += d.decompress(data, budget + 1)
        while not d.eof and d.unconsumed_tail:
            if len(out) > budget:
                break
            out += d.decompress(d.unconsumed_tail,
                                budget + 1 - len(out))
    except zlib.error:
        return None
    if len(out) > budget:
        raise ValueError("http payload decompresses past the 1 GiB "
                         "bomb guard")
    if not d.eof:
        return None                     # truncated member
    return bytes(out), d.unused_data


def _decode_content(body: bytes, encoding: str):
    """Apply ``Content-Encoding`` decodings (right-to-left over the
    comma-separated coding list, RFC 9110 §8.4): ``gzip``/``x-gzip``
    (multi-member tolerated — some servers concatenate), ``deflate``
    (zlib-wrapped per spec, with the raw-deflate retry for the classic
    server bug), ``identity`` (no-op). Returns the decoded bytes, or
    ``None`` when any coding in the chain is unknown (``br``/``zstd``
    — no codec libs here) or its stream is malformed — the caller
    keeps the raw bytes, never a half-decoded guess."""
    codings = [c.strip().lower() for c in encoding.split(",") if c.strip()]
    for coding in reversed(codings):
        if coding in ("identity", "chunked", ""):
            continue
        if coding in ("gzip", "x-gzip"):
            out = bytearray()
            rest = body
            while rest:
                # remaining aggregate budget, not a fresh per-member
                # cap — the guard bounds the whole decoded payload
                dec = _inflate_member(rest, 31,
                                      _MAX_HTTP_BODY - len(out))
                if dec is None:
                    return None
                chunk, rest = dec
                out += chunk
                rest = rest.lstrip(b"\x00")   # padded tails seen in the wild
            body = bytes(out)
        elif coding == "deflate":
            dec = _inflate_member(body, 15)   # zlib-wrapped per RFC 9110
            if dec is None:
                dec = _inflate_member(body, -15)  # raw-deflate server bug
            if dec is None:
                return None
            body = dec[0]
        else:
            return None
    return body


def _split_http(payload: bytes):
    """(status, content_type, body, decoded) from an HTTP response
    payload.

    The body is DECODED the way a browser would see it (r9 — the gap
    the WET format exists for): ``Transfer-Encoding: chunked`` framing
    is removed first, then ``Content-Encoding: gzip/deflate`` is
    decompressed, so ``html_to_text`` downstream gets markup, not hex
    size lines or compressed bytes. Real Common Crawl response records
    carry both constantly. Malformed framing or an undecodable coding
    falls back to the raw body — never a mis-parse; a decompression
    bomb past 1 GiB raises loudly.

    ``decoded`` (r10 — the last silent wrong-shape path, verdict #2)
    is False when any layer was LEFT UNDECODED: a ``Content-Encoding``
    chain with an unknown coding (``br``/``zstd`` — no codec libs in
    this environment) or a malformed stream, or chunked framing that
    would not parse. Callers gate on it instead of feeding compressed
    bytes shaped like a payload into downstream text extraction. A
    payload with no framing and no codings to undo is
    ``decoded=True``."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload, True
    he = payload.find(_CRLF + _CRLF)
    if he == -1:
        return None, None, payload, True
    lines = payload[:he].split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = tenc = cenc = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        k = k.strip().lower()
        if k == b"content-type" and ctype is None:
            ctype = v.strip().decode("latin-1")
        elif k == b"transfer-encoding" and tenc is None:
            tenc = v.strip().lower().decode("latin-1")
        elif k == b"content-encoding" and cenc is None:
            cenc = v.strip().decode("latin-1")
    body = payload[he + 4:]
    ok = True
    if tenc and "chunked" in tenc:
        dechunked = _dechunk(body)
        if dechunked is not None:
            body = dechunked
        else:
            ok = False                  # malformed framing: raw fallback
    if cenc:
        decoded = _decode_content(body, cenc)
        if decoded is not None:
            body = decoded
        else:
            ok = False                  # unknown/malformed coding: raw
    return status, ctype, body, ok


def _record_row(headers, payload):
    rtype = headers.get("warc-type")
    status = ctype = None
    body, decoded = payload, True
    if rtype == "response":
        status, ctype, body, decoded = _split_http(payload)
    return (headers.get("warc-target-uri"),
            headers.get("warc-date"), rtype, status, ctype,
            bytearray(body), decoded)


def read_warc_file(path: str, *, chunk_size: int = 1 << 20):
    """Yield row tuples (target_uri, warc_date, record_type,
    http_status, content_type, payload) for every record of one
    ``.warc`` / ``.warc.gz`` file — STREAMED: gzip members decompress
    incrementally and at most one record is buffered, so a 1 GB /
    multi-GB-decompressed Common Crawl archive never materializes in
    the task's heap (32 concurrent tasks x whole-archive would OOM
    any executor)."""
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        chunks = (_gzip_chunks(f, chunk_size) if head == b"\x1f\x8b"
                  else _file_chunks(f, chunk_size))
        for headers, payload in _assemble_segments(
                _iter_records_stream(chunks)):
            yield _record_row(headers, payload)


_WARC_DDL = ("target_uri string, warc_date string, record_type string, "
             "http_status int, content_type string, payload binary, "
             "content_decoded boolean")


def _warc_file_list(path, extension: str) -> list[str]:
    import glob as globmod

    if isinstance(path, str):
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(extension) or f.endswith(".warc"))
        else:
            files = sorted(globmod.glob(path)) or [path]
    else:
        files = list(path)
    if not files:
        raise ValueError(f"no {extension} files under {path!r}")
    return files


def read_warc_dataset(spark, path: str | list[str],
                      *, extension: str = ".warc.gz",
                      record_splits: bool = False,
                      split_bytes: int = 32 << 20,
                      include_revisit: bool = False):
    """DISTRIBUTED WARC read. Default: file-list plan source, one task
    per archive file (the Common Crawl work unit — ~1 GB x 64k files
    per crawl), records parsed executor-side in streaming bounded
    batches.

    ``record_splits=True`` (r8) adds INTRA-file parallelism without a
    CDX index — the lever for few-but-huge archives, where
    file-per-task leaves the cluster idle: a first distributed pass
    walks each file's gzip member boundaries (O(chunk) memory,
    :func:`warc_member_index`) and groups them into ~``split_bytes``
    byte ranges; the ranges then fan out as a record-level-parallel
    scan (:func:`read_warc_records`). Only (path, offset, length)
    triples cross the driver — never record bytes.
    ``record_splits=True`` assumes UNSEGMENTED archives (Common
    Crawl's are): a split boundary falling inside a WARC 1.1 segment
    run would leave a partial assembly, which raises loudly — use the
    default file-per-task path for segmented input.

    ``revisit`` records are FILTERED by default (r10, verdict #4):
    Common Crawl's dedupe-aware archives carry them as body-less
    references to an earlier identical capture (WARC 1.1 §6.7), and a
    naive payload aggregation would count each as an empty document.
    Pass ``include_revisit=True`` to surface them (record_type
    ``revisit``, payload = the record block as stored — typically
    empty or the revisited HTTP headers)."""
    files = _warc_file_list(path, extension)

    if record_splits:
        import pandas as pd

        fdf = spark.createDataFrame([(f,) for f in files],
                                    "__warc_file__ string")
        if len(files) > 1:
            fdf = fdf.repartition(len(files))

        def index_batches(it):
            for pdf in it:
                for p in pdf["__warc_file__"]:
                    rows, start, length = [], None, 0
                    for _, off, ln in warc_member_index(p):
                        if start is None:
                            start = off
                        length += ln
                        if length >= split_bytes:
                            rows.append((p, start, length))
                            start, length = None, 0
                    if length:
                        rows.append((p, start, length))
                    if rows:
                        yield pd.DataFrame(
                            rows, columns=["path", "off", "len"])

        # the split triples stay DISTRIBUTED (r10): a 100 TB crawl's
        # ~3M ranges are metadata, but there is no reason to funnel
        # them through the driver — read_warc_records consumes the
        # frame directly (present-but-empty archives yield an empty
        # frame through the same path)
        splits = fdf.mapInPandas(index_batches,
                                 "path string, off long, len long")
        return read_warc_records(spark, splits,
                                 include_revisit=include_revisit)

    fdf = spark.createDataFrame([(f,) for f in files],
                                "__warc_file__ string")
    if len(files) > 1:
        fdf = fdf.repartition(len(files))

    def batches(it):
        for pdf in it:
            for p in pdf["__warc_file__"]:
                yield from _row_batches(read_warc_file(p))

    out = fdf.mapInPandas(batches, _WARC_DDL)
    return out if include_revisit else _drop_revisit(out)


def _drop_revisit(df):
    """Catalyst-side revisit filter (null-safe: a malformed record
    with no ``WARC-Type`` keeps flowing — it is not a revisit). The
    filter sits AFTER the scan, not inside the Python reader: revisit
    bodies are bytes-tiny so the decode cost is nil, and keeping the
    reader single-shape lets one scan serve both settings."""
    from pyspark.sql import functions as F

    return df.filter(~F.col("record_type").eqNullSafe("revisit"))


def _row_batches(rows_iter, *, max_rows: int = 256,
                 max_bytes: int = 32 << 20):
    """Group streamed record rows into bounded pandas batches (by row
    count AND payload bytes) — the Arrow hand-off stays O(batch), not
    O(archive)."""
    import pandas as pd

    def frame(rows):
        return pd.DataFrame(
            rows, columns=["target_uri", "warc_date", "record_type",
                           "http_status", "content_type", "payload",
                           "content_decoded"]) \
            .astype({"http_status": "Int64"})

    rows, nbytes = [], 0
    for row in rows_iter:
        rows.append(row)
        nbytes += len(row[5])
        if len(rows) >= max_rows or nbytes >= max_bytes:
            yield frame(rows)
            rows, nbytes = [], 0
    if rows:
        yield frame(rows)


def _encode_chunked(body: bytes, chunk_size: int = 64) -> bytes:
    """Apply ``Transfer-Encoding: chunked`` framing (the fixture-side
    inverse of :func:`_dechunk`): hex size line + CRLF + chunk + CRLF
    per piece, ``0`` terminator."""
    out = bytearray()
    for i in range(0, len(body), chunk_size):
        piece = body[i:i + chunk_size]
        out += b"%x" % len(piece) + _CRLF + piece + _CRLF
    out += b"0" + _CRLF + _CRLF
    return bytes(out)


def _encode_content(body: bytes, encoding: str) -> bytes:
    """Apply one ``Content-Encoding`` coding (fixture-side inverse of
    :func:`_decode_content`)."""
    enc = encoding.strip().lower()
    if enc in ("gzip", "x-gzip"):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
    elif enc == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, 15)
    elif enc == "identity":
        return body
    else:
        raise ValueError(f"unsupported content encoding {encoding!r}")
    return co.compress(body) + co.flush()


def build_record(uri: str, date: str, payload: bytes, *,
                 rtype: str = "response",
                 http_status: int = 200,
                 content_type: str = "text/html",
                 content_encoding: str | None = None,
                 transfer_chunked: bool = False,
                 chunk_size: int = 64,
                 warc_content_type: str | None = None,
                 raw_http: bool = False) -> bytes:
    """One spec-valid WARC record (with an HTTP response envelope for
    ``response`` records) — the fixture/sink builder.

    ``content_encoding`` / ``transfer_chunked`` (r9) emit the framed
    bodies real crawl captures carry (CE applied first, then TE
    chunking — the sender order, RFC 9112 §6.1): a chunked body gets
    no ``Content-Length`` header and its WARC ``Content-Length``
    still spans the full envelope, exactly like live captures.

    ``raw_http=True`` (r10) writes the payload VERBATIM as the
    response block — what a real crawler does with bytes captured off
    the wire (the payload must already be a full HTTP envelope). The
    lever that lets fixtures carry codings this library refuses to
    decode (br/zstd) so the ``content_decoded=false`` read-side
    contract is testable end to end."""
    if rtype == "response" and raw_http:
        http = payload
    elif rtype == "response":
        body = payload
        extra = b""
        if content_encoding:
            body = _encode_content(body, content_encoding)
            extra += (b"Content-Encoding: "
                      + content_encoding.encode("latin-1") + _CRLF)
        if transfer_chunked:
            body = _encode_chunked(body, chunk_size)
            extra += b"Transfer-Encoding: chunked" + _CRLF
        else:
            extra += b"Content-Length: %d" % len(body) + _CRLF
        http = (b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n"
                % (http_status, content_type.encode("latin-1"))
                + extra + _CRLF) + body
    else:
        http = payload
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype.encode("latin-1") + _CRLF
            + b"WARC-Target-URI: " + uri.encode("latin-1") + _CRLF
            + b"WARC-Date: " + date.encode("latin-1") + _CRLF
            + ((b"Content-Type: " + warc_content_type.encode("latin-1")
                + _CRLF) if warc_content_type else b"")
            + b"Content-Length: %d" % len(http) + _CRLF + _CRLF)
    return head + http + _CRLF + _CRLF


def build_segmented_record(uri: str, date: str, payload: bytes, *,
                           segments: int = 2, rtype: str = "response",
                           http_status: int = 200,
                           content_type: str = "text/html",
                           record_id: str = "<urn:uuid:seg-fixture-1>"
                           ) -> list[bytes]:
    """Fixture builder for a WARC 1.1 segmented record run (the
    producer :func:`_assemble_segments` reads back): the record's
    block — HTTP envelope + body for ``response`` types — is split
    into ``segments`` parts; part 1 keeps the original record type
    plus ``WARC-Segment-Number: 1``, parts 2..N are ``continuation``
    records naming the origin id, and the final part carries
    ``WARC-Segment-Total-Length``. Returns the record byte strings in
    storage order (gzip each as its own member for the CC layout)."""
    if rtype == "response":
        http = (b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n"
                b"Content-Length: %d\r\n\r\n"
                % (http_status, content_type.encode("latin-1"),
                   len(payload))) + payload
    else:
        http = payload
    n = max(2, int(segments))
    step = max(1, (len(http) + n - 1) // n)
    parts = [http[i:i + step] for i in range(0, len(http), step)]
    if len(parts) < 2:
        # a run needs its terminating continuation (the total-length
        # carrier): blocks shorter than the requested split count get
        # an empty final segment — spec-legal and still a real run
        parts = (parts or [b""]) + [b""]
    uri_b, date_b = uri.encode("latin-1"), date.encode("latin-1")
    rid = record_id.encode("latin-1")
    recs = []
    for k, part in enumerate(parts, 1):
        if k == 1:
            head = (b"WARC/1.0\r\nWARC-Type: "
                    + rtype.encode("latin-1") + _CRLF
                    + b"WARC-Record-ID: " + rid + _CRLF
                    + b"WARC-Target-URI: " + uri_b + _CRLF
                    + b"WARC-Date: " + date_b + _CRLF
                    + b"WARC-Segment-Number: 1" + _CRLF
                    + b"Content-Length: %d" % len(part)
                    + _CRLF + _CRLF)
        else:
            tail = (b"WARC-Segment-Total-Length: %d" % len(http)
                    + _CRLF) if k == len(parts) else b""
            head = (b"WARC/1.0\r\nWARC-Type: continuation" + _CRLF
                    + b"WARC-Segment-Origin-ID: " + rid + _CRLF
                    + b"WARC-Segment-Number: %d" % k + _CRLF
                    + b"WARC-Target-URI: " + uri_b + _CRLF
                    + b"WARC-Date: " + date_b + _CRLF
                    + tail
                    + b"Content-Length: %d" % len(part)
                    + _CRLF + _CRLF)
        recs.append(head + part + _CRLF + _CRLF)
    return recs


def write_warc_dataset(df, path: str, *, uri_col: str = "target_uri",
                       date_col: str = "warc_date",
                       payload_col: str = "payload",
                       content_type: str = "text/html",
                       content_encoding: str | None = None,
                       transfer_chunked: bool = False,
                       status_col: str | None = None,
                       content_type_col: str | None = None,
                       record_type: str = "response",
                       warc_content_type: str | None = None,
                       part_suffix: str = ".warc.gz",
                       raw_http: bool = False,
                       record_type_col: str | None = None) -> list[dict]:
    """DISTRIBUTED WARC write: one ``part-NNNNN.warc.gz`` per
    partition, every record its own gzip member (the Common Crawl
    layout), executor-side — the avro/arrow sink shape. Returns the
    [{path, n_records}, ...] manifest. ``status_col`` /
    ``content_type_col`` (r9) name per-row columns for the HTTP status
    and Content-Type (overriding the constants) — the fixture levers
    for status-filtered CDX laws and charset-labeled captures.
    ``record_type`` / ``warc_content_type`` / ``part_suffix`` (r9)
    generalize the sink beyond response records — the WET and WAT
    sibling writers route through here (conversion / metadata records
    carry their payload raw, no HTTP envelope). ``raw_http`` /
    ``record_type_col`` (r10): write payloads that are ALREADY full
    HTTP envelopes verbatim (what a live crawler stores), and vary
    the WARC record type per row (revisit-mixed fixture archives)."""
    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)

    def sink(it):
        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}{part_suffix}")
        n = 0
        fh = None
        try:
            for pdf in it:
                if pdf.empty:
                    continue
                if fh is None:
                    fh = open(out, "wb")
                statuses = (pdf[status_col] if status_col is not None
                            else [200] * len(pdf))
                ctypes = (pdf[content_type_col]
                          if content_type_col is not None
                          else [content_type] * len(pdf))
                rtypes = (pdf[record_type_col]
                          if record_type_col is not None
                          else [record_type] * len(pdf))
                for uri, date, payload, st, ct, rt in zip(
                        pdf[uri_col], pdf[date_col], pdf[payload_col],
                        statuses, ctypes, rtypes):
                    rec = build_record(str(uri), str(date),
                                       bytes(payload),
                                       rtype=str(rt),
                                       http_status=int(st),
                                       content_type=str(ct),
                                       content_encoding=content_encoding,
                                       transfer_chunked=transfer_chunked,
                                       warc_content_type=warc_content_type,
                                       raw_http=raw_http)
                    # one gzip member per record (CC convention)
                    co = zlib.compressobj(6, zlib.DEFLATED, 31)
                    fh.write(co.compress(rec) + co.flush())
                    n += 1
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame({"path": [out], "n_records": [n]})

    manifest = df.mapInPandas(sink, "path string, n_records long").collect()
    return [r.asDict() for r in manifest]


def write_wet_dataset(df, path: str, *, uri_col: str = "target_uri",
                      date_col: str = "warc_date",
                      text_col: str = "text") -> list[dict]:
    """DISTRIBUTED WET write (r9 — the Common Crawl *extracted text*
    sibling of the .warc.gz layout): one ``part-NNNNN.warc.wet.gz``
    per partition, each a ``conversion``-type WARC record (WARC-level
    ``Content-Type: text/plain``, UTF-8 payload — the published WET
    convention) in its own gzip member. Completes the crawl format
    family (WARC + CDX + WET): a pipeline can ingest raw archives,
    extract text with html_to_text/payload_text, and re-ship the
    WET-shaped corpus downstream tools expect. Returns the
    [{path, n_records}, ...] manifest."""
    from pyspark.sql import functions as F

    recs = df.select(F.col(uri_col), F.col(date_col),
                     F.encode(F.col(text_col), "UTF-8")
                      .alias("__wet_payload__"))
    return write_warc_dataset(recs, path, uri_col=uri_col,
                              date_col=date_col,
                              payload_col="__wet_payload__",
                              record_type="conversion",
                              warc_content_type="text/plain",
                              part_suffix=".warc.wet.gz")


def read_wet_dataset(spark, path: str | list[str]):
    """DISTRIBUTED WET read (r9): the same streamed one-task-per-file
    scan as :func:`read_warc_dataset`, filtered to ``conversion``
    records with the UTF-8 payload decoded to a ``text`` column —
    (target_uri, warc_date, text), the shape a training pipeline
    ingests. Non-conversion records (warcinfo headers real WET files
    open with) are skipped by the filter, not mis-read."""
    from pyspark.sql import functions as F

    recs = read_warc_dataset(spark, path, extension=".wet.gz")
    # make_valid_utf8 over the cast, not strict decode: a foreign WET
    # file with stray invalid bytes gets U+FFFD, not a task failure
    return (recs.filter(F.col("record_type") == "conversion")
                .select("target_uri", "warc_date",
                        F.make_valid_utf8(F.col("payload").cast("string"))
                         .alias("text")))


_WAT_JSON_DDL = ("status int, mime string, title string, "
                 "links array<string>")


def wat_metadata(df, *, payload_col: str = "payload",
                 content_type_col: str = "content_type",
                 status_col: str = "http_status",
                 out_col: str = "wat_json"):
    """Compute the WAT-style metadata JSON per response row (r9 — the
    third Common Crawl sibling format: link-graph and page metadata
    without the page bytes): status, declared mime, ``<title>``, and
    every ``href`` link, extracted with pure-Catalyst regexes over the
    replacement-decoded payload and rendered with ``to_json`` — a
    map-only projection at 100 TB. The field subset is the part of the
    published WAT envelope a training/link-graph pipeline consumes."""
    from pyspark.sql import functions as F

    html = F.make_valid_utf8(F.col(payload_col).cast("string"))
    links = F.regexp_extract_all(
        html, F.lit(r"""(?i)href\s*=\s*["']([^"'<>\s]+)"""), F.lit(1))
    title = F.nullif(F.regexp_replace(F.regexp_extract(
        html, r"(?is)<title[^>]*>(.*?)</title>", 1),
        r"^\s+|\s+$", ""), F.lit(""))
    meta = F.to_json(F.struct(
        F.col(status_col).cast("int").alias("status"),
        F.col(content_type_col).alias("mime"),
        title.alias("title"), links.alias("links")))
    return df.withColumn(out_col, meta)


def write_wat_dataset(df, path: str, *, uri_col: str = "target_uri",
                      date_col: str = "warc_date",
                      payload_col: str = "payload",
                      content_type_col: str = "content_type",
                      status_col: str = "http_status") -> list[dict]:
    """DISTRIBUTED WAT write (r9): one ``part-NNNNN.warc.wat.gz`` per
    partition of ``metadata``-type records whose payload is the
    :func:`wat_metadata` JSON (WARC-level ``application/json``) —
    completing the WARC/WET/WAT triad. Input is the
    :func:`read_warc_dataset` row shape."""
    from pyspark.sql import functions as F

    recs = wat_metadata(df, payload_col=payload_col,
                        content_type_col=content_type_col,
                        status_col=status_col)
    out = recs.select(F.col(uri_col), F.col(date_col),
                      F.encode(F.col("wat_json"), "UTF-8")
                       .alias("__wat_payload__"))
    return write_warc_dataset(out, path, uri_col=uri_col,
                              date_col=date_col,
                              payload_col="__wat_payload__",
                              record_type="metadata",
                              warc_content_type="application/json",
                              part_suffix=".warc.wat.gz")


def read_wat_dataset(spark, path: str | list[str]):
    """DISTRIBUTED WAT read (r9): the streamed WARC scan filtered to
    ``metadata`` records, JSON parsed with an explicit schema (no
    sampling pass) and flattened to (target_uri, warc_date, status,
    mime, title, links)."""
    from pyspark.sql import functions as F

    recs = read_warc_dataset(spark, path, extension=".wat.gz")
    parsed = (recs.filter(F.col("record_type") == "metadata")
                  .select("target_uri", "warc_date",
                          F.from_json(
                              F.make_valid_utf8(
                                  F.col("payload").cast("string")),
                              _WAT_JSON_DDL).alias("__w__")))
    return parsed.select("target_uri", "warc_date", "__w__.status",
                         "__w__.mime", "__w__.title", "__w__.links")


def read_warc_records(spark, entries, *, include_revisit: bool = False):
    """CDX-style record-range read — the actual Common Crawl access
    pattern: the crawl ships ``cdx`` indexes mapping each capture to
    ``(warc file, byte offset, compressed length)``, and consumers
    range-read just their records' gzip members instead of streaming
    whole archives. ``entries`` is a list/DataFrame of (path, offset,
    length) triples; each becomes one unit of a record-level-parallel
    scan — a single 1 GB archive fans out across however many index
    rows point into it (the intra-file parallelism
    :func:`read_warc_dataset`'s file-per-task shape can't give).
    Offsets must land on gzip-member boundaries (what CDX guarantees);
    a mid-member offset fails loudly in the decompressor.

    A DataFrame of triples stays FULLY DISTRIBUTED (r10): a 100 TB
    crawl's filtered index selection can be billions of rows, and the
    pre-r10 driver collect was the one place that mass funneled
    through the driver — now the triples frame feeds the range scan
    directly (its first three columns, any names), and nothing but
    the plan plus a two-scalar sizing agg (row count + byte sum, one
    row to the driver — r11) crosses the driver; the sizing pass
    re-scans the filtered index once, which is columnar-pruned noise
    next to the archive bytes it right-sizes. List input keeps the
    small-fixture shape (exact partition sizing from the known
    length)."""
    if not isinstance(entries, list):
        import math

        from pyspark.sql import functions as F

        cols = entries.columns
        fdf = entries.select(
            F.col(cols[0]).cast("string").alias("__warc_file__"),
            F.col(cols[1]).cast("long").alias("__off__"),
            F.col(cols[2]).cast("long").alias("__len__"))
        # Scale-ADAPTIVE spread for the range reads (r11; guide §2.2/§6):
        # size the fetch partitions from the selection itself — one
        # scalar agg over the (already filtered, columnar) index is
        # noise next to the archive bytes it sizes — instead of the old
        # fixed defaultParallelism*4. That constant made a 32-row
        # fixture selection pay 128 task launches (measured 2.8 s ->
        # 0.9 s on the cc-index chain) while ALSO under-splitting a
        # 100 TB cut (whose byte sum now yields ~bytes/128 MB tasks,
        # the same target maxPartitionBytes gives an ordinary scan).
        # An empty selection simply yields an empty frame (a
        # filter-then-fetch that matched nothing is a legitimate
        # outcome, not an error).
        n_rows, total_len = fdf.agg(
            F.count(F.lit(1)), F.sum("__len__")).first()
        parts = max(1, min(int(n_rows),
                           max(math.ceil((total_len or 0) / (128 << 20)),
                               spark.sparkContext.defaultParallelism)))
        fdf = fdf.repartition(parts)
    else:
        if not entries:
            raise ValueError("read_warc_records: empty entry list")
        fdf = spark.createDataFrame(
            entries, "__warc_file__ string, __off__ long, __len__ long")
        if len(entries) > 1:
            fdf = fdf.repartition(
                min(len(entries),
                    spark.sparkContext.defaultParallelism * 4))

    def range_rows(pdf):
        import io as iomod

        for p, off, ln in zip(pdf["__warc_file__"], pdf["__off__"],
                              pdf["__len__"]):
            with open(p, "rb") as f:
                f.seek(int(off))
                raw = f.read(int(ln))
            if raw[:2] == b"\x1f\x8b":
                # stream the member(s): a multi-record range decompresses
                # chunk-at-a-time, never whole-range-at-once
                chunks = _gzip_chunks(iomod.BytesIO(raw))
            else:
                chunks = (raw,)
            # segment assembly applies per range: a CDX entry for a
            # segmented record must span its whole member run (real
            # crawl indexes do; a partial range raises loudly)
            for headers, payload in _assemble_segments(
                    _iter_records_stream(chunks)):
                yield _record_row(headers, payload)

    def batches(it):
        for pdf in it:
            yield from _row_batches(range_rows(pdf))

    out = fdf.mapInPandas(batches, _WARC_DDL)
    return out if include_revisit else _drop_revisit(out)


# cp1252's 0x80-0x9F block: the bytes where Windows-1252 differs from
# ISO-8859-1 (which maps them to C1 controls). After an ISO-8859-1
# decode those bytes surface as U+0080..U+009F one-to-one, so a single
# character translate finishes the cp1252 decode JVM-side. The five
# undefined bytes (81 8D 8F 90 9D) stay as their C1 codepoints.
_CP1252_SRC = "".join(chr(b) for b in range(0x80, 0xA0)
                      if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D))
_CP1252_DST = bytes(b for b in range(0x80, 0xA0)
                    if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
                    ).decode("cp1252")


def payload_text(payload, content_type, *, default_charset: str = "utf-8",
                 sniff_meta: bool = False, detect: bool = False,
                 set_coding_error_action: bool = True):
    """Charset-aware payload -> text Column (r9): real crawl captures
    label their encoding in the Content-Type header
    (``text/html; charset=ISO-8859-1``), and a blind UTF-8 cast turns
    every Latin-1/Windows-1252 page into replacement-char mojibake —
    the second half of the fidelity gap the HTTP body decode closed.

    Pure Catalyst: ``regexp_extract`` pulls the charset token, a CASE
    routes to ``F.decode`` (UTF-8 / ISO-8859-1 / UTF-16LE / UTF-16BE),
    and Windows-1252 decodes as ISO-8859-1 plus a 1:1 ``translate`` of
    the 0x80-0x9F block (cp1252 differs from Latin-1 ONLY there) — no
    Python in the hot path, fused into the scan at 100 TB.
    Unknown/missing charsets fall back to ``default_charset``. Both
    arguments are Columns or names.

    NEVER-THROW CONTRACT (r9): a real crawl always carries mislabeled
    and malformed encodings, and one bad page must not kill a 100 TB
    scan — Spark 4's strict ``decode`` raises MALFORMED_CHARACTER_
    CODING, so this builder (a) decodes the UTF-8/default arm via
    ``make_valid_utf8`` over the binary cast (U+FFFD replacement, the
    browser behavior), (b) follows the WHATWG encoding standard in
    mapping the ``us-ascii``/``ascii`` labels to Windows-1252 (which
    cannot fail: every byte maps), and (c) sets
    ``spark.sql.legacy.codingErrorAction`` on the active session so
    the UTF-16 arms also replace instead of raise (same runtime-conf
    pattern as io.read_parquet's nanos handling).

    ``sniff_meta=True`` adds the browser fallback (HTML5 §4.2.5.5):
    when the header carries no charset, the first 1024 bytes are
    scanned (as ISO-8859-1 — ASCII-compatible, so the tag text reads
    correctly regardless of the real encoding) for
    ``<meta charset=...>`` or the legacy
    ``<meta http-equiv="Content-Type" content="...charset=...">``
    form — still one JVM projection, no Python.

    ``detect=True`` adds the last-resort content heuristic for pages
    with NO label anywhere: bytes that validate as UTF-8 decode as
    UTF-8 (``is_valid_utf8`` — a multi-byte-structured encoding
    almost never false-positives), everything else as Windows-1252
    (the WHATWG default legacy encoding) — so an unlabeled Latin page
    reads correctly instead of spraying U+FFFD.

    A byte-order mark OUTRULES every other signal (WHATWG "decode"
    step 1: BOM sniffing precedes the header and meta labels) — EF BB
    BF / FF FE / FE FF route to UTF-8 / UTF-16LE / UTF-16BE
    regardless of what the server claimed, and the decoded U+FEFF is
    stripped from the front of the text on every arm.

    SESSION-WIDE SIDE EFFECT (documented per r10 ADVICE): building
    this Column sets ``spark.sql.legacy.codingErrorAction=true`` on
    the ACTIVE SESSION — it must hold at execution time (not build
    time), so it cannot be save/restored here, and it switches every
    ``F.decode`` in the session from strict MALFORMED_CHARACTER_CODING
    errors to U+FFFD replacement. That is the behavior a crawl
    pipeline wants everywhere, but callers who need strict decode
    elsewhere can pass ``set_coding_error_action=False`` and manage
    the conf themselves (the UTF-16 arms then raise on malformed
    input)."""
    from pyspark.sql import SparkSession, functions as F

    if set_coding_error_action:
        s = SparkSession.getActiveSession()
        if s is not None:
            # replacement (U+FFFD) instead of MALFORMED_CHARACTER_
            # CODING for the strict-decode arms (utf-16) — the
            # browser behavior; see the docstring's side-effect note
            s.conf.set("spark.sql.legacy.codingErrorAction", "true")
    payload = F.col(payload) if isinstance(payload, str) else payload
    content_type = (F.col(content_type) if isinstance(content_type, str)
                    else content_type)
    cs = F.lower(F.regexp_extract(
        F.coalesce(content_type, F.lit("")),
        r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9._\-]+)""", 1))
    if sniff_meta:
        head = F.decode(F.substring(payload, 1, 1024), "ISO-8859-1")
        meta = F.lower(F.coalesce(
            F.nullif(F.regexp_extract(
                head, r"""(?i)<meta\s[^>]*charset\s*=\s*["']?\s*"""
                      r"""([A-Za-z0-9._\-]+)""", 1), F.lit("")),
            F.lit("")))
        cs = F.when(cs == "", meta).otherwise(cs)
    # WHATWG decode step 1: the BOM outrules header and meta labels
    cs = (F.when(F.substring(payload, 1, 3) == F.lit(b"\xef\xbb\xbf"),
                 F.lit("utf-8"))
           .when(F.substring(payload, 1, 2) == F.lit(b"\xff\xfe"),
                 F.lit("utf-16le"))
           .when(F.substring(payload, 1, 2) == F.lit(b"\xfe\xff"),
                 F.lit("utf-16be"))
           .otherwise(cs))
    latin1 = F.decode(payload, "ISO-8859-1")    # total: every byte maps
    cp1252 = F.translate(latin1, _CP1252_SRC, _CP1252_DST)
    utf8 = F.make_valid_utf8(payload.cast("string"))
    unlabeled = utf8
    if detect:
        unlabeled = F.when(F.is_valid_utf8(payload.cast("string")),
                           utf8).otherwise(cp1252)
    decoded = (
        F.when(cs.isin("iso-8859-1", "latin-1", "latin1", "iso8859-1",
                       "l1"), latin1)
         .when(cs.isin("windows-1252", "cp1252", "win-1252",
                       "us-ascii", "ascii"),   # WHATWG: ascii -> 1252
               cp1252)
         .when(cs.isin("utf-16le", "utf16le"), F.decode(payload, "UTF-16LE"))
         .when(cs.isin("utf-16be", "utf16be"), F.decode(payload, "UTF-16BE"))
         .when(cs == "", unlabeled)
         .when(cs.isin("utf-8", "utf8"), utf8)
         .otherwise(unlabeled
                    if default_charset.lower() in ("utf-8", "utf8")
                    else F.decode(payload, default_charset.upper())))
    return F.regexp_replace(decoded, "\\A\uFEFF", "")


def encode_text_payload(text, charset):
    """Fixture-side inverse of :func:`payload_text`: encode a text
    Column to bytes under a per-row charset Column — ``F.encode`` for
    the charsets Spark knows, the reverse cp1252 translate for
    Windows-1252. Unknown charsets encode UTF-8."""
    from pyspark.sql import functions as F

    text = F.col(text) if isinstance(text, str) else text
    charset = F.col(charset) if isinstance(charset, str) else charset
    cs = F.lower(charset)
    return (
        F.when(cs.isin("iso-8859-1", "latin-1", "latin1"),
               F.encode(text, "ISO-8859-1"))
         .when(cs.isin("windows-1252", "cp1252"),
               F.encode(F.translate(text, _CP1252_DST, _CP1252_SRC),
                        "ISO-8859-1"))
         .when(cs.isin("utf-16le",), F.encode(text, "UTF-16LE"))
         .when(cs.isin("utf-16be",), F.encode(text, "UTF-16BE"))
         .otherwise(F.encode(text, "UTF-8")))


#: Public magic-number table shared by the Catalyst :func:`sniff_mime`
#: and the Python-side :func:`sniff_mime_bytes` (r10 verdict #5: one
#: authority, so the scan-side router and the decode-side router
#: cannot drift). Ordered: earlier rows win (GIF before the generic
#: two-byte mp3 frame-sync prefixes, etc.).
_MIME_MAGIC: list[tuple[bytes, str]] = [
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"fLaC", "audio/flac"),
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"\xff\xf3", "audio/mpeg"),
    (b"OggS", "application/ogg"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"WARC/", "application/warc"),
]


def sniff_mime_bytes(data: bytes) -> str:
    """Python-side mirror of :func:`sniff_mime` over one payload's
    bytes (r10) — the label-distrusting gate the multimodal decoders
    route through inside their ``mapInPandas`` batches, built from
    the SAME :data:`_MIME_MAGIC` table as the Catalyst sniffer (a
    drift between the two routers would send a payload down a codec
    the scan-side audit said it wasn't).

    Scope note (r11, ADVICE): every check here runs over the first
    256 bytes only. For the text/plain arm that head slice can cut a
    multibyte UTF-8 character mid-sequence, so a truncated trailing
    sequence is tolerated WHEN the payload continues past the head
    (the split is a slicing artifact, and the Catalyst
    :func:`sniff_mime` — which validates the WHOLE payload — would
    see the complete character). A payload that genuinely ENDS
    mid-sequence stays ``application/octet-stream`` on both routers.
    The routers can still disagree on bytes the head never sees
    (payload invalid only after byte 256) — inherent to a head-only
    sniff."""
    full_len = len(data)
    data = bytes(data[:256])
    for sig, mime in _MIME_MAGIC:
        if data.startswith(sig):
            return mime
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    head = data.decode("iso-8859-1").lower()
    if head.lstrip().startswith("<!doctype html") or "<html" in head:
        return "text/html"
    try:
        data.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError as e:
        if (full_len > len(data) and e.start >= len(data) - 3
                and e.reason == "unexpected end of data"):
            return "text/plain"     # head-boundary split, not bad UTF-8
        return "application/octet-stream"


def sniff_mime(payload):
    """Magic-byte MIME sniff (r9) — the router a crawl pipeline needs
    BEFORE trusting Content-Type labels (servers mislabel constantly;
    the multimodal decoders need the true format): a pure-Catalyst
    CASE over the payload's header bytes, fused into the scan. Covers
    the formats this repo decodes (pdf/png/gif/jpeg/wav/flac/mp3/ogg
    /gzip/zip/warc), an HTML heuristic over the first 256 bytes, a
    UTF-8-validity text check, and ``application/octet-stream`` as
    the honest residue. Signatures are the public magic numbers in
    the shared :data:`_MIME_MAGIC` table (one authority with
    :func:`sniff_mime_bytes` — r10)."""
    from pyspark.sql import functions as F

    p = F.col(payload) if isinstance(payload, str) else payload

    def pre(sig: bytes):
        return F.substring(p, 1, len(sig)) == F.lit(sig)

    head = F.lower(F.decode(F.substring(p, 1, 256), "ISO-8859-1"))
    html = (F.ltrim(head).startswith("<!doctype html")
            | head.contains("<html"))
    out = None
    for sig, mime in _MIME_MAGIC:
        out = (F.when(pre(sig), mime) if out is None
               else out.when(pre(sig), mime))
    return (
        out.when(pre(b"RIFF")
                 & (F.substring(p, 9, 4) == F.lit(b"WAVE")), "audio/wav")
           .when(html, "text/html")
           .when(F.is_valid_utf8(p.cast("string")), "text/plain")
           .otherwise("application/octet-stream"))


def warc_member_index(path: str, *,
                      chunk_size: int = 1 << 20
                      ) -> list[tuple[str, int, int]]:
    """Build the (path, offset, length) member index for a
    per-record-gzip-member archive (what a CDX file provides for real
    crawls) by walking the gzip member boundaries — a one-pass scan in
    O(chunk) memory: fixed-size reads feed a per-member
    ``decompressobj`` whose output is length-capped and discarded, so
    a ~1 GB / many-thousand-member archive costs neither whole-file
    residency nor the per-member tail copies a ``data[pos:]`` slice
    loop would (O(members x filesize) traffic)."""
    out: list[tuple[str, int, int]] = []
    with open(path, "rb") as f:
        pending = b""
        consumed = 0                    # absolute input bytes consumed
        start = 0                       # current member's offset
        d = None
        while True:
            if len(pending) < 2:        # member header spans a chunk edge
                more = f.read(chunk_size)
                if more:
                    pending += more
                elif not pending:
                    break
            if d is None:
                if pending[:2] != b"\x1f\x8b":
                    raise ValueError(f"{path}: offset {consumed} is not "
                                     "a gzip member boundary")
                d = zlib.decompressobj(31)
                start = consumed
            before = len(pending)
            d.decompress(pending, chunk_size)   # output discarded
            if d.eof:
                consumed += before - len(d.unused_data)
                out.append((path, start, consumed - start))
                pending = d.unused_data
                d = None
            elif d.unconsumed_tail:
                consumed += before - len(d.unconsumed_tail)
                pending = d.unconsumed_tail
            else:
                consumed += before
                pending = b""
        if d is not None:
            raise ValueError(f"{path}: truncated final gzip member "
                             f"(started at offset {start})")
    return out


def _iter_member_records(path: str, *, chunk_size: int = 1 << 20):
    """Single-pass walk of a per-record-gzip-member archive: yield
    ``(offset, length, headers, payload)`` for the first record of
    each gzip member in ONE sequential read — the index builders'
    access path (r11). The prior shape (``warc_member_index`` then an
    ``open``/``seek``/re-read + re-decompress per member) cost
    O(members) file opens and a second full pass over the archive;
    here the boundary walk and the record decode share one stream and
    one decompression. Memory stays O(member): only the current
    member's decompressed bytes are resident — the same residency the
    re-read path had while parsing a member."""
    with open(path, "rb") as f:
        pending = b""
        consumed = 0                    # absolute input bytes consumed
        start = 0                       # current member's offset
        d = None
        out = bytearray()
        while True:
            if len(pending) < 2:        # member header spans a chunk edge
                more = f.read(chunk_size)
                if more:
                    pending += more
                elif not pending:
                    break
            if d is None:
                if pending[:2] != b"\x1f\x8b":
                    raise ValueError(f"{path}: offset {consumed} is not "
                                     "a gzip member boundary")
                d = zlib.decompressobj(31)
                start = consumed
                out = bytearray()
            before = len(pending)
            out.extend(d.decompress(pending, chunk_size))
            if d.eof:
                consumed += before - len(d.unused_data)
                hdrs, payload = next(_parse_records(bytes(out)))
                yield start, consumed - start, hdrs, payload
                pending = d.unused_data
                d = None
            elif d.unconsumed_tail:
                consumed += before - len(d.unconsumed_tail)
                pending = d.unconsumed_tail
            else:
                consumed += before
                pending = b""
        if d is not None:
            raise ValueError(f"{path}: truncated final gzip member "
                             f"(started at offset {start})")


# ---------------------------------------------------------------------------
# CDX(J) index files — the format Common Crawl actually ships
# ---------------------------------------------------------------------------


def _surt(uri: str) -> str:
    """Canonical SURT key (the public web-archive sort convention):
    host labels reversed and comma-joined, ``)`` separator, then
    path?query lowercased-host only."""
    from urllib.parse import urlsplit

    from urllib.parse import quote

    u = urlsplit(uri)
    host = (u.hostname or "").lower()
    key = ",".join(reversed(host.split("."))) if host else ""
    # canonicalize: SURT keys never contain literal spaces (the CDX
    # line format is space-delimited)
    path = quote(u.path or "/", safe="/:%@!$&'()*+,;=~-._")
    q = ("?" + quote(u.query, safe="=&/:%@!$'()*+,;~-._")) \
        if u.query else ""
    return key + ")" + path + q


def read_cdx_index(path: str | list[str], *, base_dir: str | None = None
                   ) -> list[tuple[str, int, int]]:
    """Parse Common Crawl CDXJ index lines into the (path, offset,
    length) triples :func:`read_warc_records` consumes — the missing
    last step of the CC entry point: a crawl ships ``cdx-NNNNN.gz``
    files of ``SURT timestamp {json}`` lines whose JSON payload carries
    ``filename`` / ``offset`` / ``length`` (strings, per the published
    CDXJ convention). ``path`` is a file, directory, glob, or list;
    ``.gz`` indexes stream-decompress line-at-a-time. Relative
    filenames resolve against ``base_dir`` (default: each index file's
    own directory — the fixture layout; point it at the crawl root for
    real CC paths like ``crawl-data/CC-MAIN-.../*.warc.gz``).

    Malformed lines raise with the offending line number — an index
    that silently drops captures is a recall bug, not a convenience."""
    import glob as globmod

    if isinstance(path, str):
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if ".cdx" in f or f.endswith(".cdx.gz"))
        else:
            files = sorted(globmod.glob(path)) or [path]
    else:
        files = list(path)
    if not files:
        raise ValueError(f"read_cdx_index: no index files under {path!r}")

    entries: list[tuple[str, int, int]] = []
    for idx in files:
        root = base_dir if base_dir is not None else os.path.dirname(idx)
        with open(idx, "rb") as f:
            head = f.read(2)
            f.seek(0)
            chunks = (_gzip_chunks(f) if head == b"\x1f\x8b"
                      else _file_chunks(f))
            _consume_cdx_lines(_chunk_lines(chunks), idx, root, entries)
    if not entries:
        raise ValueError("read_cdx_index: index contained no captures")
    return entries


def _chunk_lines(chunks):
    """Split an iterable of byte chunks into utf-8 text lines without
    materializing the stream."""
    buf = b""
    for c in chunks:
        buf += c
        while True:
            i = buf.find(b"\n")
            if i == -1:
                break
            yield buf[:i].decode("utf-8")
            buf = buf[i + 1:]
    if buf:
        yield buf.decode("utf-8")


def _consume_cdx_lines(lines, idx: str, root: str, entries: list) -> None:
    import json

    for lineno, line in enumerate(lines, 1):
        line = line.strip()
        if not line or line.startswith("CDX "):   # legacy header line
            continue
        try:
            # the JSON payload starts at the first " {" — tolerant of
            # legacy keys that slipped canonicalization (spaced SURTs)
            brace = line.find(" {")
            if brace == -1:
                raise ValueError("no JSON payload")
            rec = json.loads(line[brace + 1:])
            fname = rec["filename"]
            off = int(rec["offset"])
            ln = int(rec["length"])
        except (ValueError, KeyError) as ex:
            raise ValueError(f"{idx}:{lineno}: malformed CDXJ line "
                             f"({ex!r}): {line[:120]!r}") from None
        if not os.path.isabs(fname):
            fname = os.path.join(root, fname)
        entries.append((fname, off, ln))


def build_cdx_index(archive_path: str, index_path: str, *,
                    compress: bool = True) -> int:
    """Write a CC-style CDXJ index for a per-record-gzip-member
    archive (the fixture-side producer for :func:`read_cdx_index`;
    real crawls ship theirs). One line per member: SURT key, 14-digit
    timestamp (from WARC-Date), JSON payload with url / filename
    (basename — resolved via read_cdx_index's base_dir) / offset /
    length / status. Lines sort by (SURT, timestamp), the published
    CDX ordering. Returns the number of index lines written."""
    import json

    lines = []
    for off, ln, hdrs, payload in _iter_member_records(archive_path):
        uri = hdrs.get("warc-target-uri") or ""
        date = hdrs.get("warc-date") or ""
        ts = "".join(ch for ch in date if ch.isdigit())[:14].ljust(14, "0")
        status, _, _, _ = _split_http(payload)
        rec = {"url": uri, "filename": os.path.basename(archive_path),
               "offset": str(off), "length": str(ln)}
        if status is not None:
            rec["status"] = str(status)
        lines.append("%s %s %s" % (_surt(uri), ts,
                                   json.dumps(rec, sort_keys=True)))
    lines.sort()
    blob = ("\n".join(lines) + "\n").encode("utf-8")
    if compress:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        blob = co.compress(blob) + co.flush()
    with open(index_path, "wb") as f:
        f.write(blob)
    return len(lines)


_CDX_DDL = ("surt string, ts string, url string, status int, "
            "path string, off long, len long")


def read_cdx_meta(spark, path: str | list[str], *,
                  base_dir: str | None = None):
    """DISTRIBUTED CDXJ metadata scan — the real Common Crawl access
    pattern is *filter the index, then fetch*: one task per
    ``cdx-NNNNN.gz`` file streams its lines into (surt, ts, url,
    status, path, off, len) rows, so status/host/time predicates run
    as ordinary Spark filters over the (small) index instead of after
    decompressing archives. Chain
    ``read_cdx_meta(...).filter(...).select("path", "off", "len")``
    into :func:`read_warc_records` for the range reads. A full crawl's
    index is ~100s of GB across ~300 files — exactly the shape one
    task per file handles; only the FILTERED triples ever reach the
    driver."""
    import glob as globmod

    import pandas as pd

    if isinstance(path, str):
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if ".cdx" in f)
        else:
            files = sorted(globmod.glob(path)) or [path]
    else:
        files = list(path)
    if not files:
        raise ValueError(f"read_cdx_meta: no index files under {path!r}")

    fdf = spark.createDataFrame([(f,) for f in files],
                                "__cdx_file__ string")
    if len(files) > 1:
        fdf = fdf.repartition(len(files))

    def batches(it):
        import json

        for pdf in it:
            for idx in pdf["__cdx_file__"]:
                root = base_dir if base_dir is not None \
                    else os.path.dirname(idx)
                rows = []
                with open(idx, "rb") as f:
                    head = f.read(2)
                    f.seek(0)
                    chunks = (_gzip_chunks(f) if head == b"\x1f\x8b"
                              else _file_chunks(f))
                    for lineno, line in enumerate(_chunk_lines(chunks),
                                                  1):
                        line = line.strip()
                        if not line or line.startswith("CDX "):
                            continue
                        brace = line.find(" {")
                        if brace == -1:
                            raise ValueError(
                                f"{idx}:{lineno}: malformed CDXJ line")
                        keypart = line[:brace].split(" ")
                        surt = keypart[0]
                        ts = keypart[1] if len(keypart) > 1 else None
                        try:
                            rec = json.loads(line[brace + 1:])
                            fname = rec["filename"]
                            off, ln = int(rec["offset"]), \
                                int(rec["length"])
                        except (ValueError, KeyError) as ex:
                            raise ValueError(
                                f"{idx}:{lineno}: malformed CDXJ line "
                                f"({ex!r})") from None
                        if not os.path.isabs(fname):
                            fname = os.path.join(root, fname)
                        status = rec.get("status")
                        rows.append((surt, ts, rec.get("url"),
                                     int(status) if status is not None
                                     else None, fname, off, ln))
                        if len(rows) >= 10000:
                            yield pd.DataFrame(
                                rows, columns=["surt", "ts", "url",
                                               "status", "path", "off",
                                               "len"]) \
                                .astype({"status": "Int64"})
                            rows = []
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["surt", "ts", "url", "status",
                                       "path", "off", "len"]) \
                        .astype({"status": "Int64"})

    return fdf.mapInPandas(batches, _CDX_DDL)


# ---------------------------------------------------------------------------
# columnar (parquet) index — the modern Common Crawl cc-index shape
# ---------------------------------------------------------------------------

#: Field subset of the published Common Crawl columnar index
#: (cc-index table; commoncrawl.org "Index to WARC Files and URLs in
#: Columnar Format"): SURT key + url + time + label/detected mime +
#: status + (file, offset, length) fetch triple. ``content_mime_
#: detected`` is this repo's :func:`sniff_mime_bytes` over the DECODED
#: body head — the label-distrusting column (the published table uses
#: a content-detection pass for the same reason).
_CC_INDEX_DDL = ("url_surtkey string, url string, fetch_time string, "
                 "record_type string, content_mime_type string, "
                 "content_mime_detected string, fetch_status int, "
                 "content_decoded boolean, warc_filename string, "
                 "warc_record_offset long, warc_record_length long")


def build_columnar_index(spark, archives, index_path: str, *,
                         extension: str = ".warc.gz") -> int:
    """DISTRIBUTED columnar index build (r10) — the PARQUET index the
    modern Common Crawl access path queries instead of flat CDXJ
    files: one task per archive walks gzip member boundaries and
    peeks each record's WARC + HTTP headers into an index row in ONE
    sequential read (:func:`_iter_member_records`, O(member) memory;
    the r10 shape re-opened and re-read the archive once per member —
    O(records) opens + a second full pass); the rows land as parquet
    via the ordinary distributed sink, sorted within partitions by
    ``url_surtkey`` so row groups carry tight min/max ranges for
    SURT-prefix pruning.

    Why parquet beats CDXJ at 100 TB: index predicates (host prefix,
    status, mime) become Catalyst pushdown + row-group pruning on a
    columnar scan — the index query reads only the columns and row
    groups it needs, instead of decompressing and string-splitting
    every line of ~300 gzip text files. Revisit records are indexed
    with their ``record_type`` so consumers can exclude them BEFORE
    fetching. Returns the number of index rows written."""
    import pandas as pd

    files = _warc_file_list(archives, extension)
    fdf = spark.createDataFrame([(f,) for f in files],
                                "__warc_file__ string")
    if len(files) > 1:
        fdf = fdf.repartition(len(files))

    def batches(it):
        for pdf in it:
            for p in pdf["__warc_file__"]:
                rows = []
                for off, ln, hdrs, payload in _iter_member_records(p):
                    rtype = hdrs.get("warc-type")
                    uri = hdrs.get("warc-target-uri") or ""
                    date = hdrs.get("warc-date") or ""
                    status = mime = detected = None
                    decoded = True
                    if rtype == "response":
                        status, mime, body, decoded = _split_http(payload)
                        detected = sniff_mime_bytes(body)
                    rows.append((_surt(uri), uri, date, rtype, mime,
                                 detected, status, decoded,
                                 os.path.basename(p), off, ln))
                if rows:
                    yield pd.DataFrame(rows, columns=[
                        "url_surtkey", "url", "fetch_time",
                        "record_type", "content_mime_type",
                        "content_mime_detected", "fetch_status",
                        "content_decoded", "warc_filename",
                        "warc_record_offset", "warc_record_length"]) \
                        .astype({"fetch_status": "Int64"})

    idx = fdf.mapInPandas(batches, _CC_INDEX_DDL) \
             .sortWithinPartitions("url_surtkey")
    idx.write.mode("overwrite").parquet(index_path)
    # row count from the written parquet FOOTERS (driver-side metadata
    # only — r11): the previous full re-read + count() launched one
    # more Spark job per build and re-decoded the index it just wrote.
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(os.path.join(index_path, f)).metadata.num_rows
               for f in os.listdir(index_path) if f.endswith(".parquet"))


def read_columnar_index(spark, index_path: str):
    """Plain parquet scan of a :func:`build_columnar_index` table —
    deliberately thin so Catalyst keeps full pushdown: a
    ``.filter(fetch_status == 200)`` lands in the scan's
    PushedFilters (pytest-pinned), and column pruning means a
    filter-then-fetch touches only the predicate columns plus the
    (filename, offset, length) triple."""
    return spark.read.parquet(index_path)


def fetch_index_records(spark, index_df, base_dir: str, *,
                        include_revisit: bool = False):
    """Range-fetch the records a FILTERED columnar-index frame points
    at: resolves ``warc_filename`` against ``base_dir`` (the
    published index stores basenames/crawl-relative names) as a
    column expression and feeds the (path, offset, length) triples
    into :func:`read_warc_records` FULLY DISTRIBUTED (r10) — the
    filtered selection never crosses the driver, so a billions-of-
    rows index cut scales like any other frame. Filter the index
    BEFORE calling this (the whole point of the columnar shape)."""
    from pyspark.sql import functions as F

    sep = "" if base_dir.endswith(os.sep) else os.sep
    sel = index_df.select(
        F.concat(F.lit(base_dir + sep), F.col("warc_filename"))
         .alias("path"),
        "warc_record_offset", "warc_record_length")
    return read_warc_records(spark, sel,
                             include_revisit=include_revisit)
