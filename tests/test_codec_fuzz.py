"""Corrupt-input hardening for every vendored codec.

A crawl feeds decoders truncated downloads and bit-rotted bytes at
scale; the contract is FAIL LOUDLY OR RETURN A VALID VALUE — never
hang, never allocate unbounded memory, never return silent garbage of
the wrong type. Deterministic truncation + byte-flip sweeps (not
hypothesis: the corpus of corruptions is explicit and replayable)."""

import numpy as np
import pytest


def _truncations(data: bytes):
    for frac in (0.05, 0.3, 0.6, 0.9, 0.99):
        yield data[:max(1, int(len(data) * frac))]


def _flips(data: bytes):
    step = max(1, len(data) // 17)
    for i in range(0, len(data), step):
        b = bytearray(data)
        b[i] ^= 0xFF
        yield bytes(b)


def _assault(decode, payload, valid):
    """Run decode over corrupted variants; every outcome must be an
    exception or pass the validity predicate."""
    for variant in list(_truncations(payload)) + list(_flips(payload)):
        try:
            out = decode(variant)
        except Exception:
            continue                    # loud failure: contract met
        assert valid(out), type(out)


def test_jpeg_decode_corrupt_inputs():
    from tech_ml_dataset_spark.functions import jpeg
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    ok = (lambda o: isinstance(o, np.ndarray) and o.dtype == np.uint8
          and o.ndim == 3)
    _assault(jpeg.decode, jpeg.encode(arr, quant=1), ok)
    _assault(jpeg.decode, jpeg.encode_progressive(arr, quant=1), ok)
    # decompression-bomb SOF: huge declared dims must raise, not allocate
    import struct
    bomb = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 60000, 60000, 1) + b"\x01\x11\x00")
    with pytest.raises(ValueError, match="bomb"):
        jpeg.decode(bomb)


def test_gif_png_decode_corrupt_inputs():
    from tech_ml_dataset_spark.functions import gif, png
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    ok = (lambda o: isinstance(o, np.ndarray) and o.dtype == np.uint8)
    gif_bytes = gif.encode(arr)
    _assault(gif.decode, gif_bytes, ok)
    rgb = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    _assault(png.decode, png.encode(rgb), ok)
    # gif bomb: 60000x60000 frame descriptor
    import struct
    bomb = (b"GIF89a" + struct.pack("<HH", 8, 8) + b"\x80\x00\x00"
            + b"\x00" * 6          # 2-entry gct
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 60000, 60000) + b"\x00")
    with pytest.raises(ValueError, match="bomb"):
        gif.decode(bomb)


def test_pdf_extract_corrupt_inputs():
    from tech_ml_dataset_spark.functions import pdf
    data = pdf.build_pdf(["alpha beta.", "gamma delta."], compress=True)
    _assault(pdf.extract_text, data, lambda o: isinstance(o, str))


def test_avro_read_corrupt_inputs(tmp_path):
    import os

    from tech_ml_dataset_spark.sources import avro as av
    schema = ('{"type":"record","name":"r","fields":'
              '[{"name":"k","type":["null","long"]},'
              '{"name":"s","type":["null","string"]}]}')
    f = str(tmp_path / "x.avro")
    with open(f, "wb") as fh:
        av.write_file(fh, schema,
                      [[(i, f"s{i}") for i in range(50)]], codec="null")
    payload = open(f, "rb").read()

    def decode(variant: bytes):
        g = str(tmp_path / "v.avro")
        open(g, "wb").write(variant)
        return [r for blk, _ in av.read_file(g) for r in blk]

    _assault(decode, payload,
             lambda o: isinstance(o, list)
             and all(isinstance(r, tuple) for r in o))


def test_wav_paths_corrupt_inputs():
    """audio decode paths (stdlib wave) must NULL-route garbage — the
    mapInPandas surfaces already catch; assert the raw path can't hang
    on truncated RIFF."""
    import io
    import wave

    import numpy as np

    from tech_ml_dataset_spark.functions import multimodal as mm
    # build one valid wav via the public synthesizer law
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x01\x02" * 512)
    payload = buf.getvalue()
    for variant in list(_truncations(payload)) + list(_flips(payload)):
        out = mm.decode_image_bytes(variant)     # not an image: None ok
        assert out is None or isinstance(out, np.ndarray)
        try:
            with wave.open(io.BytesIO(variant), "rb") as w:
                w.readframes(min(w.getnframes(), 10 ** 6))
        except Exception:
            pass


def test_pdf_filter_codecs_corrupt_inputs():
    """r8 filter codecs (LZW / ASCII85 / RLE) under the assault
    contract, plus whole-document assaults on lzw/a85/objstm PDFs:
    loud failure or a valid value, never hang/garbage."""
    from tech_ml_dataset_spark.functions import pdf

    payload = bytes(range(256)) * 3 + b"repeat " * 40
    _assault(pdf._lzw_decode, pdf._lzw_encode(payload),
             lambda out: isinstance(out, bytes))
    _assault(pdf._ascii85_decode, pdf._ascii85_encode(payload),
             lambda out: isinstance(out, bytes))
    _assault(pdf._rle_decode, pdf._rle_encode(payload),
             lambda out: isinstance(out, bytes))

    def ripper(data):
        return pdf.extract_text(data)

    # r9: predictor un-filtering under corruption (bad row tags must
    # raise, never mis-reconstruct silently into text)
    _assault(lambda v: pdf._unpredict(v, 12, 1, 8, 16),
             pdf._predict_encode(payload, 12, 1, 8, 16),
             lambda out: isinstance(out, bytes))

    for doc in (pdf.build_pdf(["fuzz lzw"], compress="lzw"),
                pdf.build_pdf(["fuzz a85"], compress="a85+flate"),
                pdf.build_pdf(["fuzz pred"], compress="flate+pred"),
                pdf.build_pdf_differences(["fuzz diff café°"]),
                pdf.build_pdf_unicode(["фузз"], objstm=True)):
        _assault(ripper, doc, lambda out: isinstance(out, str))


def test_jpeg_12bit_corrupt_inputs():
    from tech_ml_dataset_spark.functions import jpeg

    g = (np.arange(256, dtype=np.uint16).reshape(16, 16) * 16) % 4096
    _assault(jpeg.decode, jpeg.encode_12bit(g),
             lambda out: isinstance(out, np.ndarray)
             and out.dtype in (np.uint8, np.uint16))


def test_cdx_index_corrupt_inputs(tmp_path):
    """Malformed CDX lines raise with file:line; truncated/flipped
    gzip'd indexes fail loudly or parse a valid triple list."""
    import zlib as z

    from tech_ml_dataset_spark.sources import warc

    lines = "\n".join(
        'org,ex)/p/%d 20260101000000 {"filename": "a.warc.gz", '
        '"offset": "%d", "length": "10"}' % (i, i * 10)
        for i in range(40)) + "\n"
    co = z.compressobj(6, z.DEFLATED, 31)
    blob = co.compress(lines.encode()) + co.flush()

    def parse(data):
        p = tmp_path / "probe.cdx.gz"
        p.write_bytes(data)
        return warc.read_cdx_index(str(p))

    _assault(parse, blob,
             lambda out: isinstance(out, list)
             and all(len(t) == 3 and isinstance(t[1], int) for t in out))


def test_warc_http_decode_corrupt_inputs():
    """r9: corrupted chunked/gzip'd HTTP payloads through _split_http
    must either decode or FALL BACK TO RAW BYTES — never crash, never
    return a non-bytes body, never mis-parse a half-decoded frame."""
    from tech_ml_dataset_spark.sources import warc

    body = b"<html><p>fuzz body content here</p></html>" * 5
    for kw in ({"transfer_chunked": True, "chunk_size": 9},
               {"content_encoding": "gzip"},
               {"content_encoding": "gzip", "transfer_chunked": True}):
        rec = warc.build_record("https://f/x", "2024-01-01T00:00:00Z",
                                body, **kw)
        [(_, payload)] = list(warc._parse_records(rec))
        _assault(lambda v: warc._split_http(v)[2], payload,
                 lambda out: isinstance(out, bytes))


def test_flac_decode_corrupt_inputs():
    import numpy as np

    from tech_ml_dataset_spark.functions import flac

    rng = np.random.RandomState(11)
    payload = flac.encode(rng.randint(-20000, 20000, 3000).astype(np.int64),
                          subframe="fixed2", block_size=512)

    def valid(out):
        sr, nch, bps, arr = out
        return isinstance(arr, np.ndarray) and arr.ndim == 2

    _assault(flac.decode, payload, valid)
