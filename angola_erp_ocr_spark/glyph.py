"""Glyph-grid codec: the deterministic stand-in for rendered page images.

A real deployment renders PDF pages to images (reference ocr_read.py:133-147,
util/ocr_pdf.py:511-539) and runs Tesseract `image_to_data`
(util/ocr_pdf.py:377-380) to get word boxes. Image libs aren't in this
sandbox, so a page is encoded as a binary "glyph grid" the OCR stage
decodes *exactly*. The decode is intentionally shaped like `image_to_data`
output (D3 in SURVEY §1): parallel word records with
(block, par, line, word_idx, text, conf, x, y, w, h).

Format GG02 (columnar, little-endian) — decodes with ONE `np.frombuffer`
per page instead of per-word struct unpacking, which matters when the OCR
stage chews through millions of words per Arrow batch:

    b"GG02"
    uint16  word count n
    n × packed 16-byte records:
        uint16 x, y, w, h; uint8 conf, block, par, line;
        uint16 word_idx; uint16 text byte-length
    concatenated utf-8 word texts

The legacy row-interleaved GG01 format is still decoded for old corpora.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"GG02"
MAGIC_V1 = b"GG01"
_HDR = struct.Struct("<4sH")
_REC_V1 = struct.Struct("<HHHHBBBBHH")

HEADER_DTYPE = np.dtype(
    [
        ("x", "<u2"), ("y", "<u2"), ("w", "<u2"), ("h", "<u2"),
        ("conf", "u1"), ("block", "u1"), ("par", "u1"), ("line", "u1"),
        ("word_idx", "<u2"), ("tlen", "<u2"),
    ]
)

_FIELDS = ("x", "y", "w", "h", "conf", "block", "par", "line", "word_idx")


MAX_WORDS_PER_PAGE = 65535  # uint16 count — split denser pages upstream
MAX_WORD_BYTES = 65535      # uint16 text length

# Tesseract emits conf=-1 for non-word rows (block/par/line separators,
# util/ocr_pdf.py:231 drops them). GG02's conf slot is unsigned, so -1 is
# encoded as the reserved value 255; `conf_signed` maps it back on decode.
# Real confidences are 0..100; anything else is a producer bug and raises
# here instead of wrapping silently in the numpy uint8 assignment.
CONF_NOWORD = 255

_U16_FIELDS = ("x", "y", "w", "h", "word_idx")
_U8_FIELDS = ("block", "par", "line")


class NotBatchDecodable(ValueError):
    """The batch contains a page the vectorized GG02 path cannot handle
    (non-GG02 magic, or a truncated/count-corrupted blob). Callers fall
    back to the per-page ``decode_page_columns`` loop, which handles GG01
    and surfaces the precise malformed page. A dedicated type so callers
    do not accidentally swallow unrelated ``ValueError`` subclasses (e.g.
    ``UnicodeDecodeError`` from the text-decode step)."""


def conf_signed(conf: np.ndarray) -> np.ndarray:
    """Decoded uint8 conf column → int32 with the -1 sentinel restored."""
    c = conf.astype(np.int32)
    c[c == CONF_NOWORD] = -1
    return c


def encode_page(words: list[dict]) -> bytes:
    """words: dicts with x,y,w,h,conf,block,par,line,word_idx,text.

    GG02 uses uint16/uint8 slots; every field is range-checked so a
    producer bug raises a clear ValueError instead of a numpy wraparound
    deep in an executor (conf=-1 silently became 255 — a "readable" word —
    before this check). A producer feeding real OCR output must split
    over-limit pages (or the format moves to u4 counts)."""
    n = len(words)
    if n > MAX_WORDS_PER_PAGE:
        raise ValueError(
            f"GG02 page limit: {n} words > {MAX_WORDS_PER_PAGE}; split the page")
    arr = np.empty(n, dtype=HEADER_DTYPE)
    texts = []
    for i, wd in enumerate(words):
        tb = wd["text"].encode("utf-8")
        if len(tb) > MAX_WORD_BYTES:
            raise ValueError(
                f"GG02 word limit: {len(tb)} bytes > {MAX_WORD_BYTES}")
        for f in _U16_FIELDS:
            v = int(wd[f])
            if not 0 <= v <= 65535:
                raise ValueError(f"GG02 field {f}={v} outside uint16 range")
        for f in _U8_FIELDS:
            v = int(wd[f])
            if not 0 <= v <= 255:
                raise ValueError(f"GG02 field {f}={v} outside uint8 range")
        conf = int(wd["conf"])
        if conf == -1:
            conf = CONF_NOWORD
        elif not 0 <= conf <= 100:  # Tesseract confidence range
            raise ValueError(
                f"GG02 conf={conf} not in -1..100 (255 reserved for -1)")
        texts.append(tb)
        arr[i] = (wd["x"], wd["y"], wd["w"], wd["h"], conf,
                  wd["block"], wd["par"], wd["line"], wd["word_idx"], len(tb))
    return _HDR.pack(MAGIC, n) + arr.tobytes() + b"".join(texts)


def decode_page_columns(blob: bytes) -> tuple[np.ndarray, list[str]]:
    """Fast columnar decode → (structured header array, word texts)."""
    magic, n = _HDR.unpack_from(blob, 0)
    if magic == MAGIC:
        hdr = np.frombuffer(blob, dtype=HEADER_DTYPE, count=n, offset=_HDR.size)
        start = _HDR.size + n * HEADER_DTYPE.itemsize
        ends = start + np.cumsum(hdr["tlen"].astype(np.int64))
        starts = ends - hdr["tlen"]
        if n and int(ends[-1]) > len(blob):  # slices would silently shorten
            raise ValueError("GG02 blob truncated in text region")
        texts = [blob[s:e].decode("utf-8") for s, e in zip(starts, ends)]
        return hdr, texts
    if magic == MAGIC_V1:  # legacy row-interleaved
        pos = _HDR.size
        hdr = np.empty(n, dtype=HEADER_DTYPE)
        texts = []
        for i in range(n):
            rec = _REC_V1.unpack_from(blob, pos)
            pos += _REC_V1.size
            texts.append(blob[pos:pos + rec[9]].decode("utf-8"))
            pos += rec[9]
            hdr[i] = rec
        return hdr, texts
    raise ValueError("not a glyph grid")


def decode_batch_columns(blobs) -> tuple:
    """Vectorized GG02 decode of MANY pages at once — the OCR stage's hot
    path (``ocr.ocr_lines``). Amortizes numpy call overhead over the whole
    Arrow batch: per-page decode costs ~75 µs in tiny-array numpy calls;
    this path does ONE fancy-gather + ONE segmented cumsum for the batch.

    ``blobs``: sequence of P page blobs (bytes). ALL must be GG02 —
    raises ValueError on any other magic (caller falls back to the
    per-page ``decode_page_columns`` loop, which also handles GG01).

    Returns ``(word_page, hdr, tstart, tend, joined, rel_end)``:
      * ``word_page`` int64[W] — index into ``blobs`` for each word
      * ``hdr``       HEADER_DTYPE[W] — all pages' word records
      * ``tstart``/``tend`` int64[W] — word-text byte ranges in ``joined``
      * ``joined``    bytes — the concatenated blobs
      * ``rel_end``   int64[P] — per-page payload end offset (relative to
        the page start), i.e. ``payload_end``; trailing bytes beyond it
        are page extras (QR container, ``multimodal.embed_qr``)
    """
    P = len(blobs)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=P)
    if P == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, np.empty(0, dtype=HEADER_DTYPE), z, z, b"", z
    joined = b"".join(blobs)
    big = np.frombuffer(joined, dtype=np.uint8)
    off = np.zeros(P, dtype=np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    if lens.min() < _HDR.size or not (
        (big[off] == MAGIC[0]).all() and (big[off + 1] == MAGIC[1]).all()
        and (big[off + 2] == MAGIC[2]).all() and (big[off + 3] == MAGIC[3]).all()
    ):
        raise NotBatchDecodable("decode_batch_columns requires all-GG02 blobs")
    counts = big[off + 4].astype(np.int64) | (big[off + 5].astype(np.int64) << 8)
    # A count-corrupted blob whose declared header region runs past its own
    # length would otherwise fancy-gather bytes from the FOLLOWING page
    # (silent garbage words) — or IndexError off the end if it is the last
    # page. Validate before the gather so malformed input fails loudly and
    # takes the per-page fallback, which pinpoints the bad page.
    if ((_HDR.size + HEADER_DTYPE.itemsize * counts) > lens).any():
        raise NotBatchDecodable("GG02 blob truncated in header region")
    W = int(counts.sum())
    first = np.zeros(P, dtype=np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    word_page = np.repeat(np.arange(P, dtype=np.int64), counts)
    within = np.arange(W, dtype=np.int64) - first[word_page]
    hdr_start = off + _HDR.size
    rec_start = hdr_start[word_page] + HEADER_DTYPE.itemsize * within
    # (W, 16) fancy-gather → contiguous → reinterpret as header records
    hdr = big[rec_start[:, None]
              + np.arange(HEADER_DTYPE.itemsize, dtype=np.int64)].ravel() \
        .view(HEADER_DTYPE)
    tlen = hdr["tlen"].astype(np.int64)
    gcum = np.concatenate(([0], np.cumsum(tlen)))      # global prefix sums
    text_base = hdr_start + HEADER_DTYPE.itemsize * counts
    # segmented (per-page) prefix of tlen = global prefix − page's base
    tstart = text_base[word_page] + (gcum[:-1] - gcum[first[word_page]])
    tend = tstart + tlen
    page_tbytes = gcum[first + counts] - gcum[first]
    rel_end = _HDR.size + HEADER_DTYPE.itemsize * counts + page_tbytes
    # Text region truncated: the word-text slices (tstart/tend) would
    # silently gather bytes from the next page. Fail loudly → per-page
    # fallback raises the precise error for the malformed blob.
    if (rel_end > lens).any():
        raise NotBatchDecodable("GG02 blob truncated in text region")
    return word_page, hdr, tstart, tend, joined, rel_end


def grid_end(hdr: np.ndarray) -> int:
    """payload_end from an ALREADY-DECODED header array — the hot path
    (``ocr_lines``) has the header in hand and must not re-frombuffer
    the blob just to locate trailing extras."""
    return _HDR.size + len(hdr) * HEADER_DTYPE.itemsize + int(hdr["tlen"].sum())


def payload_end(blob: bytes) -> int:
    """Exact end offset of the glyph-grid content (GG02 only). Trailing
    bytes after this offset are not part of the word grid — the page
    container uses that region for embedded extras (e.g. the QR payload,
    ``multimodal.embed_qr``), mirroring a page image that contains both
    text and a QR code in one binary."""
    magic, n = _HDR.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("payload_end requires GG02")
    hdr = np.frombuffer(blob, dtype=HEADER_DTYPE, count=n, offset=_HDR.size)
    return _HDR.size + n * HEADER_DTYPE.itemsize + int(hdr["tlen"].sum())


def decode_page(blob: bytes) -> list[dict]:
    """Row-oriented decode (unit tests / debugging); conf sentinel restored."""
    hdr, texts = decode_page_columns(blob)
    conf = conf_signed(hdr["conf"])
    return [
        {**{f: int(hdr[f][i]) for f in _FIELDS if f != "conf"},
         "conf": int(conf[i]), "text": texts[i]}
        for i in range(len(texts))
    ]
