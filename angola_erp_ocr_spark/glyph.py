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
