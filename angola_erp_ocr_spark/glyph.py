"""Glyph-grid codec: the deterministic stand-in for rendered page images.

A real deployment renders PDF pages to images (reference ocr_read.py:133-147,
util/ocr_pdf.py:511-539) and runs Tesseract `image_to_data`
(util/ocr_pdf.py:377-380) to get word boxes. Image libs aren't in this
sandbox, so a page is encoded as a binary "glyph grid": a packed sequence of
word records the OCR stage decodes *exactly*. The decode is intentionally
shaped like `image_to_data` output (D3 in SURVEY §1): parallel word records
with (block, par, line, word_idx, text, conf, x, y, w, h).

Format (little-endian):
    b"GG01"
    uint16  word count
    repeat: uint16 x, y, w, h; uint8 conf, block, par, line; uint16 word_idx
            uint16 byte-length; utf-8 bytes
"""

from __future__ import annotations

import struct

MAGIC = b"GG01"
_HDR = struct.Struct("<4sH")
_REC = struct.Struct("<HHHHBBBBHH")


def encode_page(words: list[dict]) -> bytes:
    """words: dicts with x,y,w,h,conf,block,par,line,word_idx,text."""
    out = [_HDR.pack(MAGIC, len(words))]
    for wd in words:
        b = wd["text"].encode("utf-8")
        out.append(
            _REC.pack(
                wd["x"], wd["y"], wd["w"], wd["h"], wd["conf"],
                wd["block"], wd["par"], wd["line"], wd["word_idx"], len(b),
            )
        )
        out.append(b)
    return b"".join(out)


def decode_page(blob: bytes) -> list[dict]:
    magic, n = _HDR.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("not a glyph grid")
    pos = _HDR.size
    words = []
    for _ in range(n):
        x, y, w, h, conf, block, par, line, word_idx, blen = _REC.unpack_from(blob, pos)
        pos += _REC.size
        text = blob[pos : pos + blen].decode("utf-8")
        pos += blen
        words.append(
            dict(x=x, y=y, w=w, h=h, conf=conf, block=block, par=par,
                 line=line, word_idx=word_idx, text=text)
        )
    return words
