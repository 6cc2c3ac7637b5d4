"""Pure-stdlib netpbm PGM codec, 8-bit grayscale, P5 and P2.

PGM contributes the one container family the other image codecs
don't touch: an ASCII TOKEN HEADER with embedded comments. Width,
height and maxval arrive as whitespace-separated decimal tokens,
``#``-comments may appear between (and per spec interrupt) any of
them, and exactly ONE whitespace byte separates the maxval from a
binary P5 raster — a parser that eats "all following whitespace"
corrupts rasters whose first pixel is 0x09/0x0A/0x20. The P2
sibling stores the raster itself as ASCII decimals, where
truncation has a nasty ambiguity: cutting the final "255" to "25"
leaves a numerically valid sample, so the decoder REQUIRES a
whitespace terminator after the last sample (the encoder always
emits one) — that single rule is what makes every proper prefix of
a valid file detectable.

Scope is honest (grayscale 8-bit): P5 (binary) and P2 (ASCII),
maxval 255 only (a 2-byte-per-sample maxval > 255 raster raises
NotImplementedError; corrupt structure raises ValueError — checked
AFTER the raster-length check so truncations classify as
truncations). Spec: the pbmplus/netpbm PGM format description
(Poskanzer, 1989; netpbm doc/pgm.html).
"""

from __future__ import annotations

_WS = b" \t\r\n"


def _encode_header(magic: bytes, width: int, height: int) -> bytes:
    # a comment line in every header: decoders that don't honor
    # comments fail loudly on our own files
    return magic + b"\n# map_reduce_server_spark\n%d %d\n255\n" % (
        width,
        height,
    )


def encode_gray8(
    width: int, height: int, pixels: bytes, ascii_mode: bool = False
) -> bytes:
    """Encode row-major 8-bit grayscale as P5 (binary) or, with
    ``ascii_mode``, P2 (ASCII decimals, newline-terminated)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if ascii_mode:
        body = []
        for y in range(height):
            row = pixels[y * width : (y + 1) * width]
            body.append(" ".join(str(v) for v in row))
        return _encode_header(b"P2", width, height) + (
            "\n".join(body) + "\n"
        ).encode("ascii")
    return _encode_header(b"P5", width, height) + pixels


def _next_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Read the next header token, skipping whitespace and
    ``#``-to-end-of-line comments."""
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c in (b"#",):
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        else:
            break
    if pos >= n:
        raise ValueError("truncated PGM header")
    start = pos
    while pos < n and data[pos : pos + 1] not in (
        b" ", b"\t", b"\r", b"\n", b"#",
    ):
        pos += 1
    return data[start:pos], pos


def _int_token(data: bytes, pos: int) -> tuple[int, int]:
    tok, pos = _next_token(data, pos)
    if not tok.isdigit():
        raise ValueError(f"non-numeric PGM header token {tok!r}")
    return int(tok), pos


def decode_gray8(data: bytes) -> tuple[int, int, bytes]:
    """Decode a P5 or P2 PGM into (width, height, row-major pixel
    bytes). Honors header comments, enforces the single-whitespace
    rule before a binary raster and the whitespace terminator after
    an ASCII raster; maxval != 255 raises NotImplementedError only
    AFTER the raster is structurally complete."""
    if len(data) < 2:
        raise ValueError("not a PGM: truncated magic")
    magic = data[:2]
    if magic not in (b"P5", b"P2"):
        raise ValueError(f"not a PGM: magic {magic!r}")
    width, pos = _int_token(data, 2)
    height, pos = _int_token(data, pos)
    maxval, pos = _int_token(data, pos)
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PGM dimensions")
    n = width * height
    if magic == b"P5":
        # exactly ONE whitespace byte before the raster
        if pos >= len(data) or data[pos : pos + 1] not in (
            b" ", b"\t", b"\r", b"\n",
        ):
            raise ValueError("missing raster separator")
        pos += 1
        raster = data[pos : pos + n]
        if len(raster) != n:
            raise ValueError("truncated P5 raster")
        if data[pos + n :].strip(_WS):
            raise ValueError("trailing junk after P5 raster")
        if maxval != 255:
            raise NotImplementedError("only maxval 255")
        return width, height, raster
    vals = bytearray()
    for _ in range(n):
        v, pos = _int_token(data, pos)
        if v > 255:
            raise ValueError("P2 sample exceeds one byte")
        vals.append(v)
    # terminator rule: without it, truncating the final "255" to
    # "25" would decode as a valid (wrong) sample
    if pos >= len(data) or data[pos : pos + 1] not in (
        b" ", b"\t", b"\r", b"\n",
    ):
        raise ValueError("unterminated P2 raster")
    if data[pos:].strip(_WS):
        raise ValueError("trailing junk after P2 raster")
    if maxval != 255:
        raise NotImplementedError("only maxval 255")
    if any(v > maxval for v in vals):
        raise ValueError("P2 sample exceeds maxval")
    return width, height, bytes(vals)


# Functions above run inside Arrow-batched Python workers — ship
# them by value (see functions.register_by_value).
from map_reduce_server_spark.functions import (  # noqa: E402
    register_by_value as _rbv,
)

_rbv(__name__)
del _rbv  # a lingering ref would pickle the functions pkg by reference
