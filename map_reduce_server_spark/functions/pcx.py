"""Pure-stdlib ZSoft PCX codec, 8-bit grayscale, single plane.

PCX contributes two container behaviors no other codec here
exercises. First, its RLE is TWO-BIT-TAGGED: a byte with both top
bits set (>= 0xC0) is a run header whose low 6 bits carry the count
(1-63) and whose FOLLOWING byte is the value; any other byte is a
bare literal — which means literal pixel VALUES >= 0xC0 cannot be
written bare and must be escaped as runs of one (the classic PCX
encoder bug is emitting them raw, silently corrupting bright
pixels; the decoder here cannot detect that, so the encoder is the
contract and the round-trip test sweeps the >= 0xC0 domain).
Second, scan lines are padded to an EVEN writer-chosen
``bytes_per_line`` that can exceed the width — decoders must decode
the full padded line and then truncate to width, not read
width-many decoded bytes (a reader that does the latter drifts off
the line grid and shears the image).

Scope is honest (grayscale 8-bit): version 5, encoding 1 (RLE), one
plane, 8 bits per pixel, the trailing VGA palette block (0x0C
marker + 768 bytes) written as identity grays and verified on
decode. Per spec ("decoding breaks should occur at the end of each
scan line"), runs never cross line boundaries — the encoder honors
it and the decoder enforces it. Anything else raises — the
strictness contract shared by every from-spec codec here. Spec:
ZSoft PCX File Format Technical Reference Manual, rev 5 (1991).
"""

from __future__ import annotations

import struct

_HDR = 128
_MANUFACTURER = 0x0A
_VERSION = 5
_ENCODING_RLE = 1
_PAL_MARKER = 0x0C
_RUN_FLAG = 0xC0
_MAX_RUN = 0x3F  # 6-bit count


def _identity_palette() -> bytes:
    return bytes(v for g in range(256) for v in (g, g, g))


def _rle_line(line: bytes) -> bytes:
    """RLE-encode one (already padded) scan line. Literals >= 0xC0
    are escaped as runs of 1 per spec."""
    out = bytearray()
    i, n = 0, len(line)
    while i < n:
        v = line[i]
        run = 1
        while i + run < n and run < _MAX_RUN and line[i + run] == v:
            run += 1
        if run > 1 or v >= _RUN_FLAG:
            out.append(_RUN_FLAG | run)
            out.append(v)
        else:
            out.append(v)
        i += run
    return bytes(out)


def encode_gray8(
    width: int, height: int, pixels: bytes, bytes_per_line: int | None = None
) -> bytes:
    """Encode row-major 8-bit grayscale as a single-plane RLE PCX
    with the trailing VGA identity-gray palette. ``bytes_per_line``
    defaults to width rounded up to even; larger (even) values add
    zero padding, exercising the pad-then-truncate contract."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    bpl = bytes_per_line if bytes_per_line is not None else width + (width & 1)
    if bpl < width or bpl % 2:
        raise ValueError("bytes_per_line must be even and >= width")
    hdr = struct.pack(
        "<BBBBHHHHHH48sBBHHHH54s",
        _MANUFACTURER,
        _VERSION,
        _ENCODING_RLE,
        8,  # bits per pixel per plane
        0, 0, width - 1, height - 1,  # xmin, ymin, xmax, ymax
        72, 72,  # dpi
        b"\x00" * 48,  # EGA palette (unused for 8-bit)
        0,  # reserved
        1,  # planes
        bpl,
        1,  # palette info: color
        0, 0,  # screen size (unused)
        b"\x00" * 54,
    )
    body = bytearray()
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        body += _rle_line(row + b"\x00" * (bpl - width))
    return hdr + bytes(body) + bytes([_PAL_MARKER]) + _identity_palette()


def decode_gray8(data: bytes) -> tuple[int, int, bytes]:
    """Decode a grayscale single-plane RLE PCX into (width, height,
    row-major pixel bytes). Decodes full padded lines then truncates
    to width, enforces the no-line-crossing rule, and verifies the
    trailing identity-gray VGA palette; anything outside the
    grayscale envelope raises."""
    if len(data) < _HDR:
        raise ValueError("not a PCX: truncated header")
    (
        manufacturer,
        version,
        encoding,
        bpp,
        xmin,
        ymin,
        xmax,
        ymax,
        _hdpi,
        _vdpi,
        _ega,
        _resv,
        planes,
        bpl,
        _palinfo,
        _hs,
        _vs,
        _fill,
    ) = struct.unpack_from("<BBBBHHHHHH48sBBHHHH54s", data, 0)
    if manufacturer != _MANUFACTURER:
        raise ValueError("not a PCX: bad manufacturer byte")
    if encoding != _ENCODING_RLE:
        raise NotImplementedError("only RLE encoding (1)")
    if bpp != 8 or planes != 1:
        raise NotImplementedError("only 8-bit single-plane PCX")
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    if bpl < width:
        raise ValueError("bytes_per_line smaller than width")
    pos = _HDR
    rows = []
    for _ in range(height):
        row = bytearray()
        while len(row) < bpl:
            if pos >= len(data):
                raise ValueError("truncated RLE stream")
            b = data[pos]
            pos += 1
            if b >= _RUN_FLAG:
                count = b & _MAX_RUN
                if pos >= len(data):
                    raise ValueError("truncated run packet")
                row += data[pos : pos + 1] * count
                pos += 1
            else:
                row.append(b)
        if len(row) != bpl:
            raise ValueError("RLE run crosses scan-line boundary")
        rows.append(bytes(row[:width]))
    if pos >= len(data) or data[pos] != _PAL_MARKER:
        raise ValueError("missing VGA palette marker")
    pal = data[pos + 1 : pos + 1 + 768]
    if len(pal) != 768:
        raise ValueError("truncated VGA palette")
    if pal != _identity_palette():
        raise NotImplementedError("only identity-gray palettes")
    return width, height, b"".join(rows)


# Functions above run inside Arrow-batched Python workers — ship
# them by value (see functions.register_by_value).
from map_reduce_server_spark.functions import (  # noqa: E402
    register_by_value as _rbv,
)

_rbv(__name__)
del _rbv  # a lingering ref would pickle the functions pkg by reference
