"""Pure-stdlib Windows ICO codec, 8-bit grayscale DIB entries.

ICO contributes the MULTI-IMAGE DIRECTORY container axis: a file
holds an ICONDIR header, an array of ICONDIRENTRY records (each with
its own dimensions and a byte offset), and one image resource per
entry — the "container of containers" shape (one file, several
independently-decodable payloads) that none of the single-image
codecs exercise. Each entry here is a headerless BMP DIB with two
ICO-specific quirks a naive BMP reader trips over: the
BITMAPINFOHEADER's biHeight is DOUBLED (the pixel raster is followed
by a 1-bit-per-pixel AND transparency mask, both bottom-up), and
there is no BITMAPFILEHEADER at all, so every offset is
directory-relative. Modern ICOs may also embed whole PNG files as
entries — recognized and refused here, not mis-parsed as DIBs.

Scope is honest: type-1 (icon) directories, 8 bpp BI_RGB gray-palette
DIB entries with the AND mask present and size-consistent. Anything
else raises — the strictness contract shared by every from-spec
codec here. Spec: Windows ICO resource format (ICONDIR /
ICONDIRENTRY + DIB), MSDN "Icons in Win32".
"""

from __future__ import annotations

import struct

_DIR_HDR = 6
_DIR_ENTRY = 16
_INFO_HDR = 40
_PALETTE = 256 * 4
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _stride(bits: int) -> int:
    """Row stride in bytes for a row of ``bits`` bits, padded to 4."""
    return (bits + 31) // 32 * 4


def _encode_dib(width: int, height: int, pixels: bytes) -> bytes:
    """One ICO image resource: INFOHEADER with DOUBLED height, gray
    palette, bottom-up 8bpp XOR raster, bottom-up all-opaque AND
    mask."""
    xor_stride = _stride(width * 8)
    and_stride = _stride(width)
    out = [
        struct.pack(
            "<IiiHHIIiiII",
            _INFO_HDR,
            width,
            height * 2,  # XOR raster + AND mask, stacked
            1,
            8,
            0,  # BI_RGB
            (xor_stride + and_stride) * height,
            0,
            0,
            256,
            0,
        ),
        b"".join(bytes((v, v, v, 0)) for v in range(256)),
    ]
    xpad = b"\x00" * (xor_stride - width)
    for y in range(height - 1, -1, -1):  # bottom-up
        out.append(pixels[y * width : (y + 1) * width] + xpad)
    out.append(b"\x00" * (and_stride * height))  # fully opaque mask
    return b"".join(out)


def encode_gray8(images: list[tuple[int, int, bytes]]) -> bytes:
    """Encode one or more (width, height, pixels) grayscale images as
    a multi-entry ICO."""
    if not images:
        raise ValueError("ICO needs at least one image")
    dibs = []
    for w, h, px in images:
        if len(px) != w * h:
            raise ValueError("pixel buffer does not match dimensions")
        if not (0 < w <= 256 and 0 < h <= 256):
            raise ValueError("ICO dimensions are 1..256")
        dibs.append(_encode_dib(w, h, px))
    out = [struct.pack("<HHH", 0, 1, len(images))]
    offset = _DIR_HDR + _DIR_ENTRY * len(images)
    for (w, h, _), dib in zip(images, dibs):
        out.append(
            struct.pack(
                "<BBBBHHII",
                w % 256,  # 256 encodes as 0
                h % 256,
                0,  # colorCount: 0 for >= 8bpp
                0,
                1,  # planes
                8,  # bitcount
                len(dib),
                offset,
            )
        )
        offset += len(dib)
    out.extend(dibs)
    return b"".join(out)


def decode_gray8(data: bytes) -> list[tuple[int, int, bytes]]:
    """Decode every entry of a grayscale ICO into (width, height,
    row-major luminance bytes) triples, in directory order. Walks
    the directory by offsets, validates the doubled-height DIB
    layout, reads the stride-padded bottom-up XOR raster through the
    gray palette, and checks the AND mask is present and
    size-consistent; PNG-compressed entries are refused loudly."""
    if len(data) < _DIR_HDR:
        raise ValueError("not an ICO: truncated directory")
    reserved, rtype, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or rtype != 1:
        raise ValueError("not an ICO: bad directory header")
    if count == 0:
        raise ValueError("empty ICO directory")
    images = []
    for i in range(count):
        entry_off = _DIR_HDR + _DIR_ENTRY * i
        if entry_off + _DIR_ENTRY > len(data):
            raise ValueError(f"truncated directory entry {i}")
        w8, h8, _cc, _rsv, _planes, _bits, size, offset = struct.unpack_from(
            "<BBBBHHII", data, entry_off
        )
        body = data[offset : offset + size]
        if len(body) != size:
            raise ValueError(f"truncated image resource {i}")
        if body[: len(_PNG_SIG)] == _PNG_SIG:
            raise NotImplementedError("PNG-compressed ICO entry")
        (hdr_size,) = struct.unpack_from("<I", body, 0)
        if hdr_size != _INFO_HDR:
            raise NotImplementedError("only BITMAPINFOHEADER entries")
        width, height2, planes, bpp, compression = struct.unpack_from(
            "<iiHHI", body, 4
        )
        if planes != 1 or bpp != 8:
            raise NotImplementedError("only 8-bit single-plane entries")
        if compression != 0:
            raise NotImplementedError("only BI_RGB entries")
        if height2 % 2:
            raise ValueError("ICO DIB height must be doubled (XOR+AND)")
        height = height2 // 2
        w_dir = w8 or 256
        h_dir = h8 or 256
        if (width, height) != (w_dir, h_dir):
            raise ValueError("directory/DIB dimension mismatch")
        lum = []
        pal_off = _INFO_HDR
        for c in range(256):
            b, g, r, _x = struct.unpack_from("<BBBB", body, pal_off + 4 * c)
            if not (b == g == r):
                raise NotImplementedError("non-gray palette")
            lum.append(b)
        xor_stride = _stride(width * 8)
        and_stride = _stride(width)
        px_off = _INFO_HDR + _PALETTE
        need = (xor_stride + and_stride) * height
        if len(body) < px_off + need:
            raise ValueError("XOR raster + AND mask do not fit entry")
        rows = []
        for y in range(height):
            off = px_off + y * xor_stride
            rows.append(body[off : off + width])
        rows.reverse()  # bottom-up
        raster = b"".join(rows)
        images.append((width, height, bytes(lum[b] for b in raster)))
    return images


# Functions above run inside Arrow-batched Python workers — ship
# them by value (see functions.register_by_value).
from map_reduce_server_spark.functions import (  # noqa: E402
    register_by_value as _rbv,
)

_rbv(__name__)
del _rbv  # a lingering ref would pickle the functions pkg by reference
