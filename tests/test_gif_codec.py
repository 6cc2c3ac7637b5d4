"""The pure-stdlib GIF89a codec (functions/gif.py): wire-format
golden, LZW width-growth boundaries, and round-trip properties."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.functions import gif


def test_lzw_golden_hand_packed():
    """Four zero pixels, hand-packed from the GIF89a spec: codes
    CLEAR(256), 0, 258, 0, EOI(257) at 9 bits LSB-first =
    00 01 08 04 10 10. Pins the wire format (bit order, clear/EOI
    framing, dictionary registration point) to an independent
    derivation — a round-trip-only suite would let a symmetric
    encoder/decoder bug produce non-standard GIFs that still pass."""
    assert gif._lzw_encode(b"\x00\x00\x00\x00").hex() == "000108041010"


def test_file_structure_golden():
    """Header, screen descriptor, identity palette, image
    descriptor, min-code byte, sub-block framing, trailer."""
    f = gif.encode_gray8(4, 1, b"\x00\x00\x00\x00")
    assert f[:6] == b"GIF89a"
    w, h, packed, bg, aspect = struct.unpack("<HHBBB", f[6:13])
    assert (w, h, packed, bg, aspect) == (4, 1, 0xF7, 0, 0)
    palette = f[13 : 13 + 768]
    assert palette == b"".join(bytes((i, i, i)) for i in range(256))
    pos = 13 + 768
    assert f[pos] == 0x2C
    assert struct.unpack("<HHHH", f[pos + 1 : pos + 9]) == (0, 0, 4, 1)
    assert f[pos + 9] == 0  # no LCT, not interlaced
    assert f[pos + 10] == 8  # LZW min code size
    assert f[pos + 11] == 6  # one 6-byte sub-block (the golden above)
    assert f[pos + 12 : pos + 18].hex() == "000108041010"
    assert f[pos + 18] == 0  # block terminator
    assert f[pos + 19] == 0x3B  # trailer
    assert len(f) == pos + 20


def test_decode_golden():
    assert gif.decode_gray8(gif.encode_gray8(4, 1, b"\x00\x00\x00\x00")) == (
        4,
        1,
        b"\x00\x00\x00\x00",
    )


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=1, max_size=600))
def test_roundtrip_property(data):
    w, h = len(data), 1
    assert gif.decode_gray8(gif.encode_gray8(w, h, data)) == (w, h, data)


@pytest.mark.parametrize(
    "n,desc",
    [
        (3000, "crosses the 9->10 bit width boundary"),
        (8000, "crosses 10->11"),
        (20000, "crosses 11->12 and freezes the dictionary at 4096"),
    ],
)
def test_roundtrip_width_boundaries(n, desc):
    """Random bytes register ~2 dictionary entries per 3 pixels, so
    these sizes push the variable-width machinery through every
    growth step and into the deferred-clear (frozen dict) regime —
    the places an encoder/decoder desynchronization would bite."""
    import random

    rng = random.Random(n)
    data = bytes(rng.randrange(256) for _ in range(n))
    # genuinely random: the dictionary must actually grow (a
    # re-seeded-per-element RNG once produced a constant run here,
    # silently skipping every width transition — review r9)
    assert len(set(data)) > 200
    assert gif.decode_gray8(gif.encode_gray8(n, 1, data)) == (n, 1, data)


def test_roundtrip_long_runs():
    """Low-entropy input grows dictionary strings (not just count) —
    the KwKwK path fires constantly here."""
    data = bytes([7] * 50000)
    assert gif.decode_gray8(gif.encode_gray8(50000, 1, data))[2] == data


def test_decode_rejects_non_gray_palette():
    f = bytearray(gif.encode_gray8(2, 1, b"\x01\x02"))
    f[13 + 3] ^= 0xFF  # corrupt palette entry 1's red channel
    with pytest.raises(ValueError, match="identity gray ramp"):
        gif.decode_gray8(bytes(f))


def test_decode_rejects_truncated_stream():
    f = gif.encode_gray8(8, 3, bytes(range(24)))
    with pytest.raises(ValueError):
        gif.decode_gray8(f[:-8])


def test_decode_skips_extension_blocks():
    """Real-world GIFs carry GCE/comment extensions before the image
    descriptor; the parser must skip them, not mistake them for it."""
    f = gif.encode_gray8(2, 1, b"\x05\x06")
    pos = 13 + 768
    ext = bytes([0x21, 0xFE, 3, 65, 66, 67, 0])  # comment "ABC"
    patched = f[:pos] + ext + f[pos:]
    assert gif.decode_gray8(patched) == (2, 1, b"\x05\x06")


def test_truncation_sweep_raises_valueerror():
    """EVERY proper prefix of a valid file (except dropping only the
    unread 0x3B trailer) must raise ValueError — never struct.error
    or IndexError, which callers filtering on ValueError would crash
    on (review r9). Also pins the EOI check: the LZW stream must
    terminate exactly at the declared pixel count."""
    f = gif.encode_gray8(8, 3, bytes(range(24)))
    for cut in range(len(f) - 1):
        with pytest.raises(ValueError):
            gif.decode_gray8(f[:cut])


def test_lzw_overrun_and_missing_eoi_rejected():
    f = gif.encode_gray8(8, 3, bytes(range(24)))
    # understate the dimensions: the stream then overruns the count
    under = f[:6] + struct.pack("<HH", 4, 3) + f[10:]
    pos = 13 + 768
    under = (
        under[:pos]
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 3, 0)
        + under[pos + 10 :]
    )
    with pytest.raises(ValueError, match="exceeds pixel count|missing EOI"):
        gif.decode_gray8(under)


def test_encode_rejects_bad_dims():
    with pytest.raises(ValueError, match="out of range"):
        gif.encode_gray8(120000, 1, bytes(120000))
    with pytest.raises(ValueError, match="out of range"):
        gif.encode_gray8(0, 0, b"")
