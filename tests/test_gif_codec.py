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


def _pack_lsb(codes, width):
    """LSB-first bit-pack ``codes`` at a fixed ``width`` (the GIF
    wire order), NO padding beyond the final byte boundary."""
    return _pack_lsb_pairs((c, width) for c in codes)


def _pack_lsb_pairs(pairs):
    """LSB-first bit-pack ``(code, width)`` pairs — variable width,
    no padding beyond the final byte boundary."""
    acc = nbits = 0
    out = bytearray()
    for c, width in pairs:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _foreign_boundary_stream(n):
    """Hand-pack a root-codes-only LZW stream of ``n`` data codes
    ending with an encoder-late-width EOI, byte-aligned exactly.

    A writer that never uses its dictionary (root codes only) is
    valid LZW but must still follow the width schedule, since its
    TABLE grows one entry per emitted code regardless. Data codes
    are packed at the width the decoder will read them with; the
    trailing EOI at the width an encoder-late writer uses — one step
    NARROWER than the decoder's when n lands exactly on a transition
    (n = 255 / 767 / 1791: the decoder's registration during the
    final data code crosses 512 / 1024 / 2048 entries). Leading
    CLEARs (table-resetting no-ops) pad the total to a whole byte so
    there is no padding bit for the decoder's wide EOI read.
    Returns (lzw_bytes, pixels)."""
    pairs = []
    w = 9
    pixels = bytearray()
    for i in range(1, n + 1):
        code = (i - 1) % 256
        pairs.append((code, w))
        pixels.append(code)
        # decoder widens while PROCESSING codes 255/767/1791 (its
        # table hits 512/1024/2048), so later codes read wider
        if i in (255, 767, 1791) and w < 12:
            w += 1
    eoi_w = w - 1 if n in (255, 767, 1791) else w
    pairs.append((257, eoi_w))
    bits = sum(width for _, width in pairs)
    clears = next(c for c in range(8) if (bits + 9 * c) % 8 == 0)
    pairs = [(256, 9)] * clears + pairs
    return _pack_lsb_pairs(pairs), bytes(pixels)


def _wrap_lzw(width, height, lzw):
    """Minimal single-image gray-ramp GIF89a container around a raw
    LZW payload (same framing encode_gray8 emits)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    out.append(0x3B)
    return bytes(out)


@pytest.mark.parametrize("n", [255, 767, 1791])
def test_foreign_eoi_at_width_boundary_byte_aligned(n):
    """ADVICE r9: the decoder registers one entry behind the encoder
    so it widens one registration EARLIER — when the FINAL data
    code's registration lands exactly on a width transition (table
    hits 512/1024/2048), a writer that emits EOI at the old width
    with the stream ending byte-aligned leaves no padding bit to
    widen into; the strict fixed-width EOI read falsely rejected it
    as 'truncated before EOI'. One case per width transition
    (9→10, 10→11, 11→12)."""
    lzw, pixels = _foreign_boundary_stream(n)
    f = _wrap_lzw(n, 1, lzw)
    assert gif.decode_gray8(f) == (n, 1, pixels)


@pytest.mark.parametrize("n", [254, 256, 766, 768])
def test_foreign_eoi_off_boundary_still_strict(n):
    """One code either side of a transition the widths agree, so the
    same packer (EOI at the decoder's width there) must decode — and
    prove the schedule arithmetic in the fixture itself is right."""
    lzw, pixels = _foreign_boundary_stream(n)
    f = _wrap_lzw(n, 1, lzw)
    assert gif.decode_gray8(f) == (n, 1, pixels)


def test_foreign_eoi_at_width_boundary_with_padding():
    """Same boundary stream but with a zero pad byte after the
    9-bit EOI: the wide (10-bit) read sees the same value (EOI's
    low bits ARE EOI, LSB-first) — must also decode."""
    codes = [256] * 8 + list(range(255)) + [257]
    lzw = _pack_lsb(codes, 9) + b"\x00"
    f = _wrap_lzw(255, 1, lzw)
    assert gif.decode_gray8(f) == (255, 1, bytes(range(255)))


def test_boundary_stream_truncated_before_eoi_still_rejected():
    """The tolerance must not weaken the truncation contract: the
    same boundary stream CUT before the EOI code still raises."""
    codes = [256] * 8 + list(range(255))  # no EOI at all
    lzw = _pack_lsb(codes, 9)
    f = _wrap_lzw(255, 1, lzw)
    with pytest.raises(ValueError, match="truncated before EOI"):
        gif.decode_gray8(f)


def test_boundary_stream_garbage_instead_of_eoi_rejected():
    """A non-EOI code after the final pixel at the boundary still
    raises: the 9 remaining bits decode to 100, which is neither a
    narrow EOI (so the tolerance stays shut) nor enough bits for the
    wide read the decoder's schedule expects."""
    codes = [256] * 8 + list(range(255)) + [100]
    lzw = _pack_lsb(codes, 9)
    f = _wrap_lzw(255, 1, lzw)
    with pytest.raises(ValueError, match="truncated before EOI|missing EOI"):
        gif.decode_gray8(f)


def test_boundary_ones_padding_after_narrow_eoi_accepted():
    """Review r10 (two conflicting reviews, resolved for charity): a
    narrow EOI at the boundary followed by a SET padding bit is
    bit-identical to a malformed wide code 769 (0b1100000001) — but
    the spec makes bits after EOI don't-care padding, so a legal
    ones-padding writer produces exactly these bits and rejecting
    them would falsely refuse a conforming file. Both parses leave
    the pixels complete and identical; the conforming parse wins.
    (The same bits written as '(769, 10)' decode identically.)"""
    pairs = [(c, 9) for c in range(255)] + [(769, 10)]
    bits = 255 * 9 + 10
    clears = next(c for c in range(8) if (bits + 9 * c) % 8 == 0)
    lzw = _pack_lsb_pairs([(256, 9)] * clears + pairs)
    f = _wrap_lzw(255, 1, lzw)
    assert gif.decode_gray8(f) == (255, 1, bytes(range(255)))


def test_off_boundary_wide_garbage_still_rejected():
    """Away from a transition there is no narrow/padding ambiguity:
    a full-width non-EOI code after the final pixel stays malformed."""
    pairs = [(c, 9) for c in range(254)] + [(100, 9)]
    bits = 255 * 9
    clears = next(c for c in range(8) if (bits + 9 * c) % 8 == 0)
    lzw = _pack_lsb_pairs([(256, 9)] * clears + pairs)
    f = _wrap_lzw(254, 1, lzw)
    with pytest.raises(ValueError, match="missing EOI"):
        gif.decode_gray8(f)


@settings(max_examples=60, deadline=None)
@given(n=st.integers(min_value=1, max_value=2500))
def test_foreign_stream_any_length_decodes(n):
    """Property: a root-codes-only foreign stream of ANY length with
    an encoder-late EOI and byte-aligned ending decodes to its code
    values — on AND off the width-transition boundaries (the
    generator emits the narrow EOI exactly at n=255/767/1791 and the
    agreed width everywhere else)."""
    lzw, pixels = _foreign_boundary_stream(n)
    f = _wrap_lzw(n, 1, lzw)
    assert gif.decode_gray8(f) == (n, 1, pixels)
