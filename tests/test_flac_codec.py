"""The pure-stdlib FLAC codec (functions/flac.py): CRC vectors,
round-trip properties across predictor regimes, integrity-field
rejection."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.functions import flac


def test_crc_known_vectors():
    """The two FLAC CRCs against their published check values:
    CRC-8/0x07('123456789') = 0xF4, CRC-16/0x8005 unreflected
    ('123456789') = 0xFEE8 — pins the polynomials and bit order to
    independent references, not to our own decoder."""
    assert flac._crc8(b"123456789") == 0xF4
    assert flac._crc16(b"123456789") == 0xFEE8


def test_stream_structure():
    s = list(range(-16, 16))
    f = flac.encode_s16(s, 8000)
    assert f[:4] == b"fLaC"
    assert f[4] == 0x80  # last metadata block | STREAMINFO
    assert int.from_bytes(f[5:8], "big") == 34
    # STREAMINFO min/max block size == n
    assert struct.unpack(">HH", f[8:12]) == (32, 32)
    import hashlib

    raw = struct.pack("<32h", *s)
    assert f[8 + 18 : 8 + 34] == hashlib.md5(raw).digest()
    # frame sync code
    assert f[42] == 0xFF and (f[43] & 0xFC) == 0xF8


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=16,
        max_size=200,
    )
)
def test_roundtrip_property(data):
    rate, dec = flac.decode_s16(flac.encode_s16(data, 8000))
    assert rate == 8000 and dec == data


@pytest.mark.parametrize(
    "samples",
    [
        [12345] * 64,  # constant -> order-1 predictor zeros out
        [i * 7 - 3000 for i in range(300)],  # ramp -> order 2
        [32767, -32768] * 128,  # extreme alternation, max residuals
        list(range(16)),  # minimum legal block size
    ],
)
def test_roundtrip_predictor_regimes(samples):
    assert flac.decode_s16(flac.encode_s16(samples, 44100)) == (
        44100,
        samples,
    )


def test_smooth_signal_actually_compresses():
    """The point of prediction: a smooth signal's FLAC must be much
    smaller than raw PCM — a codec that only round-trips could be a
    verbatim store wearing FLAC framing."""
    import math

    s = [int(3000 * math.sin(i / 10)) for i in range(1000)]
    assert len(flac.encode_s16(s, 8000)) < len(s) * 2 * 0.5


def test_corrupt_frame_fails_crc16():
    f = bytearray(flac.encode_s16(list(range(16)), 8000))
    f[-3] ^= 0x01  # flip a residual bit near the frame end
    with pytest.raises(ValueError, match="CRC-16|MD5|truncated"):
        flac.decode_s16(bytes(f))


def test_corrupt_header_fails_crc8():
    f = bytearray(flac.encode_s16(list(range(16)), 8000))
    f[44] ^= 0x10  # flip a frame-header bit (blocksize code area)
    with pytest.raises(ValueError):
        flac.decode_s16(bytes(f))


def test_block_size_bounds():
    with pytest.raises(ValueError, match="block size"):
        flac.encode_s16([0] * 15, 8000)
    with pytest.raises(ValueError, match="int16"):
        flac.encode_s16([40000] * 16, 8000)


def test_large_block_16bit_escape():
    """Block sizes over 256 use the 16-bit size escape."""
    s = [(i * 31) % 1000 - 500 for i in range(4096)]
    assert flac.decode_s16(flac.encode_s16(s, 8000))[1] == s


def test_truncation_sweep_raises_valueerror():
    """EVERY proper prefix of a valid file must raise ValueError —
    never struct.error — so callers filtering on ValueError never
    crash (review r9)."""
    f = flac.encode_s16(list(range(16)), 8000)
    for cut in range(len(f)):
        with pytest.raises(ValueError):
            flac.decode_s16(f[:cut])


def test_encode_rejects_bad_rate():
    """The STREAMINFO rate field is 20 bits: an unchecked 2 MHz rate
    would truncate silently and decode cleanly to the wrong value
    (review r9)."""
    with pytest.raises(ValueError, match="sample rate"):
        flac.encode_s16([0] * 16, 2_000_000)
    with pytest.raises(ValueError, match="sample rate"):
        flac.encode_s16([0] * 16, 0)
