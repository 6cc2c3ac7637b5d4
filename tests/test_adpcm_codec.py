"""The pure-stdlib IMA ADPCM codec (functions/adpcm.py): wire-format
golden, audioop third-party conformance (both directions), container
contracts, truncation sweep.

``audioop`` (CPython's C reference of the same Intel/DVI state
machine, deprecated but present on this interpreter) packs HIGH
nibble first with implicit (0, 0) state; the WAV container packs LOW
nibble first with explicit per-block header state — the helpers
below translate between the two so the comparison is about the
codec, not the framing.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.functions import adpcm

# Per-test skip, NOT module-level importorskip: the container /
# truncation / golden tests below don't need audioop and must keep
# running on Python >= 3.13 where it was removed (the recorded
# conformance values live audioop-free in test_adpcm_goldens.py).
try:
    import audioop
except ImportError:  # Python >= 3.13
    audioop = None

needs_audioop = pytest.mark.skipif(
    audioop is None, reason="audioop removed from the stdlib (py>=3.13)"
)


def _audioop_decode(nibbles: list[int], pred: int, idx: int) -> list[int]:
    """Decode a nibble list with audioop from explicit state."""
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    raw = bytes(
        (a << 4) | b for a, b in zip(nibbles[0::2], nibbles[1::2])
    )
    dec, _ = audioop.adpcm2lin(raw, 2, (pred, idx))
    return list(struct.unpack("<%dh" % (len(raw) * 2), dec))


def test_state_machine_golden():
    """Hand-checked first steps from (0, 0): nibble 7 reconstructs
    7/8 + 7/4 + 7/2 -> 0+0+1+3 with +8/8 base = 0+1+3+... compute:
    step=7, diff=7>>3=0, +7>>2=1, +7>>1=3, +7=7 -> 11; idx += 8."""
    pred, idx = adpcm.decode_nibble(7, 0, 0)
    assert (pred, idx) == (11, 8)
    pred, idx = adpcm.decode_nibble(0xF, pred, idx)
    # step=16: diff = 2+4+8+16 = 30; 11-30 = -19; idx 8+8=16
    assert (pred, idx) == (-19, 16)


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    )
)
@needs_audioop
def test_encoder_bit_exact_to_audioop(data):
    """Our encoder's nibble stream and final state equal audioop's
    from the same (0, 0) start — the strongest possible third-party
    check of the quantizer (subtract-shift order, clamping, index
    walk)."""
    pcm = struct.pack("<%dh" % len(data), *data)
    ref, ref_state = audioop.lin2adpcm(pcm, 2, None)
    pred, idx = 0, 0
    nibs = []
    for s in data:
        nib, pred, idx = adpcm.encode_step(s, pred, idx)
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    mine = bytes((a << 4) | b for a, b in zip(nibs[0::2], nibs[1::2]))
    # audioop holds an odd trailing nibble in its (unreturned)
    # buffer — compare the bytes it actually emitted; the advanced
    # (pred, idx) state still reflects the held nibble on both sides
    assert mine[: len(ref)] == ref
    assert (pred, idx) == ref_state


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=300),
    pred0=st.integers(min_value=-32768, max_value=32767),
    idx0=st.integers(min_value=0, max_value=88),
)
@needs_audioop
def test_decoder_bit_exact_to_audioop_from_any_state(data, pred0, idx0):
    """Arbitrary nibble streams from arbitrary header state decode
    identically to audioop — covers saturation and the index clamp
    at both ends, which self-encoded streams rarely reach."""
    nibs = [n for b in data for n in (b >> 4, b & 15)]
    ref = _audioop_decode(nibs, pred0, idx0)
    pred, idx = pred0, idx0
    mine = []
    for nib in nibs:
        pred, idx = adpcm.decode_nibble(nib, pred, idx)
        mine.append(pred)
    assert mine == ref


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=1600,
    )
)
@needs_audioop
def test_wav_roundtrip_matches_audioop_reference(data):
    """End-to-end container round-trip: encode to a 0x11 WAV (505
    samples/block -> multi-block above 505, partial final block
    almost always), decode it back, and check the samples against an
    independent audioop replay of the encoder's own nibble stream.
    ADPCM is lossy, so the assertion is decoder-vs-decoder, not
    output-vs-input."""
    f = adpcm.encode_wav_ima(16000, data, samples_per_block=505)
    rate, got = adpcm.decode_wav_ima(f)
    assert rate == 16000
    assert len(got) == len(data)
    # independent replay: per block, seed audioop with the header
    # state and hand it the nibbles in its order
    (riff_len,) = struct.unpack("<I", f[4:8])
    pos = 12
    body = None
    align = spb = None
    while pos + 8 <= 8 + riff_len:
        tag = f[pos : pos + 4]
        (size,) = struct.unpack("<I", f[pos + 4 : pos + 8])
        if tag == b"fmt ":
            align, spb = struct.unpack("<HH", f[pos + 8 + 12 : pos + 8 + 14] + f[pos + 8 + 18 : pos + 8 + 20])
        if tag == b"data":
            body = f[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    ref = []
    for bstart in range(0, len(body), align):
        block = body[bstart : bstart + align]
        pred0 = struct.unpack("<h", block[0:2])[0]
        idx0 = block[2]
        nibs = [n for b in block[4:] for n in (b & 15, b >> 4)]
        ref.append(pred0)
        ref.extend(_audioop_decode(nibs, pred0, idx0))
    assert got == ref[: len(data)]


def test_partial_final_block_exact_count():
    """fact-chunk trimming: 510 samples at 505/block leaves a 5-
    sample final block whose pad nibble must NOT leak an extra
    sample."""
    data = list(range(-255, 255))
    f = adpcm.encode_wav_ima(8000, data, samples_per_block=505)
    _, got = adpcm.decode_wav_ima(f)
    assert len(got) == 510


@needs_audioop
def test_frame_wav_ima_roundtrip():
    """The raw-payload framing used by the registered query: header
    state + nibble bytes -> file -> decode replays the state machine
    over 1 + 2*len(nibbles) samples starting at the header sample."""
    f = adpcm.frame_wav_ima(8000, -1234, 40, bytes(range(16)))
    rate, got = adpcm.decode_wav_ima(f)
    assert rate == 8000
    assert got[0] == -1234
    assert len(got) == 33
    nibs = [n for b in bytes(range(16)) for n in (b & 15, b >> 4)]
    assert got[1:] == _audioop_decode(nibs, -1234, 40)


def test_rejects_wrong_formats():
    from map_reduce_server_spark.functions import g711

    mulaw = g711.encode_wav_mulaw(8000, bytes(32))
    with pytest.raises(NotImplementedError, match="only WAVE_FORMAT_IMA"):
        adpcm.decode_wav_ima(mulaw)
    with pytest.raises(ValueError):
        adpcm.decode_wav_ima(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="step index"):
        adpcm.frame_wav_ima(8000, 0, 89, b"\x00")
    with pytest.raises(ValueError, match="int16"):
        adpcm.encode_wav_ima(8000, [40000])
    with pytest.raises(ValueError, match="odd"):
        adpcm.encode_wav_ima(8000, [1, 2], samples_per_block=4)


def test_missing_fact_rejected():
    """Compressed WAVE requires the fact chunk — without it a
    partial final block is indistinguishable from truncation, so a
    file lacking it must fail loud, not guess."""
    f = bytearray(adpcm.frame_wav_ima(8000, 0, 0, bytes(4)))
    # surgically blank the fact tag so the walk skips it
    i = f.find(b"fact")
    f[i : i + 4] = b"junk"
    with pytest.raises(ValueError, match="missing fact"):
        adpcm.decode_wav_ima(bytes(f))


def test_inconsistent_samples_per_block_rejected():
    f = bytearray(adpcm.frame_wav_ima(8000, 0, 0, bytes(4)))
    i = f.find(b"fmt ")
    # wSamplesPerBlock sits 18 bytes into the fmt body
    f[i + 8 + 18 : i + 8 + 20] = struct.pack("<H", 99)
    with pytest.raises(ValueError, match="inconsistent"):
        adpcm.decode_wav_ima(bytes(f))


def test_truncation_sweep_raises_valueerror():
    """EVERY proper prefix must raise ValueError (or the documented
    NotImplementedError subclass boundary), never struct.error or
    IndexError — the caller contract every codec here shares."""
    f = adpcm.encode_wav_ima(8000, list(range(-600, 600)), 505)
    for cut in range(len(f)):
        with pytest.raises((ValueError, NotImplementedError)):
            adpcm.decode_wav_ima(f[:cut])


def test_padded_final_block_layouts():
    """Review r10: standard encoders (e.g. ffmpeg) pad EVERY block to
    nBlockAlign and let the fact count trim — including the corner
    where the final block owes ONLY its header sample (fact =
    k*spb + 1). Hand-build that layout and require exact decode;
    the pad nibbles must not leak samples or trip the trim check."""
    spb, align = 9, 8  # 9 samples/block, 4 header + 4 nibble bytes
    blocks = b""
    idx = 0
    ref = []
    # block 1: full (9 samples), block 2: padded, owes only header
    samples1 = [0, 500, -800, 1200, -1600, 30, 60, -90, 120]
    pred = samples1[0]
    blocks += struct.pack("<hBB", pred, idx, 0)
    nibs = []
    for s in samples1[1:]:
        nib, pred, idx = adpcm.encode_step(s, pred, idx)
        nibs.append(nib)
    blocks += bytes(lo | (hi << 4) for lo, hi in zip(nibs[0::2], nibs[1::2]))
    ref_decode = adpcm._decode_block(blocks[-8:], 9)
    ref.extend(ref_decode)
    blocks += struct.pack("<hBB", -12345, idx, 0) + b"\xab\xcd\xef\x01"
    ref.append(-12345)
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, align, 4, 2, spb)
    fact = struct.pack("<I", 10)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )
    f = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, got = adpcm.decode_wav_ima(f)
    assert (rate, got) == (8000, ref)


def test_frame_wav_ima_rejects_empty_nibbles():
    """Review r10: an empty nibble payload would frame a file the
    decoder's block-align consistency check rejects — refuse at the
    source."""
    with pytest.raises(ValueError, match="empty nibble"):
        adpcm.frame_wav_ima(8000, 0, 0, b"")


def test_zero_fact_count_rejected():
    """Review r10: fact = 0 must fail at the codec (the ValueError
    contract), not flow an empty sample list into the stats stage
    where max()/division crash the Spark task."""
    f = bytearray(adpcm.frame_wav_ima(8000, 0, 0, bytes(4)))
    i = f.find(b"fact")
    f[i + 8 : i + 12] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="fact sample count is zero"):
        adpcm.decode_wav_ima(bytes(f))
