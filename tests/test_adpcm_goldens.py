"""IMA ADPCM goldens recorded from CPython's ``audioop`` — pinned as
literals so the third-party conformance anchor survives containers
where ``audioop`` no longer exists (removed in Python 3.13; the
property-level tests in test_adpcm_codec.py importorskip it).

Every expected value below was captured by running ``audioop``
(CPython 3.11's C implementation of the same Intel/DVI state
machine) on the shown inputs — decode via ``adpcm2lin`` seeded with
the explicit (predictor, index) state, encode via ``lin2adpcm`` from
its fresh (0, 0) state. None of these tests import audioop.

Also hosts the multi-block hardening the round-10 verdict asked for:
cross-block step-index carry, the partial-final-block layout, the
surplus-block strictness check, and a Hypothesis sweep framing
foreign ``samples_per_block`` values through ``decode_wav_ima``.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.functions import adpcm

# (nibbles, pred0, idx0) -> audioop.adpcm2lin output samples.
# Cases cover positive/negative saturation at max step, the index
# clamp at 0, and three random walks from arbitrary seeded states.
_DECODE_GOLDENS = [
    ([7] * 12, 32700, 88, [32767] * 12),
    ([15] * 12, -32700, 88, [-32768] * 12),
    ([0, 1, 2, 3, 8, 9, 10, 11, 0, 8], 0, 0,
     [0, 1, 4, 8, 8, 7, 4, 0, 0, 0]),
    ([10, 2, 5, 8, 4, 11, 5, 13, 10, 8, 6, 15, 9, 6, 2, 12, 0, 13,
      13, 10, 12, 8, 5, 7], 2772, 8,
     [2762, 2770, 2787, 2785, 2804, 2787, 2812, 2774, 2749, 2745,
      2800, 2688, 2640, 2831, 2961, 2748, 2776, 2489, 2068, 1788,
      1329, 1268, 1885, 3118]),
    ([11, 13, 11, 8, 12, 0, 5, 2, 11, 1, 12, 6, 15, 8, 6, 5, 3, 7,
      11, 13, 7, 0, 15, 5], 21629, 39,
     [21362, 20980, 20623, 20577, 20198, 20249, 20758, 21098, 20667,
      20835, 20376, 21178, 19536, 19302, 22075, 26233, 30107, 32767,
      25217, 14431, 32767, 32767, -9204, 32767]),
    ([2, 6, 7, 1, 3, 2, 2, 7, 4, 8, 5, 1, 9, 13, 9, 10, 2, 3, 8, 6,
      11, 14, 5, 14], 16470, 18,
     [16495, 16554, 16677, 16729, 16842, 16915, 16981, 17162, 17397,
      17366, 17681, 17807, 17693, 17311, 17158, 16927, 17137, 17404,
      17370, 17780, 17388, 16725, 17720, 15998]),
    ([9, 14, 7, 12, 7, 2, 0, 7, 3, 3, 5, 13, 0, 10, 15, 14, 7, 10,
      6, 9, 2, 9, 0, 4], 23058, 36,
     [22973, 22634, 23328, 22433, 24237, 25528, 25762, 28961, 32163,
      32767, 32767, 26679, 27489, 23806, 13761, -4904, 32767, 12289,
      32767, 20481, 32767, 22611, 25688, 32767]),
]

# (pcm, audioop nibble stream, final predictor, final index) from
# (0, 0). For odd-length pcm audioop HOLDS the trailing nibble in an
# internal buffer it never returns, so the recorded stream covers
# only the even prefix — the returned final state still reflects the
# held nibble on both sides, which is what the assertion uses.
_ENCODE_GOLDENS = [
    ([0, 9815, 18551, 25244, 29158, 29862, 27278, 21692, 13718,
      4233, -5717, -15038, -22704, -27870, -29968, -28767],
     [0, 7, 7, 7, 7, 7, 7, 7, 7, 9, 15, 15, 10, 9, 9, 0],
     -30066, 75),
    ([0, 163, 309, 420, 485, 497, 454, 361, 228, 70, -95, -250,
      -378, -464, -499, -479, -406],
     [0, 7, 7, 7, 7, 6, 8, 9, 10, 10, 11, 12, 10, 9, 8, 0],
     -416, 30),
    ([0, 10721, 20262, 27572, 31847, 32616, 29794, 23693, 14983,
      4624, -6244, -16425, -24798, -30441, -32732, -31421, -26650,
      -18945, -9155, 1642, 12259, 21527, 28425, 32193, 32418, 29073,
      22528, 13503, 2992, -7848, -17825, -25840, -31010],
     [0, 7, 7, 7, 7, 7, 7, 7, 7, 8, 15, 15, 11, 9, 9, 0, 2, 3, 4,
      4, 3, 3, 3, 1, 0, 10, 11, 14, 11, 12, 11, 11],
     -31872, 74),
]


def test_decode_goldens_recorded_from_audioop():
    for nibs, pred0, idx0, want in _DECODE_GOLDENS:
        pred, idx = pred0, idx0
        got = []
        for nib in nibs:
            pred, idx = adpcm.decode_nibble(nib, pred, idx)
            got.append(pred)
        assert got == want


def test_encode_goldens_recorded_from_audioop():
    for pcm, want_nibs, want_pred, want_idx in _ENCODE_GOLDENS:
        pred, idx = 0, 0
        nibs = []
        for s in pcm:
            nib, pred, idx = adpcm.encode_step(s, pred, idx)
            nibs.append(nib)
        emitted = len(pcm) - (len(pcm) % 2)
        assert nibs[:emitted] == want_nibs[:emitted]
        assert (pred, idx) == (want_pred, want_idx)


# ---------------------------------------------------------------
# multi-block container hardening (no audioop involved)
# ---------------------------------------------------------------

# 23 samples at samples_per_block=9: two full blocks + a 5-sample
# partial final block, exercising the cross-block index carry and
# the padded partial tail in one file.
_PCM23 = [int(12000 * math.sin(k / 2.5)) + (k * 37 % 101) - 50
          for k in range(23)]
# The recorded bytes of encode_wav_ima(8000, _PCM23, 9):
_WAV23 = bytes.fromhex(
    "524946464a00000057415645666d74201400000011000100401f0000c81b0000"
    "0800040002000900666163740400000017000000646174611600000"
    "0ceff0000777777f72eeb4000ac1844343e25440001b9"
)
# audioop-free reconstruction golden: decode_wav_ima(_WAV23)[1]
_DEC23 = [-50, -39, -9, 54, 190, 483, 1114, 2471, -439, -5330,
          -9072, -11588, -12045, -10799, -7397, -3280, 1701, 6388,
          9534, 11359, 11912, 10403, 7201]


def test_wav_file_golden_bytes_and_reconstruction():
    """The full container output is byte-pinned: header fields,
    fact count, cross-block index carry, nibble packing, and the
    padded partial final block all fixed by one recorded file."""
    data = adpcm.encode_wav_ima(8000, _PCM23, samples_per_block=9)
    assert data == _WAV23
    fr, got = adpcm.decode_wav_ima(data)
    assert fr == 8000
    assert got == _DEC23


def test_cross_block_index_carry():
    """Each block header re-anchors the predictor to the block's
    first sample but carries the step index from the previous block
    — the convention encode_wav_ima documents. Verified from the
    raw block headers and against a flat step-by-step replay."""
    data = adpcm.encode_wav_ima(8000, _PCM23, samples_per_block=9)
    i = data.find(b"data")
    body = data[i + 8:]
    align = 4 + (9 - 1) // 2
    headers = [struct.unpack("<hBB", body[b * align: b * align + 4])
               for b in range(3)]
    # predictors re-anchor to the source samples at block starts
    assert [h[0] for h in headers] == [_PCM23[0], _PCM23[9], _PCM23[18]]
    # indices carry: replay the encoder flat and check the state it
    # reaches at each block boundary equals the next block's header
    pred, idx = _PCM23[0], 0
    boundary_idx = [0]
    for k, s in enumerate(_PCM23[1:], start=1):
        if k % 9 == 0:
            boundary_idx.append(idx)
            pred = s  # header re-anchor, no nibble emitted
            continue
        _, pred, idx = adpcm.encode_step(s, pred, idx)
    assert [h[1] for h in headers] == boundary_idx
    assert boundary_idx[1] > 0  # the carry is actually non-trivial


def test_surplus_block_rejected():
    """A fact count that leaves whole encoded blocks undecoded is
    malformed (header and payload disagree about length) — same
    trailing-data strictness as the GIF decoder."""
    pcm = _PCM23 + _PCM23  # 46 samples -> 6 blocks at spb=9
    data = adpcm.encode_wav_ima(8000, pcm, samples_per_block=9)
    # shrink fact to one block's worth: 9 samples
    i = data.find(b"fact")
    bad = data[: i + 8] + struct.pack("<I", 9) + data[i + 12:]
    with pytest.raises(ValueError, match="surplus"):
        adpcm.decode_wav_ima(bad)


def test_fact_trimming_final_padded_block_still_accepted():
    """The strictness check must NOT fire on the legitimate layout:
    a partial final block padded to full block-align, where fact
    stops mid-block. 19 samples at spb=9 = 2 full blocks + a block
    owing only its header sample plus pad nibbles."""
    pcm = _PCM23[:19]
    data = adpcm.encode_wav_ima(8000, pcm, samples_per_block=9)
    fr, got = adpcm.decode_wav_ima(data)
    assert fr == 8000 and len(got) == 19


@settings(max_examples=60, deadline=None)
@given(spb_foreign=st.integers(min_value=0, max_value=4096))
def test_foreign_samples_per_block_framing(spb_foreign):
    """Sweep foreign wSamplesPerBlock values through decode_wav_ima
    on an otherwise-valid file: every value inconsistent with the
    block align must raise ValueError (never decode garbage, never
    leak a struct.error); the one consistent value decodes."""
    data = adpcm.encode_wav_ima(8000, _PCM23, samples_per_block=9)
    i = data.find(b"fmt ")
    # wSamplesPerBlock is the last H of the 20-byte fmt payload
    off = i + 8 + 18
    patched = data[:off] + struct.pack("<H", spb_foreign) + data[off + 2:]
    if spb_foreign == 9:
        fr, got = adpcm.decode_wav_ima(patched)
        assert got == _DEC23
    else:
        with pytest.raises(ValueError, match="samples-per-block"):
            adpcm.decode_wav_ima(patched)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(st.integers(min_value=-32768, max_value=32767),
                  min_size=1, max_size=260),
    spb=st.sampled_from([3, 5, 9, 17, 41, 505]),
)
def test_multiblock_roundtrip_equals_flat_replay(data, spb):
    """encode_wav_ima -> decode_wav_ima equals a direct step-by-step
    replay of the encoder's own closed-loop reconstruction for every
    block size — pins the container (block split, header re-anchor,
    index carry, pad nibbles, fact trim) independently of audioop."""
    wav = adpcm.encode_wav_ima(8000, data, samples_per_block=spb)
    _, got = adpcm.decode_wav_ima(wav)
    pred, idx = 0, 0
    want = []
    for k, s in enumerate(data):
        if k % spb == 0:
            pred = s  # block header re-anchors the predictor
            want.append(pred)
        else:
            _, pred, idx = adpcm.encode_step(s, pred, idx)
            want.append(pred)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=0, max_value=88),
            st.binary(min_size=7, max_size=7),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_frame_wav_ima_multi_roundtrip(blocks):
    """Multi-block framing: decode replays each block's state machine
    independently from its own header — nothing carries across
    frame-style blocks — and the fact count covers all blocks."""
    f = adpcm.frame_wav_ima_multi(8000, blocks)
    rate, got = adpcm.decode_wav_ima(f)
    assert rate == 8000
    want = []
    for pred0, idx0, payload in blocks:
        pred, idx = pred0, idx0
        want.append(pred)
        for b in payload:
            for nib in (b & 0x0F, b >> 4):
                pred, idx = adpcm.decode_nibble(nib, pred, idx)
                want.append(pred)
    assert got == want


def test_frame_wav_ima_multi_rejects_bad_blocks():
    with pytest.raises(ValueError, match="no blocks"):
        adpcm.frame_wav_ima_multi(8000, [])
    with pytest.raises(ValueError, match="empty nibble"):
        adpcm.frame_wav_ima_multi(8000, [(0, 0, b"")])
    with pytest.raises(ValueError, match="share one size"):
        adpcm.frame_wav_ima_multi(8000, [(0, 0, b"ab"), (0, 0, b"a")])
    with pytest.raises(ValueError, match="step index"):
        adpcm.frame_wav_ima_multi(8000, [(0, 89, b"a")])
    with pytest.raises(ValueError, match="int16"):
        adpcm.frame_wav_ima_multi(8000, [(40000, 0, b"a")])
