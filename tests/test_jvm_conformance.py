"""Third-party conformance: decode OUR codec output with the JDK's
independent decoders (javax.imageio, javax.sound.sampled) through
the Spark JVM already in the container.

Round-trip tests prove encoder and decoder agree with EACH OTHER; a
shared wire-format bug passes them. These tests prove the files are
genuinely standard: a completely foreign implementation reproduces
the exact pixels/samples/codes. Notable gotchas baked in:

- ``BufferedImage.getRGB`` converts gray through sRGB (gray 128 →
  ~186), so pixel comparisons go through the RAW raster data buffer
  (one bulk byte[] transfer, no per-pixel Py4J round trips);
- PNG truecolor decodes to TYPE_3BYTE_BGR — the buffer is
  BGR-ordered;
- javax.sound exposes G.711 as ULAW/ALAW encodings with the code
  bytes intact, and its own ULAW/ALAW→PCM converter provides an
  independent check of the companding tables (audioop being the
  other, in test_multimodal).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from map_reduce_server_spark.functions import g711, gif, jpeg, png, wavcodec


def _imageio_raw(spark, payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, raw raster bytes) via javax.imageio."""
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    assert img is not None, "ImageIO could not identify the file"
    return (
        img.getWidth(),
        img.getHeight(),
        bytes(img.getRaster().getDataBuffer().getData()),
    )


@pytest.mark.parametrize(
    "n,w,h,kind",
    [
        (24, 8, 3, "random"),  # the registered query's exact shape
        (600, 600, 1, "runs"),  # KwKwK-heavy low entropy
        (1500, 50, 30, "random"),  # crosses the 9->10 bit width
        (12000, 120, 100, "random"),  # 10->11->12 + dict freeze
    ],
)
def test_gif_decodes_in_imageio(spark, n, w, h, kind):
    """The JDK's GIF decoder must reproduce our pixels exactly —
    including across every LZW width transition and the 4096-entry
    deferred-clear freeze, validating the asymmetric width-growth
    rule against a foreign implementation, not just our own
    decoder."""
    rng = random.Random(n)
    if kind == "random":
        data = bytes(rng.randrange(256) for _ in range(n))
        # genuinely random (a per-element re-seeded RNG once produced
        # a constant run); bound scales with how many distinct values
        # n draws can even produce
        assert len(set(data)) > min(n, 256) * 0.55
    else:
        data = b"".join(
            bytes([rng.randrange(256)]) * rng.randrange(1, 40)
            for _ in range(n)
        )[:n]
    f = gif.encode_gray8(w, h, data)
    jw, jh, raw = _imageio_raw(spark, f)
    # TYPE_BYTE_INDEXED: the data buffer holds palette indices, and
    # our palette is the identity gray ramp -> indices ARE pixels
    assert (jw, jh, raw) == (w, h, data)


def test_png_decodes_in_imageio(spark):
    rgb = bytes(range(36))
    f = png.encode_rgb8(4, 3, rgb)
    jw, jh, raw = _imageio_raw(spark, f)
    bgr = b"".join(
        rgb[i + 2 : i + 3] + rgb[i + 1 : i + 2] + rgb[i : i + 1]
        for i in range(0, len(rgb), 3)
    )
    assert (jw, jh, raw) == (4, 3, bgr)


@pytest.mark.parametrize(
    "encoder", [jpeg.encode_gray8, jpeg.encode_gray8_progressive]
)
def test_jpeg_decodes_in_imageio(spark, encoder):
    """Flat 8x8 blocks are the exactness domain: ANY conformant JPEG
    decoder (here the JDK's, including its progressive scan
    machinery) must reproduce them bit-for-bit."""
    vals = np.frombuffer(bytes(range(12)), np.uint8)
    img = (
        np.repeat(np.repeat(vals.reshape(3, 4) * 20, 8, 0), 8, 1)
        .astype(np.uint8)
        .tobytes()
    )
    f = encoder(32, 24, img)
    assert _imageio_raw(spark, f) == (32, 24, img)


def _jsound(spark, payload: bytes):
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    fmt = ais.getFormat()
    return fmt, bytes(ais.readAllBytes())


def test_wav_decodes_in_javasound(spark):
    samples = [100, -200, 3000, -32768, 32767, 0, 7] * 5
    f = wavcodec.encode_pcm16(samples, 8000)
    fmt, data = _jsound(spark, f)
    assert str(fmt.getEncoding()) == "PCM_SIGNED"
    assert int(fmt.getSampleRate()) == 8000
    assert fmt.getSampleSizeInBits() == 16
    order = ">" if fmt.isBigEndian() else "<"
    assert list(struct.unpack(f"{order}{len(samples)}h", data)) == samples


@pytest.mark.parametrize(
    "enc_fn,dec_fn,enc_name",
    [
        (g711.encode_wav_mulaw, g711.decode_wav_mulaw, "ULAW"),
        (g711.encode_wav_alaw, g711.decode_wav_alaw, "ALAW"),
    ],
)
def test_g711_decodes_in_javasound(spark, enc_fn, dec_fn, enc_name):
    """Two independent checks: the RIFF container parses as the
    right javax.sound encoding with the code bytes intact, and
    Java's OWN companding converter expands to the same int16
    samples our tables produce (third implementation agreement:
    ours == audioop == the JDK)."""
    jvm = spark._jvm
    codes = bytes(range(64))
    f = enc_fn(8000, codes)
    fmt, data = _jsound(spark, f)
    assert str(fmt.getEncoding()) == enc_name
    assert data == codes
    AS = jvm.javax.sound.sampled.AudioSystem
    Enc = jvm.javax.sound.sampled.AudioFormat.Encoding
    ais = AS.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(f))
    )
    pcm = AS.getAudioInputStream(Enc.PCM_SIGNED, ais)
    pfmt = pcm.getFormat()
    raw = bytes(pcm.readAllBytes())
    order = ">" if pfmt.isBigEndian() else "<"
    jsamples = list(struct.unpack(f"{order}{len(raw) // 2}h", raw))
    assert jsamples == list(dec_fn(f)[1])


def test_our_png_decoder_reads_jdk_encoded_png(spark):
    """Reverse direction: a FOREIGN encoder's PNG (the JDK writer,
    which picks its own filter strategy and zlib parameters) must
    decode exactly in our parser — proving the decoder handles
    standard files generally, not just our own encoder's output."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(4, 3, BI.TYPE_INT_RGB)
    rgb = bytes(range(36))
    k = 0
    for y in range(3):
        for x in range(4):
            img.setRGB(
                x, y, (rgb[k] << 16) | (rgb[k + 1] << 8) | rgb[k + 2]
            )
            k += 3
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    assert png.decode_rgb8(bytes(baos.toByteArray())) == (4, 3, rgb)


def test_our_wav_decoder_reads_jdk_encoded_wav(spark):
    """Reverse direction for audio: the JDK's WAVE writer output
    must decode exactly in wavcodec."""
    jvm = spark._jvm
    samples = [100, -200, 3000, -32768, 32767, 0]
    raw = struct.pack("<6h", *samples)
    fmt = jvm.javax.sound.sampled.AudioFormat(8000.0, 16, 1, True, False)
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(raw)), fmt, 6
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.sound.sampled.AudioSystem.write(
        ais, jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE, baos
    )
    assert wavcodec.decode_pcm16(bytes(baos.toByteArray())) == (
        8000,
        samples,
    )


@pytest.mark.parametrize("w,h", [(8, 3), (5, 17)])
def test_our_gif_decoder_reads_jdk_encoded_gif(spark, w, h):
    """Reverse direction for GIF: the JDK writer emits a LOCAL color
    table and INTERLACED rows by default — our decoder must handle
    both (the local table validated as the identity ramp, the
    four-pass interlace row permutation undone) and reproduce the
    exact pixels. 5x17 exercises odd pass boundaries."""
    jvm = spark._jvm
    ramp = bytearray(range(256))
    icm = jvm.java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_BYTE_INDEXED, icm)
    data = bytes((i * 11 + h) % 256 for i in range(w * h))
    raster = img.getRaster()
    k = 0
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, data[k])
            k += 1
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "gif", baos)
    assert gif.decode_gray8(bytes(baos.toByteArray())) == (w, h, data)


@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_decodes_in_imageio(spark, big_endian):
    """The JDK's TIFF decoder must reproduce our multi-strip gray8
    pixels exactly in BOTH byte orders — framing, IFD layout, and
    offset indirection validated against a foreign implementation."""
    from map_reduce_server_spark.functions import tiff

    pix = bytes((i * 37 + (13 if big_endian else 0)) % 256 for i in range(48))
    f = tiff.encode_gray8(8, 6, pix, big_endian=big_endian)
    assert _imageio_raw(spark, f) == (8, 6, pix)


def test_our_tiff_decoder_reads_jdk_encoded_tiff(spark):
    """Reverse direction: a FOREIGN encoder's TIFF (the JDK writer
    picks its own IFD layout, strip shape, and extra tags like
    ResolutionUnit) must decode exactly in our parser — proving the
    decoder handles standard files generally, not just our own
    encoder's output."""
    from map_reduce_server_spark.functions import tiff

    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(8, 6, BI.TYPE_BYTE_GRAY)
    pix = bytes((i * 29 + 7) % 256 for i in range(48))
    # write the raster directly — setRGB would push the values
    # through the sRGB->gray color conversion and change them
    raster = img.getRaster()
    k = 0
    for y in range(6):
        for x in range(8):
            raster.setSample(x, y, 0, pix[k])
            k += 1
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "tiff", baos)
    assert tiff.decode_gray8(bytes(baos.toByteArray())) == (8, 6, pix)


def test_bmp_decodes_in_imageio(spark):
    """The JDK's BMP decoder must reproduce our stride-padded
    bottom-up palettized pixels exactly — a foreign reader catches a
    scrambled row order or palette walk that order-invariant stats
    would mask."""
    from map_reduce_server_spark.functions import bmp

    pix = bytes((i * 31 + 5) % 256 for i in range(48))
    f = bmp.encode_gray8(6, 8, pix)
    assert _imageio_raw(spark, f) == (6, 8, pix)


def test_our_bmp_decoder_reads_jdk_encoded_bmp(spark):
    """Reverse direction: the JDK BMP writer's own layout (its header
    sizes, palette, row padding) must decode exactly in our parser."""
    from map_reduce_server_spark.functions import bmp

    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(6, 8, BI.TYPE_BYTE_GRAY)
    pix = bytes((i * 41 + 3) % 256 for i in range(48))
    raster = img.getRaster()
    k = 0
    for y in range(8):
        for x in range(6):
            raster.setSample(x, y, 0, pix[k])
            k += 1
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "bmp", baos)
    assert bmp.decode_gray8(bytes(baos.toByteArray())) == (6, 8, pix)


def test_aiff_decodes_in_javasound(spark):
    """Our AIFF encoder's output must parse in javax.sound as
    big-endian signed PCM at the exact (extended-float-carried)
    sample rate — a third-party check on the IFF chunk framing and
    the 80-bit rate field. (TGA has no JDK decoder; its conformance
    story is the round-trip + strictness unit tests.)"""
    from map_reduce_server_spark.functions import aiff

    samples = [100, -200, 3000, -32768, 32767, 0, 7] * 5
    f = aiff.encode_pcm16(samples, 44100)
    fmt, data = _jsound(spark, f)
    assert str(fmt.getEncoding()) == "PCM_SIGNED"
    assert int(fmt.getSampleRate()) == 44100
    assert fmt.getSampleSizeInBits() == 16
    assert fmt.isBigEndian()
    assert list(struct.unpack(f">{len(samples)}h", data)) == samples


def test_our_aiff_decoder_reads_jdk_encoded_aiff(spark):
    """Reverse direction: the JDK's AIFF writer output must decode
    exactly in functions/aiff.py (including whatever chunk order and
    padding the JDK emits)."""
    from map_reduce_server_spark.functions import aiff

    jvm = spark._jvm
    samples = [100, -200, 3000, -32768, 32767, 0, 1]
    raw = struct.pack(">7h", *samples)
    fmt = jvm.javax.sound.sampled.AudioFormat(22050.0, 16, 1, True, True)
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(raw)), fmt, 7
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.sound.sampled.AudioSystem.write(
        ais, jvm.javax.sound.sampled.AudioFileFormat.Type.AIFF, baos
    )
    assert aiff.decode_pcm16(bytes(baos.toByteArray())) == (
        22050,
        samples,
    )
