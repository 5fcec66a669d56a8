"""Real-decode tests: generated BMP/PPM/WAV fixtures end-to-end through
the Spark multimodal operators, plus parser unit/rejection coverage."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from parquet_metadata_explorer_spark.operators import codecs, multimodal


# -- fixture builders -------------------------------------------------------


def make_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """24bpp uncompressed BMP from an (h, w, 3) uint8 array (RGB order in
    the array; BMP stores BGR, but we keep bytes as-is — the parser and
    resize treat channels opaquely)."""
    h, w, c = pixels.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    rows = pixels if top_down else pixels[::-1]
    body = b"".join(bytes(r.tobytes()) + b"\x00" * pad for r in rows)
    pixel_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack(
        "<IiiHHIIiiII",
        40,  # BITMAPINFOHEADER
        w,
        -h if top_down else h,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB
        len(body),
        2835,
        2835,
        0,
        0,
    )
    return header + body


def make_ppm(pixels: np.ndarray, comment: bool = False) -> bytes:
    h, w, c = pixels.shape
    assert c == 3
    hdr = b"P6\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + pixels.tobytes()


def make_wav(n_frames: int = 4410, rate: int = 44100, channels: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)  # 16-bit PCM
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(
                struct.pack("<h", (i * 7) % 32768 - 16384) * channels
                for i in range(n_frames)
            )
        )
    return buf.getvalue()


# -- parser unit tests ------------------------------------------------------


def test_parse_bmp_bottom_up_and_top_down():
    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for td in (False, True):
        m = codecs.parse_bmp(make_bmp(px, top_down=td))
        assert m is not None and m["codec"] == "bmp"
        assert (m["width"], m["height"], m["channels"]) == (3, 2, 3)
        assert m["top_down"] is td
        assert m["row_bytes"] == 12  # 3*3=9 padded to 12


def test_parse_ppm_with_comment_and_pgm():
    px = np.full((4, 5, 3), 9, dtype=np.uint8)
    m = codecs.parse_ppm(make_ppm(px, comment=True))
    assert m is not None
    assert (m["codec"], m["width"], m["height"], m["channels"]) == ("ppm", 5, 4, 3)
    gray = b"P5\n4 2\n255\n" + bytes(8)
    g = codecs.parse_ppm(gray)
    assert (g["codec"], g["width"], g["height"], g["channels"]) == ("pgm", 4, 2, 1)


def test_parse_wav_fields_match_stdlib_writer():
    b = make_wav(n_frames=2205, rate=22050, channels=1)
    m = codecs.parse_wav(b)
    assert m is not None
    assert m["channels"] == 1
    assert m["sample_rate"] == 22050
    assert m["bits_per_sample"] == 16
    assert m["n_samples"] == 2205
    assert m["duration_ms"] == 100  # 2205/22050 s


def test_strict_parsers_reject_near_misses():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    bmp = bytearray(make_bmp(px))
    # truncated pixel data
    assert codecs.parse_bmp(bytes(bmp[:-4])) is None
    # unsupported compression field
    bad = bytearray(bmp)
    bad[30] = 1  # BI_RLE8
    assert codecs.parse_bmp(bytes(bad)) is None
    # text that merely starts with a magic
    assert codecs.sniff_media(b"BMW cars are common on highways") is None
    assert codecs.sniff_media(b"P6 is a chess engine rating") is None
    assert codecs.sniff_media(b"RIFF through the pages") is None
    # PPM declaring more pixels than present
    assert codecs.parse_ppm(b"P6\n100 100\n255\n" + bytes(10)) is None
    # WAV without a data chunk
    assert codecs.parse_wav(make_wav()[:40]) is None


# -- end-to-end through Spark ----------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    rows = [
        (1, bytearray(make_bmp(img))),
        (2, bytearray(make_ppm(img, comment=True))),
        (3, bytearray(make_wav(n_frames=4410, rate=44100, channels=2))),
        (4, bytearray(b"just some opaque text bytes, not media")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_payloads_real_media(spark, media_df):
    out = {r.doc_id: r for r in multimodal.decode_payloads(media_df).collect()}
    bmp, ppm, wav, raw = out[1], out[2], out[3], out[4]
    assert (bmp.codec, bmp.width, bmp.height, bmp.channels) == ("bmp", 6, 4, 3)
    assert bmp.sample_rate is None and bmp.duration_ms is None
    assert (ppm.codec, ppm.width, ppm.height, ppm.channels) == ("ppm", 6, 4, 3)
    assert (wav.codec, wav.channels, wav.sample_rate) == ("wav", 2, 44100)
    assert wav.n_samples == 4410 and wav.duration_ms == 100
    assert wav.width is None and wav.height is None
    assert raw.codec == "raw"
    assert raw.width == raw.n_bytes % 64 + 1  # deterministic fallback
    for r in out.values():  # checksum formula uniform across codecs
        assert r.checksum == (r.n_bytes * 2654435761) % (2**31)


def test_resize_binary_real_pixels(spark, media_df):
    """Nearest-neighbor thumbnail of the BMP/PPM fixtures must equal the
    numpy resample of the ORIGINAL pixel array — proving padding strip,
    bottom-up correction, and channel preservation on real bytes."""
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out_w, out_h = 3, 2
    yi = np.minimum((np.arange(out_h) * 4) // out_h, 3)
    xi = np.minimum((np.arange(out_w) * 6) // out_w, 5)
    expected = img[np.ix_(yi, xi)].tobytes()
    rows = {
        r.doc_id: r
        for r in multimodal.resize_binary(media_df, out_w, out_h).collect()
    }
    assert bytes(rows[1].resized) == expected  # BMP (bottom-up corrected)
    assert bytes(rows[2].resized) == expected  # PPM
    assert len(bytes(rows[1].resized)) == out_w * out_h * 3
    # WAV + raw fall back to the byte-grid resample and still emit
    assert len(bytes(rows[3].resized)) > 0
    assert len(bytes(rows[4].resized)) > 0


def test_top_down_bmp_resize_matches_bottom_up(spark):
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    df = spark.createDataFrame(
        [(1, bytearray(make_bmp(img))), (2, bytearray(make_bmp(img, top_down=True)))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: bytes(r.resized) for r in multimodal.resize_binary(df, 2, 2).collect()}
    assert rows[1] == rows[2] == img.tobytes()


# -- adversarial totality: the sniffers run on untrusted bytes ------------


def test_sniffers_are_total_over_arbitrary_bytes():
    """sniff_media must never raise — it either parses a valid container
    or returns None. Exercised with hypothesis over arbitrary byte
    strings plus mutation fuzz of valid fixtures (bit flips in headers
    must yield either None or a structurally-consistent parse, never an
    exception)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz(b):
        r = codecs.sniff_media(b)
        assert r is None or isinstance(r, dict)

    fuzz()


def test_sniffers_survive_header_mutations():
    import random

    rng = random.Random(7)
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    fixtures = [make_bmp(px), make_ppm(px), make_wav(n_frames=64, rate=8000)]
    for base in fixtures:
        for _ in range(200):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(min(64, len(b)))] = rng.randrange(256)
            r = codecs.sniff_media(bytes(b))  # must not raise
            assert r is None or isinstance(r, dict)
        # truncations at every cut point of the header region
        for cut in range(0, min(80, len(base))):
            r = codecs.sniff_media(bytes(base[:cut]))
            assert r is None or isinstance(r, dict)


def test_image_dhash_neardup_pairs(spark):
    """Perceptual dedup on REAL decoded pixels: a lightly-perturbed copy
    of an image must pair with its original at small Hamming distance;
    structurally different images must not pair."""
    from parquet_metadata_explorer_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    # near-dup: a few isolated pixels nudged — gradient signs survive
    near = base.copy()
    near[2, 3] ^= 1
    near[20, 40] ^= 1
    # distinct images: independent noise + an inverted copy
    other = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    inverted = 255 - base

    rows = [
        (1, bytearray(make_bmp(base))),
        (2, bytearray(make_bmp(near))),
        (3, bytearray(make_bmp(other))),
        (4, bytearray(make_bmp(inverted))),
    ]
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashes = {r.doc_id: r.dhash for r in image_dhash(payloads).collect()}
    assert all(
        r.codec == "bmp" for r in image_dhash(payloads).collect()
    )  # real decode path
    assert bin((hashes[1] ^ hashes[2]) & (2**64 - 1)).count("1") <= 4
    assert bin((hashes[1] ^ hashes[4]) & (2**64 - 1)).count("1") > 40  # inversion flips gradients

    pairs = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in image_neardup_pairs(payloads).collect()
    ]
    assert [(a, b) for a, b, _ in pairs] == [(1, 2)], pairs


def test_neardup_pigeonhole_exact_at_threshold(spark):
    """The adversarial Hamming-4 pair — one flipped bit per 16-bit band
    — is exactly the case 4-band blocking misses: no band matches, so
    the pair silently vanishes even though it is within the threshold.
    The r9 contract makes that impossible: n_bands must exceed
    max_hamming (ValueError otherwise), and with the default 5 bands
    the pair is found because 4 flips cannot touch all 5 bands."""
    import pytest

    from parquet_metadata_explorer_spark.operators.multimodal import (
        band_layout,
        hash_neardup_pairs,
    )

    h1 = 0
    h2 = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    hashed = spark.createDataFrame(
        [(1, h1), (2, h2)], "doc_id long, fingerprint long"
    )

    found = hash_neardup_pairs(hashed, "fingerprint", max_hamming=4).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in found] == [(1, 2, 4)]

    with pytest.raises(ValueError, match="n_bands"):
        hash_neardup_pairs(hashed, "fingerprint", max_hamming=4, n_bands=4)

    # the uneven layout covers all 64 bits disjointly
    layout = band_layout(5)
    assert sum(w for _, w in layout) == 64
    assert [off for off, _ in layout] == [0, 13, 26, 39, 52]


def _wav_from_samples(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_fingerprint_neardup(spark):
    """The envelope fingerprint must survive volume scaling and light
    noise (the gradient signs compare windows against each other), and
    must separate structurally different signals."""
    from parquet_metadata_explorer_spark.operators.multimodal import (
        audio_fingerprint,
        hash_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    n = 8000
    t = np.arange(n)
    base = (
        6000 * np.sin(2 * np.pi * t / 200) * (0.2 + 0.8 * (t / n))
    ).astype(np.int64)
    quieter = base // 2  # volume halved
    noisy = base + rng.integers(-80, 80, size=n)
    # different carrier AND reversed envelope: the window means sample a
    # different phase pattern, so gradient signs decorrelate
    other = (
        6000 * np.sin(2 * np.pi * t / 137) * (1.0 - 0.8 * (t / n))
    ).astype(np.int64)

    rows = [
        (1, bytearray(_wav_from_samples(base))),
        (2, bytearray(_wav_from_samples(quieter))),
        (3, bytearray(_wav_from_samples(noisy))),
        (4, bytearray(_wav_from_samples(other))),
    ]
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = audio_fingerprint(payloads)
    rowsc = out.collect()
    assert all(r.codec == "wav" for r in rowsc)
    fp = {r.doc_id: r.fingerprint for r in rowsc}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(fp[1], fp[2]) <= 4, ham(fp[1], fp[2])
    assert ham(fp[1], fp[3]) <= 6, ham(fp[1], fp[3])
    assert ham(fp[1], fp[4]) > 12, ham(fp[1], fp[4])

    pairs = {
        (r.doc_a, r.doc_b)
        for r in hash_neardup_pairs(
            out, "fingerprint", max_hamming=6, n_bands=7
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


# -- PNG / JPEG (round 6) ---------------------------------------------------


def _paeth(a, b, c):
    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def make_png(pixels: np.ndarray, filters=None) -> bytes:
    """Real PNG encoder for the test: per-row FORWARD filtering (so the
    parser must invert it) + zlib, color type from channel count."""
    import zlib

    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    stride = w * c
    flat = pixels.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        f = filters[y]
        enc = bytearray([f])
        for i in range(stride):
            a = int(row[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            raw = int(row[i])
            if f == 0:
                v = raw
            elif f == 1:
                v = raw - a
            elif f == 2:
                v = raw - b
            elif f == 3:
                v = raw - ((a + b) >> 1)
            else:
                v = raw - _paeth(a, b, cc)
            enc.append(v & 0xFF)
        out += enc
        prev = row

    def chunk(tag, body):
        import zlib as z

        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", z.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int, ncomp: int = 3, progressive: bool = False) -> bytes:
    """Minimal structurally-valid JPEG prefix: SOI, APP0, DQT, SOF."""
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + bytes(6)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    sof = sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comp
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def test_parse_png_all_filter_types():
    """Every PNG row filter must unfilter back to the original pixels."""
    rng = np.random.RandomState(3)
    for c in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(5, 4, c)).astype(np.uint8)
        m = codecs.parse_png(make_png(px, filters=[0, 1, 2, 3, 4]))
        assert m is not None and m["codec"] == "png"
        assert (m["width"], m["height"], m["channels"]) == (4, 5, c)
        got = np.frombuffer(m["pixels"], dtype=np.uint8).reshape(5, 4, c)
        assert (got == px).all(), f"channels={c}"


def test_parse_jpeg_dimensions():
    for prog in (False, True):
        m = codecs.parse_jpeg(make_jpeg(640, 480, 3, progressive=prog))
        assert m == {
            "codec": "jpeg",
            "width": 640,
            "height": 480,
            "channels": 3,
            "bit_depth": 8,
        }
    m = codecs.parse_jpeg(make_jpeg(12, 7, 1))
    assert (m["width"], m["height"], m["channels"]) == (12, 7, 1)


def test_png_jpeg_reject_near_misses():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = make_png(px)
    # signature-only text must not sniff
    assert codecs.sniff_media(b"\x89PNG but actually prose") is None
    assert codecs.sniff_media(b"\xff\xd8 then garbage without markers") is None
    # truncated IDAT: either header-only (no pixels) or rejected
    m = codecs.parse_png(good[:-20])
    assert m is None or "pixels" not in m
    # corrupt zlib stream -> header-only parse, dims still usable
    bad = bytearray(good)
    bad[50] ^= 0xFF
    m = codecs.parse_png(bytes(bad))
    assert m is None or (m["width"], m["height"]) == (2, 2)
    # JPEG with SOS before SOF carries no dimensions
    assert codecs.parse_jpeg(b"\xff\xd8\xff\xda\x00\x04\x00\x00") is None


def test_png_jpeg_sniffers_total():
    """Truncation at every cut + random header mutations never raise."""
    import random

    rng = random.Random(11)
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    for base in (make_png(px, filters=[4, 3, 1]), make_jpeg(33, 21, 3)):
        for cut in range(len(base)):
            r = codecs.sniff_media(bytes(base[:cut]))
            assert r is None or isinstance(r, dict)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            r = codecs.sniff_media(bytes(b))
            assert r is None or isinstance(r, dict)


def test_decode_and_resize_png_jpeg(spark):
    """End-to-end: PNG resize resamples REAL decoded pixels; JPEG decodes
    header dimensions but (no entropy decode) resizes via the raw path."""
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    df = spark.createDataFrame(
        [
            (1, bytearray(make_png(img, filters=[1, 2, 3, 4]))),
            (2, bytearray(make_jpeg(640, 480, 3))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in multimodal.decode_payloads(df).collect()}
    assert (out[1].codec, out[1].width, out[1].height, out[1].channels) == (
        "png", 6, 4, 3,
    )
    assert (out[2].codec, out[2].width, out[2].height, out[2].channels) == (
        "jpeg", 640, 480, 3,
    )
    out_w, out_h = 3, 2
    yi = np.minimum((np.arange(out_h) * 4) // out_h, 3)
    xi = np.minimum((np.arange(out_w) * 6) // out_w, 5)
    rows = {r.doc_id: bytes(r.resized) for r in multimodal.resize_binary(df, out_w, out_h).collect()}
    assert rows[1] == img[np.ix_(yi, xi)].tobytes()
    assert len(rows[2]) > 0  # raw-path fallback still total


def test_png_dhash_matches_bmp_dhash(spark):
    """The SAME pixel grid through PNG and BMP containers must produce
    the SAME perceptual dHash — the hash is a pixel property, not a
    container property."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(make_png(img, filters=[2] * 16))), (2, bytearray(make_bmp(img)))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.dhash, r.codec) for r in multimodal.image_dhash(df).collect()}
    assert rows[1][1] == "png" and rows[2][1] == "bmp"
    assert rows[1][0] == rows[2][0]


# -- AVI (round 6) ----------------------------------------------------------


def make_avi(frames: list, w: int = 4, h: int = 3, usec_per_frame: int = 40000) -> bytes:
    """Minimal RIFF-AVI with an uncompressed DIB video stream: hdrl
    (avih + strl{strh,strf}) + movi with one 00db chunk per frame."""
    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form, body):
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<10I", usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h
    ) + bytes(16)
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0,
                                        len(frames), 0, 0, 0) + bytes(8)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_avi_real_frame_boundaries():
    frames = [bytes([i]) * 36 for i in range(5)]  # 4x3x3 DIB rows
    b = make_avi(frames, w=4, h=3)
    m = codecs.parse_avi(b)
    assert m is not None and m["codec"] == "avi"
    assert (m["width"], m["height"], m["n_frames"]) == (4, 3, 5)
    assert m["compression"] == 0 and m["channels"] == 3
    assert m["duration_ms"] == 5 * 40  # 40 ms per frame
    got = [b[o : o + s] for o, s in m["frames"]]
    assert got == frames
    # WAV still routes correctly through the shared RIFF magic
    assert codecs.sniff_media(make_wav(n_frames=16, rate=8000))["codec"] == "wav"
    assert codecs.sniff_media(b)["codec"] == "avi"


def test_avi_truncation_and_mutation_total():
    frames = [bytes([i]) * 36 for i in range(3)]
    base = make_avi(frames)
    for cut in range(len(base)):
        r = codecs.sniff_media(bytes(base[:cut]))
        assert r is None or isinstance(r, dict)
    import random

    rng = random.Random(13)
    for _ in range(300):
        bb = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        r = codecs.sniff_media(bytes(bb))
        assert r is None or isinstance(r, dict)


def test_sample_frames_container_aware(spark):
    """An AVI payload must yield its REAL movi frames (every_n applied
    on frame indices); non-container bytes keep the fixed-stride
    split."""
    frames = [bytes([40 + i]) * 36 for i in range(6)]
    avi = make_avi(frames)
    raw = bytes(range(100))
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(raw))],
        "doc_id long, payload binary",
    )
    out = multimodal.sample_frames(df, frame_size=16, every_n=2).collect()
    got1 = {r.frame_id: bytes(r.frame) for r in out if r.doc_id == 1}
    assert got1 == {0: frames[0], 2: frames[2], 4: frames[4]}
    got2 = {r.frame_id: bytes(r.frame) for r in out if r.doc_id == 2}
    assert got2[0] == raw[:16] and 1 not in got2  # stride fallback
    # decode_features reports the container's real geometry
    dec = {r.doc_id: r for r in multimodal.decode_payloads(df).collect()}
    assert (dec[1].codec, dec[1].width, dec[1].height, dec[1].n_samples) == (
        "avi", 4, 3, 6,
    )


# -- PNG palette / AVI stream-awareness (round 7) ----------------------------


def make_png_palette(pixels: np.ndarray, filters=None) -> bytes:
    """Palette (color type 3) PNG encoder: unique RGB colors -> PLTE,
    one index byte per pixel through the same forward row filtering the
    truecolor builder uses."""
    import zlib

    h, w, c = pixels.shape
    assert c == 3
    flat = pixels.reshape(-1, 3)
    colors = sorted({tuple(int(v) for v in p) for p in flat})
    assert len(colors) <= 256
    lut = {col: i for i, col in enumerate(colors)}
    idx = np.array([lut[tuple(int(v) for v in p)] for p in flat],
                   dtype=np.uint8).reshape(h, w)
    filters = filters or [0] * h
    out = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y in range(h):
        row = idx[y].astype(np.int16)
        f = filters[y]
        enc = bytearray([f])
        for i in range(w):
            a = int(row[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            cc = int(prev[i - 1]) if i >= 1 else 0
            raw = int(row[i])
            if f == 0:
                v = raw
            elif f == 1:
                v = raw - a
            elif f == 2:
                v = raw - b
            elif f == 3:
                v = raw - ((a + b) >> 1)
            else:
                v = raw - _paeth(a, b, cc)
            enc.append(v & 0xFF)
        out += enc
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    plte = b"".join(bytes(col) for col in colors)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_parse_png_palette_decodes_to_rgb():
    """A PLTE-indexed PNG must decode to the SAME RGB pixel grid as the
    truecolor encoding of the same image, through every filter type."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (7, 5, 3)).astype(np.uint8)
    pal = codecs.parse_png(make_png_palette(img, filters=[0, 1, 2, 3, 4, 1, 2]))
    rgb = codecs.parse_png(make_png(img, filters=[4, 3, 2, 1, 0, 2, 4]))
    assert pal is not None and "pixels" in pal and pal["channels"] == 3
    assert pal["row_bytes"] == 5 * 3
    assert pal["pixels"] == rgb["pixels"]
    # palette without PLTE-decodable depth stays header-only but valid
    assert pal["codec"] == "png" and (pal["width"], pal["height"]) == (5, 7)


def test_png_palette_header_only_reports_logical_channels():
    """A palette PNG whose IDAT is corrupt demotes to header-only — and
    must still report channels=3 (the logical color count), identical to
    the decoded path, so the same file never flips between 1 and 3
    channels based on decodability (r7 advice)."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 255, (4, 6, 3)).astype(np.uint8)
    good = make_png_palette(img)
    decoded = codecs.parse_png(good)
    assert decoded["channels"] == 3 and "pixels" in decoded
    # corrupt the zlib stream inside IDAT, keeping the chunk walk valid
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    for i in range(idat_at + 4, idat_at + 12):
        bad[i] ^= 0xFF
    hdr = codecs.parse_png(bytes(bad))
    assert hdr is not None and "pixels" not in hdr
    assert hdr["channels"] == 3
    assert (hdr["width"], hdr["height"]) == (6, 4)


def test_png_palette_dhash_equals_rgb(spark):
    """Same image through palette-PNG, truecolor-PNG and BMP containers
    must produce the SAME perceptual dhash."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (12, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(make_png_palette(img))),
            (2, bytearray(make_png(img))),
            (3, bytearray(make_bmp(img))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.dhash, r.codec) for r in
            multimodal.image_dhash(df).collect()}
    assert rows[1][1] == "png" and rows[2][1] == "png" and rows[3][1] == "bmp"
    assert rows[1][0] == rows[2][0] == rows[3][0]


def test_png_palette_fuzz_total():
    rng_img = np.random.RandomState(3)
    base = make_png_palette(rng_img.randint(0, 255, (5, 4, 3)).astype(np.uint8))
    for cut in range(len(base)):
        r = codecs.sniff_media(bytes(base[:cut]))
        assert r is None or isinstance(r, dict)
    import random

    rng = random.Random(17)
    for _ in range(300):
        bb = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        r = codecs.sniff_media(bytes(bb))
        assert r is None or isinstance(r, dict)


def make_avi_multi(w=4, h=3, usec_per_frame=40000, audio_first=True,
                   rec_wrap=False, video_frames=None, audio_chunks=None):
    """AVI with an audio stream AND a video stream, optionally with the
    movi frames wrapped in 'rec ' grouping LISTs (the interleave unit)."""
    video_frames = video_frames or [bytes([i]) * 36 for i in range(4)]
    audio_chunks = audio_chunks or [b"\xaa" * 32, b"\xbb" * 32]

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form, body):
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<10I", usec_per_frame, 0, 0, 0, len(video_frames), 0, 2, 0, w, h
    ) + bytes(16)
    strh_a = (
        b"auds" + b"\x01\x00\x00\x00" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 16000, 0, 0, 0) + bytes(8)
    )
    # a 40-byte WAVEFORMATEXTENSIBLE-ish strf: at DIB offsets 14/16 this
    # carries garbage that a fccType-blind parser would read as bpp=0xDEAD
    # and compression=0xFEEDBEEF
    strf_a = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + \
        b"\xad\xde" + b"\xef\xbe\xed\xfe" + bytes(40 - 22)
    strh_v = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, len(video_frames), 0, 0, 0
        ) + bytes(8)
    )
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    strl_a = lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
    strl_v = lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
    order = (strl_a + strl_v) if audio_first else (strl_v + strl_a)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + order)
    vid_id = b"01" if audio_first else b"00"
    aud_id = b"00" if audio_first else b"01"
    pieces = []
    for i, f in enumerate(video_frames):
        group = chunk(vid_id + b"db", f)
        if i < len(audio_chunks):
            group += chunk(aud_id + b"wb", audio_chunks[i])
        pieces.append(lst(b"rec ", group) if rec_wrap else group)
    movi = lst(b"movi", b"".join(pieces))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("audio_first", [True, False])
@pytest.mark.parametrize("rec_wrap", [True, False])
def test_avi_audio_stream_and_rec_lists(audio_first, rec_wrap):
    """The strf must be read from the 'vids' strl only (an audio-first
    AVI's WAVEFORMAT strf is NOT a DIB header), frames must be filtered
    to the video stream's number, and 'rec '-wrapped frames must still
    be found."""
    frames = [bytes([50 + i]) * 36 for i in range(4)]
    b = make_avi_multi(audio_first=audio_first, rec_wrap=rec_wrap,
                       video_frames=frames)
    m = codecs.parse_avi(b)
    assert m is not None, (audio_first, rec_wrap)
    assert (m["width"], m["height"]) == (4, 3)
    assert m["compression"] == 0 and m["bits_per_pixel"] == 24
    assert m["channels"] == 3
    assert m["n_frames"] == 4
    got = [b[o : o + s] for o, s in m["frames"]]
    assert got == frames  # audio '..wb' chunks never enter the timeline
    assert m["duration_ms"] == 4 * 40


def test_avi_multi_fuzz_total():
    base = make_avi_multi(rec_wrap=True)
    for cut in range(len(base)):
        r = codecs.sniff_media(bytes(base[:cut]))
        assert r is None or isinstance(r, dict)
    import random

    rng = random.Random(23)
    for _ in range(300):
        bb = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        r = codecs.sniff_media(bytes(bb))
        assert r is None or isinstance(r, dict)


# -- PNG 16-bit / Adam7 interlaced (round 7) ---------------------------------


def _fwd_filter(rows, bpp, filters):
    """Forward-filter a list of equal-length byte rows (one PNG pass)."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for y, row in enumerate(rows):
        f = filters[y % len(filters)]
        enc = bytearray([f])
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = (
                0 if f == 0 else a if f == 1 else b if f == 2
                else ((a + b) >> 1) if f == 3 else _paeth(a, b, c)
            )
            enc.append((row[i] - pred) & 0xFF)
        out += enc
        prev = bytes(row)
    return out


def _png_chunks(ihdr_body, idat_raw, extra=()):
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    for tag, body in extra:
        out += chunk(tag, body)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def make_png16(pixels: np.ndarray, filters=(0, 1, 2, 3, 4)) -> bytes:
    """16-bit PNG whose samples are v*257 (big-endian bytes (v, v)) —
    the high byte round-trips the 8-bit grid exactly."""
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    rows = []
    for y in range(h):
        row = bytearray()
        for v in pixels[y].reshape(-1):
            row += bytes([int(v), int(v)])
        rows.append(bytes(row))
    raw = _fwd_filter(rows, c * 2, list(filters))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
    return _png_chunks(ihdr, raw)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def make_png_interlaced(pixels: np.ndarray, depth: int = 8) -> bytes:
    """Adam7-interlaced PNG (8- or 16-bit), each pass independently
    forward-filtered with a mix of filter types."""
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bps = depth // 8
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rows = []
        for j in range(ph):
            row = bytearray()
            for i in range(pw):
                for v in pixels[y0 + j * dy, x0 + i * dx]:
                    row += bytes([int(v)] * bps)
            rows.append(bytes(row))
        raw += _fwd_filter(rows, c * bps, [0, 2, 1, 4, 3])
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
    return _png_chunks(ihdr, bytes(raw))


def test_png16_decodes_high_byte_grid():
    rng = np.random.RandomState(19)
    for c in (1, 3, 4):
        img = rng.randint(0, 255, (6, 5, c)).astype(np.uint8)
        m16 = codecs.parse_png(make_png16(img))
        m8 = codecs.parse_png(make_png(img, filters=[3, 4, 0, 1, 2, 4]))
        assert m16 is not None and m16["bit_depth"] == 16
        assert m16["row_bytes"] == 5 * c
        assert m16["pixels"] == m8["pixels"], c


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("depth", [8, 16])
def test_png_interlaced_equals_sequential(c, depth):
    rng = np.random.RandomState(29 + c + depth)
    img = rng.randint(0, 255, (11, 9, c)).astype(np.uint8)
    inter = codecs.parse_png(make_png_interlaced(img, depth=depth))
    seq = codecs.parse_png(make_png(img, filters=[4, 2, 3, 1, 0] * 3)[: 10**9])
    assert inter is not None and "pixels" in inter, (c, depth)
    assert inter["pixels"] == seq["pixels"], (c, depth)
    # tiny image exercising passes that are empty
    tiny = rng.randint(0, 255, (2, 2, c)).astype(np.uint8)
    t = codecs.parse_png(make_png_interlaced(tiny, depth=depth))
    ts = codecs.parse_png(make_png(tiny))
    assert t["pixels"] == ts["pixels"]


def test_png16_interlaced_fuzz_total():
    rng_img = np.random.RandomState(31)
    img = rng_img.randint(0, 255, (7, 6, 3)).astype(np.uint8)
    for base in (make_png16(img), make_png_interlaced(img, depth=16)):
        for cut in range(0, len(base), 3):
            r = codecs.sniff_media(bytes(base[:cut]))
            assert r is None or isinstance(r, dict)
        import random

        rng = random.Random(37)
        for _ in range(200):
            bb = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            r = codecs.sniff_media(bytes(bb))
            assert r is None or isinstance(r, dict)


# -- PNG sub-byte depths (round 7) -------------------------------------------


def _pack_bits(samples, depth):
    per = 8 // depth
    row = bytearray((len(samples) * depth + 7) // 8)
    for i, v in enumerate(samples):
        row[i // per] |= int(v) << (8 - depth * (i % per + 1))
    return bytes(row)


def make_png_subbyte(samples2d, depth, ctype, palette=None, interlace=False):
    """1/2/4-bit PNG from a 2-D sample grid (gray levels or palette
    indices), bit-packed rows, per-row/pass forward filtering."""
    h = len(samples2d)
    w = len(samples2d[0])

    def pack_pass(rows):
        packed = [_pack_bits(r, depth) for r in rows]
        return _fwd_filter(packed, 1, [0, 2, 1, 2, 0])

    if not interlace:
        raw = pack_pass(samples2d)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows = [
                [samples2d[y0 + j * dy][x0 + i * dx] for i in range(pw)]
                for j in range(ph)
            ]
            raw += pack_pass(rows)
        raw = bytes(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    extra = [(b"PLTE", palette)] if palette is not None else []
    return _png_chunks(ihdr, bytes(raw), extra=extra)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_subbyte_gray(depth, interlace):
    """Sub-byte gray must decode to the same 8-bit grid as the 8-bit
    encoding of the scaled values."""
    rng = np.random.RandomState(41 + depth)
    full = (1 << depth) - 1
    levels = rng.randint(0, full + 1, (9, 11))
    m = codecs.parse_png(
        make_png_subbyte(levels.tolist(), depth, 0, interlace=interlace)
    )
    assert m is not None and "pixels" in m, (depth, interlace)
    assert m["channels"] == 1 and m["row_bytes"] == 11
    expected = (levels * 255 // full).astype(np.uint8)
    ref = codecs.parse_png(make_png(expected[..., None], filters=[0] * 9))
    assert m["pixels"] == ref["pixels"], (depth, interlace)


@pytest.mark.parametrize("interlace", [False, True])
def test_png_subbyte_palette(interlace):
    """4-bit palette must decode to the same RGB grid as truecolor."""
    rng = np.random.RandomState(47)
    colors = rng.randint(0, 255, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (7, 10))
    img = colors[idx]
    plte = b"".join(bytes(c) for c in colors)
    m = codecs.parse_png(
        make_png_subbyte(idx.tolist(), 4, 3, palette=plte,
                         interlace=interlace)
    )
    ref = codecs.parse_png(make_png(img, filters=[1, 2, 3, 4, 0, 2, 1]))
    assert m is not None and "pixels" in m, interlace
    assert m["channels"] == 3 and m["row_bytes"] == 30
    assert m["pixels"] == ref["pixels"], interlace


def test_png_subbyte_fuzz_total():
    rng_img = np.random.RandomState(53)
    idx = rng_img.randint(0, 2, (6, 9))
    base = make_png_subbyte(idx.tolist(), 1, 0, interlace=True)
    for cut in range(len(base)):
        r = codecs.sniff_media(bytes(base[:cut]))
        assert r is None or isinstance(r, dict)
    import random

    rng = random.Random(59)
    for _ in range(300):
        bb = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        r = codecs.sniff_media(bytes(bb))
        assert r is None or isinstance(r, dict)


# -- JPEG baseline encode/decode (round 8) -----------------------------------


def _jpeg_fdct_block(block):
    """Forward DCT via the decoder's orthonormal basis: F = T^T P T."""
    T = codecs._JPEG_T
    g = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for x in range(8):
            g[v][x] = sum(T[y][v] * (block[y][x] - 128) for y in range(8))
    out = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for u in range(8):
            out[v][u] = sum(g[v][x] * T[x][u] for x in range(8))
    return out


class _JpegWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.bits(1, 1)  # pad with 1s


def _enc_tables(symbols):
    """One fixed-length canonical Huffman table covering ``symbols``:
    counts/symbols for DHT plus symbol -> (code, length) for writing."""
    syms = sorted(set(symbols))
    length = 1
    while (1 << length) - 1 < len(syms):
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(syms)
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return counts, syms, enc


def _mag_bits(v):
    """JPEG magnitude coding: (size, appended bits)."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def make_jpeg_full(pixels: np.ndarray, subsample=(1, 1), restart=0) -> bytes:
    """Baseline-sequential JPEG encoder (test twin of parse_jpeg's
    decoder): all-ones quantization (near-lossless), one shared DC and
    one shared AC Huffman table built from the actual symbols, optional
    2x2 chroma subsampling and restart intervals."""
    h, w = pixels.shape[:2]
    gray = pixels.ndim == 2
    sh, sv = subsample
    if gray:
        planes = [(1, 1, 1, pixels.astype(float))]
    else:
        p = pixels.astype(float)
        Y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        Cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128
        Cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128
        if (sh, sv) != (1, 1):
            ch, cw = (h + sv - 1) // sv, (w + sh - 1) // sh
            def down(c):
                o = np.zeros((ch, cw))
                for y in range(ch):
                    for x in range(cw):
                        o[y, x] = c[y * sv : y * sv + sv, x * sh : x * sh + sh].mean()
                return o
            planes = [(1, sh, sv, Y), (2, 1, 1, down(Cb)), (3, 1, 1, down(Cr))]
        else:
            planes = [(1, 1, 1, Y), (2, 1, 1, Cb), (3, 1, 1, Cr)]
    maxh = max(ph for _c, ph, _v, _p in planes)
    maxv = max(pv for _c, _h, pv, _p in planes)
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)

    padded = {}
    for cid, ph, pv, plane in planes:
        pw, phh = mcux * 8 * ph, mcuy * 8 * pv
        arr = np.zeros((phh, pw))
        src_h, src_w = plane.shape
        arr[:src_h, :src_w] = plane
        if src_w < pw:
            arr[:, src_w:] = arr[:, src_w - 1 : src_w]
        if src_h < phh:
            arr[src_h:, :] = arr[src_h - 1 : src_h, :]
        padded[cid] = arr

    # first pass: quantized blocks per MCU (qtable = all ones) + symbols
    mcu_blocks = []  # [(cid, coefs-zigzag)]
    dc_syms, ac_syms = [], []
    pred = {cid: 0 for cid, _h, _v, _p in planes}
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        if restart and mcu and mcu % restart == 0:
            pred = {cid: 0 for cid in pred}
        for cid, ph, pv, _plane in planes:
            arr = padded[cid]
            for by in range(pv):
                for bx in range(ph):
                    y0 = (my * pv + by) * 8
                    x0 = (mx * ph + bx) * 8
                    block = [
                        [arr[y0 + y, x0 + x] for x in range(8)]
                        for y in range(8)
                    ]
                    F = _jpeg_fdct_block(block)
                    zz = [
                        int(round(F[codecs._JPEG_ZIGZAG[k] // 8]
                                   [codecs._JPEG_ZIGZAG[k] % 8]))
                        for k in range(64)
                    ]
                    diff = zz[0] - pred[cid]
                    pred[cid] = zz[0]
                    t, _ = _mag_bits(diff)
                    dc_syms.append(t)
                    run = 0
                    for k in range(1, 64):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            ac_syms.append(0xF0)
                            run -= 16
                        sz, _ = _mag_bits(zz[k])
                        ac_syms.append((run << 4) | sz)
                        run = 0
                    if run:
                        ac_syms.append(0x00)  # EOB
                    mcu_blocks.append((cid, zz, diff))
    # every block that ends early needs EOB in the alphabet
    ac_syms.append(0x00)
    dc_counts, dc_symlist, dc_enc = _enc_tables(dc_syms)
    ac_counts, ac_symlist, ac_enc = _enc_tables(ac_syms)

    # second pass: the entropy stream
    wtr = _JpegWriter()
    pred = {cid: 0 for cid, _h, _v, _p in planes}
    blocks_per_mcu = sum(ph * pv for _c, ph, pv, _p in planes)
    stream = bytearray()
    bi = 0
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            wtr.flush()
            stream += wtr.out
            stream += bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)])
            wtr = _JpegWriter()
        for _ in range(blocks_per_mcu):
            cid, zz, diff = mcu_blocks[bi]
            bi += 1
            t, mb = _mag_bits(diff)
            c, ln = dc_enc[t]
            wtr.bits(c, ln)
            if t:
                wtr.bits(mb, t)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_enc[0xF0]
                    wtr.bits(c, ln)
                    run -= 16
                sz, mbits = _mag_bits(zz[k])
                c, ln = ac_enc[(run << 4) | sz]
                wtr.bits(c, ln)
                wtr.bits(mbits, sz)
                run = 0
            if run:
                c, ln = ac_enc[0x00]
                wtr.bits(c, ln)
    wtr.flush()
    stream += wtr.out

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # qtable 0, all ones
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for cid, ph, pv, _p in planes:
        sof += bytes([cid, (ph << 4) | pv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_symlist))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_symlist))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for cid, _h, _v, _p in planes:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += stream
    out += b"\xff\xd9"
    return bytes(out)


def test_parse_jpeg_gray_roundtrip():
    """Gray baseline JPEG with all-ones quantization must decode to
    within DCT float-rounding error of the source grid."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 255, (16, 24)).astype(np.uint8)
    meta = codecs.parse_jpeg(make_jpeg_full(img))
    assert meta is not None and "pixels" in meta, meta
    assert (meta["width"], meta["height"], meta["channels"]) == (24, 16, 1)
    got = np.frombuffer(meta["pixels"], np.uint8).reshape(16, 24)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_parse_jpeg_rgb_roundtrip_and_restart():
    """4:4:4 color round-trip within YCbCr+DCT rounding error; a
    restart-interval encoding of the same image decodes IDENTICALLY."""
    rng = np.random.RandomState(22)
    img = rng.randint(0, 255, (17, 13, 3)).astype(np.uint8)
    meta = codecs.parse_jpeg(make_jpeg_full(img))
    assert meta is not None and "pixels" in meta
    assert (meta["width"], meta["height"], meta["channels"]) == (13, 17, 3)
    got = np.frombuffer(meta["pixels"], np.uint8).reshape(17, 13, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8
    meta_r = codecs.parse_jpeg(make_jpeg_full(img, restart=2))
    assert meta_r is not None and meta_r["pixels"] == meta["pixels"]


def test_parse_jpeg_subsampled_chroma():
    """4:2:0 chroma subsampling: luma must survive within rounding
    error (chroma is averaged by construction)."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 255, (20, 18, 3)).astype(np.uint8)
    meta = codecs.parse_jpeg(make_jpeg_full(img, subsample=(2, 2)))
    assert meta is not None and "pixels" in meta
    got = np.frombuffer(meta["pixels"], np.uint8).reshape(20, 18, 3).astype(float)
    luma_got = 0.299 * got[:, :, 0] + 0.587 * got[:, :, 1] + 0.114 * got[:, :, 2]
    p = img.astype(float)
    luma_src = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    assert np.abs(luma_got - luma_src).max() <= 10


def test_parse_jpeg_gray_sampled_header_only():
    """JPEG A.2: a one-component scan is NON-interleaved regardless of
    SOF sampling factors, so grayscale with factors >1 must demote to
    header-only (never interleaved-decode to garbage pixels)."""
    rng = np.random.RandomState(25)
    img = rng.randint(0, 255, (16, 16)).astype(np.uint8)
    good = make_jpeg_full(img)
    assert "pixels" in codecs.parse_jpeg(good)
    b = bytearray(good)
    sof_at = good.index(b"\xff\xc0")
    assert b[sof_at + 11] == 0x11  # comp-1 sampling byte (h<<4 | v)
    b[sof_at + 11] = 0x22
    meta = codecs.parse_jpeg(bytes(b))
    assert meta is not None and "pixels" not in meta
    assert (meta["width"], meta["height"], meta["channels"]) == (16, 16, 1)


def test_parse_jpeg_header_only_contract():
    """Progressive (SOF2) streams and corrupt entropy data return
    header-only metadata; truncated/garbage streams return None."""
    rng = np.random.RandomState(24)
    img = rng.randint(0, 255, (8, 8)).astype(np.uint8)
    good = make_jpeg_full(img)
    # flip the SOF marker to SOF2 (progressive): header-only
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    meta = codecs.parse_jpeg(prog)
    assert meta is not None and "pixels" not in meta
    assert (meta["width"], meta["height"]) == (8, 8)
    # corrupt entropy data: header-only, never an exception
    sos_at = good.index(b"\xff\xda")
    bad = bytearray(good)
    for i in range(sos_at + 14, min(sos_at + 22, len(bad) - 2)):
        bad[i] ^= 0xA5
    meta_b = codecs.parse_jpeg(bytes(bad))
    assert meta_b is None or "pixels" not in meta_b or meta_b["pixels"] != codecs.parse_jpeg(good)["pixels"]
    assert codecs.parse_jpeg(good[:20]) is None
    assert codecs.parse_jpeg(b"\xff\xd8" + b"\x00" * 50) is None


def test_jpeg_dhash_matches_bmp(spark):
    """Same image through BMP and near-lossless JPEG must produce
    dhashes within a small Hamming distance (identical pixels up to
    DCT rounding)."""
    rng = np.random.RandomState(25)
    img = rng.randint(0, 255, (12, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(make_bmp(img))),
            (2, bytearray(make_jpeg_full(img))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.dhash, r.codec) for r in
            multimodal.image_dhash(df).collect()}
    assert rows[1][1] == "bmp" and rows[2][1] == "jpeg"
    ham = bin((rows[1][0] ^ rows[2][0]) & ((1 << 64) - 1)).count("1")
    assert ham <= 6, (ham, rows)


# -- JPEG progressive encode/decode (round 11) --------------------------------


class _SymCounter:
    """Pass-1 sink: collects the Huffman alphabets the scans will use."""

    def __init__(self):
        self.dc_syms, self.ac_syms = [], []

    def sym_dc(self, s, enc=None):
        self.dc_syms.append(s)

    def sym_ac(self, s, enc=None):
        self.ac_syms.append(s)

    def bits(self, v, n):
        pass


class _SymWriter:
    """Pass-2 sink: entropy-codes into a _JpegWriter."""

    def __init__(self, wtr, dc_enc, ac_enc):
        self.w, self.dc_enc, self.ac_enc = wtr, dc_enc, ac_enc

    def sym_dc(self, s, enc=None):
        c, ln = self.dc_enc[s]
        self.w.bits(c, ln)

    def sym_ac(self, s, enc=None):
        c, ln = self.ac_enc[s]
        self.w.bits(c, ln)

    def bits(self, v, n):
        if n:
            self.w.bits(v, n)


def _jpeg_plan_blocks(pixels: np.ndarray, subsample=(1, 1)):
    """Geometry + per-component quantized zigzag blocks (raster order
    over the MCU-padded grid) — the shared front half of the baseline
    and progressive encoders (all-ones quantization)."""
    h, w = pixels.shape[:2]
    gray = pixels.ndim == 2
    sh, sv = subsample
    if gray:
        planes = [(1, 1, 1, pixels.astype(float))]
    else:
        p = pixels.astype(float)
        Y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        Cb = (-0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1]
              + 0.5 * p[:, :, 2] + 128)
        Cr = (0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1]
              - 0.081312 * p[:, :, 2] + 128)
        if (sh, sv) != (1, 1):
            ch, cw = (h + sv - 1) // sv, (w + sh - 1) // sh

            def down(c):
                o = np.zeros((ch, cw))
                for y in range(ch):
                    for x in range(cw):
                        o[y, x] = c[y * sv : y * sv + sv,
                                    x * sh : x * sh + sh].mean()
                return o

            planes = [(1, sh, sv, Y), (2, 1, 1, down(Cb)),
                      (3, 1, 1, down(Cr))]
        else:
            planes = [(1, 1, 1, Y), (2, 1, 1, Cb), (3, 1, 1, Cr)]
    maxh = max(ph for _c, ph, _v, _p in planes)
    maxv = max(pv for _c, _h, pv, _p in planes)
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)
    blocks = {}
    meta = []
    for cid, ph, pv, plane in planes:
        meta.append((cid, ph, pv))
        pw, phh = mcux * 8 * ph, mcuy * 8 * pv
        arr = np.zeros((phh, pw))
        src_h, src_w = plane.shape
        arr[:src_h, :src_w] = plane
        if src_w < pw:
            arr[:, src_w:] = arr[:, src_w - 1 : src_w]
        if src_h < phh:
            arr[src_h:, :] = arr[src_h - 1 : src_h, :]
        comp = []
        for by in range(mcuy * pv):
            for bx in range(mcux * ph):
                block = [
                    [arr[by * 8 + y, bx * 8 + x] for x in range(8)]
                    for y in range(8)
                ]
                F = _jpeg_fdct_block(block)
                comp.append([
                    int(round(F[codecs._JPEG_ZIGZAG[k] // 8]
                               [codecs._JPEG_ZIGZAG[k] % 8]))
                    for k in range(64)
                ])
        blocks[cid] = comp
    return meta, maxh, maxv, mcux, mcuy, blocks, w, h


def _emit_dc_first(sink, meta, mcux, mcuy, blocks, al):
    pred = {cid: 0 for cid, _h, _v in meta}
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for cid, ph, pv in meta:
            bw = mcux * ph
            for by in range(pv):
                for bx in range(ph):
                    zz = blocks[cid][(my * pv + by) * bw + mx * ph + bx]
                    v = zz[0] >> al  # arithmetic shift (T.81 G.1.2.1)
                    diff = v - pred[cid]
                    pred[cid] = v
                    t, mb = _mag_bits(diff)
                    sink.sym_dc(t)
                    sink.bits(mb, t)


def _emit_dc_refine(sink, meta, mcux, mcuy, blocks, al):
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for cid, ph, pv in meta:
            bw = mcux * ph
            for by in range(pv):
                for bx in range(ph):
                    zz = blocks[cid][(my * pv + by) * bw + mx * ph + bx]
                    sink.bits((zz[0] >> al) & 1, 1)


def _nonint_grid(cid, meta, maxh, maxv, w, h):
    ph, pv = next((a, b) for c, a, b in meta if c == cid)
    sw = (w * ph + maxh - 1) // maxh
    sh = (h * pv + maxv - 1) // maxv
    return (sw + 7) // 8, (sh + 7) // 8, ph


def _scan_blocks(cid, meta, maxh, maxv, mcux, w, h, blocks):
    """The component's blocks in NON-interleaved scan order (A.2)."""
    nw, nh, ph = _nonint_grid(cid, meta, maxh, maxv, w, h)
    bw = mcux * ph
    return [blocks[cid][by * bw + bx] for by in range(nh)
            for bx in range(nw)]


def _emit_eobrun(sink, run):
    while run > 0:
        r = run.bit_length() - 1
        if r > 14:
            r = 14
        take = min(run, (1 << (r + 1)) - 1)
        sink.sym_ac(r << 4)
        sink.bits(take - (1 << r), r)
        run -= take


def _emit_ac_first(sink, scan_blocks, ss, se, al):
    eob_batch = 0
    for zz in scan_blocks:
        vals = [(k, (abs(zz[k]) >> al) * (1 if zz[k] > 0 else -1))
                for k in range(ss, se + 1)]
        vals = [(k, v) for k, v in vals if v != 0]
        if not vals:
            eob_batch += 1
            continue
        _emit_eobrun(sink, eob_batch)
        eob_batch = 0
        prev = ss - 1
        for k, v in vals:
            run = k - prev - 1
            while run > 15:
                sink.sym_ac(0xF0)
                run -= 16
            s, mb = _mag_bits(v)
            sink.sym_ac((run << 4) | s)
            sink.bits(mb, s)
            prev = k
        if prev < se:
            eob_batch = 1  # EOB for this block, batchable with next
    _emit_eobrun(sink, eob_batch)


def _emit_ac_refine(sink, scan_blocks, ss, se, al):
    """Mirror of the decoder's G.1.2.3 walk: new ±1<<al coefficients
    with runs counted over zero-HISTORY positions, one correction bit
    per nonzero-history coefficient encountered, EOB batching."""
    ah = al + 1

    def corrections(sink, zz, k0):
        for k in range(k0, se + 1):
            if abs(zz[k]) >> ah:
                sink.bits((abs(zz[k]) >> al) & 1, 1)

    eob_batch = []
    for zz in scan_blocks:
        new = [k for k in range(ss, se + 1)
               if (abs(zz[k]) >> ah) == 0 and (abs(zz[k]) >> al) == 1]
        if not new:
            eob_batch.append(zz)
            continue
        if eob_batch:
            _emit_eobrun(sink, len(eob_batch))
            for bz in eob_batch:
                corrections(sink, bz, ss)
            eob_batch = []
        k = ss
        for j in new:
            # run of zero-history positions strictly before j
            r = sum(1 for x in range(k, j) if (abs(zz[x]) >> ah) == 0)
            while r > 15:
                sink.sym_ac(0xF0)
                # ZRL consumes 16 zero-history positions; emit the
                # correction bits for nonzero-history coefs passed
                passed = 0
                while passed < 16:
                    if (abs(zz[k]) >> ah) == 0:
                        passed += 1
                    else:
                        sink.bits((abs(zz[k]) >> al) & 1, 1)
                    k += 1
                r -= 16
            sink.sym_ac((r << 4) | 1)
            sink.bits(1 if zz[j] > 0 else 0, 1)
            while k <= j:
                if (abs(zz[k]) >> ah) != 0:
                    sink.bits((abs(zz[k]) >> al) & 1, 1)
                k += 1  # zero-history positions consume nothing
        if k <= se:
            # EOB closing this block covers [k, se] correction bits
            _emit_eobrun(sink, 1)
            corrections(sink, zz, k)
    if eob_batch:
        _emit_eobrun(sink, len(eob_batch))
        for bz in eob_batch:
            corrections(sink, bz, ss)


def make_jpeg_progressive(pixels: np.ndarray, subsample=(1, 1), al=1,
                          bands=((1, 5), (6, 63))) -> bytes:
    """Progressive JPEG encoder (test twin of the SOF2 decoder):
    DC-first at Al, per-component AC-first scans over ``bands`` at Al,
    then DC refine and per-component AC refines down to level 0 —
    spectral selection AND successive approximation, EOBRUN batching,
    all-ones quantization. Same quantized coefficients as
    make_jpeg_full, so pixels must decode BIT-identically."""
    meta, maxh, maxv, mcux, mcuy, blocks, w, h = _jpeg_plan_blocks(
        pixels, subsample
    )

    def run_scans(sink):
        _emit_dc_first(sink, meta, mcux, mcuy, blocks, al)
        for cid, _ph, _pv in meta:
            sb = _scan_blocks(cid, meta, maxh, maxv, mcux, w, h, blocks)
            for ss, se in bands:
                _emit_ac_first(sink, sb, ss, se, al)
        for lvl in range(al - 1, -1, -1):
            _emit_dc_refine(sink, meta, mcux, mcuy, blocks, lvl)
            for cid, _ph, _pv in meta:
                sb = _scan_blocks(cid, meta, maxh, maxv, mcux, w, h,
                                  blocks)
                for ss, se in bands:
                    _emit_ac_refine(sink, sb, ss, se, lvl)

    cnt = _SymCounter()
    run_scans(cnt)
    cnt.ac_syms.append(0x00)  # EOB always in the alphabet
    dc_counts, dc_symlist, dc_enc = _enc_tables(cnt.dc_syms)
    ac_counts, ac_symlist, ac_enc = _enc_tables(cnt.ac_syms)

    def seg(marker, body):
        return (bytes([0xFF, marker])
                + (len(body) + 2).to_bytes(2, "big") + body)

    def sos(scomps, ss, se, ah, lvl):
        body = bytes([len(scomps)])
        for cid in scomps:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | lvl])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(meta)])
    for cid, ph, pv in meta:
        sof += bytes([cid, (ph << 4) | pv, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_symlist))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_symlist))

    def entropy(emit):
        wtr = _JpegWriter()
        emit(_SymWriter(wtr, dc_enc, ac_enc))
        wtr.flush()
        return bytes(wtr.out)

    all_cids = [cid for cid, _h, _v in meta]
    out += sos(all_cids, 0, 0, 0, al)
    out += entropy(lambda s: _emit_dc_first(s, meta, mcux, mcuy, blocks,
                                            al))
    for cid, _ph, _pv in meta:
        sb = _scan_blocks(cid, meta, maxh, maxv, mcux, w, h, blocks)
        for ss, se in bands:
            out += sos([cid], ss, se, 0, al)
            out += entropy(
                lambda s, sb=sb, ss=ss, se=se:
                _emit_ac_first(s, sb, ss, se, al)
            )
    for lvl in range(al - 1, -1, -1):
        out += sos(all_cids, 0, 0, lvl + 1, lvl)
        out += entropy(lambda s, lvl=lvl: _emit_dc_refine(
            s, meta, mcux, mcuy, blocks, lvl))
        for cid, _ph, _pv in meta:
            sb = _scan_blocks(cid, meta, maxh, maxv, mcux, w, h, blocks)
            for ss, se in bands:
                out += sos([cid], ss, se, lvl + 1, lvl)
                out += entropy(
                    lambda s, sb=sb, ss=ss, se=se, lvl=lvl:
                    _emit_ac_refine(s, sb, ss, se, lvl)
                )
    out += b"\xff\xd9"
    return bytes(out)


def test_parse_jpeg_progressive_equals_baseline_gray():
    """Progressive decode must be BIT-identical to the baseline decode
    of the same quantized coefficients — gray, spectral selection +
    successive approximation."""
    rng = np.random.RandomState(31)
    img = rng.randint(0, 255, (16, 24)).astype(np.uint8)
    base = codecs.parse_jpeg(make_jpeg_full(img))
    prog = codecs.parse_jpeg(make_jpeg_progressive(img))
    assert prog is not None and "pixels" in prog, prog
    assert prog["pixels"] == base["pixels"]
    assert (prog["width"], prog["height"], prog["channels"]) == (24, 16, 1)


def test_parse_jpeg_progressive_equals_baseline_rgb():
    """4:4:4 color with two AC bands and Al=1 SA must equal baseline."""
    rng = np.random.RandomState(32)
    img = rng.randint(0, 255, (17, 13, 3)).astype(np.uint8)
    base = codecs.parse_jpeg(make_jpeg_full(img))
    prog = codecs.parse_jpeg(make_jpeg_progressive(img))
    assert prog is not None and "pixels" in prog, prog
    assert prog["pixels"] == base["pixels"]


def test_parse_jpeg_progressive_subsampled_and_al0():
    """4:2:0 (non-interleaved AC grids smaller than the padded store)
    and a spectral-selection-only encoding (al=0, no SA) both equal
    their baseline twins."""
    rng = np.random.RandomState(33)
    img = rng.randint(0, 255, (20, 18, 3)).astype(np.uint8)
    base = codecs.parse_jpeg(make_jpeg_full(img, subsample=(2, 2)))
    prog = codecs.parse_jpeg(make_jpeg_progressive(img, subsample=(2, 2)))
    assert prog is not None and "pixels" in prog, prog
    assert prog["pixels"] == base["pixels"]

    img2 = rng.randint(0, 255, (9, 11, 3)).astype(np.uint8)
    base2 = codecs.parse_jpeg(make_jpeg_full(img2))
    prog2 = codecs.parse_jpeg(make_jpeg_progressive(img2, al=0))
    assert prog2 is not None and "pixels" in prog2, prog2
    assert prog2["pixels"] == base2["pixels"]


def test_parse_jpeg_progressive_fuzz_total():
    """Truncation and mutation over a progressive stream: header-only
    or None, never an exception, and never garbage claiming pixels
    from a malformed scan structure."""
    rng = np.random.RandomState(34)
    img = rng.randint(0, 255, (8, 16)).astype(np.uint8)
    good = make_jpeg_progressive(img)
    for cut in range(0, len(good), 7):
        r = codecs.sniff_media(bytes(good[:cut]))
        assert r is None or isinstance(r, dict)
    import random

    rr = random.Random(35)
    for _ in range(300):
        bb = bytearray(good)
        for _ in range(rr.randint(1, 4)):
            bb[rr.randrange(len(bb))] = rr.randrange(256)
        r = codecs.sniff_media(bytes(bb))
        assert r is None or isinstance(r, dict)


def test_parse_jpeg_progressive_sparse_long_runs():
    """A sparse-spectrum image (flat blocks with one bright pixel each)
    forces long zero runs — ZRL chunks in the AC-first scan, >15
    zero-history runs in the refine scan, and cross-block EOBRUN
    batching — all of which must still reconstruct bit-identically."""
    img = np.full((24, 24), 100, np.uint8)
    img[3, 5] = 250
    img[11, 17] = 0
    base = codecs.parse_jpeg(make_jpeg_full(img))
    prog = codecs.parse_jpeg(make_jpeg_progressive(img, al=2,
                                                   bands=((1, 63),)))
    assert prog is not None and "pixels" in prog, prog
    assert prog["pixels"] == base["pixels"]
