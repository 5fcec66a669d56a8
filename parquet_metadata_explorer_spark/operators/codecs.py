"""Pure-Python media header/sample parsers for the multimodal operators.

Real decoders for the three codec-less container formats a pure-Python
environment can parse exactly — BMP (Windows DIB), binary PPM/PGM
(netpbm), and WAV (RIFF/PCM) — so ``multimodal.decode_features`` extracts
width/height/channels/sample-rate/duration from the actual bytes instead
of a stub. Compressed formats (JPEG/PNG/MP3/H.264) still need codec
libraries this container doesn't ship; payloads that aren't one of the
three formats fall back to the deterministic byte-derived features, so
the operator is total over arbitrary binary.

Every parser is strict-by-construction: it returns ``None`` unless the
full structural contract holds (magic bytes, sane header fields, payload
large enough for the declared geometry), so arbitrary text/binary cannot
mis-sniff — the dispatch in ``multimodal.decode_batch`` relies on that to
stay deterministic.
"""

from __future__ import annotations

from typing import Optional

# DIB header sizes we understand: BITMAPINFOHEADER and the V4/V5 variants
_BMP_DIB_SIZES = (40, 52, 56, 108, 124)


def parse_bmp(b: bytes) -> Optional[dict]:
    """BMP: 14-byte file header + BITMAPINFOHEADER. Uncompressed 8/24/32
    bpp only (BI_RGB); returns None on any structural violation."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    pixel_off = int.from_bytes(b[10:14], "little")
    dib_size = int.from_bytes(b[14:18], "little")
    if dib_size not in _BMP_DIB_SIZES:
        return None
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)  # <0: top-down
    planes = int.from_bytes(b[26:28], "little")
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if planes != 1 or compression != 0 or bpp not in (8, 24, 32):
        return None
    if width <= 0 or height == 0 or width > 1 << 20 or abs(height) > 1 << 20:
        return None
    channels = bpp // 8
    # rows are padded to 4-byte boundaries
    row_bytes = (width * channels + 3) & ~3
    if pixel_off < 54 or pixel_off + row_bytes * abs(height) > len(b):
        return None
    return {
        "codec": "bmp",
        "width": width,
        "height": abs(height),
        "channels": channels,
        "pixel_offset": pixel_off,
        "row_bytes": row_bytes,
        "top_down": height < 0,
    }


def parse_ppm(b: bytes) -> Optional[dict]:
    """Binary netpbm: P6 (RGB) or P5 (grayscale), maxval <= 255. The header
    is ASCII tokens (magic, width, height, maxval) with ``#`` comments;
    pixel data starts after exactly one whitespace byte past maxval."""
    if b[:2] not in (b"P6", b"P5") or len(b) < 10:
        return None
    channels = 3 if b[:2] == b"P6" else 1
    pos, vals = 2, []
    n = len(b)
    while len(vals) < 3:
        # skip whitespace and comment lines
        while pos < n and b[pos : pos + 1].isspace():
            pos += 1
        if pos < n and b[pos] == 0x23:  # '#'
            while pos < n and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and b[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None  # non-numeric token where an int is required
        vals.append(int(b[start:pos]))
    if pos >= n or not b[pos : pos + 1].isspace():
        return None  # exactly one whitespace byte must follow maxval
    pos += 1
    width, height, maxval = vals
    if not (0 < width <= 1 << 20 and 0 < height <= 1 << 20 and 0 < maxval < 256):
        return None
    if n - pos < width * height * channels:
        return None
    return {
        "codec": "ppm" if channels == 3 else "pgm",
        "width": width,
        "height": height,
        "channels": channels,
        "pixel_offset": pos,
        "row_bytes": width * channels,
        "top_down": True,
    }


def parse_wav(b: bytes) -> Optional[dict]:
    """RIFF/WAVE with a PCM (format 1) or IEEE-float (format 3) ``fmt ``
    chunk and a ``data`` chunk. Walks the chunk list, so extra chunks
    (LIST, fact, ...) are fine."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, n = 12, len(b)
    fmt = None
    data_size = None
    data_off = None
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        csize = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = pos + 8
        if cid == b"fmt " and csize >= 16 and body + 16 <= n:
            audio_format = int.from_bytes(b[body : body + 2], "little")
            n_channels = int.from_bytes(b[body + 2 : body + 4], "little")
            sample_rate = int.from_bytes(b[body + 4 : body + 8], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
            if (
                audio_format not in (1, 3)
                or not 0 < n_channels <= 64
                or not 0 < sample_rate <= 1_000_000
                or bits not in (8, 16, 24, 32, 64)
            ):
                return None
            fmt = (n_channels, sample_rate, bits)
        elif cid == b"data":
            data_size = min(csize, n - body)  # tolerate truncated tail
            data_off = body
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    n_channels, sample_rate, bits = fmt
    frame_bytes = n_channels * (bits // 8)
    if frame_bytes == 0:
        return None
    n_samples = data_size // frame_bytes  # frames (per-channel samples)
    return {
        "codec": "wav",
        "channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // sample_rate,
        "data_offset": data_off,
        "data_size": data_size,
    }


def sniff_media(b: bytes) -> Optional[dict]:
    """Dispatch on magic bytes; None when no strict parser accepts."""
    if b[:2] == b"BM":
        return parse_bmp(b)
    if b[:2] in (b"P6", b"P5"):
        return parse_ppm(b)
    if b[:4] == b"RIFF":
        return parse_wav(b)
    return None
