"""Pure-Python media parsers for the multimodal operators.

Real decoders for the formats a pure-Python environment can handle
exactly — BMP (Windows DIB), binary PPM/PGM (netpbm), WAV (RIFF/PCM),
and PNG with REAL pixels (stdlib zlib inflate + the five row unfilters
+ Adam7 deinterlacing + sub-byte bit unpacking) for EVERY legal
depth/color combination — 1/2/4/8/16-bit gray, 8/16-bit
RGB/gray+alpha/RGBA, 1/2/4/8-bit PLTE palette — so
``multimodal.decode_features``, ``resize_binary`` and ``image_dhash``
work on actual pixel grids — and baseline-sequential AND progressive
JPEG with REAL pixels (canonical Huffman decode, dequantize, float
IDCT, chroma upsampling, JFIF YCbCr→RGB; progressive accumulates
spectral-selection + successive-approximation scans per block before
the shared IDCT; 12/16-bit and arithmetic variants return header-only
dimensions, the documented contract). AVI parses the RIFF
container (avih dims/timing + real ``movi`` frame boundaries for the
video stream) so frame sampling is container-aware. Payloads no strict
parser accepts fall back to the deterministic byte-derived features, so
every operator stays total over arbitrary binary.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> STORED channels (palette type 3 stores 1 index/pixel;
# parse_png reports the logical count 3 in its metadata)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse the five PNG row filters (None/Sub/Up/Average/Paeth).

    Per-pixel sequential dependency within a row forces a byte loop;
    fine for the thumbnail-scale fixtures the pure-Python path targets
    (a production image pipeline brings a codec library — this makes
    the Spark plumbing real, not fast)."""
    out = bytearray(height * stride)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row_off = y * stride
        out[row_off : row_off + stride] = raw[pos : pos + stride]
        pos += stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                out[row_off + i] = (out[row_off + i] + out[row_off + i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for i in range(stride):
                    out[row_off + i] = (
                        out[row_off + i] + out[prev_off + i]
                    ) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[row_off + i - bpp] if i >= bpp else 0
                b_ = out[prev_off + i] if y else 0
                out[row_off + i] = (out[row_off + i] + ((a + b_) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[row_off + i - bpp] if i >= bpp else 0
                b_ = out[prev_off + i] if y else 0
                c = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                pa, pb, pc = abs(b_ - c), abs(a - c), abs(a + b_ - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                out[row_off + i] = (out[row_off + i] + pred) & 0xFF
        else:
            raise ValueError("bad filter")
        prev_off = row_off
    return bytes(out)


# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unpack_bits(row: bytes, width: int, depth: int) -> bytes:
    """Expand a bit-packed PNG row (MSB-first, depth 1/2/4) to one byte
    per sample; trailing pad bits in the last byte are discarded."""
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray(width)
    for i in range(width):
        b = row[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out[i] = (b >> shift) & mask
    return bytes(out)


def _png_adam7(
    raw: bytes, width: int, height: int, pixbytes: int, depth: int = 8
) -> bytes:
    """Deinterlace an Adam7 stream: each of the seven passes is an
    independently-filtered sub-image (its own per-row filter bytes,
    filtered against ITS OWN previous row); unfilter each pass, then
    scatter its pixels to their (x0 + i·dx, y0 + j·dy) grid positions.
    For sub-byte depths each pass's rows are bit-packed with per-row
    padding (pixbytes must be 1; samples unpack before the scatter).
    Raises ValueError on a length mismatch or bad filter byte."""
    out = bytearray(width * height * pixbytes)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        if depth >= 8:
            stride = pw * pixbytes
            fbpp = pixbytes
        else:
            stride = (pw * depth + 7) // 8
            fbpp = 1
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("short adam7 pass")
        sub = _png_unfilter(raw[pos : pos + need], ph, stride, fbpp)
        pos += need
        for j in range(ph):
            srow = (
                sub[j * stride : (j + 1) * stride]
                if depth >= 8
                else _unpack_bits(sub[j * stride : (j + 1) * stride], pw, depth)
            )
            spix = pixbytes if depth >= 8 else 1
            row = (y0 + j * dy) * width
            for i in range(pw):
                dst = (row + x0 + i * dx) * pixbytes
                out[dst : dst + pixbytes] = srow[i * spix : (i + 1) * spix]
    if pos != len(raw):
        raise ValueError("adam7 trailing bytes")
    return bytes(out)


def parse_png(b: bytes) -> Optional[dict]:
    """PNG: signature + chunk walk. Dimensions/channels from IHDR for any
    structurally-valid PNG; REAL pixels (stdlib zlib inflate + the five
    row unfilters) for the non-sub-byte color types:

    - 8-bit gray / RGB / gray+alpha / RGBA, sequential AND Adam7
      interlaced (the seven passes unfilter independently and scatter
      into the full grid);
    - 8-bit PLTE-indexed palette (indices decoded like a 1-channel
      grid, then looked up to RGB — the decoded grid is channels=3,
      identical to the same image encoded as truecolor; tRNS
      transparency is ignored, color only);
    - 16-bit gray / RGB / gray+alpha / RGBA (sequential or interlaced),
      downscaled to 8 bits via the high byte of each big-endian sample
      (the standard approximation; ``bit_depth`` still reports 16);
    - sub-byte 1/2/4-bit gray (samples expanded to the 8-bit range) and
      1/2/4-bit palette (bit-packed indices unpacked, then the PLTE
      lookup), sequential or interlaced.

    Every legal IHDR depth/color combination therefore decodes real
    pixels."""
    import zlib

    if b[: len(_PNG_SIG)] != _PNG_SIG or len(b) < 33:
        return None
    pos, n = len(_PNG_SIG), len(b)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    saw_end = False
    while pos + 8 <= n:
        clen = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        body_start = pos + 8
        if clen > n - body_start:
            return None  # truncated chunk
        body = b[body_start : body_start + clen]
        if pos == len(_PNG_SIG) and ctype != b"IHDR":
            return None  # IHDR must come first
        if ctype == b"IHDR":
            if clen != 13:
                return None
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type = body[8], body[9]
            comp, filt, interlace = body[10], body[11], body[12]
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                return None
            if not (0 < width <= 1 << 20 and 0 < height <= 1 << 20):
                return None
            if color_type not in _PNG_CHANNELS:
                return None
        elif ctype == b"PLTE":
            # 1..256 RGB triples; a malformed PLTE demotes to header-only
            if clen % 3 == 0 and 3 <= clen <= 768:
                palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            saw_end = True
            break
        pos = body_start + clen + 4  # skip CRC
    if width is None or not saw_end:
        return None
    channels = _PNG_CHANNELS[color_type]
    meta = {
        "codec": "png",
        "width": width,
        "height": height,
        # palette images always report the LOGICAL channel count (3):
        # header-only and decoded paths agree whether or not the pixel
        # decode succeeds (the stored stream is 1 index/pixel either way)
        "channels": 3 if color_type == 3 else channels,
        "bit_depth": bit_depth,
    }
    decodable = idat and (
        (bit_depth == 8 and (color_type in (0, 2, 4, 6) or palette is not None))
        or (bit_depth == 16 and color_type in (0, 2, 4, 6))
        or (
            bit_depth in (1, 2, 4)
            and (color_type == 0 or (color_type == 3 and palette is not None))
        )
    )
    if decodable:
        if bit_depth >= 8:
            pixbytes = channels * (bit_depth // 8)
            stride = width * pixbytes  # palette: channels=1, 1 index byte
        else:
            # bit-packed gray or palette rows, one filter byte each;
            # the filter delta unit is one byte (PNG spec: bpp rounds up)
            pixbytes = 1
            stride = (width * bit_depth + 7) // 8
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return meta  # header-only when the stream is corrupt
        try:
            if interlace == 0:
                if len(raw) != height * (stride + 1):
                    return meta
                pixels = _png_unfilter(
                    raw, height, stride, pixbytes if bit_depth >= 8 else 1
                )
                if bit_depth < 8:
                    pixels = b"".join(
                        _unpack_bits(
                            pixels[y * stride : (y + 1) * stride],
                            width,
                            bit_depth,
                        )
                        for y in range(height)
                    )
            else:
                pixels = _png_adam7(
                    raw, width, height, pixbytes, depth=bit_depth
                )
        except ValueError:
            return meta
        if bit_depth == 16:
            # high byte of each big-endian 16-bit sample -> 8-bit grid
            pixels = pixels[::2]
            stride = width * channels
        elif bit_depth < 8:
            stride = width  # one sample byte per pixel after unpacking
            if color_type == 0:
                # expand 1/2/4-bit gray to the 8-bit range
                full = (1 << bit_depth) - 1
                pixels = bytes(v * 255 // full for v in pixels)
        if color_type == 3:
            # index -> RGB lookup; out-of-range index = corrupt, demote
            n_entries = len(palette) // 3
            if any(p >= n_entries for p in pixels):
                return meta
            pixels = b"".join(
                palette[3 * p : 3 * p + 3] for p in pixels
            )
            channels = 3
            stride = width * 3
        meta["pixels"] = pixels
        meta["row_bytes"] = stride
        meta["top_down"] = True
    return meta


# SOF markers that carry dimensions (baseline, progressive, lossless,
# arithmetic variants) — everything except DHT(C4)/DAC(CC)/JPG(C8)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_matrix():
    import math

    t = []
    for x in range(8):
        row = []
        for u in range(8):
            c = math.sqrt(0.125) if u == 0 else 0.5
            row.append(c * math.cos((2 * x + 1) * u * math.pi / 16.0))
        t.append(row)
    return t


_JPEG_T = _jpeg_idct_matrix()


def _jpeg_huff_table(counts, symbols):
    """Canonical Huffman: (length, code) -> symbol (JPEG Annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one un-stuffed entropy segment."""

    __slots__ = ("d", "i", "n", "cur", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.n = len(data)
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.i >= self.n:
                raise ValueError("jpeg: entropy data exhausted")
            self.cur = self.d[self.i]
            self.i += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _jpeg_idct_block(coef):
    """8x8 inverse DCT: two passes against the precomputed basis."""
    T = _JPEG_T
    g = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        cv = coef[v * 8 : v * 8 + 8]
        for x in range(8):
            tx = T[x]
            g[v][x] = (
                cv[0] * tx[0] + cv[1] * tx[1] + cv[2] * tx[2]
                + cv[3] * tx[3] + cv[4] * tx[4] + cv[5] * tx[5]
                + cv[6] * tx[6] + cv[7] * tx[7]
            )
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        ty = T[y]
        oy = out[y]
        for x in range(8):
            acc = (
                g[0][x] * ty[0] + g[1][x] * ty[1] + g[2][x] * ty[2]
                + g[3][x] * ty[3] + g[4][x] * ty[4] + g[5][x] * ty[5]
                + g[6][x] * ty[6] + g[7][x] * ty[7]
            )
            px = int(round(acc)) + 128
            oy[x] = 0 if px < 0 else (255 if px > 255 else px)
    return out


def _jpeg_entropy_segments(b: bytes, pos: int):
    """Un-stuffed entropy segments split at RSTn; returns (segs, end)."""
    segs = [bytearray()]
    n = len(b)
    i = pos
    while i < n:
        c = b[i]
        if c == 0xFF:
            if i + 1 >= n:
                break
            m = b[i + 1]
            if m == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytearray())
                i += 2
                continue
            break  # real marker (EOI or next segment)
        segs[-1].append(c)
        i += 1
    return [bytes(x) for x in segs], i


def _jpeg_decode_baseline(comps, qt, huff_dc, huff_ac, scan_map,
                          segments, width, height, restart_interval):
    """Baseline sequential scan decode -> per-component sample planes.

    ``comps`` is the SOF0 list [(cid, h, v, tq)]; ``scan_map`` maps cid
    to (dc table id, ac table id). Returns {cid: (plane rows, pw, ph)}.
    """
    maxh = max(h for _c, h, _v, _q in comps)
    maxv = max(v for _c, _h, v, _q in comps)
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)
    planes = {}
    for cid, h, v, _tq in comps:
        pw, ph = mcux * 8 * h, mcuy * 8 * v
        planes[cid] = ([[0] * pw for _ in range(ph)], pw, ph)
    pred = {cid: 0 for cid, _h, _v, _q in comps}
    seg_idx = 0
    bits = _JpegBits(segments[0])
    n_mcus = mcux * mcuy
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            bits = _JpegBits(segments[seg_idx])
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(mcu, mcux)
        for cid, h, v, tq in comps:
            dct, act = huff_dc[scan_map[cid][0]], huff_ac[scan_map[cid][1]]
            q = qt[tq]
            plane, pw, _ph = planes[cid]
            for by in range(v):
                for bx in range(h):
                    coef = [0] * 64
                    t = bits.huff(dct)
                    diff = _jpeg_extend(bits.bits(t), t) if t else 0
                    pred[cid] += diff
                    coef[0] = pred[cid] * q[0]
                    k = 1
                    while k < 64:
                        rs = bits.huff(act)
                        r, sz = rs >> 4, rs & 0x0F
                        if sz == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        coef[_JPEG_ZIGZAG[k]] = (
                            _jpeg_extend(bits.bits(sz), sz) * q[k]
                        )
                        k += 1
                    block = _jpeg_idct_block(coef)
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    for yy in range(8):
                        plane[y0 + yy][x0 : x0 + 8] = block[yy]
    return planes


def _jpeg_refine_nonzero(blk, k0, k1, bit, bits):
    """AC successive-approximation correction bits (T.81 G.1.2.3): one
    bit per already-nonzero coefficient in the band; a 1 appends
    ``bit`` to the magnitude if that magnitude bit is still clear."""
    for k in range(k0, k1 + 1):
        c = blk[k]
        if c != 0 and bits.bit():
            if (abs(c) & bit) == 0:
                blk[k] = c + (bit if c > 0 else -bit)


def _jpeg_ac_first(blk, bits, table, ss, se, al, eobrun):
    """Progressive AC initial scan for one block; returns the EOBRUN
    counting FURTHER all-zero-band blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = bits.huff(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("jpeg: progressive AC index overflow")
        blk[k] = _jpeg_extend(bits.bits(s), s) << al
        k += 1
    return 0


def _jpeg_ac_refine(blk, bits, table, ss, se, al, eobrun):
    """Progressive AC refinement scan for one block (the T.81 G.1.2.3
    correction pass): new coefficients arrive as ±2^Al, every nonzero
    coefficient visited consumes one correction bit. Returns EOBRUN."""
    bit = 1 << al
    if eobrun > 0:
        _jpeg_refine_nonzero(blk, ss, se, bit, bits)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = bits.huff(table)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.bits(r)
                _jpeg_refine_nonzero(blk, k, se, bit, bits)
                return eobrun
            # r == 15: skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("jpeg: refine scan size != 1")
            val = bit if bits.bit() else -bit
        while k <= se:
            c = blk[k]
            if c != 0:
                if bits.bit() and (abs(c) & bit) == 0:
                    blk[k] = c + (bit if c > 0 else -bit)
            else:
                if r == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return 0


def _jpeg_decode_progressive(comps, qt, scans, width, height):
    """Progressive (SOF2) decode: accumulate per-block zigzag
    coefficients across every scan (spectral selection + successive
    approximation), then dequantize/IDCT once — the exact integer
    reconstruction baseline would have produced from the same
    coefficients. ``scans`` carries per-scan Huffman-table SNAPSHOTS
    (DHT may be redefined between scans) and restart segments.
    Returns {cid: (plane rows, pw, ph)} like the baseline decoder."""
    maxh = max(h for _c, h, _v, _q in comps)
    maxv = max(v for _c, _h, v, _q in comps)
    mcux = (width + 8 * maxh - 1) // (8 * maxh)
    mcuy = (height + 8 * maxv - 1) // (8 * maxv)
    geom = {cid: (h, v) for cid, h, v, _q in comps}
    store = {
        cid: [[0] * 64 for _ in range(mcux * h * mcuy * v)]
        for cid, h, v, _q in comps
    }

    def nonint_grid(cid):
        # JPEG A.2: a one-component scan covers ceil(samples/8) blocks
        # of THAT component, not the MCU-padded grid
        h, v = geom[cid]
        sw = (width * h + maxh - 1) // maxh
        sh = (height * v + maxv - 1) // maxv
        return (sw + 7) // 8, (sh + 7) // 8

    for scomps, ss, se, ah, al, hdc, hac, segments, ri in scans:
        if ss == 0 and se != 0:
            raise ValueError("jpeg: progressive DC scan with Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("jpeg: progressive AC scan must be 1-comp")
        bits = _JpegBits(segments[0])
        seg_idx = 0
        if ss == 0:  # DC scan (interleaved when ns>1)
            pred = {cid: 0 for cid, _d, _a in scomps}
            if len(scomps) > 1:
                units = mcux * mcuy
            else:
                nw, nh = nonint_grid(scomps[0][0])
                units = nw * nh
            for u in range(units):
                if ri and u and u % ri == 0:
                    seg_idx += 1
                    bits = _JpegBits(segments[seg_idx])
                    pred = {cid: 0 for cid in pred}
                if len(scomps) > 1:
                    my, mx = divmod(u, mcux)
                    targets = []
                    for cid, dci, _aci in scomps:
                        h, v = geom[cid]
                        bw = mcux * h
                        for by in range(v):
                            for bx in range(h):
                                targets.append((
                                    cid, dci,
                                    (my * v + by) * bw + mx * h + bx,
                                ))
                else:
                    cid, dci, _aci = scomps[0]
                    h, _v = geom[cid]
                    nw, _nh = nonint_grid(cid)
                    by, bx = divmod(u, nw)
                    targets = [(cid, dci, by * (mcux * h) + bx)]
                for cid, dci, idx in targets:
                    blk = store[cid][idx]
                    if ah == 0:
                        t = bits.huff(hdc[dci])
                        diff = _jpeg_extend(bits.bits(t), t) if t else 0
                        pred[cid] += diff
                        blk[0] = pred[cid] << al
                    elif bits.bit():
                        blk[0] |= 1 << al
        else:  # AC scan: one component, non-interleaved
            cid, _dci, aci = scomps[0]
            table = hac[aci]
            h, _v = geom[cid]
            bw = mcux * h
            nw, nh = nonint_grid(cid)
            eobrun = 0
            for u in range(nw * nh):
                if ri and u and u % ri == 0:
                    seg_idx += 1
                    bits = _JpegBits(segments[seg_idx])
                    eobrun = 0
                by, bx = divmod(u, nw)
                blk = store[cid][by * bw + bx]
                if ah == 0:
                    eobrun = _jpeg_ac_first(
                        blk, bits, table, ss, se, al, eobrun
                    )
                else:
                    eobrun = _jpeg_ac_refine(
                        blk, bits, table, ss, se, al, eobrun
                    )

    planes = {}
    for cid, h, v, tq in comps:
        q = qt[tq]
        bw, bh = mcux * h, mcuy * v
        plane = [[0] * (bw * 8) for _ in range(bh * 8)]
        for i, zz in enumerate(store[cid]):
            coef = [0] * 64
            for k in range(64):
                coef[_JPEG_ZIGZAG[k]] = zz[k] * q[k]
            block = _jpeg_idct_block(coef)
            by, bx = divmod(i, bw)
            y0, x0 = by * 8, bx * 8
            for yy in range(8):
                plane[y0 + yy][x0 : x0 + 8] = block[yy]
        planes[cid] = (plane, bw * 8, bh * 8)
    return planes


def parse_jpeg(b: bytes) -> Optional[dict]:
    """JPEG: strict marker-segment walk for dimensions/channels on ANY
    SOF variant, plus REAL pixels for the two dominant on-disk shapes —
    BASELINE SEQUENTIAL (SOF0, 8-bit, 1 or 3 components, any sampling
    factors, restart intervals honored): hand-rolled canonical Huffman
    decode, dequantize, dezigzag, float IDCT (+128 level shift,
    clamped), nearest-neighbor chroma upsampling and the JFIF
    YCbCr→RGB transform — and PROGRESSIVE (SOF2, 8-bit, 1 or 3
    components): every scan's coefficients accumulate per block
    (spectral selection bands, successive-approximation first +
    refinement passes, EOBRUN, per-scan DHT snapshots, restarts), then
    one shared dequant/IDCT reconstructs pixels bit-identical to a
    baseline encoding of the same quantized coefficients (the encoder-
    twin pytest). 12/16-bit, arithmetic and lossless streams return
    header-only metadata — the documented contract (tested) — and ANY
    entropy-decode failure demotes to header-only rather than
    erroring, like the PNG path."""
    if b[:2] != b"\xff\xd8" or len(b) < 4:
        return None
    pos, n = 2, len(b)
    sof = None
    sof_marker = None
    qt = {}
    huff_dc = {}
    huff_ac = {}
    restart_interval = 0
    scan = None
    prog_scans = []
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None  # lost marker sync: not a JPEG stream
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers, no payload
        if marker == 0xD9:
            break  # EOI
        if marker == 0xDA and sof is None:
            return None  # scan before SOF
        if pos + 2 > n:
            return None
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return None
        seg = b[pos + 2 : pos + seglen]
        if marker in _JPEG_SOF:
            if seglen < 8:
                return None
            precision = seg[0]
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
                return None
            if ncomp not in (1, 3, 4) or precision not in (8, 12, 16):
                return None
            comps = []
            if len(seg) >= 6 + 3 * ncomp:
                for i in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (precision, height, width, ncomp, comps)
            sof_marker = marker
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                step = 2 if pq else 1
                if i + 64 * step > len(seg):
                    break
                vals = [
                    int.from_bytes(seg[i + j * step : i + (j + 1) * step],
                                   "big")
                    for j in range(64)
                ]
                # store dezigzagged-by-index: q[k] pairs with zigzag k
                qt[tq] = vals
                i += 64 * step
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                if i + 17 + total > len(seg):
                    break
                symbols = list(seg[i + 17 : i + 17 + total])
                table = _jpeg_huff_table(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + total
        elif marker == 0xDD and len(seg) >= 2:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0] if seg else 0
            if len(seg) >= 1 + 2 * ns:
                scan_map = {}
                scomps = []
                for i in range(ns):
                    cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                    scan_map[cid] = (tabs >> 4, tabs & 0x0F)
                    scomps.append((cid, tabs >> 4, tabs & 0x0F))
                scan = (scan_map, pos + seglen)
                if sof_marker == 0xC2 and len(seg) >= 4 + 2 * ns:
                    # progressive: record this scan (with Huffman-table
                    # SNAPSHOTS — DHT may be redefined between scans)
                    # and keep walking past its entropy data
                    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                    ahal = seg[3 + 2 * ns]
                    segments, end = _jpeg_entropy_segments(
                        b, pos + seglen
                    )
                    prog_scans.append((
                        scomps, ss, se, ahal >> 4, ahal & 0x0F,
                        dict(huff_dc), dict(huff_ac), segments,
                        restart_interval,
                    ))
                    pos = end
                    continue
            break  # baseline: single scan
        pos += seglen
    if sof is None:
        return None
    precision, height, width, ncomp, comps = sof
    meta = {
        "codec": "jpeg",
        "width": width,
        "height": height,
        "channels": ncomp,
        "bit_depth": precision,
    }
    decodable = (
        sof_marker == 0xC0
        and precision == 8
        and ncomp in (1, 3)
        and scan is not None
        and len(comps) == ncomp
        # JPEG A.2: a ONE-component scan is non-interleaved — one data
        # unit per MCU in raster order — regardless of the SOF sampling
        # factors. The decoder below assumes the interleaved h×v-per-MCU
        # layout, so grayscale with factors >1 must stay header-only
        # rather than risk decoding garbage without an error.
        and (ncomp != 1 or comps[0][1:3] == (1, 1))
    )
    prog_decodable = (
        sof_marker == 0xC2
        and precision == 8
        and ncomp in (1, 3)
        and prog_scans
        and len(comps) == ncomp
    )
    if decodable:
        try:
            scan_map, data_pos = scan
            for cid, _h, _v, tq in comps:
                if tq not in qt or cid not in scan_map:
                    return meta
                dc_id, ac_id = scan_map[cid]
                if dc_id not in huff_dc or ac_id not in huff_ac:
                    return meta
            segments, _end = _jpeg_entropy_segments(b, data_pos)
            planes = _jpeg_decode_baseline(
                comps, qt, huff_dc, huff_ac, scan_map, segments,
                width, height, restart_interval,
            )
        except (ValueError, IndexError, KeyError):
            return meta  # corrupt entropy data: header-only, like PNG
    elif prog_decodable:
        try:
            for cid, _h, _v, tq in comps:
                if tq not in qt:
                    return meta
            planes = _jpeg_decode_progressive(
                comps, qt, prog_scans, width, height
            )
        except (ValueError, IndexError, KeyError):
            return meta  # malformed scan structure: header-only
    else:
        return meta
    maxh = max(h for _c, h, _v, _q in comps)
    maxv = max(v for _c, _h, v, _q in comps)
    out = bytearray()
    if ncomp == 1:
        plane, _pw, _ph = planes[comps[0][0]]
        for y in range(height):
            out.extend(plane[y][:width])
        meta["row_bytes"] = width
    else:
        (py, _, _), (pcb, _, _), (pcr, _, _) = (
            planes[comps[0][0]], planes[comps[1][0]], planes[comps[2][0]]
        )
        hy, vy = comps[0][1], comps[0][2]
        hb, vb = comps[1][1], comps[1][2]
        hr, vr = comps[2][1], comps[2][2]
        for y in range(height):
            for x in range(width):
                Y = py[y * vy // maxv][x * hy // maxh]
                Cb = pcb[y * vb // maxv][x * hb // maxh] - 128
                Cr = pcr[y * vr // maxv][x * hr // maxh] - 128
                r = int(round(Y + 1.402 * Cr))
                g = int(round(Y - 0.344136 * Cb - 0.714136 * Cr))
                bb = int(round(Y + 1.772 * Cb))
                out.append(0 if r < 0 else (255 if r > 255 else r))
                out.append(0 if g < 0 else (255 if g > 255 else g))
                out.append(0 if bb < 0 else (255 if bb > 255 else bb))
        meta["row_bytes"] = width * 3
    meta["pixels"] = bytes(out)
    meta["top_down"] = True
    return meta


def _riff_children(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for RIFF chunks in a range."""
    pos = start
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        csize = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + csize > end:
            return  # truncated child: stop, caller decides validity
        yield cid, body, csize
        pos = body + csize + (csize & 1)  # word alignment


def parse_avi(b: bytes) -> Optional[dict]:
    """RIFF-AVI container: REAL frame boundaries from the ``movi`` list
    (``00db``/``00dc`` chunks) plus dimensions/timing from ``avih`` —
    the container walk a video pipeline needs for frame sampling.
    Frame PIXEL decode stays format-dependent: uncompressed DIB streams
    (biCompression=0) are raw bottom-up rows; compressed codecs need
    libraries this environment doesn't ship, so their frames surface as
    opaque bytes with exact boundaries."""
    if len(b) < 24 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    riff_size = int.from_bytes(b[4:8], "little")
    end = min(len(b), 8 + riff_size)
    width = height = None
    usec_per_frame = total_frames_hdr = None
    compression = None
    bpp = None
    video_stream = None  # 0-based strl index of the first 'vids' stream
    frames = []

    def walk_movi(start, stop):
        # frame chunks may be wrapped in 'rec ' grouping LISTs (the
        # interleave unit real muxers emit) — recurse into those; only
        # collect chunks belonging to the parsed video stream, so an
        # audio '01wb' (or a second video stream) never pollutes the
        # frame timeline the strf metadata describes
        for c2, b2, s2 in _riff_children(b, start, stop):
            if c2 == b"LIST" and s2 >= 4 and b[b2 : b2 + 4] == b"rec ":
                walk_movi(b2 + 4, b2 + s2)
            elif c2[2:4] in (b"db", b"dc") and c2[:2].isdigit():
                if video_stream is not None and int(c2[:2]) == video_stream:
                    frames.append((b2, s2))

    for cid, body, csize in _riff_children(b, 12, end):
        if cid != b"LIST" or csize < 4:
            continue
        form = b[body : body + 4]
        if form == b"hdrl":
            stream_idx = -1
            for c2, b2, s2 in _riff_children(b, body + 4, body + csize):
                if c2 == b"avih" and s2 >= 40:
                    usec_per_frame = int.from_bytes(b[b2 : b2 + 4], "little")
                    total_frames_hdr = int.from_bytes(b[b2 + 16 : b2 + 20], "little")
                    width = int.from_bytes(b[b2 + 32 : b2 + 36], "little")
                    height = int.from_bytes(b[b2 + 36 : b2 + 40], "little")
                elif c2 == b"LIST" and s2 >= 4 and b[b2 : b2 + 4] == b"strl":
                    stream_idx += 1
                    fcc_type = None
                    for c3, b3, s3 in _riff_children(b, b2 + 4, b2 + s2):
                        if c3 == b"strh" and s3 >= 4:
                            fcc_type = b[b3 : b3 + 4]
                        elif (
                            c3 == b"strf"
                            and s3 >= 40
                            and fcc_type == b"vids"
                            and video_stream is None
                        ):
                            # BITMAPINFOHEADER of the first VIDEO stream
                            # only — an audio strl's strf is a
                            # WAVEFORMAT(EXTENSIBLE), not a DIB header
                            video_stream = stream_idx
                            bpp = int.from_bytes(b[b3 + 14 : b3 + 16], "little")
                            compression = int.from_bytes(
                                b[b3 + 16 : b3 + 20], "little"
                            )
        elif form == b"movi":
            walk_movi(body + 4, body + csize)
    if width is None or not frames:
        return None
    if not (0 < width <= 1 << 16 and 0 < height <= 1 << 16):
        return None
    meta = {
        "codec": "avi",
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
        "compression": compression,
        "bits_per_pixel": bpp,
    }
    if usec_per_frame:
        meta["duration_ms"] = (len(frames) * usec_per_frame) // 1000
    if compression == 0 and bpp in (8, 24, 32):
        meta["channels"] = (bpp or 24) // 8
    return meta


def sniff_media(b: bytes) -> Optional[dict]:
    """Dispatch on magic bytes; None when no strict parser accepts."""
    if b[:2] == b"BM":
        return parse_bmp(b)
    if b[:2] in (b"P6", b"P5"):
        return parse_ppm(b)
    if b[:4] == b"RIFF":
        if b[8:12] == b"AVI ":
            return parse_avi(b)
        return parse_wav(b)
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        return parse_png(b)
    if b[:2] == b"\xff\xd8":
        return parse_jpeg(b)
    return None
