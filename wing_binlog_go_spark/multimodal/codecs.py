"""Pure-Python media codecs for the multimodal column pipeline.

The reference ships no media handling at all; the driver north star
("multimodal columns" as a first-class training-data operator) needs at
least one REAL decode path so the phash/feature plumbing is exercised on
actual pixels and samples, not only on deterministic fakes. PIL/ffmpeg/
soundfile are not installed in this environment, so these decoders cover
the two formats parseable with nothing but ``struct`` + numpy:

- BMP, uncompressed BI_RGB, 24- or 32-bit, bottom-up or top-down — the
  standard interchange form every image tool can emit;
- PNG, 8- and 16-bit, plain and Adam7-interlaced, all five color types
  (gray, RGB, palette, gray+alpha, RGBA) — zlib is stdlib, so the
  DEFLATE stream and the five scanline filters decode without any
  external imaging library;
- JPEG, baseline (SOF0/1) AND progressive (SOF2: DC/AC first +
  refinement passes with EOB runs), any h×v chroma sampling, restart
  markers — canonical huffman + 8×8 IDCT in a few hundred lines of
  numpy; verified against real camera JPEGs shipped with Spark's MLlib
  test data (and a known-content white test card), not only this
  module's own encoder;
- GIF, 87a/89a incl. animation (the video modality), interlaced frames
  and all three disposal methods;
- WebP lossless (VP8L), all four transforms, color cache, LZ77 and
  meta prefix codes, plus animated WebP (ANMF chapters) with
  blending/disposal compositing;
- TIFF, baseline 6.0 stripped layout (uncompressed, PackBits, LZW with
  the horizontal-differencing predictor, and deflate; both byte
  orders, gray/RGB(A) incl. white-is-zero) — the scanned-document
  staple;
- WAV, RIFF integer PCM 8/16/24-bit and IEEE float 32/64-bit, any
  channel count (mixed down to mono);
- FLAC (RFC 9639): CONSTANT/VERBATIM/FIXED/LPC subframes, partitioned
  Rice residuals, all four stereo decorrelation modes, CRC-8/16
  checked — lossless compressed audio without soundfile.

Everything here runs INSIDE Arrow-batched ``mapInPandas`` workers (see
``multimodal.image_features``): per-row Python cost is amortized over
Arrow batch transfer, and the numpy work (row destriding, DCT) is
vectorized. Formats needing codec libraries this environment lacks
(lossy WebP/MP3/MP4) still raise NotImplementedError at the dispatch
in ``multimodal.decode_image`` / ``decode_audio`` — a real deployment
drops in PIL/ffmpeg behind the same seam.

Measured single-core decode rates (this container, after the r5
flat-peek-table rework of every entropy decoder): PNG sub-ms per image
(fully numpy-vectorized unfilter fast paths), JPEG ~0.21 s profiled /
~1 Mpx/s wall for a 300×300 photo (2.5× over the bit-loop form), FLAC
~11.7× realtime (table CRCs + per-byte unary), VP8L ~0.44 Mpx/s on
incompressible content (5.6×). The remaining per-symbol loops are the
stated pure-Python tradeoff: corpus throughput comes from partition/
executor parallelism, and swapping PIL/ffmpeg in at the dispatch seam
is the per-core speedup path, not a plumbing change.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _bounded_inflate(data: bytes, max_out: int) -> bytes:
    """zlib inflate capped at ``max_out`` bytes: a decoder that knows
    its output size from the header must never let a hostile stream
    expand past it (decompression bomb → executor OOM is the wrong
    failure mode for crawl bytes)."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, max_out)
        # bomb check BEFORE flush(): flush ignores the cap and would
        # realize the oversized buffer we are trying to avoid
        if not d.eof and (d.unconsumed_tail or len(out) == max_out):
            raise ValueError(
                f"compressed stream expands past the {max_out}-byte bound "
                "declared by the header (decompression bomb?)"
            )
        out += d.flush()
    except zlib.error as exc:
        raise ValueError(f"bad DEFLATE stream: {exc}") from exc
    if len(out) > max_out:
        raise ValueError(
            f"compressed stream expands past the {max_out}-byte bound "
            "declared by the header (decompression bomb?)"
        )
    return out

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24/32-bit BI_RGB or 8-bit paletted (plain / RLE8) BMP
    → H×W×3 uint8 (RGB).

    Handles the standard quirks: 4-byte row padding, bottom-up row order
    (positive height) vs top-down (negative height), BGR channel order,
    and pixel-array offset taken from the file header (palettes or gap
    bytes between header and pixels are skipped, not assumed absent).
    RLE8 (compression 1) implements the full escape set: end-of-line,
    end-of-bitmap, delta moves, and word-padded literal runs.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if width <= 0 or height == 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if compression == 1 or (compression == 0 and bpp == 8):
        return _decode_bmp_8bit(
            payload, pixel_off, header_size, width, height, bpp, compression
        )
    if compression != 0:
        raise ValueError(
            f"only BI_RGB/BI_RLE8 supported, got compression {compression}"
        )
    if bpp not in (24, 32):
        raise ValueError(f"only 8/24/32-bit BMP supported, got {bpp}")
    top_down = height < 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=pixel_off)
    rows = raw.reshape(height, stride)[:, : width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]  # bottom-up storage → natural top-down order
    # BGR(A) → RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def _decode_bmp_8bit(
    payload: bytes, pixel_off: int, header_size: int,
    width: int, height: int, bpp: int, compression: int,
) -> np.ndarray:
    """8-bit paletted BMP, plain (compression 0) or RLE8 (1)."""
    if bpp != 8:
        raise ValueError(f"RLE8 BMP must be 8-bit, got {bpp}")
    top_down = height < 0
    height = abs(height)
    n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
    pal_off = 14 + header_size
    if pal_off + n_colors * 4 > len(payload):
        raise ValueError("truncated BMP palette")
    pal = np.frombuffer(payload, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
    palette = pal[:, 2::-1]  # BGRX → RGB
    idx = np.zeros((height, width), dtype=np.uint8)
    if compression == 0:
        stride = (width + 3) & ~3
        need = pixel_off + stride * height
        if len(payload) < need:
            raise ValueError("truncated BMP pixel data")
        raw = np.frombuffer(payload, np.uint8, stride * height, pixel_off)
        idx = raw.reshape(height, stride)[:, :width].copy()
    else:  # RLE8: stored bottom-up regardless of sign convention
        x = y = 0
        p = pixel_off
        n = len(payload)
        while p + 1 < n:
            cnt, val = payload[p], payload[p + 1]
            p += 2
            if cnt:  # encoded run
                if y >= height:
                    raise ValueError("RLE8 run outside bitmap")
                end = min(x + cnt, width)
                idx[y, x:end] = val
                x = end
            elif val == 0:  # end of line
                x, y = 0, y + 1
            elif val == 1:  # end of bitmap
                break
            elif val == 2:  # delta
                if p + 1 >= n:
                    raise ValueError("truncated RLE8 delta")
                x += payload[p]
                y += payload[p + 1]
                p += 2
            else:  # literal run of `val` indices, word-padded
                if p + val > n or y >= height:
                    raise ValueError("truncated RLE8 literal run")
                end = min(x + val, width)
                lit = np.frombuffer(payload, np.uint8, val, p)
                idx[y, x:end] = lit[: end - x]
                x = end
                p += val + (val & 1)
        idx = idx[::-1]  # RLE8 bitmaps are bottom-up
        top_down = True  # already flipped
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("BMP palette index out of range")
    out = palette[idx]
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode H×W×3 uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes.

    Round-trip partner of :func:`decode_bmp`; used by tests to plant
    real pixel data and by pipelines that need to materialize decoded
    frames back into the binary payload column.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    height, width = img.shape[:2]
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = img[::-1, :, ::-1].reshape(height, width * 3)  # RGB→BGR, flip
    pixels = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" + "IiiHHIIiiII",
        b"BM", 54 + len(pixels), 0, 0, 54,
        40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


def grayscale(img: np.ndarray) -> np.ndarray:
    """H×W×3 RGB → H×W float64 luma (ITU-R BT.601 weights)."""
    return img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114


def resize_plane(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact fractional-box area-average resample of one channel to
    out_h×out_w.

    Each output cell is the mean of the (possibly fractional) source
    rectangle it covers, computed from an integral image sampled with
    bilinear interpolation — which is EXACT for a piecewise-constant
    pixel grid. Integer splits (np.array_split-style) are not
    scale-invariant at non-divisible sizes: 48 rows → 32 groups makes
    blocks of 2,2,…,1,1 while 96 rows → uniform 3s, warping the
    sampling grid and breaking phash stability under 2× upscale. The
    fractional box covers proportionally identical regions at every
    scale, and averaging keeps per-pixel noise robustness. (Upscale is
    box-overlap interpolation under the same formula — every output
    cell still averages exactly the region it covers.)"""
    plane = np.asarray(plane, dtype=np.float64)
    h, w = plane.shape
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = np.cumsum(np.cumsum(plane, axis=0), axis=1)
    ys = np.linspace(0.0, h, out_h + 1)
    xs = np.linspace(0.0, w, out_w + 1)
    y0 = np.minimum(ys.astype(int), h - 1) if h > 0 else ys.astype(int)
    x0 = np.minimum(xs.astype(int), w - 1) if w > 0 else xs.astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = integral[np.ix_(y0, x0)]
    b = integral[np.ix_(y0, x0 + 1)]
    c = integral[np.ix_(y0 + 1, x0)]
    d = integral[np.ix_(y0 + 1, x0 + 1)]
    corner = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx
    sums = corner[1:, 1:] - corner[:-1, 1:] - corner[1:, :-1] + corner[:-1, :-1]
    return sums / ((h / out_h) * (w / out_w))


def _area_resize(gray: np.ndarray, size: int) -> np.ndarray:
    """size×size square form of ``resize_plane`` (the phash grid)."""
    return resize_plane(gray, size, size)


def resize_rgb(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """H×W×3 uint8 RGB → out_h×out_w×3 uint8, per-channel exact
    area-average resample (the same sampler phash trusts for its
    scale invariance), rounded half-away-from-zero to uint8."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"resize_rgb: bad target {out_h}x{out_w}")
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"resize_rgb: expected HxWx3, got {img.shape}")
    out = np.stack(
        [resize_plane(img[:, :, c], out_h, out_w) for c in range(3)], axis=2
    )
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the transform JPEG/pHash build on)."""
    k = np.arange(n).reshape(-1, 1)
    x = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(gray: np.ndarray) -> int:
    """Classic 64-bit perceptual hash: area-resize to 32×32, 2-D DCT,
    keep the 8×8 low-frequency block, threshold at the median of the 63
    AC coefficients. Robust to resize/re-encode/small noise; signed
    two's-complement so it fits Spark's LongType exactly like the fake
    decoder's hash."""
    small = _area_resize(np.asarray(gray, dtype=np.float64), 32)
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC from the threshold
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters → height×stride recon bytes.

    Each scanline is prefixed by one filter-type byte; reconstruction is
    sequential top-to-bottom (Up/Average/Paeth read the prior row) and,
    for Sub/Average/Paeth, left-to-right within the row. None/Up rows
    are vectorized whole-row; Sub is a per-byte-lane cumulative sum
    (mod-256 cumsum in uint8 is exactly the Sub recurrence); Average and
    Paeth keep the per-pixel loop the spec's data dependence forces —
    acceptable because payloads decode inside Arrow-batched workers and
    most encoders emit None/Sub/Up for the bulk of rows.
    """
    rows = raw.reshape(height, stride + 1)
    recon = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype, line = int(rows[y, 0]), rows[y, 1:].copy()
        if ftype == 0:  # None
            out = line
        elif ftype == 1:  # Sub: out[x] = line[x] + out[x-bpp]
            out = line
            for lane in range(bpp):
                np.cumsum(out[lane::bpp], dtype=np.uint8, out=out[lane::bpp])
        elif ftype == 2:  # Up
            out = line + prior
        elif ftype == 3:  # Average
            out = line
            for x in range(stride):
                left = int(out[x - bpp]) if x >= bpp else 0
                out[x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            out = line
            for x in range(stride):
                a = int(out[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
        recon[y] = out
        prior = recon[y]
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8- or 16-bit PNG (progressive Adam7 included) → H×W×3
    RGB (16-bit samples keep their high byte — the standard 8-bit
    rendering).

    Pure Python + stdlib zlib: chunk walk (IHDR/PLTE/IDAT/IEND with CRC
    checks), DEFLATE inflate, scanline unfilter (per Adam7 pass when
    interlaced; filtering is byte-oriented, so 16-bit rows reuse the
    same unfilter with doubled bpp exactly as the spec defines),
    palette expansion, and alpha drop (features/phash operate on
    color; compositing policy belongs to callers). Sub-byte depths
    (1/2/4-bit palette) raise toward the PIL seam.
    """
    if len(payload) < 8 or payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos, ihdr, palette, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16):
        raise ValueError(f"only 8/16-bit PNG supported, got depth {depth}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("16-bit palette PNG is not legal")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    ch = _PNG_CHANNELS[color]
    bpp = ch * (depth // 8)  # filtering is byte-oriented (spec §6.2)
    stride = width * bpp
    # decompression-bomb cap: the exact output size is known from IHDR
    # (interlaced images pay one filter byte per PASS-row), so a
    # hostile IDAT cannot expand past it — crawl corpora contain
    # hostile bytes, and an executor OOM is the wrong failure mode
    if interlace == 1:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expected += ph * (pw * bpp + 1)
    else:
        expected = height * (stride + 1)
    raw = _bounded_inflate(b"".join(idat), expected)
    raw = np.frombuffer(raw, dtype=np.uint8)
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full grid by each pass's (offset, step)
        px = np.zeros((height, width, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            need = ph * (pstride + 1)
            if pos + need > raw.size:
                raise ValueError("truncated PNG interlaced data")
            sub = _png_unfilter(raw[pos : pos + need], ph, pstride, bpp)
            pos += need
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        if pos != raw.size:
            raise ValueError("PNG interlaced data size mismatch")
    else:
        if raw.size != height * (stride + 1):
            raise ValueError(
                f"PNG pixel data size mismatch: {raw.size} != {height * (stride + 1)}"
            )
        px = _png_unfilter(raw, height, stride, bpp).reshape(height, width, bpp)
    if depth == 16:
        # big-endian samples: the high byte IS the 8-bit rendering
        px = px.reshape(height, width, ch, 2)[..., 0]
    if color == 3:  # palette → RGB lookup
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        if int(px.max()) >= len(palette):
            raise ValueError("palette index out of range")
        return np.ascontiguousarray(palette[px[:, :, 0]])
    if color == 0:  # gray → replicate
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if color == 4:  # gray+alpha → replicate luma, drop alpha
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA (alpha dropped)


def encode_png(
    img: np.ndarray, *, sub_filter: bool = False, interlace: bool = False
) -> bytes:
    """Encode H×W×3 uint8 RGB → 8-bit RGB PNG bytes.

    Round-trip partner of :func:`decode_png`. ``sub_filter=True`` emits
    filter-type-1 scanlines instead of 0 so tests exercise the unfilter
    path on encoder-realistic data; ``interlace=True`` writes the seven
    Adam7 passes (filter 0) so the de-interlacing path round-trips.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    height, width = img.shape[:2]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph <= 0 or pw <= 0:
                continue
            parts.append(
                np.concatenate(
                    [np.zeros((ph, 1), dtype=np.uint8), sub.reshape(ph, pw * 3)],
                    axis=1,
                ).reshape(-1)
            )
        body = np.concatenate(parts)
    elif sub_filter:
        flat = img.reshape(height, width * 3).astype(np.int16)
        delta = flat.copy()
        delta[:, 3:] = (flat[:, 3:] - flat[:, :-3]) & 0xFF
        body = np.concatenate(
            [np.full((height, 1), 1, dtype=np.uint8), delta.astype(np.uint8)], axis=1
        )
    else:
        body = np.concatenate(
            [np.zeros((height, 1), dtype=np.uint8), img.reshape(height, width * 3)],
            axis=1,
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG (baseline DCT — the dominant training-corpus image format)
# ---------------------------------------------------------------------------

_DCT8 = _dct_matrix(8)

# JPEG zigzag scan order: zigzag index -> (row, col) linear index
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Table K.1/K.2 quantization tables (quality-50 reference)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _huff_decode_table(bits: list[int], vals: bytes) -> tuple:
    """DHT (counts per code length 1..16, symbols) → flat peek table
    ``(lut, max_len)`` via the canonical-code construction of ITU-T
    T.81 Annex C: one ``max_len``-bit peek resolves any symbol with a
    single list index (vs a bit-at-a-time tree walk — measured ~3× on
    the whole-scan decode)."""
    pairs, code, k = [], 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            pairs.append((vals[k], ln, code))
            k += 1
            code += 1
        code <<= 1
    if not pairs:
        return ([None], 1)
    max_len = max(ln for _, ln, _ in pairs)
    lut: list = [None] * (1 << max_len)
    for sym, ln, c in pairs:
        start = c << (max_len - ln)
        entry = (sym, ln)
        for i in range(start, start + (1 << (max_len - ln))):
            lut[i] = entry
    return (lut, max_len)


class _JpegBits:
    """MSB-first bit reader over an unstuffed entropy segment.

    ``start`` reads in place from an offset into a larger buffer —
    FLAC decodes many frames from one payload and slicing the
    remaining stream per frame would copy O(n²) bytes overall.
    """

    def __init__(self, data: bytes, start: int = 0):
        self.d, self.pos, self.bit = data, start, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("truncated JPEG entropy data")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        d, pos, bit = self.d, self.pos, self.bit
        if pos * 8 + bit + n > len(d) * 8:
            raise ValueError("truncated JPEG entropy data")
        v = 0
        while n > 0:  # per-byte, not per-bit
            avail = 8 - bit
            take = avail if avail < n else n
            v = (v << take) | ((d[pos] >> (avail - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                bit, pos = 0, pos + 1
        self.pos, self.bit = pos, bit
        return v

    def read_symbol(self, table: tuple) -> int:
        """One flat-table lookup per symbol: peek up to ``max_len``
        bits from a 3-byte window (zero-padded at EOF; consumption is
        bounds-checked, so truncation still raises)."""
        d, pos, bit = self.d, self.pos, self.bit
        nd = len(d)
        if pos >= nd:
            raise ValueError("truncated JPEG entropy data")
        lut, max_len = table
        w = (
            (d[pos] << 16)
            | ((d[pos + 1] if pos + 1 < nd else 0) << 8)
            | (d[pos + 2] if pos + 2 < nd else 0)
        )
        entry = lut[(w >> (24 - bit - max_len)) & ((1 << max_len) - 1)]
        if entry is None:
            raise ValueError("invalid JPEG huffman code")
        sym, ln = entry
        if pos * 8 + bit + ln > nd * 8:
            raise ValueError("truncated JPEG entropy data")
        bit += ln
        self.pos, self.bit = pos + (bit >> 3), bit & 7
        return sym


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_entropy_segments(payload: bytes, start: int):
    """Unstuff the entropy-coded bytes from ``start``, splitting at
    restart markers; returns (segments, index-of-terminating-marker)."""
    segments, cur = [], bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JFIF JPEG →
    H×W×3 uint8 RGB.

    Pure Python + numpy: marker walk (DQT/DHT/SOF/DRI/SOS), canonical
    huffman decode, a shared zigzag coefficient store filled by one
    (baseline) or many (progressive: DC/AC first + refinement passes
    with EOBRUN) scans, then dequantize, 8×8 IDCT via the orthonormal
    DCT matrix, MCU assembly for any h×v sampling (4:2:0/4:2:2/4:4:4),
    restart markers, chroma upsample, and JFIF YCbCr→RGB. Hierarchical,
    arithmetic-coded, lossless, and 12-bit variants raise — a real
    deployment swaps PIL in at the same dispatch seam.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    sof = None
    progressive = False
    restart = 0
    coefs: dict[int, np.ndarray] = {}
    saw_scan = False
    i = 2
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, i + 2)[0]
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 15
                p += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    qt[tid] = np.frombuffer(body, ">u2", 64, p).astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                huff[(tc, th)] = _huff_decode_table(bits, body[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported, got {prec}")
            progressive = marker == 0xC2
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, tq))
            sof = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for cid, ch, cv, _tq in comps:
                coefs[cid] = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG "
                "supported without PIL"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps, scan_tables = [], {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append(cs)
                scan_tables[cs] = (tables >> 4, tables & 15)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            segments, i = _jpeg_entropy_segments(payload, i + 2 + ln)
            if progressive:
                _jpeg_progressive_scan(
                    coefs, segments, sof, scan_comps, scan_tables, huff,
                    restart, ss, se, ah, al,
                )
            else:
                _jpeg_sequential_scan(
                    coefs, segments, sof, scan_comps, scan_tables, huff, restart
                )
            saw_scan = True
            continue
        i += 2 + ln
    if not saw_scan:
        raise ValueError("JPEG with no scan data")
    return _jpeg_finish(coefs, qt, sof)


def _scan_geometry(sof, scan_comps):
    """MCU/block geometry for a scan: interleaved scans step MCUs over
    all scan components; single-component scans step that component's
    TRUE block grid in raster order (T.81 A.2.2 — no MCU padding)."""
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    byid = {c[0]: c for c in comps}
    if len(scan_comps) > 1:
        units = mcus_x * mcus_y
        return units, mcus_x, byid, None
    cid = scan_comps[0]
    _, ch, cv, _tq = byid[cid]
    cw = -(-w * ch // hmax)  # component sample dims (T.81 A.1.1)
    chh = -(-h * cv // vmax)
    bw, bh = -(-cw // 8), -(-chh // 8)
    return bw * bh, bw, byid, (bw, bh)


def _jpeg_sequential_scan(
    coefs, segments, sof, scan_comps, scan_tables, huff, restart
) -> None:
    """Full-band huffman scan (baseline or multi-scan sequential) into
    the zigzag coefficient store."""
    units, row_w, byid, single = _scan_geometry(sof, scan_comps)
    pred = {cid: 0 for cid in scan_comps}
    seg_idx = 0
    reader = _JpegBits(segments[0])
    per_seg = restart if restart else units
    for unit in range(units):
        if restart and unit and unit % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _JpegBits(segments[seg_idx])
            pred = {cid: 0 for cid in scan_comps}
        uy, ux = divmod(unit, row_w)
        for cid in scan_comps:
            _, ch, cv, _tq = byid[cid]
            dc_t = huff.get((0, scan_tables[cid][0]))
            ac_t = huff.get((1, scan_tables[cid][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("JPEG scan references missing huffman table")
            blocks = [(0, 0)] if single else [
                (by, bx) for by in range(cv) for bx in range(ch)
            ]
            for by, bx in blocks:
                if single:
                    row, col = uy, ux
                else:
                    row, col = uy * cv + by, ux * ch + bx
                zz = coefs[cid][row, col]
                t = reader.read_symbol(dc_t)
                diff = _extend(reader.read_bits(t), t) if t else 0
                pred[cid] += diff
                zz[0] = pred[cid]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(ac_t)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    zz[k] = _extend(reader.read_bits(s), s)
                    k += 1


def _jpeg_progressive_scan(
    coefs, segments, sof, scan_comps, scan_tables, huff, restart, ss, se, ah, al
) -> None:
    """One progressive scan (T.81 G.1.2): DC first/refinement (may be
    interleaved), AC first/refinement (always single-component), with
    EOB-run tracking and restart resets."""
    units, row_w, byid, single = _scan_geometry(sof, scan_comps)
    is_dc = ss == 0
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    pred = {cid: 0 for cid in scan_comps}
    eobrun = 0
    seg_idx = 0
    reader = _JpegBits(segments[0])
    per_seg = restart if restart else units
    p1 = 1 << al
    m1 = -1 << al
    for unit in range(units):
        if restart and unit and unit % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _JpegBits(segments[seg_idx])
            pred = {cid: 0 for cid in scan_comps}
            eobrun = 0
        uy, ux = divmod(unit, row_w)
        for cid in scan_comps:
            _, ch, cv, _tq = byid[cid]
            blocks = [(0, 0)] if single else [
                (by, bx) for by in range(cv) for bx in range(ch)
            ]
            for by, bx in blocks:
                if single:
                    row, col = uy, ux
                else:
                    row, col = uy * cv + by, ux * ch + bx
                zz = coefs[cid][row, col]
                if is_dc and ah == 0:  # DC first
                    dc_t = huff.get((0, scan_tables[cid][0]))
                    if dc_t is None:
                        raise ValueError("missing DC huffman table")
                    t = reader.read_symbol(dc_t)
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    pred[cid] += diff
                    zz[0] = pred[cid] << al
                elif is_dc:  # DC refinement: one bit per block
                    if reader.read_bit():
                        zz[0] |= p1
                elif ah == 0:  # AC first
                    ac_t = huff.get((1, scan_tables[cid][1]))
                    if ac_t is None:
                        raise ValueError("missing AC huffman table")
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.read_symbol(ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
                else:  # AC refinement (T.81 G.1.2.3)
                    ac_t = huff.get((1, scan_tables[cid][1]))
                    if ac_t is None:
                        raise ValueError("missing AC huffman table")
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = reader.read_symbol(ac_t)
                            r, s = rs >> 4, rs & 15
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    break
                            else:
                                newval = p1 if reader.read_bit() else m1
                            while k <= se:
                                if zz[k]:
                                    if reader.read_bit() and not (zz[k] & p1):
                                        zz[k] += p1 if zz[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                zz[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if zz[k]:
                                if reader.read_bit() and not (zz[k] & p1):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            k += 1
                        eobrun -= 1


def _jpeg_finish(coefs, qt, sof) -> np.ndarray:
    """Zigzag coefficient store → dequantize → IDCT → assemble → RGB."""
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for cid, ch, cv, tq in comps:
        grid = coefs[cid]
        bv, bh = grid.shape[:2]
        q = qt[tq].astype(np.float64)
        # dequantize every block at once, scatter zigzag → natural order
        deq = grid.astype(np.float64) * q[None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq
        blocks = nat.reshape(bv, bh, 8, 8)
        # batched IDCT: contract both 8-dims with the DCT matrix
        px = np.einsum("ij,abjk,kl->abil", _DCT8.T, blocks, _DCT8) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
        p = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:  # grayscale
        g = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _huff_encode_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Fixed-length canonical huffman table over ``symbols``: every
    symbol gets length L = ceil(log2(n+1)) (the +1 keeps the all-ones
    code unused, as T.81 requires). Spec-valid and trivially in sync
    between DHT segment and encoder — compression-optimal tables are a
    quality knob this fixture encoder doesn't need."""
    n = len(symbols)
    L = max(2, n.bit_length())
    bits = [0] * 16
    enc = {}
    if n <= 255:
        bits[L - 1] = n
        for code, sym in enumerate(symbols):
            enc[sym] = (L, code)
    else:
        # DHT counts are single bytes: overflow symbols take length L+1
        # (canonical continuation: codes restart at first_count << 1)
        first = 255
        bits[L - 1] = first
        bits[L] = n - first
        for code, sym in enumerate(symbols[:first]):
            enc[sym] = (L, code)
        base = first << 1
        for off, sym in enumerate(symbols[first:]):
            enc[sym] = (L + 1, base + off)
    return bits, symbols, enc


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per convention


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Encode H×W×3 uint8 RGB → baseline JFIF JPEG bytes.

    Round-trip partner of :func:`decode_jpeg` (lossy: tests bound PSNR,
    not equality). ``subsample=True`` writes 4:2:0 chroma (2×2 mean),
    exercising the decoder's MCU sampling geometry on synthetic data in
    addition to the real-photo fixtures.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    h, w = img.shape[:2]
    scale = (5000 / quality if quality < 50 else 200 - 2 * quality) / 100.0
    qts = []
    for base in (_QT_LUMA, _QT_CHROMA):
        q = np.clip(np.round(base * scale), 1, 255).astype(np.int32)
        qts.append(q)
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    if subsample:
        hmax = vmax = 2
        samps = [(2, 2), (1, 1), (1, 1)]

        def down(p):
            hh, ww = p.shape
            pad = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
            return (pad[0::2, 0::2] + pad[1::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0

        chans = [y, down(cb), down(cr)]
    else:
        hmax = vmax = 1
        samps = [(1, 1), (1, 1), (1, 1)]
        chans = [y, cb, cr]

    dc_syms = list(range(12))
    ac_syms = list(range(256))
    dc_bits, dc_vals, dc_enc = _huff_encode_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _huff_encode_table(ac_syms)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        zz = np.empty(64, dtype=np.uint8)
        zz[np.arange(64)] = q.reshape(-1)[_ZIGZAG]
        out += seg(0xDB, bytes([tid]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c, (sh, sv) in enumerate(samps):
        sof += bytes([c + 1, (sh << 4) | sv, 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + b"".join(bytes([c + 1, 0x00]) for c in range(3)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    writer = _JpegBitWriter()
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    pred = [0, 0, 0]

    def encode_block(plane, y0, x0, qtab, ci):
        hh, ww = plane.shape
        blk = np.zeros((8, 8))
        ys, xs = min(8, hh - y0), min(8, ww - x0)
        if ys <= 0 or xs <= 0:
            patch = np.full((8, 8), plane[min(y0, hh - 1), min(x0, ww - 1)])
        else:
            patch = plane[y0 : y0 + 8, x0 : x0 + 8]
            patch = np.pad(patch, ((0, 8 - ys), (0, 8 - xs)), mode="edge")
        blk = patch - 128.0
        coef = _DCT8 @ blk @ _DCT8.T
        zz = np.round(coef.reshape(-1)[_ZIGZAG] / qtab.reshape(-1)[_ZIGZAG]).astype(int)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = abs(diff).bit_length()
        ln, code = dc_enc[t]
        writer.write(code, ln)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_enc[0xF0]
                writer.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            ln, code = ac_enc[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = ac_enc[0x00]
            writer.write(code, ln)

    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, ((sh, sv), plane) in enumerate(zip(samps, chans)):
            for by in range(sv):
                for bx in range(sh):
                    encode_block(
                        plane,
                        (my * sv + by) * 8,
                        (mx * sh + bx) * 8,
                        qts[0 if ci == 0 else 1],
                        ci,
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF (animated — the video modality's native-decode format)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW → list of palette indices.

    Variable-width codes (min+1 .. 12 bits, LSB-first bit packing),
    clear code resets the dictionary, EOI terminates. The dictionary is
    a list of byte-sequences; growth stops at 4096 per the GIF spec.
    """
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return [[i] for i in range(clear)] + [None, None]

    table = fresh()
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and table[code] is not None:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + [entry[0]])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (round-trip partner of :func:`_lzw_decode`)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    seq: tuple = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (idx,)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode a (possibly animated) GIF → list of (delay_ms, H×W×3 RGB).

    Full-canvas compositing: each image descriptor's rect is drawn over
    the running canvas (respecting the transparent index), so every
    returned frame is the complete displayed picture, not the stored
    delta. All three disposal methods: 1 (keep), 2 (restore
    background; with an active transparent index the rect restores to
    transparent — black on this RGB canvas, matching RGBA renderers
    flattened) and 3 (restore previous, via a saved pre-frame rect).
    Interlaced frames de-interlace through the four GIF89a passes.
    """
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed, bg_index = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms, transparent, disposal = 0, None, 0

    def subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(payload[p : p + n])
            p += n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                delay_ms = struct.unpack_from("<H", body, 1)[0] * 10
                transparent = body[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        fpacked = payload[pos + 8]
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[pos]
        pos += 1
        data, pos = subblocks(pos)
        idx = np.array(_lzw_decode(data, min_code), dtype=np.int32)
        if idx.size != w * h:
            raise ValueError(f"GIF frame pixel count {idx.size} != {w * h}")
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF palette index out of range")
        rect = idx.reshape(h, w)
        if fpacked & 0x40:
            # interlaced: stored rows are the four GIF89a passes
            # (every 8th from 0, every 8th from 4, every 4th from 2,
            # every 2nd from 1) — scatter them back into place
            order = [y for y in range(0, h, 8)] + [y for y in range(4, h, 8)] \
                + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)]
            deinter = np.empty_like(rect)
            deinter[np.array(order, dtype=np.int64)] = rect
            rect = deinter
        patch = table[rect]
        if disposal == 3:
            # restore-previous: keep the pre-frame canvas to put back
            saved = canvas[top : top + h, left : left + w].copy()
        target = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = rect != transparent
            target[mask] = patch[mask]
        else:
            target[:] = patch
        frames.append((delay_ms, canvas.copy()))
        if disposal == 3:  # restore previous after presenting
            canvas[top : top + h, left : left + w] = saved
        elif disposal == 2:  # restore background after presenting
            if transparent is not None:
                # spec-conformant renderers restore the rect to
                # TRANSPARENT when a transparent index is active (the
                # "background" is the page showing through); an RGB
                # canvas flattens transparent to black — the same
                # result as PIL's RGBA compositing flattened to RGB
                canvas[top : top + h, left : left + w] = 0
            else:
                # background color index is defined against the GLOBAL
                # color table (logical screen descriptor), not the
                # frame's local table
                bg = gct[bg_index] if gct is not None and bg_index < len(gct) else 0
                canvas[top : top + h, left : left + w] = bg
        delay_ms, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF with no image frames")
    return frames


def encode_gif(
    frames: list[np.ndarray], delay_ms: int = 100, interlace: bool = False
) -> bytes:
    """Encode H×W×3 uint8 RGB frames → animated GIF89a bytes.

    Builds one global palette from the distinct colors across all
    frames (≤256 required — test fixtures construct palettized content;
    this is a fixture/round-trip encoder, not a quantizing one).
    ``interlace=True`` stores each frame's rows in the four GIF89a
    pass order with the interlace flag set, so the decoder's
    de-interlacing path round-trips.
    """
    if not frames:
        raise ValueError("no frames")
    arr = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arr[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in arr):
        raise ValueError("all frames must be H×W×3 and same size")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in arr], axis=0), axis=0)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; encoder caps at 256")
    # palette size = power of two ≥ max(2, n_colors)
    bits = max(1, (len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    min_code = max(2, bits)
    for f in arr:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_ms // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        if interlace:
            order = [y for y in range(0, h, 8)] + [y for y in range(4, h, 8)] \
                + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)]
            f = f[np.array(order, dtype=np.int64)]
        idx = [lut[tuple(px)] for px in f.reshape(-1, 3)]
        lzw = _lzw_encode(idx, min_code)
        out.append(min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0: uncompressed + PackBits)
# ---------------------------------------------------------------------------


def _packbits(data: bytes) -> bytes:
    """Decode Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first code packing,
    Clear=256 / EOI=257, 9→12-bit codes with the spec's EARLY width
    change (switch one code before the table fills the width)."""
    CLEAR, EOI = 256, 257

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    out = bytearray()
    table = fresh()
    width, prev = 9, None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = fresh()
                width, prev = 9, None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("bad first TIFF-LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad TIFF-LZW code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # EARLY change, adjusted for the decoder's one-entry lag:
            # the writer switches right after assigning slot 2^w - 2,
            # and the reader only learns that entry's content from the
            # NEXT code — so the reader must widen while its own table
            # still has one fewer entry than the writer's.
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Round-trip partner of :func:`_tiff_lzw_decode` (same early-change
    discipline on the write side)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        emit(table[seq])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF (uncompressed, PackBits, LZW or deflate;
    8-bit grayscale/RGB(A), either byte order, stripped layout) →
    H×W×3 RGB.

    Covers what scanners and exporters emit as "TIFF" in document
    corpora; JPEG-in-TIFF/CCITT/tiled variants raise and fall to the
    PIL seam like every other codec here.
    """
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    n_entries = struct.unpack_from(bo + "H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, ttype, count = struct.unpack_from(bo + "HHI", payload, off)
        if ttype not in type_size:
            continue  # rationals etc. — not needed for layout tags
        sz = type_size[ttype] * count
        src = off + 8 if sz <= 4 else struct.unpack_from(bo + "I", payload, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}[ttype]
        tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, payload, src))
    try:
        w = tags[256][0]
        h = tags[257][0]
        strip_offs = tags[273]
        strip_counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    bits = tags.get(258, [8])
    spp = tags.get(277, [len(bits)])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF supported")
    if comp == 1:
        raw = b"".join(
            payload[o : o + c] for o, c in zip(strip_offs, strip_counts)
        )
    elif comp in (5, 8, 32946):  # LZW / deflate / legacy deflate
        # each strip's output can never legally exceed the whole image
        cap = h * w * spp + 64
        expand = (
            _tiff_lzw_decode if comp == 5
            else (lambda b: _bounded_inflate(b, cap))
        )
        try:
            raw = b"".join(
                expand(payload[o : o + c]) for o, c in zip(strip_offs, strip_counts)
            )
        except zlib.error as exc:  # corrupt stream: clean rejection
            raise ValueError(f"bad TIFF deflate stream: {exc}") from exc
        if tags.get(317, [1])[0] == 2:  # horizontal differencing predictor
            arr = np.frombuffer(raw, np.uint8).copy().reshape(-1, w, spp)
            np.cumsum(arr, axis=1, dtype=np.uint8, out=arr)
            raw = arr.tobytes()
    elif comp == 32773:
        raw = b"".join(
            _packbits(payload[o : o + c])
            for o, c in zip(strip_offs, strip_counts)
        )
    else:
        raise ValueError(f"TIFF compression {comp} (JPEG/CCITT/...) needs PIL")
    need = h * w * spp
    if len(raw) < need:
        raise ValueError("truncated TIFF pixel data")
    px = np.frombuffer(raw, np.uint8, need).reshape(h, w, spp)
    if photo == 0:  # white-is-zero grayscale
        px = 255 - px
    if spp == 1:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA (alpha dropped)


def encode_tiff(
    img: np.ndarray,
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
) -> bytes:
    """Encode H×W×3 uint8 RGB → little-endian stripped TIFF
    (round-trip partner of :func:`decode_tiff`); ``lzw`` writes one
    LZW-compressed strip (compression 5), ``deflate`` one zlib strip
    (compression 8), ``packbits`` one RLE strip per row (32773),
    default uncompressed."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    if sum((packbits, lzw, deflate)) > 1:
        raise ValueError("choose one compression")
    h, w = img.shape[:2]
    raw = img.tobytes()
    if lzw or deflate:
        strip_data = _tiff_lzw_encode(raw) if lzw else zlib.compress(raw)
        strip_counts = [len(strip_data)]
        rows_per_strip = h
    elif packbits:
        body = bytearray()
        # one PackBits strip per row (the common writer convention)
        strips = []
        for y in range(h):
            row = img[y].tobytes()
            enc = bytearray()
            i = 0
            while i < len(row):
                run = 1
                while i + run < len(row) and run < 128 and row[i + run] == row[i]:
                    run += 1
                if run >= 2:
                    enc += bytes([257 - run, row[i]])
                    i += run
                else:
                    lit = i
                    while (
                        i < len(row)
                        and i - lit < 128
                        and not (
                            i + 2 < len(row) and row[i] == row[i + 1] == row[i + 2]
                        )
                    ):
                        i += 1
                    enc += bytes([i - lit - 1]) + row[lit:i]
            strips.append(bytes(enc))
        strip_data = b"".join(strips)
        strip_counts = [len(s) for s in strips]
        rows_per_strip = 1
    else:
        strip_data = raw
        strip_counts = [len(raw)]
        rows_per_strip = h

    n_strips = len(strip_counts)
    header = 8
    ifd_entries = 8
    ifd_size = 2 + ifd_entries * 12 + 4
    # BitsPerSample (258) must have count == SamplesPerPixel (TIFF 6.0);
    # 3 SHORTs don't fit the 4-byte value field, so they live in an
    # out-of-line array right after the IFD (6 bytes keeps the following
    # arrays word-aligned).
    bps_off = header + ifd_size
    arrays_off = bps_off + 6
    # strip offsets/counts arrays (LONG each) when more than one strip
    extra = (8 * n_strips) if n_strips > 1 else 0
    data_off = arrays_off + extra
    offs = []
    acc = data_off
    for c in strip_counts:
        offs.append(acc)
        acc += c

    out = bytearray(b"II*\x00") + struct.pack("<I", header)

    def entry(tag, ttype, count, value):
        return struct.pack("<HHII", tag, ttype, count, value)

    e = bytearray(struct.pack("<H", ifd_entries))
    e += entry(256, 4, 1, w)
    e += entry(257, 4, 1, h)
    e += entry(258, 3, 3, bps_off)  # bits per sample: (8,8,8) out-of-line
    e += entry(
        259, 3, 1,
        5 if lzw else (8 if deflate else (32773 if packbits else 1)),
    )
    e += entry(262, 3, 1, 2)  # RGB
    e += entry(273, 4, n_strips, offs[0] if n_strips == 1 else arrays_off)
    e += entry(277, 3, 1, 3)  # samples per pixel
    e += entry(
        279, 4, n_strips,
        strip_counts[0] if n_strips == 1 else arrays_off + 4 * n_strips,
    )
    e += struct.pack("<I", 0)  # next IFD
    out += e
    out += struct.pack("<3H", 8, 8, 8)  # BitsPerSample array (tag 258)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *offs)
        out += struct.pack(f"<{n_strips}I", *strip_counts)
    out += strip_data
    return bytes(out)


# ---------------------------------------------------------------------------
# FLAC (lossless compressed audio — RFC 9639)
# ---------------------------------------------------------------------------

_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
# fixed-predictor coefficients by order (RFC 9639 §9.2.5)
_FLAC_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ t[(crc >> 8) ^ b]
    return crc


def _read_unary(r: _JpegBits) -> int:
    """Count zero bits up to the terminating 1 — per-BYTE, not per-bit
    (rice quotients are the hottest FLAC read)."""
    d, pos, bit = r.d, r.pos, r.bit
    nd = len(d)
    n = 0
    while True:
        if pos >= nd:
            raise ValueError("truncated JPEG entropy data")
        chunk = d[pos] & ((1 << (8 - bit)) - 1)  # bits left in this byte
        if chunk:
            lead = (8 - bit) - chunk.bit_length()  # zeros before the 1
            n += lead
            bit += lead + 1  # consume the 1 as well
            if bit == 8:
                bit, pos = 0, pos + 1
            r.pos, r.bit = pos, bit
            return n
        n += 8 - bit
        bit, pos = 0, pos + 1


def _read_signed(r: _JpegBits, n: int) -> int:
    v = r.read_bits(n)
    return v - (1 << n) if v >> (n - 1) else v


def _read_coded_number(r: _JpegBits) -> int:
    """The UTF-8-style frame/sample number (§9.1.5)."""
    first = r.read_bits(8)
    if first < 0x80:
        return first
    ones = 0
    while (first << ones) & 0x80:
        ones += 1
    val = first & (0x7F >> ones)
    for _ in range(ones - 1):
        cont = r.read_bits(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad FLAC coded number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _flac_residual(r: _JpegBits, blocksize: int, order: int) -> list[int]:
    method = r.read_bits(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read_bits(4)
    if blocksize % (1 << po):
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = r.read_bits(pbits)
        if param == escape:
            raw = r.read_bits(5)
            out.extend(_read_signed(r, raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = _read_unary(r)
                v = (q << param) | r.read_bits(param) if param else q
                out.append((v >> 1) ^ -(v & 1))  # zigzag → signed
    return out


def _flac_subframe(r: _JpegBits, blocksize: int, bps: int) -> list[int]:
    if r.read_bit():
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read_bits(6)
    wasted = 0
    if r.read_bit():
        wasted = _read_unary(r) + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = [_read_signed(r, bps)] * blocksize
    elif stype == 1:  # VERBATIM
        out = [_read_signed(r, bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype & 0x07
        warm = [_read_signed(r, bps) for _ in range(order)]
        res = _flac_residual(r, blocksize, order)
        coefs = _FLAC_FIXED[order]
        out = list(warm)
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(res[i - order] + pred)
    elif stype >= 32:  # LPC order 1..32
        order = (stype & 0x1F) + 1
        warm = [_read_signed(r, bps) for _ in range(order)]
        prec = r.read_bits(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC qlp precision")
        shift = _read_signed(r, 5)
        if shift < 0:
            raise ValueError("negative FLAC qlp shift")
        qlp = [_read_signed(r, prec) for _ in range(order)]
        res = _flac_residual(r, blocksize, order)
        out = list(warm)
        for i in range(order, blocksize):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(qlp))
            out.append(res[i - order] + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, mono float64 in [-1, 1]).

    Pure Python per RFC 9639: STREAMINFO + skipped metadata blocks,
    then per frame: CRC-8-checked header, subframes (CONSTANT /
    VERBATIM / FIXED 0-4 / LPC 1-32, wasted bits), partitioned Rice
    residuals (both 4- and 5-bit parameter forms with raw escapes),
    all four channel assignments (independent, left-side, right-side,
    mid-side), and the frame CRC-16. Multi-channel mixes down by mean,
    like :func:`decode_wav`. No external fixtures exist in this
    environment, so conformance evidence is the spec-structured
    round-trip suite (fixed + verbatim + constant subframes, stereo
    decorrelation, multiple partition orders) — a real deployment can
    point the same tests at reference-encoder files.
    """
    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | int.from_bytes(body[14:18], "big")
            streaminfo = (sr, nch, bps, total)
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC without STREAMINFO")
    sr0, nch0, bps0, total = streaminfo

    channels_out: list[list[int]] = [[] for _ in range(nch0)]
    while pos < len(payload):
        frame_start = pos
        r = _JpegBits(payload, pos)  # in place: r.pos is ABSOLUTE
        sync = r.read_bits(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        r.read_bit()  # reserved
        r.read_bit()  # blocking strategy
        bs_code = r.read_bits(4)
        sr_code = r.read_bits(4)
        ch_code = r.read_bits(4)
        ss_code = r.read_bits(3)
        r.read_bit()  # reserved
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = r.read_bits(8) + 1
        elif bs_code == 7:
            blocksize = r.read_bits(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        if sr_code == 12:
            r.read_bits(8)
        elif sr_code in (13, 14):
            r.read_bits(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        bps = bps0 if ss_code == 0 else _FLAC_BPS.get(ss_code)
        if bps is None:
            raise ValueError("reserved FLAC sample size code")
        header_len = (r.pos - frame_start) + (1 if r.bit else 0)
        crc8 = r.read_bits(8)
        if _crc8(payload[frame_start : frame_start + header_len]) != crc8:
            raise ValueError("FLAC frame header CRC mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_flac_subframe(r, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(r, blocksize, bps)
                side = _flac_subframe(r, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(r, blocksize, bps + 1)
                right = _flac_subframe(r, blocksize, bps)
                subs = [[rv + s for rv, s in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(r, blocksize, bps)
                side = _flac_subframe(r, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if nch != nch0:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")
        # align to byte, verify frame CRC-16
        if r.bit:
            r.pos, r.bit = r.pos + 1, 0
        crc16 = int.from_bytes(payload[r.pos : r.pos + 2], "big")
        if _crc16(payload[frame_start : r.pos]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos + 2
        for c in range(nch0):
            channels_out[c].extend(subs[c])

    n = len(channels_out[0])
    if total and n != total:
        raise ValueError(f"FLAC sample count {n} != STREAMINFO total {total}")
    arr = np.array(channels_out, dtype=np.float64) / float(1 << (bps0 - 1))
    return sr0, arr.mean(axis=0)


class _FlacBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        value &= (1 << length) - 1 if length else 0
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.n:
            self.write(0, 1)


def encode_flac(
    samples: np.ndarray | list,
    rate: int = 16000,
    stereo_mode: str | None = None,
    block_size: int = 1024,
    partition_order: int = 0,
) -> bytes:
    """Encode 16-bit audio → FLAC bytes (round-trip partner of
    :func:`decode_flac`; a fixture encoder, not a ratio-chasing one).

    ``samples``: mono float64 [-1,1] or (2, n) array for stereo.
    Subframe choice per block/channel: CONSTANT when flat, else FIXED
    order 2 with single-rice-parameter partitions (``partition_order``
    exercises the partitioned form), falling back to VERBATIM when the
    residual would not fit. ``stereo_mode`` None/'independent' or
    'left-side' (exercises the decorrelated path + side bit depth).
    """
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        chans = [np.clip(arr * 32767, -32768, 32767).astype(np.int64)]
    else:
        chans = [np.clip(c * 32767, -32768, 32767).astype(np.int64) for c in arr]
    nch = len(chans)
    n = len(chans[0])
    bps = 16

    out = bytearray(b"fLaC")
    si = bytearray(34)
    si[0:2] = struct.pack(">H", block_size)
    si[2:4] = struct.pack(">H", block_size)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    si[14:18] = struct.pack(">I", n & 0xFFFFFFFF)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last metadata block

    def write_subframe(w: _FlacBitWriter, data: list[int], sbps: int, bs: int):
        if all(v == data[0] for v in data):
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)
            w.write(data[0], sbps)
            return
        order = 2 if bs > 2 else 0
        res = [
            data[i] - (2 * data[i - 1] - data[i - 2]) if order else data[i]
            for i in range(order, bs)
        ]
        # FLAC (RFC 9639 §9.2.7): the first rice partition holds
        # (block_size >> po) - predictor_order samples, which must be
        # positive — a short final frame (bs <= order << po) would give a
        # non-positive first-partition count and desync the bitstream, so
        # clamp po to 0 alongside the divisibility requirement.
        po = (
            partition_order
            if bs % (1 << partition_order) == 0
            and (bs >> partition_order) > order
            else 0
        )
        # refuse rice params that would balloon: fall back to VERBATIM
        zz = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in res]
        param = max(1, int((sum(zz) / len(zz)) if zz else 1).bit_length() - 1)
        if param > 14:
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for v in data:
                w.write(v, sbps)
            return
        w.write(0, 1)
        w.write(8 | order, 6)  # FIXED
        w.write(0, 1)
        for v in data[:order]:
            w.write(v, sbps)
        w.write(0, 2)  # rice, 4-bit params
        w.write(po, 4)
        idx = 0
        for p in range(1 << po):
            cnt = (bs >> po) - (order if p == 0 else 0)
            w.write(param, 4)
            for v in zz[idx : idx + cnt]:
                w.write_unary(v >> param)
                if param:
                    w.write(v & ((1 << param) - 1), param)
            idx += cnt

    frame_no = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        w = _FlacBitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(13, 4)  # 16-bit sample rate in Hz follows
        if nch == 2 and stereo_mode == "left-side":
            w.write(8, 4)
        else:
            w.write(nch - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)  # reserved
        # coded frame number (UTF-8 style; fixture stays < 128 frames)
        if frame_no >= 128:
            raise ValueError("fixture encoder caps at 128 frames")
        w.write(frame_no, 8)
        frame_no += 1
        w.write(bs - 1, 16)
        w.write(rate, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)

        blocks = [list(map(int, c[start : start + bs])) for c in chans]
        if nch == 2 and stereo_mode == "left-side":
            side = [l - r2 for l, r2 in zip(blocks[0], blocks[1])]
            write_subframe(w, blocks[0], bps, bs)
            write_subframe(w, side, bps + 1, bs)
        else:
            for c in range(nch):
                write_subframe(w, blocks[c], bps, bs)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE payload → (sample_rate, mono float64 in
    [-1, 1]). 8-bit (unsigned) / 16-bit (signed LE) / 24-bit (signed
    LE) integer PCM and 32/64-bit IEEE float (format 3, what DAWs and
    scientific tooling export); multi-channel mixes down by mean.
    Chunks are walked, not assumed at fixed offsets (LIST/fact chunks
    before data are common)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format not in (1, 3):
        raise ValueError(
            f"only integer PCM (1) and IEEE float (3) supported, got "
            f"{audio_format} (ADPCM/µ-law need an audio library)"
        )
    if channels < 1:
        raise ValueError("zero channels")
    if audio_format == 3:
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4", count=len(data) // 4).astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8", count=len(data) // 8).astype(np.float64)
        else:
            raise ValueError(f"IEEE-float WAV must be 32/64-bit, got {bits}")
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 24:
        n = len(data) // 3
        b = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(n, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = (v ^ 0x800000) - 0x800000  # sign-extend 24-bit
        samples = v.astype(np.float64) / 8388608.0
    else:
        raise ValueError(f"only 8/16/24-bit PCM supported, got {bits}")
    frames = len(samples) // channels
    mono = samples[: frames * channels].reshape(frames, channels).mean(axis=1)
    return rate, mono


def spectrogram(
    samples: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Log-magnitude STFT spectrogram → (frames × bins) float64.

    Hann-windowed rfft frames; clips shorter than one frame are
    zero-padded to a single frame. The output is an "image" of the
    sound — which is exactly how the fingerprint below treats it.
    """
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    return np.log1p(mag)


def audio_phash64(samples: np.ndarray, n_fft: int = 256, hop: int = 128) -> int:
    """64-bit perceptual audio fingerprint: the DCT hash of the
    log-spectrogram image.

    The published robust-audio-hashing schemes (Haitsma-Kalker's sign of
    band-energy differences; chromaprint) all reduce to thresholded
    low-frequency structure of the time-frequency plane — which is
    precisely what :func:`phash64` computes over an image. Reusing it
    makes audio near-dup share the image pipeline end-to-end: the same
    area-resize (so clips of different lengths/rates land on the same
    32×32 grid), the same DCT, and the same pigeonhole chunk join
    downstream. Robust to re-encode noise and small gain changes
    (log magnitudes); distinct content lands far in hamming space.
    """
    return phash64(spectrogram(samples, n_fft, hop))


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono float64 [-1, 1] → 16-bit PCM WAV bytes (round-trip
    partner of :func:`decode_wav`, used to plant real audio in tests)."""
    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0).astype("<i2")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — WebP Lossless Bitstream Specification / RFC 9649
# ---------------------------------------------------------------------------
#
# Pure-Python decoder for the full VP8L feature set (all four transforms,
# meta prefix codes, color cache, LZ77 backward references) plus a fixture
# encoder that writes literal/RLE/cache-coded streams with optional
# subtract-green, predictor and palette transforms — enough to round-trip
# arbitrary RGB content and exercise every inverse-transform path in the
# decoder. Lossy WebP (VP8 chunks) needs a full VP8 video decoder and goes
# to the PIL/ffmpeg seam like the other out-of-scope formats.


class _LsbBits:
    """LSB-first bit reader (DEFLATE-style packing, as VP8L uses)."""

    _REV = [int(f"{b:08b}"[::-1], 2) for b in range(256)]

    def __init__(self, data: bytes, start: int = 0):
        self.d = data
        self.pos = start  # next byte to pull into the buffer
        self.buf = 0      # buffered bits, stream order packed MSB-first
        self.nbuf = 0     # bits currently buffered
        self.avail = (len(data) - start) * 8  # real bits left (buf + unread)

    def _fill(self, n: int) -> None:
        # pad with zero bits past EOF; `avail` is what gates truncation
        d, pos = self.d, self.pos
        rev = self._REV
        while self.nbuf < n:
            byte = rev[d[pos]] if pos < len(d) else 0
            pos += 1
            self.buf = (self.buf << 8) | byte
            self.nbuf += 8
        self.pos = pos

    def peek_bits(self, n: int) -> int:
        """Next n bits in stream order, packed MSB-first (prefix-code
        order) — zero-padded past EOF."""
        if self.nbuf < n:
            self._fill(n)
        return (self.buf >> (self.nbuf - n)) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        if n > self.avail:
            raise ValueError("truncated VP8L bitstream")
        self.avail -= n
        self.nbuf -= n
        self.buf &= (1 << self.nbuf) - 1

    def read_bits(self, n: int) -> int:
        """n bits as an LSB-first field (spec ReadBits)."""
        msb = self.peek_bits(n)
        self.consume(n)
        v = 0
        for j in range(n):  # bit j of the field = j-th stream bit
            v |= ((msb >> (n - 1 - j)) & 1) << j
        return v


class _LsbBitWriter:
    """LSB-first bit writer (mirror of :class:`_LsbBits`)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, value: int, n: int):
        for i in range(n):
            self.acc |= ((value >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def bytes(self) -> bytes:
        if self.n:
            return bytes(self.out + bytearray([self.acc]))
        return bytes(self.out)


# Order in which code-length-code lengths are transmitted (spec §5.2.2).
_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Distance-map codes 1..120 → 2D offsets: all (x, y) with y in 0..7,
# x in -7..8 (y=0 restricted to x≥1), sorted by euclidean distance with
# ties broken larger-y-first, then smaller |x|, positive x before
# negative — this reproduces the literal table in spec §4.2.2.
_VP8L_DIST_MAP = sorted(
    [(x, y) for y in range(8) for x in range(-7, 9) if y > 0 or x > 0],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), 0 if p[0] > 0 else 1),
)
assert len(_VP8L_DIST_MAP) == 120


def _vp8l_lut(pairs: list) -> tuple:
    """[(symbol, length, code)] → ('lut', flat_table, max_len): one
    peek of ``max_len`` bits resolves any symbol in a single list
    index (the libwebp root-table idea, sized to the full code depth —
    max 2^15 entries, built once per prefix code)."""
    max_len = max(ln for _, ln, _ in pairs)
    lut: list = [None] * (1 << max_len)
    for sym, ln, code in pairs:
        start = code << (max_len - ln)
        entry = (sym, ln)
        for i in range(start, start + (1 << (max_len - ln))):
            lut[i] = entry
    return ("lut", lut, max_len)


def _vp8l_canonical_table(lengths: dict) -> tuple:
    """Code lengths → decoder: ('trivial', sym) for single-symbol codes
    (0 bits consumed), else a flat peek table with DEFLATE canonical
    assignment (codes walked MSB-first)."""
    used = sorted((s for s, l in lengths.items() if l > 0))
    if not used:
        raise ValueError("VP8L prefix code with no symbols")
    if len(used) == 1:
        return ("trivial", used[0])
    max_len = max(lengths[s] for s in used)
    bl_count = [0] * (max_len + 1)
    for s in used:
        bl_count[lengths[s]] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    pairs = []
    for s in used:  # symbol order = canonical order
        ln = lengths[s]
        pairs.append((s, ln, next_code[ln]))
        next_code[ln] += 1
        if next_code[ln] > (1 << ln):
            raise ValueError("oversubscribed VP8L prefix code")
    return _vp8l_lut(pairs)


def _vp8l_read_sym(r: _LsbBits, code: tuple) -> int:
    if code[0] == "trivial":
        return code[1]
    entry = code[1][r.peek_bits(code[2])]
    if entry is None:
        raise ValueError("invalid VP8L prefix code")
    r.consume(entry[1])
    return entry[0]


def _vp8l_read_code_lengths(r: _LsbBits, cl_code: tuple, num_symbols: int) -> dict:
    """Spec §5.2.2 ReadHuffmanCodeLengths: code lengths for an alphabet,
    themselves prefix-coded with 16/17/18 repeat forms and an optional
    max_symbol read cap."""
    if r.read_bits(1):  # use a length cap
        length_nbits = 2 + 2 * r.read_bits(3)
        max_symbol = 2 + r.read_bits(length_nbits)
    else:
        max_symbol = num_symbols
    lengths = {}
    symbol, prev_len = 0, 8
    while symbol < num_symbols:
        if max_symbol == 0:
            break  # remaining lengths are zero
        max_symbol -= 1
        cl = _vp8l_read_sym(r, cl_code)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep, val = 3 + r.read_bits(2), prev_len
            for _ in range(rep):
                if symbol >= num_symbols:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[symbol] = val
                symbol += 1
        elif cl == 17:
            symbol += 3 + r.read_bits(3)
        else:  # 18
            symbol += 11 + r.read_bits(7)
        if symbol > num_symbols:
            raise ValueError("VP8L code-length repeat overflow")
    return {s: l for s, l in lengths.items() if l}


def _vp8l_read_code(r: _LsbBits, alphabet_size: int) -> tuple:
    """Spec §5.2.1/§5.2.2: one prefix code, simple or normal form."""
    if r.read_bits(1):  # simple
        num_symbols = r.read_bits(1) + 1
        if r.read_bits(1):  # first symbol is 8 bits
            first = r.read_bits(8)
        else:
            first = r.read_bits(1)
        if num_symbols == 1:
            return ("trivial", first)
        second = r.read_bits(8)
        if first == second:
            raise ValueError("VP8L simple code with duplicate symbols")
        # simple 2-symbol codes honor TRANSMISSION order (code 0 = first
        # transmitted symbol), not canonical symbol order
        return _vp8l_lut([(first, 1, 0), (second, 1, 1)])
    num_cl = 4 + r.read_bits(4)
    cl_lengths = {}
    for i in range(num_cl):
        ln = r.read_bits(3)
        if ln:
            cl_lengths[_VP8L_CL_ORDER[i]] = ln
    cl_code = _vp8l_canonical_table(cl_lengths)
    lengths = _vp8l_read_code_lengths(r, cl_code, alphabet_size)
    return _vp8l_canonical_table(lengths)


def _vp8l_prefix_val(r: _LsbBits, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read_bits(extra) + 1


def _vp8l_distance(dval: int, width: int) -> int:
    if dval > 120:
        return dval - 120
    x, y = _VP8L_DIST_MAP[dval - 1]
    return max(1, y * width + x)


def _vp8l_read_image(r: _LsbBits, w: int, h: int, allow_meta: bool) -> np.ndarray:
    """One entropy-coded VP8L image → flat uint32 ARGB array (h*w).

    Handles the color cache, LZ77 backward references, and (for the
    main spatially-coded image only) the meta prefix-code image."""
    cache_bits = r.read_bits(4) if r.read_bits(1) else 0
    if cache_bits > 11:
        raise ValueError("VP8L color cache too large")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    group_idx = None
    hbits = 0
    n_groups = 1
    if allow_meta and r.read_bits(1):
        hbits = r.read_bits(3) + 2
        hw = (w + (1 << hbits) - 1) >> hbits
        hh = (h + (1 << hbits) - 1) >> hbits
        himg = _vp8l_read_image(r, hw, hh, False)
        group_idx = (((himg >> 16) & 0xFF) << 8) | ((himg >> 8) & 0xFF)
        n_groups = int(group_idx.max()) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    codes = [
        (
            _vp8l_read_code(r, green_alpha),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 40),
        )
        for _ in range(n_groups)
    ]

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    n = w * h
    mask = (1 << cache_bits) - 1 if cache_bits else 0
    hw = (w + (1 << hbits) - 1) >> hbits if group_idx is not None else 0
    while pos < n:
        if group_idx is not None:
            g = int(group_idx[((pos // w) >> hbits) * hw + ((pos % w) >> hbits)])
            if g >= n_groups:
                raise ValueError("VP8L meta group out of range")
        else:
            g = 0
        gcode, rcode, bcode, acode, dcode = codes[g]
        s = _vp8l_read_sym(r, gcode)
        if s < 256:
            red = _vp8l_read_sym(r, rcode)
            blue = _vp8l_read_sym(r, bcode)
            alpha = _vp8l_read_sym(r, acode)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _vp8l_prefix_val(r, s - 256)
            dval = _vp8l_prefix_val(r, _vp8l_read_sym(r, dcode))
            dist = _vp8l_distance(dval, w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            idx = s - 280
            if not cache_bits or idx > mask:
                raise ValueError("VP8L cache reference without cache")
            out[pos] = cache[idx]
            pos += 1
    return out


def _s8(v: np.ndarray) -> np.ndarray:
    """uint8 channel → signed int8 semantics (two's complement), int32."""
    return ((v & 0xFF) ^ 0x80).astype(np.int64) - 0x80


def _vp8l_inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    red = ((img >> 16) + g) & 0xFF
    blue = (img + g) & 0xFF
    return (img & 0xFF00FF00) | (red << 16) | blue


def _vp8l_inv_color_transform(img2d: np.ndarray, bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img2d.shape
    tw = (w + (1 << bits) - 1) >> bits
    t2d = timg.reshape(-1, tw)
    # expand the per-block transform elements to per-pixel maps
    rows = np.arange(h) >> bits
    cols = np.arange(w) >> bits
    cte = t2d[np.ix_(rows, cols)]
    g2r = _s8(cte)          # stored in the blue channel
    g2b = _s8(cte >> 8)     # stored in the green channel
    r2b = _s8(cte >> 16)    # stored in the red channel
    green = _s8(img2d >> 8)
    red = (img2d >> 16) & 0xFF
    blue = img2d & 0xFF
    new_red = (red + ((g2r * green) >> 5)) & 0xFF
    new_blue = (blue + ((g2b * green) >> 5) + ((r2b * _s8(new_red)) >> 5)) & 0xFF
    return (img2d & 0xFF00FF00) | (new_red.astype(np.uint32) << 16) | new_blue.astype(np.uint32)


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _vp8l_predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        diff = 0
        for sh in (24, 16, 8, 0):
            lc, tc, tlc = (L >> sh) & 0xFF, (T >> sh) & 0xFF, (TL >> sh) & 0xFF
            diff += abs(lc - tlc) - abs(tc - tlc)
        return T if diff <= 0 else L
    if mode == 12:  # ClampAddSubtractFull
        px = 0
        for sh in (24, 16, 8, 0):
            c = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
            px |= min(255, max(0, c)) << sh
        return px
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        px = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            b = (TL >> sh) & 0xFF
            d = a - b
            half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
            px |= min(255, max(0, a + half)) << sh
        return px
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _vp8l_inv_predictor(img2d: np.ndarray, bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img2d.shape
    tw = (w + (1 << bits) - 1) >> bits
    modes = ((timg.reshape(-1, tw) >> 8) & 0xFF).astype(np.int64)
    flat = img2d.reshape(-1).astype(np.uint32).tolist()  # python ints: fast loop
    n = w * h
    for pos in range(n):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[pos - 1]  # first row: Left
        elif x == 0:
            pred = flat[pos - w]  # first column: Top
        else:
            # flat aliasing: TR of the last column = first pixel of the
            # SAME row (already decoded), exactly as libwebp addresses it
            pred = _vp8l_predict(
                int(modes[y >> bits, x >> bits]),
                flat[pos - 1], flat[pos - w], flat[pos - w - 1], flat[pos - w + 1],
            )
        cur = flat[pos]
        flat[pos] = (
            ((((cur >> 24) + (pred >> 24)) & 0xFF) << 24)
            | ((((cur >> 16) + (pred >> 16)) & 0xFF) << 16)
            | ((((cur >> 8) + (pred >> 8)) & 0xFF) << 8)
            | (((cur + pred) & 0xFF))
        )
    return np.array(flat, dtype=np.uint32).reshape(h, w)


def _vp8l_inv_color_index(img2d: np.ndarray, width_bits: int,
                          palette: np.ndarray, full_w: int) -> np.ndarray:
    h = img2d.shape[0]
    psize = len(palette)
    if width_bits:
        bpp = 8 >> width_bits          # bits per index
        ppp = 1 << width_bits          # packed pixels per green byte
        xs = np.arange(full_w)
        packed = img2d[:, xs >> width_bits]
        green = (packed >> 8) & 0xFF
        idx = (green >> ((xs & (ppp - 1)) * bpp)) & ((1 << bpp) - 1)
    else:
        idx = (img2d >> 8) & 0xFF
    out = np.zeros((h, idx.shape[1]), dtype=np.uint32)
    valid = idx < psize  # out-of-range palette index → transparent black
    out[valid] = palette[idx[valid].astype(np.int64)]
    return out


def _webp_chunks(payload: bytes):
    """Validated RIFF walk → yields (fourcc, body)."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        yield fourcc, body
        pos += 8 + size + (size & 1)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L) → H×W×3 uint8 RGB.

    RIFF walk accepts both plain ('VP8L' at top level) and extended
    ('VP8X' header) containers. Full VP8L inverse pipeline: color
    indexing (incl. sub-byte bundling), subtract-green, color transform
    and all 14 spatial predictors, with color-cache and LZ77-coded
    entropy images and meta prefix-code groups. Lossy 'VP8 ' payloads
    need a VP8 video decoder and raise toward the PIL/ffmpeg seam.
    """
    vp8l = None
    saw_lossy = False
    for fourcc, body in _webp_chunks(payload):
        if fourcc == b"VP8L":
            vp8l = body
            break
        if fourcc == b"VP8 ":
            saw_lossy = True
    if vp8l is None:
        if saw_lossy:
            raise NotImplementedError(
                "lossy WebP (VP8) needs a video codec; use PIL/ffmpeg "
                "behind the dispatch seam"
            )
        raise ValueError("WebP container without VP8L chunk")
    img = _decode_vp8l_argb(vp8l)
    out = np.empty((*img.shape, 3), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF
    out[..., 1] = (img >> 8) & 0xFF
    out[..., 2] = img & 0xFF
    return out


def _decode_vp8l_argb(vp8l: bytes) -> np.ndarray:
    """One VP8L bitstream → H×W uint32 ARGB (alpha kept — animation
    frame blending needs it; :func:`decode_webp` drops it)."""
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LsbBits(vp8l, 1)
    w = r.read_bits(14) + 1
    h = r.read_bits(14) + 1
    r.read_bits(1)  # alpha hint
    if r.read_bits(3) != 0:
        raise ValueError("unsupported VP8L version")

    transforms = []
    seen = set()
    cur_w = w
    while r.read_bits(1):
        t = r.read_bits(2)
        if t in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(t)
        if t in (0, 1):  # predictor / color transform
            bits = r.read_bits(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            timg = _vp8l_read_image(r, tw, th, False)
            transforms.append((t, bits, timg, cur_w))
        elif t == 2:  # subtract green
            transforms.append((2, None, None, cur_w))
        else:  # color indexing
            psize = r.read_bits(8) + 1
            raw = _vp8l_read_image(r, psize, 1, False)
            # palette entries are delta-coded per channel
            pal = np.zeros(psize, dtype=np.uint32)
            prev = 0
            for i in range(psize):
                cur = int(raw[i])
                px = 0
                for sh in (24, 16, 8, 0):
                    px |= ((((cur >> sh) + (prev >> sh)) & 0xFF) << sh)
                pal[i] = px
                prev = px
            width_bits = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
            transforms.append((3, width_bits, pal, cur_w))
            if width_bits:
                cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    img = _vp8l_read_image(r, cur_w, h, True).reshape(h, cur_w)
    for t, arg, data, t_w in reversed(transforms):
        if t == 0:
            img = _vp8l_inv_predictor(img, arg, data)
        elif t == 1:
            img = _vp8l_inv_color_transform(img, arg, data)
        elif t == 2:
            img = _vp8l_inv_subtract_green(img)
        else:
            img = _vp8l_inv_color_index(img, arg, data, t_w)
    return img


def _vp8l_huff_lengths(freqs, max_len: int = 15) -> dict:
    """Length-limited Huffman code lengths by package-merge (optimal,
    deterministic). ``freqs`` is an indexable of per-symbol counts;
    returns {symbol: length} for used symbols only."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}
    if n > (1 << max_len):
        raise ValueError("alphabet larger than prefix-code capacity")
    orig = sorted((int(freqs[s]), (s,)) for s in syms)
    lst = list(orig)
    for _ in range(max_len - 1):
        pkgs = [
            (lst[i][0] + lst[i + 1][0], lst[i][1] + lst[i + 1][1])
            for i in range(0, len(lst) - 1, 2)
        ]
        lst = sorted(orig + pkgs)
    lengths = {s: 0 for s in syms}
    for _, ss in lst[: 2 * n - 2]:
        for s in ss:
            lengths[s] += 1
    return lengths


def _vp8l_canonical_codes(lengths: dict) -> dict:
    """{symbol: length} → {symbol: (length, code)} with the same DEFLATE
    canonical assignment the decoder's table builder uses. A trivial
    single-symbol code maps to (0, 0): zero bits on the wire."""
    used = sorted(s for s, l in lengths.items() if l > 0)
    if not used:
        return {}
    if len(used) == 1:
        return {used[0]: (0, 0)}
    max_len = max(lengths[s] for s in used)
    bl_count = [0] * (max_len + 1)
    for s in used:
        bl_count[lengths[s]] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for s in used:
        ln = lengths[s]
        out[s] = (ln, next_code[ln])
        next_code[ln] += 1
    return out


def _vp8l_write_sym(bw: _LsbBitWriter, codes: dict, sym: int) -> None:
    ln, code = codes[sym]
    for i in range(ln - 1, -1, -1):  # prefix codes go MSB-first
        bw.write_bits((code >> i) & 1, 1)


def _vp8l_write_code(bw: _LsbBitWriter, freqs, alphabet: int) -> dict:
    """Write one prefix code (simple form when it fits, else the normal
    code-length-coded form) and return the symbol→(len,code) writer map."""
    lengths = _vp8l_huff_lengths(freqs)
    used = sorted(lengths)
    if not used:  # code never consulted: cheapest legal placeholder
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        bw.write_bits(0, 1)  # 1-bit symbol
        bw.write_bits(0, 1)  # symbol 0
        return {0: (0, 0)}
    if len(used) <= 2 and used[-1] <= 255:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            bw.write_bits(0, 1)
            bw.write_bits(first, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(first, 8)
        if len(used) == 1:
            return {first: (0, 0)}
        bw.write_bits(used[1], 8)
        return {first: (1, 0), used[1]: (1, 1)}  # transmission order
    # normal form
    bw.write_bits(0, 1)
    max_symbol = max(used[-1] + 1, 2)
    arr = [lengths.get(s, 0) for s in range(max_symbol)]
    cl_freq = [0] * 19
    for ln in arr:
        cl_freq[ln] += 1
    cl_lengths = _vp8l_huff_lengths(cl_freq, max_len=7)
    bw.write_bits(19 - 4, 4)  # transmit all 19 code-length-code lengths
    for sym in _VP8L_CL_ORDER:
        bw.write_bits(cl_lengths.get(sym, 0), 3)
    cl_codes = _vp8l_canonical_codes(cl_lengths)
    if max_symbol >= alphabet:
        bw.write_bits(0, 1)  # no cap: emit every alphabet entry
        arr = arr + [0] * (alphabet - len(arr))
        # trailing zeros still need the 0 symbol in the cl code
        if 0 not in cl_codes and alphabet > max_symbol:
            raise ValueError("internal: zero-length symbol missing")
    else:
        bw.write_bits(1, 1)
        val = max_symbol - 2
        nbits = 2
        while val >= (1 << nbits):
            nbits += 2
        bw.write_bits((nbits - 2) // 2, 3)
        bw.write_bits(val, nbits)
    for ln in arr:
        _vp8l_write_sym(bw, cl_codes, ln)
    return _vp8l_canonical_codes(lengths)


def _vp8l_prefix_encode(value: int) -> tuple:
    """value ≥ 1 → (prefix_code, n_extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    extra = value.bit_length() - 2
    rem = value - 1 - (1 << (extra + 1))
    code = 2 + 2 * extra + (1 if rem >= (1 << extra) else 0)
    offset = (2 + (code & 1)) << extra
    return code, extra, value - offset - 1


def _vp8l_write_image(
    bw: _LsbBitWriter,
    flat: list,
    w: int,
    h: int,
    spatial: bool,
    cache_bits: int = 0,
    rle: bool = False,
    meta_groups: bool = False,
) -> None:
    """Write one entropy-coded image: tokenize (literal / cache-ref /
    distance-1 RLE copy), build per-group histograms, emit the 5 prefix
    codes per group and then the token stream. ``spatial`` images carry
    the meta-prefix-code bit (optionally a real 2-group meta image)."""
    n = len(flat)
    # color cache declaration
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
        cache = [0] * (1 << cache_bits)
    else:
        bw.write_bits(0, 1)
        cache = None

    hbits = 0
    group_of = None
    n_groups = 1
    if spatial:
        if meta_groups:
            hbits = 2  # 4×4 pixel blocks
            hw = (w + 3) >> 2
            hh = (h + 3) >> 2
            # checkerboard group assignment: group = (bx + by) & 1
            himg = [
                (0xFF << 24) | ((((bx + by) & 1)) << 8)
                for by in range(hh)
                for bx in range(hw)
            ]
            bw.write_bits(1, 1)
            bw.write_bits(hbits - 2, 3)
            _vp8l_write_image(bw, himg, hw, hh, spatial=False)
            n_groups = 2

            def group_of(pos):
                y, x = divmod(pos, w)
                return ((x >> 2) + (y >> 2)) & 1
        else:
            bw.write_bits(0, 1)

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    hists = [
        [[0] * green_alpha, [0] * 256, [0] * 256, [0] * 256, [0] * 40]
        for _ in range(n_groups)
    ]
    tokens = []
    pos = 0
    while pos < n:
        g = group_of(pos) if group_of else 0
        hg = hists[g]
        if rle and pos > 0:
            run = 0
            while pos + run < n and flat[pos + run] == flat[pos - 1] and run < 4000:
                run += 1
            if run >= 3:
                lcode, lbits, lval = _vp8l_prefix_encode(run)
                dcode, dbits, dval = _vp8l_prefix_encode(1 + 120)  # distance 1
                tokens.append(("copy", g, lcode, lbits, lval, dcode, dbits, dval))
                hg[0][256 + lcode] += 1
                hg[4][dcode] += 1
                if cache is not None:
                    px = flat[pos - 1]
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += run
                continue
        px = flat[pos]
        if cache is not None:
            idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                tokens.append(("cache", g, idx))
                hg[0][280 + idx] += 1
                pos += 1
                continue
            cache[idx] = px
        tokens.append(("lit", g, px))
        hg[0][(px >> 8) & 0xFF] += 1
        hg[1][(px >> 16) & 0xFF] += 1
        hg[2][px & 0xFF] += 1
        hg[3][(px >> 24) & 0xFF] += 1
        pos += 1

    codes = [
        [
            _vp8l_write_code(bw, hists[g][0], green_alpha),
            _vp8l_write_code(bw, hists[g][1], 256),
            _vp8l_write_code(bw, hists[g][2], 256),
            _vp8l_write_code(bw, hists[g][3], 256),
            _vp8l_write_code(bw, hists[g][4], 40),
        ]
        for g in range(n_groups)
    ]
    for tok in tokens:
        kind, g = tok[0], tok[1]
        cg = codes[g]
        if kind == "lit":
            px = tok[2]
            _vp8l_write_sym(bw, cg[0], (px >> 8) & 0xFF)
            _vp8l_write_sym(bw, cg[1], (px >> 16) & 0xFF)
            _vp8l_write_sym(bw, cg[2], px & 0xFF)
            _vp8l_write_sym(bw, cg[3], (px >> 24) & 0xFF)
        elif kind == "cache":
            _vp8l_write_sym(bw, cg[0], 280 + tok[2])
        else:
            _, _, lcode, lbits, lval, dcode, dbits, dval = tok
            _vp8l_write_sym(bw, cg[0], 256 + lcode)
            bw.write_bits(lval, lbits)
            _vp8l_write_sym(bw, cg[4], dcode)
            bw.write_bits(dval, dbits)


def _sub_px(a: int, b: int) -> int:
    """Per-channel (a - b) mod 256 on packed ARGB."""
    return (
        ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
        | (((a - b) & 0xFF))
    )


def _vp8l_forward_predictor(flat: list, w: int, h: int, mode: int) -> list:
    """Residuals for a constant predictor ``mode`` with the spec's
    border overrides (top-left=opaque black, first row=L, first
    column=T), predicting from ORIGINAL neighbor values exactly as the
    decoder reconstructs them."""
    out = [0] * len(flat)
    for pos in range(len(flat)):
        y, x = divmod(pos, w)
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[pos - 1]
        elif x == 0:
            pred = flat[pos - w]
        else:
            pred = _vp8l_predict(
                mode, flat[pos - 1], flat[pos - w], flat[pos - w - 1],
                flat[pos - w + 1],
            )
        out[pos] = _sub_px(flat[pos], pred)
    return out


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: "int | None" = None,
    color_transform: "tuple | None" = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
    meta_groups: bool = False,
) -> bytes:
    """Encode H×W×3 uint8 RGB → lossless WebP (VP8L) bytes.

    Fixture/round-trip encoder (not a rate-optimizing one): literal
    prefix-coded pixels by default, with every decoder feature
    exercisable — ``subtract_green``, a constant-mode ``predictor``
    (0-13), a constant ``color_transform`` (g2r, g2b, r2b), ``palette``
    color indexing (sub-byte bundling for ≤16 colors), a color cache
    (``cache_bits``), distance-1 LZ77 runs (``rle``) and a 2-group meta
    prefix-code image (``meta_groups``). ``palette`` is mutually
    exclusive with the pixel-space transforms.
    """
    payload = _encode_vp8l_payload(
        img, subtract_green, predictor, color_transform, palette,
        cache_bits, rle, meta_groups,
    )
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _encode_vp8l_payload(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: "int | None" = None,
    color_transform: "tuple | None" = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
    meta_groups: bool = False,
) -> bytes:
    """The raw VP8L stream (signature byte + bitstream) for one image —
    shared by :func:`encode_webp` and the animated-WebP frame writer."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if palette and (subtract_green or predictor is not None or color_transform):
        raise ValueError("palette excludes the pixel-space transforms")

    a = img.astype(np.uint32)
    flat = [
        int(0xFF000000 | (r_ << 16) | (g_ << 8) | b_)
        for r_, g_, b_ in zip(
            a[..., 0].reshape(-1), a[..., 1].reshape(-1), a[..., 2].reshape(-1)
        )
    ]

    bw = _LsbBitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    cur_w = w

    if palette:
        colors = sorted(set(flat))
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} distinct colors; palette caps at 256")
        lut = {c: i for i, c in enumerate(colors)}
        bw.write_bits(1, 1)
        bw.write_bits(3, 2)  # color indexing
        bw.write_bits(len(colors) - 1, 8)
        deltas, prev = [], 0
        for c in colors:
            deltas.append(_sub_px(c, prev) if prev else _sub_px(c, 0))
            prev = c
        _vp8l_write_image(bw, deltas, len(colors), 1, spatial=False)
        psize = len(colors)
        width_bits = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
        idx = np.array([lut[c] for c in flat], dtype=np.uint32).reshape(h, w)
        if width_bits:
            bpp = 8 >> width_bits
            ppp = 1 << width_bits
            pw = (w + ppp - 1) >> width_bits
            packed = np.zeros((h, pw), dtype=np.uint32)
            for j in range(ppp):
                cols = np.arange(j, w, ppp)
                packed[:, : len(cols)] |= idx[:, cols] << (j * bpp)
            flat = [int(0xFF000000 | (g_ << 8)) for g_ in packed.reshape(-1)]
            cur_w = pw
        else:
            flat = [int(0xFF000000 | (g_ << 8)) for g_ in idx.reshape(-1)]
    else:
        # transforms are declared in FORWARD application order; the
        # decoder applies the inverses in reverse declaration order
        if subtract_green:
            bw.write_bits(1, 1)
            bw.write_bits(2, 2)
            flat = [
                (px & 0xFF00FF00)
                | ((((px >> 16) - (px >> 8)) & 0xFF) << 16)
                | ((px - (px >> 8)) & 0xFF)
                for px in flat
            ]
        if color_transform is not None:
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            bw.write_bits(1, 1)
            bw.write_bits(1, 2)
            bits = max(2, (max(w, h) - 1).bit_length())
            bits = min(bits, 9)
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            bw.write_bits(bits - 2, 3)
            cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
            _vp8l_write_image(bw, [cte] * (tw * th), tw, th, spatial=False)

            def s8(v):
                return ((v & 0xFF) ^ 0x80) - 0x80

            nf = []
            for px in flat:
                green = s8(px >> 8)
                red = s8(px >> 16)
                nr = (((px >> 16) & 0xFF) - ((s8(g2r) * green) >> 5)) & 0xFF
                nb = (
                    (px & 0xFF)
                    - ((s8(g2b) * green) >> 5)
                    - ((s8(r2b) * red) >> 5)
                ) & 0xFF
                nf.append((px & 0xFF00FF00) | (nr << 16) | nb)
            flat = nf
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode must be 0..13")
            bw.write_bits(1, 1)
            bw.write_bits(0, 2)
            bits = max(2, (max(w, h) - 1).bit_length())
            bits = min(bits, 9)
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            bw.write_bits(bits - 2, 3)
            _vp8l_write_image(
                bw, [(0xFF << 24) | (predictor << 8)] * (tw * th), tw, th,
                spatial=False,
            )
            flat = _vp8l_forward_predictor(flat, w, h, predictor)
    bw.write_bits(0, 1)  # end of transforms

    _vp8l_write_image(
        bw, flat, cur_w, h, spatial=True, cache_bits=cache_bits, rle=rle,
        meta_groups=meta_groups,
    )
    return b"\x2f" + bw.bytes()


def decode_webp_anim(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode an animated WebP (VP8X + ANIM + ANMF chapters with VP8L
    frame payloads) → list of (duration_ms, H×W×3 RGB) composited
    full-canvas frames — the same contract as :func:`decode_gif`.

    Compositing per the WebP container spec: each ANMF places its
    frame rect (x/y stored in 2-px units) on the canvas; blending
    method 0 alpha-blends the frame over the canvas, 1 overwrites;
    disposal method 1 restores the rect to the ANIM background color
    after the frame is presented. Lossy (VP8) frames raise toward the
    PIL/ffmpeg seam."""
    canvas_w = canvas_h = None
    bg = 0
    frames: list[tuple[int, np.ndarray]] = []
    canvas = None
    saw_anim = False
    for fourcc, body in _webp_chunks(payload):
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise ValueError("short VP8X chunk")
            canvas_w = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            canvas_h = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
        elif fourcc == b"ANIM":
            if len(body) < 6:
                raise ValueError("short ANIM chunk")
            bg = struct.unpack_from("<I", body, 0)[0]  # BGRA byte order
            saw_anim = True
        elif fourcc == b"ANMF":
            if not saw_anim or canvas_w is None:
                raise ValueError("ANMF before VP8X/ANIM")
            if len(body) < 16:
                raise ValueError("short ANMF chunk")
            fx = 2 * (body[0] | (body[1] << 8) | (body[2] << 16))
            fy = 2 * (body[3] | (body[4] << 8) | (body[5] << 16))
            fw = 1 + (body[6] | (body[7] << 8) | (body[8] << 16))
            fh = 1 + (body[9] | (body[10] << 8) | (body[11] << 16))
            dur = body[12] | (body[13] << 8) | (body[14] << 16)
            flags = body[15]
            blend = (flags >> 1) & 1   # 0 = alpha blend, 1 = overwrite
            dispose = flags & 1        # 1 = restore to background
            sub = None
            for sfour, sbody in _webp_chunks(
                b"RIFF" + struct.pack("<I", len(body) - 16 + 4) + b"WEBP"
                + body[16:]
            ):
                if sfour == b"VP8L":
                    sub = sbody
                    break
                if sfour == b"VP8 ":
                    raise NotImplementedError(
                        "lossy WebP animation frames need a video codec; "
                        "use PIL/ffmpeg behind the dispatch seam"
                    )
            if sub is None:
                raise ValueError("ANMF without VP8L frame data")
            frame = _decode_vp8l_argb(sub)
            if frame.shape != (fh, fw):
                raise ValueError("ANMF frame dimensions mismatch")
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError("ANMF frame outside canvas")
            if canvas is None:
                # background color is BGRA bytes → ARGB word
                b_, g_, r_, a_ = (bg & 0xFF), (bg >> 8) & 0xFF, (bg >> 16) & 0xFF, (bg >> 24) & 0xFF
                bg_argb = (a_ << 24) | (r_ << 16) | (g_ << 8) | b_
                canvas = np.full((canvas_h, canvas_w), bg_argb, dtype=np.uint32)
            target = canvas[fy : fy + fh, fx : fx + fw]
            if blend:
                target[:] = frame
            else:
                fa = ((frame >> 24) & 0xFF).astype(np.int64)
                ca = ((target >> 24) & 0xFF).astype(np.int64)
                oa = fa + ca * (255 - fa) // 255
                out = np.zeros_like(target)
                safe = np.maximum(oa, 1)
                for sh in (16, 8, 0):
                    fc = ((frame >> sh) & 0xFF).astype(np.int64)
                    cc = ((target >> sh) & 0xFF).astype(np.int64)
                    oc = (fc * fa + cc * ca * (255 - fa) // 255) // safe
                    out |= np.minimum(oc, 255).astype(np.uint32) << sh
                out |= oa.astype(np.uint32) << 24
                target[:] = np.where(oa == 0, 0, out)
            rgb = np.empty((canvas_h, canvas_w, 3), dtype=np.uint8)
            rgb[..., 0] = (canvas >> 16) & 0xFF
            rgb[..., 1] = (canvas >> 8) & 0xFF
            rgb[..., 2] = canvas & 0xFF
            frames.append((dur, rgb))
            if dispose:
                target[:] = bg_argb
    if not frames:
        raise ValueError("animated WebP with no ANMF frames")
    return frames


def encode_webp_anim(
    frames: "list[tuple[np.ndarray, tuple[int, int]]] | list[np.ndarray]",
    duration_ms: int = 100,
    canvas: "tuple[int, int] | None" = None,
    bg: int = 0xFF000000,
) -> bytes:
    """Encode RGB frames → animated lossless WebP.

    ``frames`` is either a list of H×W×3 arrays (full-canvas frames) or
    (array, (x, y)) pairs placing sub-rect frames at even offsets on a
    ``canvas`` of (w, h). Frames are written as VP8L payloads with
    blending method 1 (overwrite) and disposal 0 (keep), so compositing
    is deterministic byte-exact for round-trip tests."""
    if not frames:
        raise ValueError("no frames")
    norm = []
    for f in frames:
        if isinstance(f, tuple):
            img, (x, y) = f
        else:
            img, x, y = f, 0, 0
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets are stored in 2-px units; use even x/y")
        norm.append((np.asarray(img, dtype=np.uint8), x, y))
    if canvas is None:
        cw = max(x + im.shape[1] for im, x, y in norm)
        ch = max(y + im.shape[0] for im, x, y in norm)
    else:
        cw, ch = canvas
    for im, x, y in norm:
        if x + im.shape[1] > cw or y + im.shape[0] > ch:
            raise ValueError("frame outside canvas")

    def u24(v):
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    chunks = bytearray()
    # VP8X: animation flag (bit 1 of byte 0 per spec: 0x02 = ANIM)
    vp8x = bytes([0x02, 0, 0, 0]) + u24(cw - 1) + u24(ch - 1)
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    # ANIM: background color (BGRA bytes) + infinite loop
    b_ = bg & 0xFF
    g_ = (bg >> 8) & 0xFF
    r_ = (bg >> 16) & 0xFF
    a_ = (bg >> 24) & 0xFF
    # ARGB input stored as the spec's [B, G, R, A] byte order + loop=0
    anim = bytes([b_, g_, r_, a_]) + struct.pack("<H", 0)
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for im, x, y in norm:
        sub = _encode_vp8l_payload(im)
        frame_chunk = b"VP8L" + struct.pack("<I", len(sub)) + sub
        if len(sub) & 1:
            frame_chunk += b"\x00"
        body = (
            u24(x // 2) + u24(y // 2)
            + u24(im.shape[1] - 1) + u24(im.shape[0] - 1)
            + u24(duration_ms) + bytes([0b10])  # blend=1 (overwrite), dispose=0
            + frame_chunk
        )
        chunks += b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + bytes(chunks)


def encode_bmp_rle8(img: np.ndarray) -> bytes:
    """Encode H×W×3 uint8 RGB (≤256 distinct colors) → RLE8 BMP bytes —
    round-trip partner for the RLE8 decode path, emitting encoded runs,
    word-padded literal runs for non-repeating stretches, end-of-line
    and end-of-bitmap escapes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected H×W×3 uint8 RGB")
    h, w = img.shape[:2]
    colors = np.unique(img.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; RLE8 caps at 256")
    lut = {tuple(c): i for i, c in enumerate(colors)}
    idx = np.array(
        [lut[tuple(px)] for px in img.reshape(-1, 3)], dtype=np.uint8
    ).reshape(h, w)
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2 or w - x == 1:
                data += bytes([run, int(row[x])])
                x += run
            else:
                lit = x + 1
                while (
                    lit < w and lit - x < 255
                    and not (lit + 1 < w and row[lit] == row[lit + 1])
                ):
                    lit += 1
                n_lit = lit - x
                if n_lit < 3:  # literal escape needs ≥3; fall back to runs
                    data += bytes([1, int(row[x])])
                    x += 1
                else:
                    data += bytes([0, n_lit]) + idx[y, x:lit].tobytes()
                    if n_lit & 1:
                        data.append(0)  # word padding
                    x = lit
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    n_col = len(colors)
    pal = bytearray()
    for c in colors:
        pal += bytes([int(c[2]), int(c[1]), int(c[0]), 0])  # BGRX
    pixel_off = 14 + 40 + len(pal)
    hdr = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(data), 0, 0, pixel_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, n_col, 0
    )
    return bytes(hdr) + bytes(pal) + bytes(data)


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Resample mono float samples by linear interpolation on the
    continuous time axis (output length = round(n·dst/src); endpoints
    anchored so duration is preserved to one sample).

    Linear interpolation is the standard cheap resampler: exact for
    any signal band-limited well below Nyquist, with high-frequency
    roll-off near Nyquist instead of aliasing rejection — a windowed-
    sinc polyphase filter is the production upgrade and slots in HERE
    behind the same signature (the resize_plane seam note, for audio).
    Identity when src_rate == dst_rate.
    """
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError(f"rates must be positive, got {src_rate}->{dst_rate}")
    x = np.asarray(samples, dtype=np.float64)
    if src_rate == dst_rate or x.size == 0:
        return x.copy()
    n_out = max(int(round(x.size * dst_rate / src_rate)), 1)
    src_pos = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    return np.interp(src_pos, np.arange(x.size, dtype=np.float64), x)


def resample_sinc(
    samples: np.ndarray, src_rate: int, dst_rate: int, taps: int = 32
) -> np.ndarray:
    """Band-limited resample: windowed-sinc (Hann) interpolation with
    ``taps`` zero-crossings per side — the production-quality path the
    ``resample_linear`` docstring promises. When downsampling, the
    kernel cutoff scales to the OUTPUT Nyquist so aliasing is rejected
    instead of folded; when upsampling it reconstructs the band-limited
    signal near-exactly (tested to 1e-3 RMS on in-band tones, vs the
    linear path's high-frequency droop).

    Vectorized: one (n_out × 2·taps·max(1,src/dst)) gather — memory is
    the tap window, not n_in × n_out. Same length/endpoint contract as
    ``resample_linear``.
    """
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError(f"rates must be positive, got {src_rate}->{dst_rate}")
    x = np.asarray(samples, dtype=np.float64)
    if src_rate == dst_rate or x.size == 0:
        return x.copy()
    ratio = dst_rate / src_rate
    cutoff = min(1.0, ratio)  # fraction of INPUT Nyquist to keep
    half = int(np.ceil(taps / cutoff))
    n_out = max(int(round(x.size * ratio)), 1)
    pos = np.arange(n_out, dtype=np.float64) / ratio  # output → input axis
    base = np.floor(pos).astype(np.int64)
    # gather window indices around each output position
    offs = np.arange(-half + 1, half + 1, dtype=np.int64)
    idx = base[:, None] + offs[None, :]
    frac = pos[:, None] - idx  # signed distance in input samples
    np.clip(idx, 0, x.size - 1, out=idx)
    t = frac * cutoff
    kern = cutoff * np.sinc(t)
    win = np.where(
        np.abs(frac) < half,
        0.5 * (1.0 + np.cos(np.pi * frac / half)),
        0.0,
    )
    kern *= win
    kern /= np.maximum(kern.sum(axis=1, keepdims=True), 1e-12)  # DC-exact
    return (kern * x[idx]).sum(axis=1)
