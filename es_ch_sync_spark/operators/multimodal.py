"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

Decode support is two-tier, honestly split by what pure numpy can do:

- **UNCOMPRESSED formats are decoded for real** — BMP (24-bpp) and PPM
  (P6) images, and RIFF/WAV PCM-16 audio — with lib-free numpy codecs in
  this module (parse → pixel/sample arrays → stats/resize/chunk).  The
  pixel-stat and PCM-chunk operators are oracle-checked end to end: the
  DuckDB oracle recomputes the same statistics from the generating
  formula, so encode→decode→compute must round-trip exactly.
- **PNG decodes for real** — stdlib zlib inflate + spec unfilter
  (encode_png/decode_png below), no image library needed.
- **GIF decodes for real, ANIMATED + COMPOSITED** — stdlib LZW + numpy
  palette lookup (encode_gif/encode_gif_frames/encode_gif_animated/
  parse_gif_frames below): multi-frame clips with graphic-control
  extensions, 4-pass interlace, partial-canvas blits, transparent-index
  pass-through and disposal 0-3 (restore-to-background/previous) —
  the full GIF89a compositing model (r16).
- **Baseline AND progressive JPEG decode for real** — pure numpy Huffman
  + IDCT (encode_jpeg/encode_jpeg_progressive/decode_jpeg below:
  DQT/DHT/SOF0/SOF2/SOS, sampling factors to 2×2, restart intervals,
  spectral-selection + successive-approximation scans);
  arithmetic/12-bit/lossless/hierarchical gate explicitly.
- **MJPEG-AVI video decodes for real** — RIFF container walk
  (encode_mjpeg_avi/parse_mjpeg_avi) + per-frame baseline-JPEG decode;
  sample_video_frames / video_frame_stats are real kernels now.
- **Lossless WebP (VP8L) decodes for real** — canonical prefix codes,
  LZ77 + color cache, subtract-green/predictor inverse transforms
  (operators/webp.py); lossy VP8/VP8X and MP4/H.264 stay gated (they
  need Pillow/pyav): those paths raise NotImplementedError (job-level
  kernels) or emit a per-row ``error`` column (row-level kernels),
  never silently fake pixels.

Everything Spark-side is real and tested either way: the schema contract,
the `mapInPandas` batch shape, partition sizing, and the metadata
projection.

Scale posture for binary columns:
- keep blobs in their own column so Parquet column pruning skips them for
  metadata-only queries;
- size partitions by *bytes not rows* (`spark.sql.files.maxPartitionBytes`)
  because blob rows are huge;
- never collect blobs; feature extraction reduces each blob to a small
  struct before any shuffle.
"""

from __future__ import annotations

import struct as _struct

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Errors a malformed blob may legitimately raise out of the pure-python
# codecs.  Row-level kernels catch exactly this tuple so ONE bad
# real-world blob lands in its row's ``error`` column instead of failing
# the whole Spark job (ADVICE r14: struct.error from short segment/chunk
# bodies and KeyError from scans that omit a component escaped the old
# three-way catch).  The decoders below also length-check their inputs so
# most malformed streams surface as ValueError at the source.
_ROW_DECODE_ERRORS = (
    NotImplementedError, ValueError, IndexError, KeyError, _struct.error,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque blob
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# Lib-free codecs for UNCOMPRESSED formats (pure numpy, no Pillow/pyav).
# BMP: Windows BITMAPINFOHEADER, 24-bpp, bottom-up, BGR, 4-byte row padding.
# PPM: P6 binary RGB.  WAV: RIFF canonical PCM-16 little-endian.
# ---------------------------------------------------------------------------


def encode_bmp(arr) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bpp BMP bytes."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += a[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    img_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return bytes(header + info + body)


def decode_bmp(blob: bytes):
    """24-bpp uncompressed BMP → (H, W, 3) uint8 RGB."""
    import struct

    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}: only 24-bpp uncompressed")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(blob, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(arr) -> bytes:
    """(H, W, 3) uint8 RGB → binary P6 PPM."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(blob: bytes):
    """Binary P6 PPM → (H, W, 3) uint8 RGB."""
    import numpy as np

    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment to EOL
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(int(blob[i:j]))
        i = j
    i += 1  # the single whitespace before the raster
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM")
    return (
        np.frombuffer(blob, dtype=np.uint8, count=h * w * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """1-D int16 mono samples → canonical RIFF/WAV PCM bytes."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(blob: bytes):
    """RIFF/WAV PCM-16 mono → (samples int16 ndarray, sample_rate).  Walks
    the chunk list (tolerates LIST/fact/etc. between fmt and data)."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"WAV fmt={audio_fmt} bits={bits} ch={channels}: only PCM-16 mono"
                )
        elif cid == b"data":
            data = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return data, rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr, color_type: int | None = None, interlace: bool = False) -> bytes:
    """uint8 image → PNG bytes — pure stdlib zlib + struct, no image
    library.  (H, W, 3) RGB encodes as color type 2 (truecolor) or — with
    ``color_type=3`` — as a PLTE-paletted image (ValueError above 256
    distinct colors); (H, W) grayscale encodes as color type 0.  All at
    bit depth 8, filter 0 on every scanline, one zlib IDAT;
    ``interlace=True`` writes the real Adam7 pass structure.  Pairs with
    :func:`decode_png` for the synth round-trip oracles."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if color_type is None:
        color_type = 0 if gray else 2
    if color_type == 0 and not gray:
        raise ValueError("grayscale PNG needs a 2-D array")
    if color_type in (2, 3) and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("truecolor/paletted PNG needs (H, W, 3)")
    if color_type not in (0, 2, 3):
        raise ValueError(f"unsupported PNG color type {color_type}")
    h, w = a.shape[:2]
    plte = b""
    if color_type == 3:
        colors, inverse = _unique_rgb(a.reshape(-1, 3))
        if len(colors) > 256:
            raise ValueError(
                f"PNG palette overflow: {len(colors)} > 256 colors"
            )
        plte = colors.astype(np.uint8).tobytes()
        img = inverse.reshape(h, w).astype(np.uint8)
    elif color_type == 0:
        img = a
    else:
        img = a

    def pass_bytes(sub) -> bytes:
        return b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))

    if interlace:
        raw = b"".join(
            pass_bytes(img[y0::dy, x0::dx])
            for x0, y0, dx, dy in _PNG_PASSES
            if img[y0::dy, x0::dx].shape[0] and img[y0::dy, x0::dx].shape[1]
        )
    else:
        raw = pass_bytes(img)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0
    )
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per spec §8.2.
_PNG_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_unfilter(raw, offset, ph, stride, fbpp):
    """Reconstruct ``ph`` scanlines of ``stride`` filtered bytes starting
    at ``offset`` (all five filter types per spec §9); returns a
    (ph, stride) uint8 array.  Up/None rows reconstruct vectorized;
    Sub/Average/Paeth run the spec's sequential byte recurrence."""
    import numpy as np

    out = np.zeros((ph, stride), dtype=np.uint8)
    for y in range(ph):
        ftype = raw[offset + y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, offset + y * (stride + 1) + 1
        ).copy()
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = line + prev
        elif ftype == 1:  # Sub
            cur = line
            for x in range(fbpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - fbpp])) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - fbpp]) if x >= fbpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - fbpp]) if x >= fbpp else 0
                b = int(prev[x])
                c = int(prev[x - fbpp]) if x >= fbpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pr) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur
    return out


def decode_png(blob: bytes):
    """PNG → (H, W, 3) uint8 RGB — pure stdlib zlib + numpy: chunk walk,
    one zlib inflate, per-scanline unfilter, sample decode.

    Supported (r15 — the full spec color/interlace matrix): color types
    0 (grayscale, depths 1/2/4/8/16), 2 (RGB, 8/16), 3 (paletted,
    1/2/4/8), 4 (gray+alpha, 8/16) and 6 (RGBA, 8/16), each either
    non-interlaced or Adam7-interlaced.  Sub-8-bit samples scale to
    8-bit by the exact 255/(2^d−1) factor; 16-bit samples take the high
    byte; alpha is dropped.  Malformed streams raise ValueError."""
    import struct
    import zlib

    import numpy as np

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(blob):
        size, tag = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            if size != 13:
                raise ValueError("truncated PNG chunk")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if ctype not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(
                    f"bad PNG depth={depth} color_type={ctype} combination"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            if size % 3:
                raise ValueError("bad PNG PLTE size")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if ctype == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # zlib.error is not in the row-level catch tuple; a corrupt
        # IDAT must surface as ValueError so one bad blob lands in its
        # row's error column instead of failing the job (r15 fuzz find)
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    channels = _PNG_CHANNELS[ctype]
    fbpp = max(1, channels * depth // 8)
    passes = _PNG_PASSES if interlace else ((0, 0, 1, 1),)
    # Validate the TOTAL expected scanline payload against what actually
    # inflated BEFORE allocating the output: a corrupted IHDR can claim
    # multi-gigapixel dimensions and a naive h×w allocation would
    # MemoryError (r15 fuzz find) — the inflated byte count bounds every
    # allocation instead.
    total = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw > 0 and ph > 0:
            total += ph * (1 + (pw * channels * depth + 7) // 8)
    if total != len(raw):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, w, 3), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("PNG scanline payload size mismatch")
        rows = _png_unfilter(raw, pos, ph, stride, fbpp)
        pos += need
        if depth == 8:
            samples = rows[:, : pw * channels]
        elif depth == 16:
            samples = rows.reshape(ph, -1)[:, : pw * channels * 2 : 2]
        else:
            bits = np.unpackbits(rows, axis=1)
            samples = (
                bits[:, : pw * channels * depth]
                .reshape(ph, pw * channels, depth)
                .dot(1 << np.arange(depth - 1, -1, -1))
                .astype(np.uint8)
            )
        if ctype == 3:
            idx = samples.reshape(ph, pw).astype(np.int64)
            if int(idx.max(initial=0)) >= len(plte):
                raise ValueError("PNG palette index out of range")
            rgb = plte[idx]
        elif ctype in (0, 4):
            g = samples.reshape(ph, pw, channels)[:, :, 0]
            if depth < 8:
                g = (g.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
                    np.uint8
                )
            rgb = np.stack([g] * 3, axis=-1)
        else:
            rgb = samples.reshape(ph, pw, channels)[:, :, :3]
        out[y0::dy, x0::dx] = rgb
    if pos != len(raw):
        raise ValueError("PNG scanline payload size mismatch")
    return out


# ---------------------------------------------------------------------------
# GIF (87a/89a) — single-frame decode + writer, stdlib-only LZW + numpy
# palette lookup (r12 verdict directive #4: close the GIF gate the PNG
# way).  Animation, interlace, and partial-canvas frames are explicitly
# gated with NotImplementedError; malformed input is a ValueError.
# ---------------------------------------------------------------------------


def _unique_rgb(flat):
    """np.unique(flat, axis=0, return_inverse=True) for (N, 3) uint8 rows
    via packed uint32 keys (r17, guide §4.2): axis-unique pays a structured
    view + lexicographic argsort (cProfile: 0.96 s cum over the 2000-doc
    agif corpus); packing r<<16|g<<8|b makes it the 1-D fast path.  Row
    order is identical by construction — lexicographic (r, g, b) IS numeric
    order of the packed key — so palettes and inverse indices match the
    axis-unique output exactly."""
    import numpy as np

    f = flat.astype(np.uint32)
    packed = (f[:, 0] << 16) | (f[:, 1] << 8) | f[:, 2]
    keys, inverse = np.unique(packed, return_inverse=True)
    colors = np.empty((len(keys), 3), np.uint8)
    colors[:, 0] = keys >> 16
    colors[:, 1] = (keys >> 8) & 0xFF
    colors[:, 2] = keys & 0xFF
    return colors, inverse


def _gif_lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW: variable-width codes starting at mcs+1 bits,
    LSB-first bit packing, clear/EOI codes, dictionary capped at 4096
    (images here never fill it, so no mid-stream clear is emitted).

    r17 (guide §4.2): the dictionary keys on ``(current_code << 8) |
    symbol`` ints instead of symbol tuples — sequences and their codes
    are in bijection, so the greedy match and every emitted code are
    identical, without a tuple allocation + tuple hash per pixel
    (cProfile: 0.346 → ~0.11 s tottime over the 2000-doc agif corpus)."""
    clear = 1 << mcs
    eoi = clear + 1
    code_size = mcs + 1
    d: dict[int, int] = {}
    next_code = eoi + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    seq = indices.tolist() if hasattr(indices, "tolist") else list(map(int, indices))
    w = -1  # code of the currently-matched sequence; -1 = empty
    for k in seq:
        if w < 0:
            w = k
            continue
        key = (w << 8) | k
        nxt = d.get(key)
        if nxt is not None:
            w = nxt
            continue
        emit(w)
        if next_code < 4096:
            d[key] = next_code
            next_code += 1
            # the encoder's dictionary runs one entry ahead of the
            # decoder's at each emission, so it widens one entry later
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = k
    if w >= 0:
        emit(w)
        # Mirror the decoder's entry-add on the FINAL data code: the
        # decoder inserts a table entry for every received code and
        # widens when its table hits 2^code_size, so when that final add
        # crosses the boundary it reads EOI at the wider size.  Without
        # this phantom add the encoder emits EOI one bit narrower and
        # the stream truncates (first hit: a 64-pixel constant frame at
        # mcs=2 — the add lands exactly on next_code 16).
        if next_code - 1 < 4096:
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, expected: int) -> list[int]:
    """Spec decoder (GIF89a appendix F): the ground truth the encoder is
    property-tested against — code == next_code handles the KwKwK case;
    width bumps when the table reaches 2^code_size; deferred-clear
    tolerated (table full ⇒ stop growing until a clear code)."""
    clear = 1 << mcs
    eoi = clear + 1
    out: list[int] = []
    cur = 0
    nbits = 0
    pos = 0
    table: dict[int, tuple] = {}
    next_code = 0
    code_size = mcs + 1
    prev: tuple | None = None

    def reset() -> None:
        nonlocal table, next_code, code_size, prev
        table = {i: (i,) for i in range(clear)}
        next_code = eoi + 1
        code_size = mcs + 1
        prev = None

    reset()
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            cur |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("bad GIF LZW code")
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF pixel overflow")
    if len(out) != expected:
        raise ValueError("GIF pixel count mismatch")
    return out


def _gif_interlace_rows(h: int) -> list[int]:
    """GIF89a appendix E interlace order: the row indices in the order
    the four passes store them (pass 1: every 8th from 0; pass 2: every
    8th from 4; pass 3: every 4th from 2; pass 4: every 2nd from 1)."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def encode_gif(arr, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → single-frame GIF87a bytes: global palette
    (np.unique color order — deterministic), LZW-compressed index
    stream; ``interlace=True`` stores rows in the real 4-pass order.
    Raises ValueError above 256 distinct colors (inherent GIF limit,
    not a gate)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, inverse = _unique_rgb(flat)
    if len(colors) > 256:
        raise ValueError(f"GIF palette overflow: {len(colors)} > 256 colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), np.uint8)
    pal[: len(colors)] = colors
    mcs = max(2, bits)  # spec: LZW min code size >= 2
    idx = inverse.reshape(h, w)
    if interlace:
        idx = idx[_gif_interlace_rows(h)]
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    out += pal.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    data = _gif_lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def parse_gif_frames(blob: bytes) -> dict:
    """GIF87a/89a → {"w", "h", "frames": [(H, W, 3) uint8 …],
    "delays_cs": [int …]} — stdlib LZW + numpy palette lookup, MULTI-FRAME
    (r14 VERDICT directive #2: animated GIF un-gated).

    Decodes with FULL COMPOSITING (r16 VERDICT directive #1): global or
    local color tables, 4-pass interlace, partial-canvas frames blitted
    at their (left, top) offset, transparent-index pass-through, and all
    four defined disposal methods — 0/1 leave the canvas, 2 restores the
    frame's rectangle to the background color, 3 restores it to the
    canvas state before the frame was drawn.  Each returned frame is the
    COMPOSED canvas after its image was rendered (the sequence a viewer
    displays), so full-canvas opaque streams return exactly the stored
    pixels, unchanged from the pre-r16 semantics.  The canvas starts as
    the logical-screen background color (GCT[bg] when a GCT exists, else
    black), which is also what disposal 2 restores — the spec's literal
    "restore to background color" reading, pinned by the
    encode→parse round trip.  Reserved disposal values 4-7 and frames
    extending past the canvas raise ValueError; truncation and malformed
    streams raise ValueError."""
    import struct

    import numpy as np

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(blob) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_idx, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + n * 3 > len(blob):
            raise ValueError("truncated GIF color table")
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8).copy()
    frames: list = []
    delays: list[int] = []
    pending_delay = 0
    pending_disposal = 0
    pending_transparent = -1  # no transparent index
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label byte + sub-blocks
            if pos + 2 > len(blob):
                raise ValueError("truncated GIF extension")
            label = blob[pos + 1]
            pos += 2
            first_block = True
            while True:
                if pos >= len(blob):
                    raise ValueError("truncated GIF extension")
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(blob):
                    raise ValueError("truncated GIF extension block")
                if label == 0xF9 and first_block:  # graphic control
                    if sz < 4:
                        raise ValueError("truncated GIF graphic control")
                    gp = blob[pos]
                    pending_disposal = (gp >> 2) & 0x07
                    if pending_disposal > 3:
                        raise ValueError(
                            f"reserved GIF disposal method {pending_disposal}"
                        )
                    pending_transparent = blob[pos + 3] if gp & 0x01 else -1
                    pending_delay = blob[pos + 1] | (blob[pos + 2] << 8)
                first_block = False
                pos += sz
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            left, top, iw, ih, ip = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            if left + iw > w or top + ih > h or iw == 0 or ih == 0:
                raise ValueError("GIF frame outside canvas")
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                if pos + n * 3 > len(blob):
                    raise ValueError("truncated GIF local color table")
                pal = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without a color table")
            if pos >= len(blob):
                raise ValueError("truncated GIF image data")
            mcs = blob[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad GIF LZW min code size {mcs}")
            data = bytearray()
            while True:
                if pos >= len(blob):
                    raise ValueError("truncated GIF data sub-blocks")
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(blob):
                    raise ValueError("truncated GIF data sub-block")
                data += blob[pos : pos + sz]
                pos += sz
            idx = np.array(
                _gif_lzw_decode(bytes(data), mcs, iw * ih), dtype=np.int64
            ).reshape(ih, iw)
            if ip & 0x40:  # interlaced: stored rows map to 4-pass order
                out = np.empty_like(idx)
                out[_gif_interlace_rows(ih)] = idx
                idx = out
            opaque = (
                idx != pending_transparent
                if pending_transparent >= 0
                else np.ones_like(idx, dtype=bool)
            )
            if idx[opaque].max(initial=0) >= len(pal):
                raise ValueError("GIF index outside color table")
            region = canvas[top : top + ih, left : left + iw]
            if pending_disposal == 3:
                saved = region.copy()
            # transparent pixels pass the existing canvas through; the
            # clip guards pal from out-of-range TRANSPARENT indices
            # (opaque ones were bounds-checked above)
            region[opaque] = pal[np.clip(idx, 0, len(pal) - 1)][opaque]
            frames.append(canvas.copy())
            if pending_disposal == 2:
                region[:] = bg_rgb
            elif pending_disposal == 3:
                region[:] = saved
            delays.append(pending_delay)
            pending_delay = 0
            pending_disposal = 0
            pending_transparent = -1
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF missing image data")
    return {"w": w, "h": h, "frames": frames, "delays_cs": delays}


def decode_gif(blob: bytes):
    """GIF → (H, W, 3) uint8 RGB: the FIRST frame (the conventional
    still-image reading of an animation; parse_gif_frames returns them
    all).  Same gates as parse_gif_frames."""
    return parse_gif_frames(blob)["frames"][0]


def encode_gif_frames(specs, w: int, h: int, gct=None, bg_index: int = 0) -> bytes:
    """Low-level animated GIF89a writer that exercises the FULL
    compositing feature set parse_gif_frames decodes (r16 directive #1).
    Each spec is a dict: ``rgb`` (ih, iw, 3) uint8, optional ``left`` /
    ``top`` (partial-canvas position, default 0), ``disposal`` (0-3,
    default 1), ``delay_cs`` (default 10) and ``alpha`` — an (ih, iw)
    bool mask where False pixels are written as a TRANSPARENT index (the
    composed canvas shows through).  Every frame gets its own local
    color table (np.unique order + one appended transparent slot when
    needed) behind a real graphic-control extension; ``gct`` (K, 3)
    uint8 + ``bg_index`` emit a global color table defining the
    background color disposal 2 restores."""
    import struct

    import numpy as np

    out = bytearray(b"GIF89a")
    if gct is not None:
        g = np.asarray(gct, dtype=np.uint8).reshape(-1, 3)
        bits = max(1, int(len(g) - 1).bit_length())
        pal = np.zeros((1 << bits, 3), np.uint8)
        pal[: len(g)] = g
        out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), bg_index, 0)
        out += pal.tobytes()
    else:
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    for spec in specs:
        a = np.asarray(spec["rgb"], dtype=np.uint8)
        ih, iw = a.shape[:2]
        left = int(spec.get("left", 0))
        top = int(spec.get("top", 0))
        disposal = int(spec.get("disposal", 1))
        delay_cs = int(spec.get("delay_cs", 10))
        alpha = spec.get("alpha")
        if left + iw > w or top + ih > h:
            raise ValueError("GIF frame outside canvas")
        if not 0 <= disposal <= 3:
            raise ValueError(f"bad GIF disposal {disposal}")
        colors, inverse = _unique_rgb(a.reshape(-1, 3))
        idx = inverse.reshape(ih, iw).astype(np.int64)
        n_colors = len(colors)
        transparent = -1
        if alpha is not None:
            m = np.asarray(alpha, dtype=bool)
            if m.shape != (ih, iw):
                raise ValueError("GIF alpha mask shape mismatch")
            if not m.all():
                transparent = n_colors  # one extra palette slot
                n_colors += 1
                idx = np.where(m, idx, transparent)
        if n_colors > 256:
            raise ValueError(
                f"GIF palette overflow: {n_colors} > 256 colors"
            )
        bits = max(1, int(n_colors - 1).bit_length())
        pal = np.zeros((1 << bits, 3), np.uint8)
        pal[: len(colors)] = colors
        mcs = max(2, bits)
        gce_flags = (disposal << 2) | (1 if transparent >= 0 else 0)
        out += bytes([0x21, 0xF9, 0x04, gce_flags])
        out += struct.pack("<H", delay_cs)
        out += bytes([max(transparent, 0), 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", left, top, iw, ih, 0x80 | (bits - 1)
        )
        out += pal.tobytes()
        out.append(mcs)
        data = _gif_lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif_animated(frames, delay_cs: int = 10, deltas: bool = False) -> bytes:
    """List of (H, W, 3) uint8 COMPOSED frames → animated GIF89a bytes.

    ``deltas=False``: one full-canvas opaque image per frame (disposal 1,
    local color table each) — the pre-r16 layout.  ``deltas=True`` emits
    the r16 inter-frame-optimized layout real encoders produce: frame 0
    full, every later frame only the BOUNDING BOX of pixels that changed
    vs the previous composed frame, with unchanged pixels inside the box
    stored as a transparent index (disposal 1).  parse_gif_frames
    composites either layout back to exactly ``frames`` — the round trip
    that pins the compositor."""
    import numpy as np

    if not frames:
        raise ValueError("no GIF frames")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for a in arrs:
        if a.shape[:2] != (h, w):
            raise ValueError("GIF frames must share the canvas size")
    specs = [{"rgb": arrs[0], "delay_cs": delay_cs, "disposal": 1}]
    for prev, cur in zip(arrs, arrs[1:]):
        if not deltas:
            specs.append({"rgb": cur, "delay_cs": delay_cs, "disposal": 1})
            continue
        changed = (cur != prev).any(axis=2)
        if not changed.any():
            # identical frame: 1×1 fully-transparent image keeps the
            # frame count without touching the canvas
            specs.append(
                {
                    "rgb": cur[:1, :1],
                    "alpha": np.zeros((1, 1), bool),
                    "delay_cs": delay_cs,
                    "disposal": 1,
                }
            )
            continue
        rows = np.flatnonzero(changed.any(axis=1))
        cols = np.flatnonzero(changed.any(axis=0))
        top, bot = int(rows[0]), int(rows[-1]) + 1
        left, right = int(cols[0]), int(cols[-1]) + 1
        specs.append(
            {
                "rgb": cur[top:bot, left:right],
                "alpha": changed[top:bot, left:right],
                "left": left,
                "top": top,
                "delay_cs": delay_cs,
                "disposal": 1,
            }
        )
    return encode_gif_frames(specs, w, h)


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 sequential DCT, Huffman) — pure numpy + stdlib.
#
# The r13 VERDICT asked for the real thing: a baseline-JPEG frame decoder
# (DQT/DHT/SOF0/SOS walk, canonical Huffman, dequant, de-zigzag, IDCT,
# YCbCr→RGB) plus an encoder so fixtures are REAL entropy-coded JPEGs
# generated executor-side.  The decoder is general (it builds Huffman
# tables from whatever DHT declares, honors sampling factors up to 2×2,
# restart intervals, and multi-table DQT) so it also reads ordinary
# baseline files; progressive (SOF2), arithmetic coding, 12-bit precision
# and hierarchical modes gate with NotImplementedError naming the feature.
#
# Oracle-ability: JPEG is lossy, so the hash-matched query fixtures use
# 8×8-BLOCK-CONSTANT images with an all-ones quantization table — a
# constant block's DCT is exactly (DC = 8·(v−128), AC = 0), which
# quantizes and inverse-transforms back to v with zero error, making
# decode(encode(x)) = x EXACTLY and the pixel stats a closed form the
# DuckDB oracle recomputes (the multimodal_gif_stats pattern).  Arbitrary
# images round-trip within a small bound (property-tested), which is the
# honest statement of JPEG semantics.
# ---------------------------------------------------------------------------


def _jpeg_zigzag():
    """The 64 (row, col) positions in JPEG zig-zag scan order, generated
    from the anti-diagonal rule (even diagonals ascend, odd descend) —
    derivation instead of a transcribed table."""
    order = []
    for s in range(15):
        rs = range(max(0, s - 7), min(7, s) + 1)
        rows = reversed(rs) if s % 2 == 0 else rs
        order.extend((r, s - r) for r in rows)
    return order


_JPEG_ZZ = _jpeg_zigzag()


def _jpeg_dct_matrix():
    import numpy as np

    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2.0)
    return a


# Huffman tables: UNIFORM-LENGTH canonical codes (12 DC categories at 4
# bits; the 162 baseline AC symbols at 8 bits).  Legal per T.81 (prefix-
# free, no all-ones code), chosen over the Annex K defaults so the tables
# are constructed, not transcribed — the decoder reads whatever DHT
# declares either way, so it still decodes Annex-K-coded files.
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0] * 7 + [162] + [0] * 8
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _huff_encode_map(bits, vals):
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits, vals):
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self):
        while self._n:
            self.write(1, 1)  # pad to byte with 1-bits (T.81 F.1.2.3)


class _JpegBitReader:
    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy segment"
                )
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read(self, n):
        while self._n < n:
            self._fill()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_huff(self, table):
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self, m):
        """Byte-align and consume the expected RSTm marker."""
        self._acc = 0
        self._n = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("missing JPEG restart marker")
        got = self.data[self.pos + 1]
        if got != 0xD0 + (m % 8):
            raise ValueError(f"unexpected restart marker 0xFF{got:02X}")
        self.pos += 2


def _jpeg_extend(raw, cat):
    if cat == 0:
        return 0
    return raw - (1 << cat) + 1 if raw < (1 << (cat - 1)) else raw


def _jpeg_category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _jpeg_encode_block(bw, coeffs, prev_dc, dc_map, ac_map):
    """Entropy-encode one zig-zagged, quantized 64-coefficient block."""
    diff = int(coeffs[0]) - prev_dc
    cat = _jpeg_category(diff)
    code, length = dc_map[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_map[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _jpeg_category(v)
        code, length = ac_map[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        bw.write(code, length)
    return int(coeffs[0])


def _jpeg_decode_block_full(br, block, dctab, actab, pred):
    """Baseline sequential entropy decode of one 64-coefficient block
    (zig-zag order) into ``block``; returns the new DC prediction."""
    cat = br.read_huff(dctab)
    if cat > 11:
        raise ValueError("bad DC category")
    pred += _jpeg_extend(br.read(cat), cat)
    block[0] = pred
    k = 1
    while k < 64:
        sym = br.read_huff(actab)
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        run, size = sym >> 4, sym & 15
        k += run
        if k > 63 or size == 0:
            raise ValueError("bad AC run/size")
        block[k] = _jpeg_extend(br.read(size), size)
        k += 1
    return pred


def _jpeg_ac_first(br, block, actab, ss, se, al, eobrun):
    """Progressive AC first scan (Ah=0) for one block: spectral band
    [ss, se] at point transform ``al``; EOB runs span blocks (T.81
    G.1.2.2) — returns the remaining EOB run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = br.read_huff(actab)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            block[k] = _jpeg_extend(br.read(s), s) << al
            k += 1
    return 0


def _jpeg_ac_refine(br, block, actab, ss, se, al, eobrun):
    """Progressive AC refinement scan (Ah=Al+1) for one block: newly
    nonzero coefficients arrive with magnitude 1 at bit ``al``; already
    nonzero coefficients receive one correction bit each (T.81 G.1.2.3,
    the same control flow libjpeg's jdphuff uses).  Returns the remaining
    EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = br.read_huff(actab)
            r, s = sym >> 4, sym & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if br.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break
            # advance past r zero-history coefficients, emitting one
            # correction bit for every nonzero-history one on the way
            while k <= se:
                if block[k]:
                    if br.read(1) and not (block[k] & p1):
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement run past band end")
                block[k] = val
            k += 1
    if eobrun:
        while k <= se:
            if block[k]:
                if br.read(1) and not (block[k] & p1):
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_scan(
    blob, pos, frame, scan, ss, se, ah, al,
    dc_tabs, ac_tabs, coefs, dri, progressive,
):
    """Entropy-decode one scan's data starting at ``pos`` into the
    per-component coefficient planes ``coefs``; returns the stream
    position of the next marker.  Handles baseline full-block scans,
    progressive DC first/refinement (interleaved or single-component)
    and progressive AC first/refinement (single-component only, per
    T.81 G.1), with restart-interval support in all modes."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    sc = []
    for s in scan:
        c = by_id.get(s["id"])
        if c is None:
            raise ValueError("SOS references unknown component")
        need_dc = (not progressive) or (ss == 0 and ah == 0)
        need_ac = (not progressive) or ss > 0
        dc = dc_tabs.get(s["td"]) if need_dc else None
        ac = ac_tabs.get(s["ta"]) if need_ac else None
        if (need_dc and dc is None) or (need_ac and ac is None):
            raise ValueError("SOS references undefined Huffman table")
        sc.append((c, dc, ac))
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(sc) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if ss > se or se > 63:
            raise ValueError("bad spectral band")
        if ah and ah != al + 1:
            raise ValueError("successive approximation must step one bit")
    else:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("baseline scan must cover 0..63 at Ah=Al=0")

    br = _JpegBitReader(blob, pos)
    prev = {c["id"]: 0 for c, _, _ in sc}
    eobrun = 0
    rst = 0
    interleaved = len(sc) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        c0 = sc[0][0]
        # Non-interleaved scans cover the component's OWN block grid
        # (ceil of its scaled dimensions), not the MCU-padded grid.
        cw = -(-(w * c0["h"]) // maxh)
        ch = -(-(h * c0["v"]) // maxv)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        n_units = nbx * nby
    for mi in range(n_units):
        if dri and mi and mi % dri == 0:
            br.restart(rst)
            rst += 1
            prev = {c["id"]: 0 for c, _, _ in sc}
            eobrun = 0
        if interleaved:
            my, mx = divmod(mi, mcux)
            units = [
                (c, dc, ac, (my * c["v"] + bv), (mx * c["h"] + bh))
                for c, dc, ac in sc
                for bv in range(c["v"])
                for bh in range(c["h"])
            ]
        else:
            c, dc, ac = sc[0]
            by, bx = divmod(mi, nbx)
            units = [(c, dc, ac, by, bx)]
        for c, dc, ac, by, bx in units:
            block = coefs[c["id"]][by, bx]
            if not progressive:
                prev[c["id"]] = _jpeg_decode_block_full(
                    br, block, dc, ac, prev[c["id"]]
                )
            elif ss == 0 and ah == 0:  # DC first
                cat = br.read_huff(dc)
                if cat > 11:
                    raise ValueError("bad DC category")
                prev[c["id"]] += _jpeg_extend(br.read(cat), cat)
                block[0] = prev[c["id"]] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if br.read(1):
                    block[0] |= 1 << al
            elif ah == 0:
                eobrun = _jpeg_ac_first(br, block, ac, ss, se, al, eobrun)
            else:
                eobrun = _jpeg_ac_refine(br, block, ac, ss, se, al, eobrun)
    # resync to the next marker (skip pad bytes / stray stuffing)
    p = br.pos
    n = len(blob)
    while p + 1 < n and not (
        blob[p] == 0xFF and blob[p + 1] not in (0x00,)
        and not (0xD0 <= blob[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def encode_jpeg(
    arr, subsample: str = "444", restart_interval: int = 0, qtable=None
) -> bytes:
    """(H, W) or (H, W, 3) uint8 → baseline JFIF bytes with an all-ones
    quantization table (q=1: maximum-fidelity baseline; 8×8-constant
    blocks round-trip EXACTLY — see module notes).  Grayscale stays one
    component; RGB encodes as YCbCr (BT.601, rounded) at 4:4:4 or —
    ``subsample="420"`` — with 2×2-box-averaged chroma, which exercises
    the decoder's sampling-factor/MCU-interleave path for real.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset, bitstream byte-aligned) — the
    error-resilience feature real camera JPEGs use, and the encoder-side
    exerciser for the decoder's restart path."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    # chroma box-average spans per mode (r16: 4:2:2 and 4:1:1 exercise
    # the decoder's non-square / above-2 sampling factors for real)
    spans = {"444": (1, 1), "422": (2, 1), "420": (2, 2), "411": (4, 1)}
    if subsample not in spans:
        raise ValueError(f"unsupported subsample {subsample!r}")
    if gray:
        planes = [a.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
        cr = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
        planes = [y, cb, cr]
        sx, sy = spans[subsample]
        factors = [(sx, sy), (1, 1), (1, 1)]
        if (sx, sy) != (1, 1):
            for i in (1, 2):
                p = planes[i]
                eh = -(-p.shape[0] // sy) * sy
                ew = -(-p.shape[1] // sx) * sx
                q = np.empty((eh, ew))
                q[: p.shape[0], : p.shape[1]] = p
                q[p.shape[0] :, : p.shape[1]] = p[-1:, : p.shape[1]]
                q[:, p.shape[1] :] = q[:, p.shape[1] - 1 : p.shape[1]]
                planes[i] = np.round(
                    q.reshape(eh // sy, sy, ew // sx, sx).mean(axis=(1, 3))
                )
    return _emit_baseline_jpeg(
        planes, factors, h, w, restart_interval, qtable=qtable
    )


def _emit_baseline_jpeg(
    planes, factors, h, w, restart_interval=0, app14_transform=None,
    qtable=None,
):
    """Shared baseline-JPEG emitter (standard Huffman tables) for any
    component count; ``app14_transform`` emits an Adobe APP14 segment
    (r16 directive #4: the 4-component CMYK/YCCK convention marker);
    ``qtable`` — an (8, 8) natural-order quantization table — replaces
    the default all-ones table (r16 directive #5: REAL-table dequant,
    coefficients quantized as round(coef / q) and the DQT carried in
    zig-zag order)."""
    import struct

    import numpy as np

    if qtable is None:
        q_nat = np.ones((8, 8))
    else:
        q_nat = np.asarray(qtable, dtype=np.float64)
        if q_nat.shape != (8, 8) or (q_nat < 1).any() or (q_nat > 255).any():
            raise ValueError("qtable must be (8, 8) with entries 1..255")

    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        ph, pw = mcuy * fv * 8, mcux * fh * 8
        q = np.empty((ph, pw))
        sh, sw = min(p.shape[0], ph), min(p.shape[1], pw)
        q[:sh, :sw] = p[:sh, :sw]
        q[sh:, :sw] = q[sh - 1 : sh, :sw]
        q[:, sw:] = q[:, sw - 1 : sw]
        padded.append(q)

    A = _jpeg_dct_matrix()
    zz_r = [r for r, _ in _JPEG_ZZ]
    zz_c = [c for _, c in _JPEG_ZZ]
    dc_map = _huff_encode_map(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_map = _huff_encode_map(_JPEG_AC_BITS, _JPEG_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if app14_transform is not None:
        out += b"\xff\xee" + struct.pack(">H", 14)
        out += b"Adobe" + bytes([0, 100, 0, 0, 0, 0, app14_transform])
    zz_q = bytes(int(q_nat[r, c]) for r, c in _JPEG_ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (fh, fv) in enumerate(factors):
        out += bytes([ci + 1, (fh << 4) | fv, 0])
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([cls]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw = _JpegBitWriter()
    prev = [0] * ncomp
    rst = 0
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()  # byte-align before the marker (T.81 E.1.4)
            out += bw.buf
            bw = _JpegBitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            prev = [0] * ncomp
        my, mx = divmod(mi, mcux)
        for ci, (p, (fh, fv)) in enumerate(zip(padded, factors)):
            for bv in range(fv):
                for bh in range(fh):
                    y0 = (my * fv + bv) * 8
                    x0 = (mx * fh + bh) * 8
                    blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = np.rint((A @ blk @ A.T) / q_nat).astype(np.int64)
                    zzc = coef[zz_r, zz_c]
                    prev[ci] = _jpeg_encode_block(
                        bw, zzc, prev[ci], dc_map, ac_map
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(stored, transform: int = 0) -> bytes:
    """(H, W, 4) uint8 STORED component planes → 4-component baseline
    JPEG with an Adobe APP14 segment (r16 VERDICT directive #4).

    ``stored`` holds the values as they appear in the file's four
    components — for ``transform=0`` the Adobe INVERTED CMYK planes
    (255 = no ink), for ``transform=2`` (YCCK) the Y/Cb/Cr/K planes
    directly.  No color conversion happens here: the caller controls
    the exact stored values, so 8×8-block-constant planes + the q=1
    table round-trip bit-exactly and the decoder's documented
    CMYK→RGB math is pinned by a closed-form oracle."""
    import numpy as np

    a = np.asarray(stored, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("expected (H, W, 4) stored CMYK planes")
    if transform not in (0, 2):
        raise ValueError(f"bad Adobe transform {transform} for CMYK")
    h, w = a.shape[:2]
    planes = [a[..., i].astype(np.float64) for i in range(4)]
    return _emit_baseline_jpeg(
        planes, [(1, 1)] * 4, h, w, app14_transform=transform
    )


# Progressive AC Huffman table (uniform 8-bit canonical, like the
# baseline tables above): the baseline AC symbol set plus the EOBRUN
# symbols (r<<4)|0 for r = 0..14 that progressive scans need (T.81
# G.1.2.2) — 176 symbols, codes 0..175, all-ones 8-bit code unused.
_JPEG_PROG_AC_BITS = [0] * 7 + [176] + [0] * 8
_JPEG_PROG_AC_VALS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _jpeg_coefficients(arr, subsample: str = "444"):
    """Forward path shared with the progressive encoder: colorspace,
    subsampling, MCU padding and per-block quantized (q=1) zig-zag DCT —
    the SAME per-block expression encode_jpeg uses, so baseline and
    progressive encodings of one image carry identical coefficients.
    Returns (h, w, factors, mcux, mcuy, [comp blocks (nby, nbx, 64)])."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    # chroma box-average spans per mode (r16: 4:2:2 and 4:1:1 exercise
    # the decoder's non-square / above-2 sampling factors for real)
    spans = {"444": (1, 1), "422": (2, 1), "420": (2, 2), "411": (4, 1)}
    if subsample not in spans:
        raise ValueError(f"unsupported subsample {subsample!r}")
    if gray:
        planes = [a.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
        cr = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
        planes = [y, cb, cr]
        sx, sy = spans[subsample]
        factors = [(sx, sy), (1, 1), (1, 1)]
        if (sx, sy) != (1, 1):
            for i in (1, 2):
                p = planes[i]
                eh = -(-p.shape[0] // sy) * sy
                ew = -(-p.shape[1] // sx) * sx
                q = np.empty((eh, ew))
                q[: p.shape[0], : p.shape[1]] = p
                q[p.shape[0] :, : p.shape[1]] = p[-1:, : p.shape[1]]
                q[:, p.shape[1] :] = q[:, p.shape[1] - 1 : p.shape[1]]
                planes[i] = np.round(
                    q.reshape(eh // sy, sy, ew // sx, sx).mean(axis=(1, 3))
                )
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    A = _jpeg_dct_matrix()
    zz_r = [r for r, _ in _JPEG_ZZ]
    zz_c = [c for _, c in _JPEG_ZZ]
    blocks = []
    for p, (fh, fv) in zip(planes, factors):
        ph, pw = mcuy * fv * 8, mcux * fh * 8
        q = np.empty((ph, pw))
        sh, sw = min(p.shape[0], ph), min(p.shape[1], pw)
        q[:sh, :sw] = p[:sh, :sw]
        q[sh:, :sw] = q[sh - 1 : sh, :sw]
        q[:, sw:] = q[:, sw - 1 : sw]
        nby, nbx = ph // 8, pw // 8
        out = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = q[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.rint(A @ blk @ A.T).astype(np.int64)
                out[by, bx] = coef[zz_r, zz_c]
        blocks.append(out)
    return h, w, factors, mcux, mcuy, blocks


class _ProgAcState:
    """Per-scan progressive AC encoder state: the pending EOB run and the
    correction bits buffered inside it, flushed together (T.81 G.1.2.2,
    the jcphuff discipline)."""

    def __init__(self, bw, ac_map):
        self.bw = bw
        self.map = ac_map
        self.eobrun = 0
        self.pend = []

    def sym(self, s):
        code, length = self.map[s]
        self.bw.write(code, length)

    def flush_eob(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pend:
            self.bw.write(b, 1)
        self.pend = []


def _jpeg_enc_ac_first(pa, block, ss, se, al):
    """Progressive AC first-scan encoding of one block's band: values
    divided by 2^al with truncation toward zero, EOB runs across blocks."""
    r = 0
    for k in range(ss, se + 1):
        v = int(block[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)
        if t == 0:
            r += 1
            continue
        pa.flush_eob()
        while r > 15:
            pa.sym(0xF0)
            r -= 16
        nbits = abs(t).bit_length()
        pa.sym((r << 4) | nbits)
        pa.bw.write(t if t >= 0 else t + (1 << nbits) - 1, nbits)
        r = 0
    if r:
        pa.eobrun += 1
        if pa.eobrun == 0x7FFF:
            pa.flush_eob()


def _jpeg_enc_ac_refine(pa, block, ss, se, al):
    """Progressive AC refinement encoding of one block's band: newly
    nonzero coefficients (shifted magnitude 1) get a run/1 symbol + sign
    bit; already nonzero ones get one buffered correction bit."""
    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eobk = ss - 1
    for i, t in enumerate(absv):
        if t == 1:
            eobk = ss + i
    r = 0
    brbits = []
    for i, t in enumerate(absv):
        k = ss + i
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobk:
            pa.flush_eob()
            pa.sym(0xF0)
            r -= 16
            for b in brbits:
                pa.bw.write(b, 1)
            brbits = []
        if t > 1:
            brbits.append(t & 1)
            continue
        pa.flush_eob()
        pa.sym((r << 4) | 1)
        pa.bw.write(1 if int(block[k]) >= 0 else 0, 1)
        for b in brbits:
            pa.bw.write(b, 1)
        brbits = []
        r = 0
    if r > 0 or brbits:
        pa.eobrun += 1
        pa.pend.extend(brbits)
        if pa.eobrun == 0x7FFF or len(pa.pend) > 900:
            pa.flush_eob()


def encode_jpeg_progressive(arr, subsample: str = "444") -> bytes:
    """(H, W) or (H, W, 3) uint8 → PROGRESSIVE (SOF2) JFIF bytes, q=1 —
    the encoder-side fixture for the progressive decode path (r14 VERDICT
    directive #1).  Same coefficients as encode_jpeg (entropy coding is
    lossless either way, so decode(progressive) == decode(baseline)
    pixel-for-pixel), delivered as a real spectral-selection +
    successive-approximation scan script:

        DC all comps        Ss=0 Se=0  Ah=0 Al=1
        AC per comp         Ss=1 Se=5  Ah=0 Al=2   (low band first)
        AC per comp         Ss=6 Se=63 Ah=0 Al=2   (high band)
        AC per comp         Ss=1 Se=63 Ah=2 Al=1   (refine bit 1)
        AC per comp         Ss=1 Se=63 Ah=1 Al=0   (refine bit 0)
        DC all comps        Ss=0 Se=0  Ah=1 Al=0   (DC refine)

    which exercises every progressive decode mode: interleaved DC
    first/refine, banded AC first with cross-block EOB runs, and AC
    refinement with correction bits."""
    import struct

    h, w, factors, mcux, mcuy, blocks = _jpeg_coefficients(arr, subsample)
    ncomp = len(blocks)
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)

    dc_map = _huff_encode_map(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_map = _huff_encode_map(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (fh, fv) in enumerate(factors):
        out += bytes([ci + 1, (fh << 4) | fv, 0])
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([cls]) + bytes(bits) + bytes(vals)

    def sos_header(comp_ids, ss, se, ah, al):
        hdr = bytearray(b"\xff\xda")
        hdr += struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci in comp_ids:
            hdr += bytes([ci + 1, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        return bytes(hdr)

    def comp_grid(ci):
        # non-interleaved scans cover the component's own block grid
        fh, fv = factors[ci]
        cw = -(-(w * fh) // maxh)
        ch = -(-(h * fv) // maxv)
        return -(-ch // 8), -(-cw // 8)

    all_comps = list(range(ncomp))
    # DC first (interleaved, Al=1)
    out += sos_header(all_comps, 0, 0, 0, 1)
    bw = _JpegBitWriter()
    prev = [0] * ncomp
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci, (fh, fv) in enumerate(factors):
            for bv in range(fv):
                for bh in range(fh):
                    dc = int(blocks[ci][my * fv + bv, mx * fh + bh, 0]) >> 1
                    diff = dc - prev[ci]
                    prev[ci] = dc
                    cat = _jpeg_category(diff)
                    code, length = dc_map[cat]
                    bw.write(code, length)
                    if cat:
                        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    bw.flush()
    out += bw.buf
    # AC scans: banded first pass at Al=2, then two refinement passes
    for ss, se, ah, al in ((1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)):
        for ci in range(ncomp):
            out += sos_header([ci], ss, se, ah, al)
            bw = _JpegBitWriter()
            pa = _ProgAcState(bw, ac_map)
            nby, nbx = comp_grid(ci)
            for mi in range(nby * nbx):
                by, bx = divmod(mi, nbx)
                if ah == 0:
                    _jpeg_enc_ac_first(pa, blocks[ci][by, bx], ss, se, al)
                else:
                    _jpeg_enc_ac_refine(pa, blocks[ci][by, bx], ss, se, al)
            pa.flush_eob()
            bw.flush()
            out += bw.buf
    # DC refinement (interleaved, one raw bit per block)
    out += sos_header(all_comps, 0, 0, 1, 0)
    bw = _JpegBitWriter()
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci, (fh, fv) in enumerate(factors):
            for bv in range(fv):
                for bh in range(fh):
                    bw.write(int(blocks[ci][my * fv + bv, mx * fh + bh, 0]) & 1, 1)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(blob: bytes):
    """Baseline (SOF0) and progressive (SOF2) JPEG → (H, W, 3) uint8 RGB
    — pure numpy Huffman + IDCT, no image library.

    Architecture: every SOS entropy-decodes into per-component
    coefficient planes (zig-zag order, int32); dequantization,
    de-zigzag and a BATCHED IDCT run once at end of stream.  Baseline
    is the one-scan special case; progressive accumulates spectral
    bands and successive-approximation bits across scans (T.81 G.1,
    r14 VERDICT directive #1).  Supported: 8-bit, 1, 3 or 4 components
    (r16: Adobe APP14 CMYK and YCCK with the inverted-ink composite),
    sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), multiple
    scans (including non-interleaved baseline), multiple DQT/DHT
    tables, restart intervals, APPn/COM skip.  Extended/arithmetic/
    lossless/hierarchical SOFs and DNL gate with NotImplementedError;
    malformed streams raise ValueError."""
    import struct

    import numpy as np

    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    dc_tabs, ac_tabs = {}, {}
    frame = None
    progressive = False
    dri = 0
    coefs = None
    nscans = 0
    mcux = mcuy = 0
    adobe_transform = None
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", blob, pos)[0]
        if seglen < 2:
            raise ValueError("JPEG segment length below header size")
        seg_end = pos + seglen
        if seg_end > len(blob):
            raise ValueError("truncated JPEG segment")
        body = blob[pos + 2 : seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                if pq:
                    vals = np.frombuffer(raw, ">u2").astype(np.float64)
                else:
                    vals = np.frombuffer(raw, np.uint8).astype(np.float64)
                tab = np.zeros((8, 8))
                for k, (r, c) in enumerate(_JPEG_ZZ):
                    tab[r, c] = vals[k]
                qt[tq] = tab
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated DHT")
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                tab = _huff_decode_map(bits, vals)
                (ac_tabs if cls else dc_tabs)[tid] = tab
                i += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF component list")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if len(comps) not in (1, 3, 4):
                raise NotImplementedError(f"{len(comps)}-component JPEG")
            if not all(1 <= c["h"] <= 4 and 1 <= c["v"] <= 4 for c in comps):
                raise NotImplementedError("JPEG sampling factors above 4x4")
            fmaxh = max(c["h"] for c in comps)
            fmaxv = max(c["v"] for c in comps)
            if not all(
                fmaxh % c["h"] == 0 and fmaxv % c["v"] == 0 for c in comps
            ):
                # np.repeat upsampling needs integer ratios; 3:2-style
                # mixes would need fractional resampling
                raise NotImplementedError(
                    "non-dividing JPEG sampling factors"
                )
            if not fh or not fw:
                raise ValueError("zero JPEG dimensions")
            if fh * fw > (1 << 26):
                # resource bound, not malformed: the pure-python decoder
                # tops out far below the 65535² the format allows, and a
                # corrupted SOF must not trigger a multi-GB allocation
                raise NotImplementedError(
                    "JPEG larger than 64 MP (pure-python decoder bound)"
                )
            frame = {"h": fh, "w": fw, "comps": comps}
            maxh = max(c["h"] for c in comps)
            maxv = max(c["v"] for c in comps)
            mcux = -(-fw // (8 * maxh))
            mcuy = -(-fh // (8 * maxv))
            coefs = {
                c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                for c in comps
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline/progressive JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDC:
            raise NotImplementedError("JPEG DNL segment")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated SOS header")
            ns = body[0]
            if not ns:
                raise ValueError("SOS with zero components")
            scan = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                scan.append({"id": cid, "td": tt >> 4, "ta": tt & 15})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = _jpeg_decode_scan(
                blob, seg_end, frame, scan, ss, se, ahal >> 4, ahal & 15,
                dc_tabs, ac_tabs, coefs, dri, progressive,
            )
            nscans += 1
            continue
        elif marker == 0xEE:  # APP14: Adobe transform convention
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        # APPn / COM / others: skip
        pos = seg_end
    if frame is None or nscans == 0:
        raise ValueError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    A = _jpeg_dct_matrix()
    # zig-zag index → natural (row, col) gather: nat[r*8+c] = zz[k]
    nat_idx = np.empty(64, np.int64)
    for k, (r, c) in enumerate(_JPEG_ZZ):
        nat_idx[r * 8 + c] = k
    chans = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("component references undefined DQT")
        zz = coefs[c["id"]].astype(np.float64)
        nby, nbx = zz.shape[:2]
        coef = zz[..., nat_idx].reshape(nby, nbx, 8, 8) * qt[c["tq"]]
        blk = A.T @ coef @ A + 128.0  # batched IDCT over all blocks
        p = blk.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        p = np.repeat(np.repeat(p, maxv // c["v"], axis=0), maxh // c["h"], axis=1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        gray = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.stack([gray] * 3, axis=-1)
    if len(chans) == 4:
        # Adobe CMYK/YCCK (r16 directive #4).  Stored values follow the
        # Adobe INVERTED convention (255 = no ink): for transform 0 the
        # planes are C', M', Y', K' directly; for transform 2 (YCCK)
        # the first three are BT.601 YCbCr of (C', M', Y') and invert
        # through the same matrix as the 3-component path.  RGB is then
        # channel' × K' / 255, the standard consumer-side composite.
        t = 0 if adobe_transform is None else adobe_transform
        c0, c1, c2, kk = (np.clip(ch, 0.0, 255.0) for ch in chans)
        if t == 2:
            cy = c0 + 1.402 * (c2 - 128)
            mg = c0 - 0.344136 * (c1 - 128) - 0.714136 * (c2 - 128)
            yl = c0 + 1.772 * (c1 - 128)
            cy, mg, yl = (np.clip(v, 0.0, 255.0) for v in (cy, mg, yl))
        elif t == 0:
            cy, mg, yl = c0, c1, c2
        else:
            raise ValueError(
                f"4-component JPEG with Adobe transform {t}"
            )
        rgb = np.stack([cy * kk, mg * kk, yl * kk], axis=-1) / 255.0
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    y, cb, cr = chans
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(blob: bytes):
    """Magic-dispatched real decode: BMP/PPM/PNG/GIF/JPEG (baseline and
    progressive)/lossless WebP (VP8L) in pure numpy + stdlib
    zlib/LZW/Huffman/prefix codes; lossy WebP (VP8) still needs an
    external library and gates by name."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(blob)
    if blob[:4] == b"GIF8":
        return decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from es_ch_sync_spark.operators.webp import decode_webp

        return decode_webp(blob)
    raise ValueError("unrecognized image format")


def nn_resize(arr, width: int, height: int):
    """Nearest-neighbor resize (H, W, 3) → (height, width, 3), index map
    floor(i·src/dst) — deterministic, no interpolation arithmetic."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def decode_image_stub(blob: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-pixel stats from the bytes.

    Replace body with PIL/libvips decode in a container that has them; the
    mapInPandas plumbing, schema, and batch shape do not change."""
    if blob is None:
        return {"n_bytes": None, "content_md5": None, "feature": None}
    import hashlib

    h = hashlib.md5(blob).hexdigest()
    # 8 fake features from the digest — deterministic, testable
    feat = [int(h[i * 4 : i * 4 + 4], 16) / 65535.0 for i in range(8)]
    return {"n_bytes": len(blob), "content_md5": h, "feature": feat}


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Real image resize for uncompressed formats: decode (BMP/PPM, pure
    numpy) → nearest-neighbor → re-encode BMP.  Codec formats raise from
    decode_image until Pillow/libvips is present."""
    return encode_bmp(nn_resize(decode_image(blob), width, height))


# ---------------------------------------------------------------------------
# MJPEG AVI (RIFF) — the one real video container (r13 VERDICT #1): the
# same RIFF chunk grammar as WAV (decode_wav_pcm16 above), an 'hdrl' LIST
# carrying avih/strh/strf headers, and a 'movi' LIST of '00dc' chunks each
# holding one baseline JPEG — decoded by decode_jpeg.  Other codecs
# (fccHandler ≠ MJPG) and audio-only AVIs gate with NotImplementedError;
# malformed containers raise ValueError.
# ---------------------------------------------------------------------------


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """JPEG frame blobs → AVI/MJPG bytes (RIFF hdrl + movi + idx1)."""
    import struct

    if not frames:
        raise ValueError("empty frame list")
    n = len(frames)
    maxsz = max(len(f) for f in frames)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n, maxsz, 0, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
    strl += b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, maxsz,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl"
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + bytes(idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_mjpeg_avi(blob: bytes) -> dict:
    """AVI/MJPG → {"rate", "scale", "width", "height", "frames": [jpeg]}.

    Walks the RIFF chunk list non-recursively (LIST bodies are chunk
    lists themselves); fps = strh dwRate/dwScale.  Gates: non-MJPG video
    codecs and AVIs with no video stream raise NotImplementedError;
    truncated/malformed chunks raise ValueError."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    riff_len = struct.unpack_from("<I", blob, 4)[0]
    if 8 + riff_len > len(blob):
        raise ValueError("truncated AVI")
    meta = {"rate": None, "scale": None, "width": None, "height": None}
    frames: list[bytes] = []
    vid_stream = None
    stream_no = 0
    stack = [(12, 8 + riff_len)]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            size = struct.unpack_from("<I", blob, pos + 4)[0]
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                # push the rest of this level, then descend into the list
                next_pos = body_start + size + (size % 2)
                stack.append((next_pos, end))
                pos, end = body_start + 4, body_start + size
                continue
            if fourcc == b"strh":
                if size < 8:
                    raise ValueError("truncated AVI strh chunk")
                fcc_type = blob[body_start : body_start + 4]
                handler = blob[body_start + 4 : body_start + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r}: only MJPG"
                        )
                    if size < 28:
                        raise ValueError("truncated AVI strh chunk")
                    vid_stream = stream_no
                    scale, rate = struct.unpack_from("<II", blob, body_start + 20)
                    if not rate or not scale:
                        raise ValueError("AVI strh rate/scale is zero")
                    meta["rate"], meta["scale"] = rate, scale
                stream_no += 1
            elif fourcc == b"strf" and meta["width"] is None and vid_stream is not None:
                if size < 12:
                    raise ValueError("truncated AVI strf chunk")
                _, w, h = struct.unpack_from("<Iii", blob, body_start)
                meta["width"], meta["height"] = w, abs(h)
            elif vid_stream is not None and fourcc in (
                b"%02ddc" % vid_stream, b"%02ddb" % vid_stream,
            ):
                frames.append(bytes(blob[body_start : body_start + size]))
            pos = body_start + size + (size % 2)
    if vid_stream is None:
        raise NotImplementedError("AVI without a video stream")
    meta["frames"] = frames
    return meta


def sample_video_frames(blob: bytes, every_ms: int) -> list[bytes]:
    """REAL frame sampling, no video library: parse the MJPEG-AVI
    container, pick the frame under each ``every_ms`` tick (index =
    floor(t·rate / (1000·scale)), exact integer arithmetic), and return
    those frames' JPEG bytes — the container is lossless, so the sampled
    blobs are byte-identical to what the encoder stored.  Decode of the
    sampled frames is decode_jpeg's job (see video_frame_stats)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    v = parse_mjpeg_avi(blob)
    n = len(v["frames"])
    out = []
    t = 0
    while True:
        idx = (t * v["rate"]) // (1000 * v["scale"])
        if idx >= n:
            break
        out.append(v["frames"][idx])
        t += every_ms
    return out


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Blob → (n_bytes, md5, feature[8]) via mapInPandas (Arrow batches).

    The UDF sees pandas DataFrames, never Python-per-row; output rows are
    tiny so every downstream op (dedup by content_md5, ANN over feature)
    shuffles features, not blobs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                d = decode_image_stub(bytes(blob) if blob is not None else None)
                out.append(
                    (mid, d["n_bytes"], d["content_md5"], d["feature"])
                )
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "content_md5", "feature"])

    return media.select("media_id", "content").mapInPandas(batches, FEATURE_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def extract_pixel_features(
    media: DataFrame, batch_rows: int = 256, use_arrow: bool = False
) -> DataFrame:
    """REAL decode → per-channel pixel means via mapInPandas.

    Uncompressed blobs (BMP/PPM) decode in pure numpy; codec blobs land in
    the per-row ``error`` column with null stats — row-level isolation,
    same contract as the quarantine operators (a bad blob never fails the
    job).  Output rows are tiny (7 scalars), so downstream shuffles move
    stats, not pixels.  ``use_arrow`` (r17 pilot, guide §4): mapInArrow
    variant that skips the Arrow→pandas conversion on both sides."""

    def _decode_rows(ids, blobs):
        out = []
        for mid, blob in zip(ids, blobs):
            try:
                px = decode_image(bytes(blob))
                m = px.reshape(-1, 3).mean(axis=0)
                out.append(
                    (int(mid), px.shape[1], px.shape[0],
                     round(float(m[0]), 4), round(float(m[1]), 4),
                     round(float(m[2]), 4), None)
                )
            except _ROW_DECODE_ERRORS as exc:
                out.append((int(mid), None, None, None, None, None, str(exc)[:200]))
        return out

    if use_arrow:
        def batches_arrow(it):
            import pyarrow as pa

            cols = ["media_id", "width", "height", "mean_r", "mean_g",
                    "mean_b", "error"]
            types = [pa.int64(), pa.int32(), pa.int32(), pa.float64(),
                     pa.float64(), pa.float64(), pa.string()]
            for rb in it:
                rows = _decode_rows(
                    rb.column(0).to_pylist(), rb.column(1).to_pylist()
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array([r[i] for r in rows], types[i])
                     for i in range(7)],
                    names=cols,
                )

        return media.select("media_id", "content").mapInArrow(
            batches_arrow, PIXEL_STATS_SCHEMA
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    px = decode_image(bytes(blob))
                    m = px.reshape(-1, 3).mean(axis=0)
                    out.append(
                        (mid, px.shape[1], px.shape[0],
                         round(float(m[0]), 4), round(float(m[1]), 4),
                         round(float(m[2]), 4), None)
                    )
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b", "error"],
            )

    return media.select("media_id", "content").mapInPandas(batches, PIXEL_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def extract_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode → whole-clip stats via mapInPandas, dispatched
    on magic (RIFF/WAVE PCM16 or FLAC — r16 directive #8).  Bad blobs
    land in the per-row ``error`` column; output rows are 5 scalars, so
    downstream shuffles move stats, not samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from es_ch_sync_spark.operators.flac import decode_flac

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    raw = bytes(blob)
                    if raw[:4] == b"fLaC":
                        s, rate = decode_flac(raw)
                    elif raw[:4] == b"RIFF":
                        s, rate = decode_wav_pcm16(raw)
                    else:
                        raise ValueError("unrecognized audio format")
                    f = np.asarray(s, np.float64).reshape(len(s), -1)
                    out.append(
                        (mid, len(f), int(rate),
                         round(float(f.mean()), 4),
                         round(float(np.sqrt((f * f).mean())), 4), None)
                    )
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "sample_rate",
                    "mean_amp", "rms", "error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        batches, AUDIO_STATS_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize: decode → NN-resample → re-encode BMP, per
    row inside Arrow batches; codec formats go to ``error``.  Blobs stay on
    executors end to end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    out.append((mid, resize_image(bytes(blob), width, height),
                                width, height, None))
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height", "error"]
            )

    return media.select("media_id", "content").mapInPandas(batches, RESIZE_SCHEMA)


WAV_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_idx", T.LongType(), True),
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("end_ms", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def chunk_wav(media: DataFrame, chunk_ms: int = 100) -> DataFrame:
    """REAL PCM chunking: parse RIFF/WAV, split the sample stream into
    ``chunk_ms`` windows, emit per-chunk RMS — the compute-bearing half
    plan_audio_chunks only planned.  Integer sample math; RMS is
    sqrt(mean(v²)) over int16 values (exact in double at these sizes),
    rounded 4dp for cross-engine hashing.  Non-WAV/codec blobs produce one
    ``error`` row each."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, rate = decode_wav_pcm16(bytes(blob))
                    per = max(1, (rate * chunk_ms) // 1000)
                    n = len(samples)
                    for ci in range(0, max((n + per - 1) // per, 1)):
                        seg = samples[ci * per : (ci + 1) * per].astype(np.float64)
                        rms = float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0
                        out.append(
                            (mid, ci, ci * per * 1000 // rate,
                             min((ci + 1) * per, n) * 1000 // rate,
                             len(seg), round(rms, 4), None)
                        )
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["media_id", "chunk_idx", "start_ms", "end_ms", "n_samples", "rms", "error"],
            )

    return media.select("media_id", "content").mapInPandas(batches, WAV_CHUNK_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "media_id long, chunk_idx int, n_samples int, zcr int, peak int, "
    "error string"
)


def chunk_wav_features(media: DataFrame, chunk_ms: int = 100) -> DataFrame:
    """Per-chunk WAV signal features beyond chunk_wav's RMS: zero-crossing
    rate (count of strict sign flips v[i-1]*v[i] < 0 inside the chunk —
    the classic voiced/unvoiced + noisiness discriminant) and peak
    amplitude max|v| — both PURE INTEGERS over the decoded int16 stream,
    so the cross-engine check is hash-exact with no float rounding at
    all (RMS needed 4dp rounding; these don't).

    Same Arrow mapInPandas shape as chunk_wav: the blob never leaves the
    executor, one output row per 100 ms chunk, decode errors become one
    ``error`` row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, rate = decode_wav_pcm16(bytes(blob))
                    per = max(1, (rate * chunk_ms) // 1000)
                    n = len(samples)
                    for ci in range(0, max((n + per - 1) // per, 1)):
                        seg = samples[ci * per : (ci + 1) * per].astype(
                            np.int64
                        )
                        zcr = (
                            int(np.sum(seg[:-1] * seg[1:] < 0))
                            if len(seg) > 1
                            else 0
                        )
                        peak = int(np.max(np.abs(seg))) if len(seg) else 0
                        out.append((mid, ci, len(seg), zcr, peak, None))
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "chunk_idx", "n_samples", "zcr", "peak",
                    "error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        batches, WAV_FEATURE_SCHEMA
    )


# -- deterministic synthetic blobs (closed-form pixels/samples, so a SQL
#    oracle can recompute the decoded statistics from the generating
#    formula — encode→decode must round-trip exactly to match) -------------

SYNTH_W, SYNTH_H = 8, 6
SYNTH_RATE = 8000


def synth_bmp_blob(media_id: int) -> bytes:
    """pixel(c, x, y) = (media_id + 3x + 5y + 85c) mod 256 for c ∈ {r,g,b}."""
    import numpy as np

    x = np.arange(SYNTH_W)[None, :, None]
    y = np.arange(SYNTH_H)[:, None, None]
    c = np.arange(3)[None, None, :]
    return encode_bmp((media_id + 3 * x + 5 * y + 85 * c) % 256)


def synth_png_blob(media_id: int) -> bytes:
    """Same deterministic gradient as synth_bmp_blob, PNG-encoded — one
    synthetic pixel formula, two real container round-trips."""
    import numpy as np

    x = np.arange(SYNTH_W)[None, :, None]
    y = np.arange(SYNTH_H)[:, None, None]
    c = np.arange(3)[None, None, :]
    return encode_png((media_id + 3 * x + 5 * y + 85 * c) % 256)


def synth_gif_blob(media_id: int) -> bytes:
    """Same deterministic gradient as synth_bmp_blob, GIF-encoded — the
    48-pixel gradient has ≤ 48 distinct colors, comfortably inside the
    256-color palette.  Odd media_ids store the real 4-pass INTERLACED
    row order (r15), so the one oracle-checked query covers both
    layouts (lossless either way)."""
    import numpy as np

    x = np.arange(SYNTH_W)[None, :, None]
    y = np.arange(SYNTH_H)[:, None, None]
    c = np.arange(3)[None, None, :]
    return encode_gif(
        (media_id + 3 * x + 5 * y + 85 * c) % 256,
        interlace=bool(media_id % 2),
    )


def synth_wav_blob(media_id: int) -> bytes:
    """n = (media_id mod 20 + 5)·80 samples @ 8 kHz;
    sample(i) = ((media_id·31 + 7i) mod 4096) − 2048."""
    import numpy as np

    n = (media_id % 20 + 5) * 80
    i = np.arange(n, dtype=np.int64)
    return encode_wav_pcm16(((media_id * 31 + 7 * i) % 4096) - 2048, SYNTH_RATE)


def synth_jpeg_blob(media_id: int) -> bytes:
    """16×16 grayscale, 8×8-BLOCK-CONSTANT: block (bx, by) value
    v = (7·media_id + 13·bx + 29·by) mod 256 — the exact-round-trip JPEG
    fixture (constant blocks + q=1 survive encode→decode bit-for-bit, so
    the generating-formula oracle hash-matches a REAL entropy-coded
    baseline JPEG)."""
    import numpy as np

    bx = np.arange(2)[None, :]
    by = np.arange(2)[:, None]
    vals = ((7 * media_id + 13 * bx + 29 * by) % 256).astype(np.uint8)
    return encode_jpeg(np.repeat(np.repeat(vals, 8, 0), 8, 1))


def synth_pngx_blob(media_id: int) -> bytes:
    """Same deterministic gradient as synth_png_blob, but rotating
    through the r15 PNG variant matrix by media_id mod 4: truecolor /
    paletted / truecolor+Adam7 / paletted+Adam7 — all lossless, so one
    closed-form oracle checks every container variant."""
    import numpy as np

    x = np.arange(SYNTH_W)[None, :, None]
    y = np.arange(SYNTH_H)[:, None, None]
    c = np.arange(3)[None, None, :]
    img = ((media_id + 3 * x + 5 * y + 85 * c) % 256).astype(np.uint8)
    variant = media_id % 4
    return encode_png(
        img,
        color_type=3 if variant in (1, 3) else 2,
        interlace=variant >= 2,
    )


def synth_webp_blob(media_id: int) -> bytes:
    """Same deterministic gradient as synth_bmp_blob, LOSSLESS-WebP
    (VP8L) encoded — one synthetic pixel formula, one oracle-checked
    query.  media_id mod 7 selects the encoder path so the corpus
    exercises plain literals, SUBTRACT_GREEN, the PREDICTOR transform
    (mode = media_id mod 14), COLOR_INDEXING (the ≤48-color gradient
    palettizes), greedy LZ77 with 2D near-distance codes, the color
    cache + cross-COLOR_TRANSFORM, and META PREFIX code groups (r16
    directive #2): all are exactly invertible, so the closed form
    still holds."""
    import numpy as np

    from es_ch_sync_spark.operators.webp import encode_webp_lossless

    x = np.arange(SYNTH_W)[None, :, None]
    y = np.arange(SYNTH_H)[:, None, None]
    c = np.arange(3)[None, None, :]
    img = ((media_id + 3 * x + 5 * y + 85 * c) % 256).astype(np.uint8)
    variant = media_id % 7
    if variant == 0:
        return encode_webp_lossless(img)
    if variant == 1:
        return encode_webp_lossless(img, subtract_green=True)
    if variant == 2:
        return encode_webp_lossless(
            img, predictor_modes=media_id % 14, predictor_size_bits=2
        )
    if variant == 3:
        return encode_webp_lossless(img, palette=True)
    if variant == 4:
        return encode_webp_lossless(img, lz77=True)
    if variant == 5:
        return encode_webp_lossless(
            img,
            lz77=True,
            cache_bits=4,
            color_transform=(media_id % 256, (media_id * 7) % 256, 77),
        )
    return encode_webp_lossless(img, meta_prefix_bits=2)


def synth_agif_blob(media_id: int) -> bytes:
    """Animated GIF89a, n = (media_id mod 4) + 2 frames on a 16×8
    canvas, rotating the r16 COMPOSITING variants by v = (media_id//4)
    mod 4 so the one oracle-checked census pins transparency,
    partial-canvas blits and disposal 2/3 (r16 VERDICT directive #1).
    With c(f) = (13·media_id + 19·f) mod 256 and background B = 0
    (GCT[0], bg_index 0), the COMPOSED frame is always two constant-gray
    halves (left | right):

    - v=0: full-canvas opaque frames, disposal 1 → (c(f), c(f)) —
      the pre-r16 layout.
    - v=1: frame 0 full; f≥1 blits an 8×8 OPAQUE half (odd f → left,
      even → right), disposal 1 — the untouched half persists.
    - v=2: frame 0 full; f≥1 a full-canvas image whose right half is a
      TRANSPARENT index, disposal 2 — the right half shows frame 0's
      color once, then the restored background forever after.
    - v=3: frame 0 full; f≥1 blits alternating halves with disposal 3 —
      the canvas snaps back to frame 0 after every frame, so the
      untouched half always reads c(0).

    Every decoded half is reproducible by the gif_frame_dedup oracle's
    closed form, so a hash match proves the whole compositor."""
    import numpy as np

    n = media_id % 4 + 2
    v = (media_id // 4) % 4
    gct = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)

    def c(f: int) -> int:
        return (13 * media_id + 19 * f) % 256

    if v == 0:
        frames = [np.full((8, 16, 3), c(f), np.uint8) for f in range(n)]
        return encode_gif_animated(frames, delay_cs=10)
    specs = [{"rgb": np.full((8, 16, 3), c(0), np.uint8), "disposal": 1}]
    for f in range(1, n):
        if v == 2:
            alpha = np.zeros((8, 16), bool)
            alpha[:, :8] = True
            specs.append(
                {
                    "rgb": np.full((8, 16, 3), c(f), np.uint8),
                    "alpha": alpha,
                    "disposal": 2,
                }
            )
        else:  # v in (1, 3): alternating opaque half blits
            specs.append(
                {
                    "rgb": np.full((8, 8, 3), c(f), np.uint8),
                    "left": 0 if f % 2 else 8,
                    "top": 0,
                    "disposal": 1 if v == 1 else 3,
                }
            )
    return encode_gif_frames(specs, 16, 8, gct=gct, bg_index=0)


def synth_pjpeg_blob(media_id: int) -> bytes:
    """16×16 grayscale, 8×8-BLOCK-CONSTANT like synth_jpeg_blob but with
    a DIFFERENT generating formula v = (19·media_id + 31·bx + 53·by) mod
    256, PROGRESSIVE-encoded (SOF2, 10-scan spectral-selection +
    successive-approximation script) — constant blocks + q=1 keep the
    round trip exact, so the closed-form oracle hash-checks the whole
    progressive entropy-decode path."""
    import numpy as np

    bx = np.arange(2)[None, :]
    by = np.arange(2)[:, None]
    vals = ((19 * media_id + 31 * bx + 53 * by) % 256).astype(np.uint8)
    return encode_jpeg_progressive(np.repeat(np.repeat(vals, 8, 0), 8, 1))


def synth_flac_blob(media_id: int) -> bytes:
    """The synth_wav_blob PCM formula (n = (id mod 20 + 5)·80 samples @
    8 kHz, s(i) = ((id·31 + 7i) mod 4096) − 2048), FLAC-encoded — the
    lossless audio sibling of the image-codec fixtures (r16 directive
    #8).  media_id mod 4 rotates the encoder path: auto fixed-order
    selection, VERBATIM, an explicit LPC subframe, and 4-partition rice
    — all exactly invertible, so the closed form holds."""
    import numpy as np

    from es_ch_sync_spark.operators.flac import encode_flac

    n = (media_id % 20 + 5) * 80
    i = np.arange(n, dtype=np.int64)
    s = ((media_id * 31 + 7 * i) % 4096) - 2048
    variant = media_id % 4
    if variant == 1:
        return encode_flac(s, SYNTH_RATE, force="verbatim")
    if variant == 2:
        return encode_flac(s, SYNTH_RATE, force="lpc", lpc_coefs=[2, -1])
    if variant == 3:
        return encode_flac(s, SYNTH_RATE, partition_order=2)
    return encode_flac(s, SYNTH_RATE)


def synth_cmyk_blob(media_id: int) -> bytes:
    """16×16 4-component Adobe JPEG, 8×8-BLOCK-CONSTANT stored planes
    p1..p4(bx, by) = ((23|29|37|31)·id + (37|43|53|17)·bx +
    (41|47|59|13)·by) mod 256, alternating transform 0 (inverted CMYK)
    and 2 (YCCK) by id parity (r16 VERDICT directive #4).  Constant
    blocks + q=1 make the stored planes exact, so the decoder's
    documented CMYK→RGB composite is a closed form the DuckDB oracle
    recomputes."""
    import numpy as np

    bx = np.arange(2)[None, :]
    by = np.arange(2)[:, None]

    def plane(a, b, c):
        v = ((a * media_id + b * bx + c * by) % 256).astype(np.uint8)
        return np.repeat(np.repeat(v, 8, 0), 8, 1)

    stored = np.stack(
        [plane(23, 37, 41), plane(29, 43, 47),
         plane(37, 53, 59), plane(31, 17, 13)],
        axis=-1,
    )
    return encode_jpeg_cmyk(stored, transform=2 * (media_id % 2))


def synth_mjpeg_blob(media_id: int) -> bytes:
    """MJPEG-AVI, 10 fps: n = (media_id mod 4) + 2 frames, each 16×8
    grayscale with two constant blocks v(f, bx) = (11·media_id + 17·f +
    23·bx) mod 256 — real JPEG frames in a real RIFF container, every
    sampled pixel reproducible by the oracle's closed form."""
    import numpy as np

    n = media_id % 4 + 2
    frames = []
    for f in range(n):
        vals = np.array(
            [[(11 * media_id + 17 * f + 23 * bx) % 256 for bx in range(2)]],
            dtype=np.uint8,
        )
        frames.append(encode_jpeg(np.repeat(np.repeat(vals, 8, 0), 8, 1)))
    return encode_mjpeg_avi(frames, 16, 8, fps=10)


def synth_media(docs: DataFrame, kind: str, use_arrow: bool = False) -> DataFrame:
    """(media_id, kind, content) with real encoded BMP/WAV blobs derived
    from doc_id — generated executor-side in Arrow batches (the driver
    never holds a blob).

    r16: the doc-id frame is REPARTITIONED up to the cluster's default
    parallelism before synthesis when the upstream scan yields fewer
    splits (a small-SF documents table is one parquet file → one task,
    which serialized the whole per-blob codec pipeline onto a single
    core — the r15 ×100 rows were measuring exactly that).  The shuffle
    moves only ids (blobs are synthesized AFTER it, and real decode
    pipelines inherit the same layout), so this is the scale-correct
    shape: codec CPU spreads across every core at any input split
    count."""
    sess = docs.sparkSession
    if sess is not None:
        par = sess.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
    maker = {
        "image": synth_bmp_blob,
        "png": synth_png_blob,
        "gif": synth_gif_blob,
        "jpeg": synth_jpeg_blob,
        "pjpeg": synth_pjpeg_blob,
        "agif": synth_agif_blob,
        "webp": synth_webp_blob,
        "pngx": synth_pngx_blob,
        "mjpeg": synth_mjpeg_blob,
        "cmyk": synth_cmyk_blob,
        "flac": synth_flac_blob,
    }.get(kind, synth_wav_blob)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    if use_arrow:
        # r17 pilot (guide §4, VERDICT next-round #5): mapInArrow skips the
        # Arrow→pandas materialization of the id/blob columns on both sides
        # of the boundary; the per-row codec loop is unchanged.
        def batches_arrow(it):
            import pyarrow as pa

            for rb in it:
                ids = rb.column(0).to_pylist()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids, pa.int64()),
                        pa.array([kind] * len(ids), pa.string()),
                        pa.array([maker(int(m)) for m in ids], pa.binary()),
                    ],
                    names=["media_id", "kind", "content"],
                )

        return docs.select("doc_id").mapInArrow(batches_arrow, schema)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": kind,
                    "content": [maker(int(m)) for m in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: text bytes as
    the blob (deterministic), so the binary plumbing is exercised end-to-end
    without real image files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def video_media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a video media table from the documents fixture: text bytes
    as the blob, duration derived deterministically from text length (10 ms
    per character) — exercises the video-path plumbing without real files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("video/mp4").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text").cast("long") * 10).alias("duration_ms"),
    )


def audio_media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an audio media table from the documents fixture: text
    bytes as the blob, duration 10 ms per character — exercises the
    audio-path plumbing without real files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text").cast("long") * 10).alias("duration_ms"),
    )


def plan_audio_chunks(
    media: DataFrame, chunk_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio chunking PLAN: overlapping ``chunk_ms`` windows every
    ``hop_ms`` across each clip — the work list an ASR/feature kernel
    would consume via mapInPandas (decode stays stubbed; the plan is real
    and oracle-checked).

    Like plan_frame_samples, this is metadata-only: the blob column is
    pruned at the scan, so a 100 TB audio table plans its segmentation
    reading only (media_id, duration_ms).  All-integer arithmetic; a clip
    shorter than one chunk still yields its single (clamped) window."""
    chunk, hop = int(chunk_ms), int(hop_ms)
    last_idx = F.expr(f"greatest((duration_ms - {chunk}) DIV {hop}, 0)").cast("long")
    start = F.col("chunk_idx") * F.lit(hop)
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("duration_ms"),
            F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            start.alias("start_ms"),
            F.least(start + F.lit(chunk), F.col("duration_ms")).alias("end_ms"),
        )
    )


def plan_frame_samples(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling PLAN: one row per (media_id, frame_idx, frame_ts_ms)
    to decode, at ``every_ms`` intervals across each video's duration.

    This is the Spark-side half of frame sampling — the work list the
    decode kernel (``sample_video_frames``, stubbed here) would consume via
    mapInPandas exactly like ``extract_features``.  Planning from metadata
    keeps the explode blob-free: Parquet column pruning drops ``content``
    entirely, so a 100 TB video table plans its sampling schedule reading
    only (media_id, duration_ms).  Frame indices are pure column arithmetic
    (explode over sequence) — fully oracle-checkable."""
    n = F.expr(f"duration_ms DIV {int(every_ms)}").cast("long")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(int(every_ms)))
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("t_ms", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def video_frame_stats(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """REAL video frame sampling + decode, no video library: parse each
    MJPEG-AVI blob, pick the frame under every ``every_ms`` tick, decode
    it with the baseline-JPEG decoder, and emit per-sampled-frame stats —
    (media_id, frame_idx, t_ms, width, height, mean_luma).

    Same contract as extract_pixel_features: Arrow-batched mapInPandas,
    per-row error isolation (a bad container/frame yields one error row,
    never a failed job), and tiny output rows so shuffles move stats,
    not pixels.  At 100 TB the blob column never leaves the executor and
    the decode parallelism is the scan's partitioning."""
    every_ms = int(every_ms)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    v = parse_mjpeg_avi(bytes(blob))
                    n = len(v["frames"])
                    t = 0
                    while True:
                        idx = (t * v["rate"]) // (1000 * v["scale"])
                        if idx >= n:
                            break
                        px = decode_jpeg(v["frames"][idx]).astype("float64")
                        # BT.601 luma (ADVICE r14: mean of the R channel is
                        # only luma for grayscale frames; color MJPEG needs
                        # the real weighting).  On gray fixtures the 1-ulp
                        # float noise vs the plain channel mean is absorbed
                        # by the round-to-4-decimals below.
                        luma = (
                            0.299 * px[..., 0] + 0.587 * px[..., 1]
                            + 0.114 * px[..., 2]
                        ).mean()
                        out.append(
                            (mid, idx, t, px.shape[1], px.shape[0],
                             round(float(luma), 4), None)
                        )
                        t += every_ms
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "t_ms", "width", "height",
                    "mean_luma", "error",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        batches, VIDEO_FRAME_SCHEMA
    )


FRAME_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame_md5", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def video_frame_fingerprints(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Content fingerprint per SAMPLED video frame: parse the MJPEG-AVI
    container, decode the frame under each ``every_ms`` tick, md5 the
    decoded RGB pixel buffer — byte-level container/encoder differences
    (chunk padding, Huffman table choice, restart intervals) vanish, so
    equal fingerprints mean equal decoded CONTENT.  Same Arrow
    mapInPandas + per-row error isolation as video_frame_stats."""
    import hashlib

    every_ms = int(every_ms)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    v = parse_mjpeg_avi(bytes(blob))
                    n = len(v["frames"])
                    t = 0
                    while True:
                        idx = (t * v["rate"]) // (1000 * v["scale"])
                        if idx >= n:
                            break
                        px = decode_jpeg(v["frames"][idx])
                        out.append(
                            (mid, idx, hashlib.md5(px.tobytes()).hexdigest(), None)
                        )
                        t += every_ms
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_md5", "error"]
            )

    return media.select("media_id", "content").mapInPandas(
        batches, FRAME_FP_SCHEMA
    )


def video_frame_dedup(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Cross-clip duplicate-FRAME census — the video analog of
    exact_duplicate_groups: fingerprint every sampled frame (decoded
    content, not bytes), group identical fingerprints corpus-wide, and
    roll the groups up into a (n_frames, n_clips) → n_groups census.
    Training pipelines use exactly this to find shared intros/outros/
    test-card frames across a clip corpus before frame-level dedup.

    Scale: the fingerprint pass is the blob scan (decode parallelism =
    scan partitioning, blobs never shuffle); both aggregates move
    (md5, id)-sized rows then census-sized rows — the standard
    two-hash-aggregate discipline, never pixels."""
    fp = video_frame_fingerprints(media, every_ms).filter(
        F.col("frame_md5").isNotNull()
    )
    groups = fp.groupBy("frame_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.countDistinct("media_id").cast("long").alias("n_clips"),
    )
    return (
        groups.groupBy("n_frames", "n_clips")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .orderBy("n_frames", "n_clips")
    )


def gif_frame_fingerprints(media: DataFrame) -> DataFrame:
    """Content fingerprint per ANIMATED-GIF frame: parse_gif_frames walks
    every full-canvas frame, md5 the decoded RGB pixel buffer — palette
    layout, LZW coding and sub-block packing vanish, so equal
    fingerprints mean equal decoded CONTENT (the video_frame_fingerprints
    contract on the second real container, r14 VERDICT directive #2).
    Arrow mapInPandas + per-row error isolation."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    v = parse_gif_frames(bytes(blob))
                    for idx, px in enumerate(v["frames"]):
                        out.append(
                            (mid, idx, hashlib.md5(px.tobytes()).hexdigest(), None)
                        )
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_md5", "error"]
            )

    return media.select("media_id", "content").mapInPandas(
        batches, FRAME_FP_SCHEMA
    )


def gif_frame_dedup(media: DataFrame) -> DataFrame:
    """Cross-clip duplicate-frame census over animated GIFs — identical
    census shape to video_frame_dedup (fingerprint every frame, group
    identical fingerprints corpus-wide, roll up to (n_frames, n_clips) →
    n_groups).  Same scale posture: decode parallelism is the blob scan's
    partitioning, the aggregates move (md5, id) rows, never pixels."""
    fp = gif_frame_fingerprints(media).filter(F.col("frame_md5").isNotNull())
    groups = fp.groupBy("frame_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.countDistinct("media_id").cast("long").alias("n_clips"),
    )
    return (
        groups.groupBy("n_frames", "n_clips")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .orderBy("n_frames", "n_clips")
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def dhash_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Perceptual difference-hash (dHash) per image through REAL decode.

    Classic dHash [see e.g. the widely-described "difference hash" of
    Krawetz] compares horizontally adjacent pixels of a small grayscale
    rendition: bit_(y,x) = 1 iff gray(x, y) > gray(x+1, y).  Here the
    grayscale proxy is the integer channel sum r+g+b (no division — keeps
    the arithmetic exactly reproducible in the SQL oracle), bits are packed
    LSB-first as bit index y·(W−1)+x into one BIGINT.

    This is the image analog of simhash: hash equality groups visually
    identical images regardless of byte-level differences (metadata,
    encoder), and hamming-banded blocking (as in simhash_near_duplicates)
    extends it to near-duplicates.  Output rows are (id, 64-bit scalar) —
    the blobs never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    px = decode_image(bytes(blob))
                    gs = px.astype(np.int64).sum(axis=2)  # (H, W) channel sum
                    bits = gs[:, :-1] > gs[:, 1:]
                    h, w = bits.shape
                    weights = (
                        np.int64(1) << (np.arange(h)[:, None] * w + np.arange(w))
                    )
                    out.append(
                        (mid, px.shape[1], px.shape[0],
                         int((bits * weights).sum()), None)
                    )
                except _ROW_DECODE_ERRORS as exc:
                    out.append((mid, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "dhash", "error"]
            )

    return media.select("media_id", "content").mapInPandas(batches, DHASH_SCHEMA)
