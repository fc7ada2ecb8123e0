"""Lossless WebP (VP8L) — pure stdlib + numpy codec (r14 VERDICT
directive #6: the only WebP variant that is honest in-stdlib work).

Everything here derives from the PUBLIC WebP Lossless Bitstream
Specification (RFC 9649 / the webmproject spec): LSB-first bit packing,
canonical prefix codes transmitted as code-length codes, LZ77 backward
references with a color cache, and the four spatial transforms.  The
control flow mirrors the spec pseudo-code, not any library's source.

Decoder (`decode_webp` / `_decode_vp8l`) supports:
  - single `VP8L` chunk in a `WEBP` RIFF form;
  - simple (1-2 symbol) and normal (code-length-coded) prefix codes,
    including the 16/17/18 repeat codes and the optional max_symbol
    shortcut;
  - literals, color-cache hits, and LZ77 backward references with PLAIN
    distance codes (dist_code > 120);
  - SUBTRACT_GREEN and PREDICTOR inverse transforms (all 14 predictor
    modes, shared with the encoder below).

r16 additions (VERDICT directive #2): COLOR_INDEXING (palette) with
sub-byte pixel packing, the cross-COLOR_TRANSFORM, and the 2D
near-distance codes (dist_code <= 120).  The 120-entry distance map is
DERIVED, not transcribed: the spec's neighborhood is exactly every
offset (dx, dy) with dy in 1..7, dx in -7..8 plus dy=0, dx in 1..8
(120 offsets — the (dy << 4) | (8 - dx) nibble encoding's full range),
ordered by increasing squared Euclidean distance with ties broken by
larger dy (equivalently smaller |dx|) and positive dx before negative.
The derivation reproduces the spec table's documented prefix and is
pinned by unit test both against that prefix and by encoder↔decoder
round trips through 2D codes.

r16 also un-gates META PREFIX CODES: an entropy sub-image assigns a
prefix-code group (red << 8 | green) to every 2^bits block, and each
pixel's five codes read from its block's group — the last VP8L decode
feature besides the lossy VP8 path.

Gates (NotImplementedError, each named):
  - lossy `VP8 ` and extended `VP8X` containers.

Malformed streams raise ValueError.

Encoder (`encode_webp_lossless`) emits VP8L with BALANCED COMPLETE
prefix codes (every used symbol at ceil(log2(k)) or one bit less —
valid canonical codes, deterministic, no frequency modeling),
optionally behind SUBTRACT_GREEN, a PREDICTOR transform with an
explicit per-block mode image, a COLOR_TRANSFORM with explicit deltas,
or COLOR_INDEXING (``palette=True``); ``lz77=True`` runs a greedy
matcher that emits backward references (2D near codes when the
distance maps into the neighborhood), ``cache_bits`` adds a real
color cache, and ``meta_prefix_bits`` emits two block-column-parity
meta prefix groups.  Lossless means encode→decode round-trips EXACTLY, which
is what the multimodal_webp_stats oracle checks; the knobs let tests
exercise every inverse path.
"""

from __future__ import annotations

import struct

# Order in which code-length-code lengths are transmitted (spec §6.2.2).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_LITERALS = 256
_LENGTH_CODES = 24
_DISTANCE_CODES = 40
_HASH_MUL = 0x1E35A7BD


def _near_distance_table():
    """The 120 2D near-distance offsets (dist_code 1..120), DERIVED from
    the spec's construction instead of transcribed: the neighborhood is
    every (dx, dy) with dy in 1..7, dx in -7..8, plus the same-row
    dy=0, dx in 1..8 — exactly 120 offsets, the full range of the
    (dy << 4) | (8 - dx) nibble packing — ordered by increasing
    dx² + dy², ties by larger dy (= smaller |dx|), positive dx before
    negative.  The unit test pins the documented prefix of the spec
    table against this derivation."""
    pairs = [(dx, 0) for dx in range(1, 9)]
    pairs += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    pairs.sort(
        key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] > 0 else 1)
    )
    return tuple(pairs)


_NEAR_DIST = _near_distance_table()


class _BitReaderLSB:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            self._acc |= self.data[self.pos] << self._n
            self._n += 8
            self.pos += 1
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v

    def read_code(self, table: dict) -> int:
        """Read one canonical prefix code.  Fast path (r16 directive
        #3): peek ``bits`` stream bits and resolve symbol + length in
        ONE table lookup — the LUT is keyed by the bit-reversed code
        (stream bits arrive code-MSB-first) padded to ``bits``.  Codes
        longer than the LUT fall back to the bit-by-bit walk."""
        lut = table.get("lut")
        if lut is not None:
            m = table["bits"]
            while self._n < m and self.pos < len(self.data):
                self._acc |= self.data[self.pos] << self._n
                self._n += 8
                self.pos += 1
            entry = lut[self._acc & ((1 << m) - 1)]
            if entry is not None:
                sym, ln = entry
                if ln > self._n:
                    raise ValueError("truncated VP8L bitstream")
                self._acc >>= ln
                self._n -= ln
                return sym
        code, length = 0, 0
        mp = table["map"]
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = mp.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


class _BitWriterLSB:
    """LSB-first bit writer (VP8L bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical code: its bits go on the wire MSB-first,
        which for an LSB-first writer means writing the bit-reversal."""
        rev = 0
        for _ in range(length):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, length)

    def write_bulk(self, vals, lens) -> None:
        """Vectorized bulk append (r16 directive #3): ``vals[i]`` is an
        ALREADY-BIT-REVERSED code (or raw LSB-first value) emitted at
        ``lens[i]`` bits.  Expands to a flat LSB-first bit array with
        numpy, prepends the writer's pending bits, packs with
        np.packbits and leaves the sub-byte remainder pending."""
        import numpy as np

        vals = np.asarray(vals, dtype=np.uint64)
        lens = np.asarray(lens, dtype=np.int64)
        if not len(vals):
            return
        maxb = int(lens.max())
        if maxb == 0:
            return
        shifts = np.arange(maxb, dtype=np.uint64)
        bitmat = ((vals[:, None] >> shifts[None, :]) & 1).astype(bool)
        keep = shifts[None, :] < lens[:, None].astype(np.uint64)
        flat = bitmat[keep]  # row-major: symbol order, LSB-first
        if self._n:
            pending = np.array(
                [(self._acc >> i) & 1 for i in range(self._n)], dtype=bool
            )
            flat = np.concatenate([pending, flat])
        packed = np.packbits(flat, bitorder="little")
        nbits = len(flat)
        rem = nbits % 8
        if rem:
            self.buf += packed[:-1].tobytes()
            self._acc = int(packed[-1])
            self._n = rem
        else:
            self.buf += packed.tobytes()
            self._acc = 0
            self._n = 0

    def flush(self) -> bytes:
        if self._n:
            self.buf.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.buf)


def _canonical_from_lengths(lengths: dict) -> dict:
    """{symbol: bit length} → {symbol: (canonical code, length)} — codes
    assigned in (length, symbol) order, the spec's canonical rule."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln:
            by_len.setdefault(ln, []).append(sym)
    code = 0
    out = {}
    for ln in range(1, 16):
        for sym in sorted(by_len.get(ln, ())):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    return out


def _bitrev(code: int, length: int) -> int:
    rev = 0
    for _ in range(length):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    return rev


def _decode_table_from_lengths(lengths: dict) -> dict:
    """{symbol: length} → decode table for read_code: a peek LUT over
    min(maxlen, 11) bits (one lookup resolves symbol + length; longer
    codes marked None fall back to the "map" walk).  A single used
    symbol is the spec's 0-bit trivial code."""
    used = [s for s, ln in lengths.items() if ln]
    if len(used) == 1:
        return {"trivial": used[0]}
    enc = _canonical_from_lengths(lengths)
    mp = {(ln, code): sym for sym, (code, ln) in enc.items()}
    m = min(max(ln for _, ln in enc.values()), 11)
    lut: list = [None] * (1 << m)
    for sym, (code, ln) in enc.items():
        if ln > m:
            continue
        rev = _bitrev(code, ln)
        for j in range(rev, 1 << m, 1 << ln):
            lut[j] = (sym, ln)
    return {"lut": lut, "bits": m, "map": mp}


def _read_sym(br: _BitReaderLSB, table: dict) -> int:
    if "trivial" in table:
        return table["trivial"]
    return br.read_code(table)


def _balanced_lengths(symbols) -> dict:
    """Complete canonical code over >= 3 used symbols: with
    k symbols and L = ceil(log2(k)), the first (2^L - k) symbols get
    length L-1 and the rest L — Kraft sums to exactly 1."""
    syms = sorted(symbols)
    k = len(syms)
    L = max(1, (k - 1).bit_length())
    short = (1 << L) - k
    return {s: (L - 1 if i < short else L) for i, s in enumerate(syms)}


def _prefix_decode(br: _BitReaderLSB, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(v: int):
    """Inverse of _prefix_decode: value >= 1 → (code, extra_value,
    extra_bits) such that decode(code) with those extra bits yields v."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    hb = x.bit_length() - 1  # x >= 4 so hb >= 2
    second = (x >> (hb - 1)) & 1
    code = 2 * hb + second
    extra = hb - 1
    offset = (2 + second) << extra
    return code, x - offset, extra


# ---------------------------------------------------------------------------
# Predictor transform (spec §4.4.2) — shared by encoder and decoder so the
# forward subtraction and inverse addition agree by construction.
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L, T, TL, TR):
    """One predicted (a, r, g, b) pixel from mode 0..13 (spec §4.4.2)."""
    if mode == 0:
        return (255, 0, 0, 0)
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
    if mode == 11:
        # Select: whichever of L/T is closer (L1 over channels) to the
        # gradient estimate L + T - TL
        p = tuple(a + b - c for a, b, c in zip(L, T, TL))
        p_l = sum(abs(x - y) for x, y in zip(p, L))
        p_t = sum(abs(x - y) for x, y in zip(p, T))
        # Spec tie-break: strictly "if (pL < pT) return L else return T",
        # so ties return T (matches libwebp).
        return L if p_l < p_t else T
    if mode == 12:
        return tuple(_clamp(a + b - c) for a, b, c in zip(L, T, TL))
    if mode == 13:
        ave = _avg2(L, T)
        # ClampAddSubtractHalf: the spec's (a - c) / 2 is C division,
        # truncating toward zero — Python // floors, which differs for
        # negative odd differences.
        return tuple(
            _clamp(a + int((a - c) / 2)) for a, c in zip(ave, TL)
        )
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _predictor_pass(pix, w, h, modes, size_bits, inverse: bool):
    """Apply (inverse=True) or subtract (False) the predictor transform
    in raster order.  ``pix`` is a flat list of (a, r, g, b) tuples,
    mutated in place; ``modes`` the per-block mode grid (flat list),
    edge rules per spec: (0,0) black, row 0 → L, column 0 → T.
    Predictions always read RECONSTRUCTED neighbors: that's ``pix``
    itself when inverting (originals accumulate in place) and a frozen
    copy of the originals when subtracting at encode time."""
    src = pix if inverse else list(pix)
    bw_blocks = -(-w // (1 << size_bits))
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = modes[(y >> size_bits) * bw_blocks + (x >> size_bits)]
            L = src[i - 1] if x else (255, 0, 0, 0)
            T = src[i - w] if y else (255, 0, 0, 0)
            TL = src[i - w - 1] if (x and y) else (255, 0, 0, 0)
            # TR by raster index (spec): for the last column this wraps
            # to the current row's first pixel, which is already
            # reconstructed; row 0 never reads TR (edge rule forces L)
            TR = src[i - w + 1] if y else T
            pred = _predict(mode, L, T, TL, TR)
            cur = pix[i]
            if inverse:
                pix[i] = tuple((c + p) & 0xFF for c, p in zip(cur, pred))
            else:
                pix[i] = tuple((c - p) & 0xFF for c, p in zip(cur, pred))


def _cdelta(t: int, c: int) -> int:
    """ColorTransformDelta (spec §4.4.3): (int8(t) * int8(c)) >> 5 with
    arithmetic shift — both arguments reinterpreted as signed bytes."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _color_transform_pass(pix, w, h, sub, size_bits, inverse: bool):
    """Apply (inverse=True) or subtract the cross-color transform.  The
    per-block element packs green_to_red in BLUE, green_to_blue in
    GREEN and red_to_blue in RED (spec §4.4.3).  Red transforms off
    green; blue off green and the ORIGINAL red — which at decode time
    is the just-reconstructed red, at encode time the input red."""
    bw_blocks = -(-w // (1 << size_bits))
    for y in range(h):
        for x in range(w):
            i = y * w + x
            _ea, r2b, g2b, g2r = sub[
                (y >> size_bits) * bw_blocks + (x >> size_bits)
            ]
            a, r, g, b = pix[i]
            if inverse:
                r = (r + _cdelta(g2r, g)) & 0xFF
                b = (b + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
            else:
                b = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
                r = (r - _cdelta(g2r, g)) & 0xFF
            pix[i] = (a, r, g, b)


def _palette_inverse(pix, palette, width_bits: int, w: int, h: int):
    """COLOR_INDEXING inverse (spec §4.4.4): the decoded image is
    ceil(w / 2^width_bits) wide with 2^width_bits indices PACKED
    LSB-first into each GREEN channel at 8 >> width_bits bits each;
    out-of-range indices are transparent black per spec."""
    packed_w = -(-w // (1 << width_bits))
    bits_per = 8 >> width_bits
    mask = (1 << bits_per) - 1
    sub_mask = (1 << width_bits) - 1
    n_pal = len(palette)
    out: list = [None] * (w * h)
    for y in range(h):
        row = y * packed_w
        for x in range(w):
            g = pix[row + (x >> width_bits)][2]
            idx = (g >> ((x & sub_mask) * bits_per)) & mask
            out[y * w + x] = (
                palette[idx] if idx < n_pal else (0, 0, 0, 0)
            )
    return out


# ---------------------------------------------------------------------------
# Entropy-coded image read/write
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReaderLSB, alphabet: int) -> dict:
    """One prefix code (spec §6.2.2): simple (1-2 symbols) or normal
    (code-length-coded); returns a read_code table."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet:
            raise ValueError("VP8L simple-code symbol outside alphabet")
        if num_symbols == 1:
            return {"trivial": s0}
        s1 = br.read(8)
        if s1 >= alphabet or s1 == s0:
            raise ValueError("VP8L simple-code symbol outside alphabet")
        return _decode_table_from_lengths({s0: 1, s1: 1})
    num_clc = 4 + br.read(4)
    clc_lengths = {}
    for i in range(num_clc):
        ln = br.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    if not clc_lengths:
        raise ValueError("empty VP8L code-length code")
    clc = _decode_table_from_lengths(clc_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _read_sym(br, clc)
        if cl < 16:
            if cl:
                lengths[symbol] = cl
                prev_len = cl
            symbol += 1
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            if fill:
                for _ in range(repeat):
                    lengths[symbol] = fill
                    symbol += 1
            else:
                symbol += repeat
    if not lengths:
        raise ValueError("VP8L prefix code with no symbols")
    return _decode_table_from_lengths(lengths)


def _read_entropy_image(br: _BitReaderLSB, w: int, h: int, is_argb: bool):
    """Decode one entropy-coded image to a flat list of (a, r, g, b).
    ARGB images may carry META PREFIX CODES (r16: the last VP8L decode
    gate besides lossy VP8): a sub-image maps each 2^bits block to a
    prefix-code GROUP (index = red << 8 | green), and every symbol of
    a pixel reads from its block's group."""
    meta_groups = None
    meta_bits = 0
    if is_argb and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_pix = _read_entropy_image(br, mw, mh, False)
        meta_groups = [((p[1] << 8) | p[2]) for p in meta_pix]
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color cache bits {cache_bits}")
    green_alpha = _GREEN_LITERALS + _LENGTH_CODES + (
        (1 << cache_bits) if cache_bits else 0
    )
    n_groups = (max(meta_groups) + 1) if meta_groups is not None else 1
    if n_groups > 1 << 16:
        raise ValueError("VP8L meta prefix group index overflow")
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, _DISTANCE_CODES),
        ))
    t_green, t_red, t_blue, t_alpha, t_dist = groups[0]
    mw_blocks = -(-w // (1 << meta_bits)) if meta_groups is not None else 0
    n = w * h
    pix: list = [None] * n
    cache = [(0, 0, 0, 0)] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0

    def insert(p):
        if cache is not None:
            argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
            cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = p

    i = 0
    while i < n:
        if meta_groups is not None:
            y, x = divmod(i, w)
            t_green, t_red, t_blue, t_alpha, t_dist = groups[
                meta_groups[
                    (y >> meta_bits) * mw_blocks + (x >> meta_bits)
                ]
            ]
        g = _read_sym(br, t_green)
        if g < _GREEN_LITERALS:
            r = _read_sym(br, t_red)
            b = _read_sym(br, t_blue)
            a = _read_sym(br, t_alpha)
            pix[i] = (a, r, g, b)
            insert(pix[i])
            i += 1
        elif g < _GREEN_LITERALS + _LENGTH_CODES:
            length = _prefix_decode(br, g - _GREEN_LITERALS)
            dist_code = _prefix_decode(br, _read_sym(br, t_dist))
            if dist_code <= 120:
                # 2D near-distance: map through the neighborhood table
                # scaled by THIS entropy image's width (spec: codes 1..120)
                dx, dy = _NEAR_DIST[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > i or i + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                pix[i] = pix[i - dist]
                insert(pix[i])
                i += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache hit without a color cache")
            idx = g - _GREEN_LITERALS - _LENGTH_CODES
            pix[i] = cache[idx]
            i += 1
    return pix


def _emit_prefix_code(bw: _BitWriterLSB, lengths: dict, alphabet: int) -> dict:
    """Write one prefix code's description; returns {sym: (code, len)}."""
    used = sorted(s for s, ln in lengths.items() if ln)
    if len(used) == 1 and used[0] <= 255:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2 and used[1] <= 255:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # normal
    # r16 directive #3: run-length the code-length sequence with the
    # spec's 16 (repeat prev non-zero) / 17 / 18 (zero runs) codes and
    # stop at the last used symbol via the max_symbol shortcut — for a
    # sparse alphabet this collapses ~alphabet writes (and the
    # decoder's matching reads) to ~2×(used symbols) tokens.
    end = max(s for s, v in lengths.items() if v) + 1
    arr = [0] * end
    for s, v in lengths.items():
        if s < end:
            arr[s] = v
    toks: list[tuple[int, int, int]] = []  # (cl symbol, extra, extra bits)
    prev_len = 8  # reader's initial "previous" for code 16
    i = 0
    while i < end:
        v = arr[i]
        j = i
        while j < end and arr[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                toks.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                toks.append((17, r - 3, 3))
                run -= r
            toks.extend((0, 0, 0) for _ in range(run))
        else:
            if v != prev_len:
                toks.append((v, 0, 0))
                run -= 1
                prev_len = v
            while run >= 3:
                r = min(run, 6)
                toks.append((16, r - 3, 2))
                run -= r
            toks.extend((v, 0, 0) for _ in range(run))
        i = j
    distinct = sorted({t[0] for t in toks})
    if len(distinct) == 1:
        distinct = sorted({distinct[0], 0 if distinct[0] else 1})
    clc_lengths = _balanced_lengths(distinct) if len(distinct) > 2 else {
        distinct[0]: 1, distinct[1]: 1,
    }
    num_clc = max(_CLC_ORDER.index(s) for s in clc_lengths) + 1
    num_clc = max(num_clc, 4)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    clc_enc = _canonical_from_lengths(clc_lengths)
    if len(toks) >= 2:
        # max_symbol counts CL-token READS (the reader decrements once
        # per token, repeats included)
        x = len(toks) - 2
        k = max(0, -(-(max(2, x.bit_length()) - 2) // 2))
        bw.write(1, 1)
        bw.write(k, 3)
        bw.write(x, 2 + 2 * k)
    else:
        bw.write(0, 1)  # no max_symbol shortcut: emit the whole alphabet
        toks = [(v, 0, 0) for v in arr]
        toks += [(0, 0, 0)] * (alphabet - end)
    for sym, extra, ebits in toks:
        code, bits = clc_enc[sym]
        bw.write_code(code, bits)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_from_lengths(lengths)


def _emit_group_codes(bw: _BitWriterLSB, gpix):
    """Emit one meta-prefix GROUP's five codes (literals-only group:
    the distance code is a never-used one-symbol table)."""

    def lens(symbols):
        if not symbols:
            return {0: 1}
        if len(symbols) <= 2:
            return {s: 1 for s in sorted(symbols)}
        return _balanced_lengths(symbols)

    e_green = _emit_prefix_code(
        bw, lens({p[2] for p in gpix}), _GREEN_LITERALS + _LENGTH_CODES
    )
    e_red = _emit_prefix_code(bw, lens({p[1] for p in gpix}), 256)
    e_blue = _emit_prefix_code(bw, lens({p[3] for p in gpix}), 256)
    e_alpha = _emit_prefix_code(bw, lens({p[0] for p in gpix}), 256)
    _emit_prefix_code(bw, {0: 1}, _DISTANCE_CODES)
    return e_green, e_red, e_blue, e_alpha


def _tokenize_lz77(pix, w: int, cache_bits: int):
    """Greedy LZ77 over the pixel stream (r16 directive #2's encoder
    handle): emits ("lit", pixel) / ("cache", idx) / ("copy", length,
    dist_code, raw_dist) tokens the decoder's backward-reference path
    reproduces.  Distances that land in the 2D neighborhood map to
    near-distance codes 1..120 (smallest code on collision — the same
    table the decoder aliases through); everything else is
    dist + 120.  Min match 3, overlap allowed (the decoder copies
    sequentially), candidate positions from a last-8-occurrences
    chain."""
    near: dict[int, int] = {}
    for ci, (dx, dy) in enumerate(_NEAR_DIST):
        d = dy * w + dx
        if d >= 1 and d not in near:
            near[d] = ci + 1
    cache = [(0, 0, 0, 0)] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0

    def cache_idx(p):
        argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
        return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift

    chains: dict = {}
    tokens = []
    n = len(pix)
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        for j in reversed(chains.get(pix[i], ())):
            d = i - j
            ln = 0
            limit = min(n - i, 1024)
            while ln < limit and pix[i + ln - d] == pix[i + ln]:
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, d
                if ln >= limit:
                    break
        if best_len >= 3:
            dc = near.get(best_dist, best_dist + 120)
            tokens.append(("copy", best_len, dc, best_dist))
            for k in range(i, i + best_len):
                chains.setdefault(pix[k], []).append(k)
                if len(chains[pix[k]]) > 8:
                    chains[pix[k]].pop(0)
                if cache is not None:
                    cache[cache_idx(pix[k])] = pix[k]
            i += best_len
            continue
        if cache is not None and cache[cache_idx(pix[i])] == pix[i]:
            tokens.append(("cache", cache_idx(pix[i])))
        else:
            tokens.append(("lit", pix[i]))
            if cache is not None:
                cache[cache_idx(pix[i])] = pix[i]
        chains.setdefault(pix[i], []).append(i)
        if len(chains[pix[i]]) > 8:
            chains[pix[i]].pop(0)
        i += 1
    return tokens


def _write_entropy_image(
    bw: _BitWriterLSB,
    pix,
    is_argb: bool,
    lz77: bool = False,
    w: int | None = None,
    cache_bits: int = 0,
    meta_bits: int | None = None,
    h: int | None = None,
) -> None:
    """Entropy image: one prefix-code group.  Default literals-only; with
    ``lz77`` (requires ``w``) backward references + optional color
    cache are emitted through _tokenize_lz77; ``meta_bits`` (requires
    ``w``/``h``, literals-only) emits META PREFIX CODES — two code
    groups assigned by block-column parity, each built from its own
    pixels' statistics (the r16 decoder-path exerciser)."""
    if is_argb:
        if meta_bits is not None:
            if lz77 or cache_bits:
                raise ValueError("meta prefix emission is literals-only")
            if w is None or h is None:
                raise ValueError("meta prefix emission needs w and h")
            if not 2 <= meta_bits <= 9:
                raise ValueError("meta_bits out of range")
            bw.write(1, 1)  # meta prefix codes present
            bw.write(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            grid = [bx % 2 for _by in range(mh) for bx in range(mw)]
            n_groups = max(grid) + 1
            _write_entropy_image(
                bw,
                [(0, idx >> 8, idx & 0xFF, 0) for idx in grid],
                is_argb=False,
            )
            bw.write(0, 1)  # no color cache
            group_of = [
                grid[((i // w) >> meta_bits) * mw + ((i % w) >> meta_bits)]
                for i in range(len(pix))
            ]
            encs = []
            for gi in range(n_groups):
                gpix = [p for p, g in zip(pix, group_of) if g == gi] or [
                    (255, 0, 0, 0)
                ]
                encs.append(_emit_group_codes(bw, gpix))
            for p, g in zip(pix, group_of):
                e_green, e_red, e_blue, e_alpha = encs[g]
                a, r, gg, b = p
                for enc, sym in (
                    (e_green, gg), (e_red, r), (e_blue, b), (e_alpha, a)
                ):
                    c, nb = enc[sym]
                    bw.write_code(c, nb)
            return
        bw.write(0, 1)  # no meta prefix codes
    if cache_bits:
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache bits")
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)  # no color cache
    if lz77 or cache_bits:
        if w is None:
            raise ValueError("lz77/cache emission needs the image width")
        tokens = _tokenize_lz77(pix, w, cache_bits)
    else:
        tokens = [("lit", p) for p in pix]
    greens: set = set()
    reds: set = set()
    blues: set = set()
    alphas: set = set()
    dists: set = set()
    cache_base = _GREEN_LITERALS + _LENGTH_CODES
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            greens.add(g)
            reds.add(r)
            blues.add(b)
            alphas.add(a)
        elif t[0] == "cache":
            greens.add(cache_base + t[1])
        else:
            greens.add(_GREEN_LITERALS + _prefix_encode(t[1])[0])
            dists.add(_prefix_encode(t[2])[0])

    def lens(symbols):
        if not symbols:
            return {0: 1}
        if len(symbols) <= 2:
            return {s: 1 for s in sorted(symbols)}
        return _balanced_lengths(symbols)

    green_alpha = cache_base + ((1 << cache_bits) if cache_bits else 0)
    e_green = _emit_prefix_code(bw, lens(greens), green_alpha)
    e_red = _emit_prefix_code(bw, lens(reds), 256)
    e_blue = _emit_prefix_code(bw, lens(blues), 256)
    e_alpha = _emit_prefix_code(bw, lens(alphas), 256)
    e_dist = _emit_prefix_code(bw, lens(dists), _DISTANCE_CODES)
    if len(tokens) >= 1024 and all(t[0] == "lit" for t in tokens):
        # vectorized literal emission (r16 directive #3): map each
        # channel symbol to its bit-reversed code + length via numpy
        # gather, interleave g,r,b,a per pixel, bulk-pack once
        import numpy as np

        arr = np.array([t[1] for t in tokens], dtype=np.int64)

        def table_arrays(enc):
            hi = max(enc) + 1
            revs = np.zeros(hi, np.uint64)
            ls = np.zeros(hi, np.int64)
            for s, (code, ln) in enc.items():
                revs[s] = _bitrev(code, ln)
                ls[s] = ln
            return revs, ls

        rg, lg = table_arrays(e_green)
        rr, lr = table_arrays(e_red)
        rb, lb = table_arrays(e_blue)
        ra, la = table_arrays(e_alpha)
        g, r, b, al = arr[:, 2], arr[:, 1], arr[:, 3], arr[:, 0]
        vals = np.stack([rg[g], rr[r], rb[b], ra[al]], axis=1).reshape(-1)
        lns = np.stack([lg[g], lr[r], lb[b], la[al]], axis=1).reshape(-1)
        bw.write_bulk(vals, lns)
        return
    # scalar path: pre-reverse each used code once (write() takes the
    # LSB-first form directly) instead of per-emission bit reversal
    rv_green = {s: (_bitrev(c, n), n) for s, (c, n) in e_green.items()}
    rv_red = {s: (_bitrev(c, n), n) for s, (c, n) in e_red.items()}
    rv_blue = {s: (_bitrev(c, n), n) for s, (c, n) in e_blue.items()}
    rv_alpha = {s: (_bitrev(c, n), n) for s, (c, n) in e_alpha.items()}
    wr = bw.write
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            c, nb = rv_green[g]
            wr(c, nb)
            c, nb = rv_red[r]
            wr(c, nb)
            c, nb = rv_blue[b]
            wr(c, nb)
            c, nb = rv_alpha[a]
            wr(c, nb)
        elif t[0] == "cache":
            c, nb = rv_green[cache_base + t[1]]
            wr(c, nb)
        else:
            _mk, length, dc, _raw = t
            lcode, lextra, lbits = _prefix_encode(length)
            c, nb = e_green[_GREEN_LITERALS + lcode]
            bw.write_code(c, nb)
            if lbits:
                bw.write(lextra, lbits)
            dcode, dextra, dbits = _prefix_encode(dc)
            c, nb = e_dist[dcode]
            bw.write_code(c, nb)
            if dbits:
                bw.write(dextra, dbits)


# ---------------------------------------------------------------------------
# VP8L stream + RIFF container
# ---------------------------------------------------------------------------


def _decode_vp8l(payload: bytes):
    """VP8L chunk payload → (H, W, 3) uint8 RGB."""
    import numpy as np

    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReaderLSB(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    if w * h > (1 << 26):
        # resource bound, not malformed: a corrupted header must not
        # trigger a quarter-billion-entry pixel list allocation
        raise NotImplementedError(
            "VP8L larger than 64 MP (pure-python decoder bound)"
        )
    transforms = []
    seen = set()
    cur_w = w  # COLOR_INDEXING packing shrinks the width downstream
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            size_bits = br.read(3) + 2
            bw_blocks = -(-cur_w // (1 << size_bits))
            bh_blocks = -(-h // (1 << size_bits))
            sub = _read_entropy_image(br, bw_blocks, bh_blocks, False)
            modes = [p[2] for p in sub]
            if any(m > 13 for m in modes):
                raise ValueError("bad VP8L predictor mode")
            transforms.append(("predictor", size_bits, modes, cur_w))
        elif ttype == 1:  # COLOR_TRANSFORM (cross-color)
            size_bits = br.read(3) + 2
            bw_blocks = -(-cur_w // (1 << size_bits))
            bh_blocks = -(-h // (1 << size_bits))
            sub = _read_entropy_image(br, bw_blocks, bh_blocks, False)
            transforms.append(("color_transform", size_bits, sub, cur_w))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING (palette)
            n_colors = br.read(8) + 1
            pal_deltas = _read_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = (0, 0, 0, 0)
            for p in pal_deltas:  # spec: entries are delta-coded mod 256
                prev = tuple((x + y) & 0xFF for x, y in zip(prev, p))
                palette.append(prev)
            width_bits = (
                3 if n_colors <= 2 else
                2 if n_colors <= 4 else
                1 if n_colors <= 16 else 0
            )
            transforms.append(("color_index", palette, width_bits, cur_w))
            cur_w = -(-cur_w // (1 << width_bits))
    pix = _read_entropy_image(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            pix = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF) for a, r, g, b in pix
            ]
        elif t[0] == "predictor":
            _predictor_pass(pix, t[3], h, t[2], t[1], inverse=True)
        elif t[0] == "color_transform":
            _color_transform_pass(pix, t[3], h, t[2], t[1], inverse=True)
        else:  # color_index: unpack sub-byte indices, look up the palette
            pix = _palette_inverse(pix, t[1], t[2], t[3], h)
    arr = np.array(pix, dtype=np.uint8).reshape(h, w, 4)
    return arr[..., 1:4].copy()  # (a, r, g, b) → RGB


def decode_webp(blob: bytes):
    """WebP container → (H, W, 3) uint8 RGB.  Lossless (VP8L) decodes
    for real; lossy VP8 and extended VP8X gate with NotImplementedError;
    malformed containers raise ValueError."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    riff_len = struct.unpack_from("<I", blob, 4)[0]
    end = min(len(blob), 8 + riff_len)
    pos = 12
    while pos + 8 <= end:
        fourcc = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError("lossy WebP (VP8) decode")
        if fourcc == b"VP8X":
            raise NotImplementedError("extended WebP (VP8X) container")
        pos += 8 + size + (size % 2)
    raise ValueError("WebP without an image chunk")


def encode_webp_lossless(
    arr,
    subtract_green: bool = False,
    predictor_modes=None,
    predictor_size_bits: int = 4,
    palette: bool = False,
    color_transform=None,
    lz77: bool = False,
    cache_bits: int = 0,
    meta_prefix_bits: int | None = None,
) -> bytes:
    """(H, W, 3) uint8 RGB → lossless WebP bytes (VP8L).

    ``subtract_green`` prepends the SUBTRACT_GREEN transform;
    ``predictor_modes`` (flat per-block mode list, or a single int
    broadcast to every block) prepends a PREDICTOR transform;
    ``color_transform`` — an (g2r, g2b, r2b) byte triple broadcast to
    every block — prepends the cross-COLOR_TRANSFORM; ``palette=True``
    (exclusive with the other transforms) emits COLOR_INDEXING with
    sub-byte packing when <= 16 colors; ``lz77``/``cache_bits`` switch
    the entropy image from literals-only to backward references (2D
    near-distance codes when in range) and a real color cache.  All
    paths are exactly inverted by the decoder, so every encode
    round-trips bit-exactly regardless of the knobs (the test handle
    for every inverse path)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB")
    h, w = a.shape[:2]
    if not h or not w or w > (1 << 14) or h > (1 << 14):
        raise ValueError("bad WebP dimensions")
    if palette and (
        subtract_green or predictor_modes is not None
        or color_transform is not None
    ):
        raise ValueError("palette encoding excludes the other transforms")
    pix = [
        (255, int(p[0]), int(p[1]), int(p[2]))
        for row in a for p in row
    ]
    bw = _BitWriterLSB()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version
    cur_w = w
    if predictor_modes is not None:
        size_bits = predictor_size_bits
        if not 2 <= size_bits <= 9:
            raise ValueError("predictor size_bits out of range")
        bwb = -(-w // (1 << size_bits))
        bhb = -(-h // (1 << size_bits))
        if isinstance(predictor_modes, int):
            modes = [predictor_modes] * (bwb * bhb)
        else:
            modes = list(predictor_modes)
            if len(modes) != bwb * bhb:
                raise ValueError("predictor mode grid size mismatch")
        if any(not 0 <= m <= 13 for m in modes):
            raise ValueError("bad predictor mode")
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(size_bits - 2, 3)
        _write_entropy_image(
            bw, [(0, 0, m, 0) for m in modes], is_argb=False
        )
        _predictor_pass(pix, w, h, modes, size_bits, inverse=False)
    if color_transform is not None:
        g2r, g2b, r2b = (int(v) & 0xFF for v in color_transform)
        size_bits = 4
        bwb = -(-w // (1 << size_bits))
        bhb = -(-h // (1 << size_bits))
        elems = [(255, r2b, g2b, g2r)] * (bwb * bhb)
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        bw.write(size_bits - 2, 3)
        _write_entropy_image(bw, elems, is_argb=False)
        _color_transform_pass(pix, w, h, elems, size_bits, inverse=False)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        pix = [(pa, (r - g) & 0xFF, g, (b - g) & 0xFF) for pa, r, g, b in pix]
    if palette:
        colors, inverse = np.unique(
            a.reshape(-1, 3), axis=0, return_inverse=True
        )
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError(
                f"palette overflow: {n_colors} > 256 colors"
            )
        width_bits = (
            3 if n_colors <= 2 else
            2 if n_colors <= 4 else
            1 if n_colors <= 16 else 0
        )
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        pal_argb = [(255, int(c[0]), int(c[1]), int(c[2])) for c in colors]
        deltas = []
        prev = (0, 0, 0, 0)
        for cur in pal_argb:  # spec: palette entries are delta-coded
            deltas.append(tuple((x - y) & 0xFF for x, y in zip(cur, prev)))
            prev = cur
        _write_entropy_image(bw, deltas, is_argb=False)
        idx = inverse.reshape(h, w).astype(np.int64)
        packed_w = -(-w // (1 << width_bits))
        bits_per = 8 >> width_bits
        packed = np.zeros((h, packed_w), np.int64)
        for sub in range(1 << width_bits):
            cols = idx[:, sub::(1 << width_bits)]
            packed[:, : cols.shape[1]] |= cols << (sub * bits_per)
        pix = [(255, 0, int(g), 0) for row in packed for g in row]
        cur_w = packed_w
    bw.write(0, 1)  # end of transforms
    _write_entropy_image(
        bw, pix, is_argb=True, lz77=lz77, w=cur_w, cache_bits=cache_bits,
        meta_bits=meta_prefix_bits, h=h,
    )
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
