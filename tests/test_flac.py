"""FLAC codec tests (r16 VERDICT directive #8): exact round trips
across every subframe/partition path, hand-built stereo-decorrelation
streams, CRC tamper detection, and malformed-stream ValueErrors."""

import struct

import numpy as np
import pytest

from es_ch_sync_spark.operators import flac as F
from es_ch_sync_spark.operators.flac import decode_flac, encode_flac


def _rt(s, rate=8000, **kw):
    out, r = decode_flac(encode_flac(s, rate, **kw))
    assert r == rate
    assert np.array_equal(out, np.asarray(s)), kw


def test_flac_round_trips_all_paths():
    rng = np.random.default_rng(3)
    i = np.arange(2000, dtype=np.int64)
    s = ((7 * 31 + 7 * i) % 4096) - 2048  # the fixture formula
    _rt(s)
    _rt(np.zeros(3000, np.int64))  # constant subframes
    _rt(np.full(500, -123, np.int64))
    _rt(rng.integers(-32768, 32768, 5000))  # noise → high rice params
    _rt(np.cumsum(rng.integers(-50, 50, 4000)))  # smooth → fixed orders
    _rt(s, force="verbatim")
    for k in range(5):
        _rt(s, force=f"fixed{k}")
    _rt(s, force="lpc", lpc_coefs=[3, -3, 1], lpc_shift=1)
    _rt(s, force="lpc", lpc_coefs=[2], lpc_shift=0)
    _rt(s[:2048], partition_order=2)
    _rt(s[:1024], force="fixed2", partition_order=4)
    # stereo (independent channels), block-boundary sizes, extremes
    _rt(np.stack([s[:1024], np.roll(s[:1024], 7)], axis=1))
    _rt(np.array([5], np.int64))
    _rt(rng.integers(-32768, 32768, 1023))
    _rt(rng.integers(-32768, 32768, 1025))
    _rt(np.array([32767, -32768] * 600, np.int64))
    # out-of-range samples refused; bad knobs refused
    with pytest.raises(ValueError):
        encode_flac(np.array([1 << 15]), 8000)
    _rt(np.full(10, 3, np.int64), force="constant")  # flat: allowed
    with pytest.raises(ValueError):
        encode_flac(np.arange(100), 8000, force="constant")


def _build_stereo(mode, left, right, rate=8000):
    """Hand-built single-frame stream with a decorrelated stereo
    channel assignment (8 = L/S, 9 = R/S, 10 = M/S) — the decoder
    paths the mono encoder cannot reach."""
    n = len(left)
    out = bytearray(b"fLaC")
    info = F._BitWriterMSB()
    info.write(F._BLOCKSIZE, 16)
    info.write(F._BLOCKSIZE, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(1, 3)  # 2 channels
    info.write(15, 5)  # 16 bps
    info.write(n, 36)
    body = info.flush() + bytes(16)  # md5 unknown
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    bw = F._BitWriterMSB()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0b0111, 4)
    bw.write(0, 4)
    bw.write(mode, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    header = bw.flush() + F._utf8_code(0) + struct.pack(">H", n - 1)
    header += bytes([F._crc8(header)])
    fw = F._BitWriterMSB()
    fw.buf += header
    ln = np.asarray(left, np.int64)
    rn = np.asarray(right, np.int64)
    side = ln - rn
    if mode == 8:
        chans = [(ln, 16), (side, 17)]
    elif mode == 9:
        chans = [(side, 17), (rn, 16)]
    else:
        chans = [((ln + rn) >> 1, 16), (side, 17)]
    for sv, bits in chans:
        fw.write(0, 1)
        fw.write(1, 6)  # VERBATIM
        fw.write(0, 1)
        for v in sv.tolist():
            fw.write_signed(int(v), bits)
    fw.align()
    frame = bytes(fw.buf)
    out += frame + struct.pack(">H", F._crc16(frame))
    return bytes(out)


def test_flac_stereo_decorrelation_hand_built():
    rng = np.random.default_rng(5)
    left = rng.integers(-32768, 32768, 64)
    right = rng.integers(-32768, 32768, 64)
    for mode in (8, 9, 10):
        got, rate = decode_flac(_build_stereo(mode, left, right))
        assert rate == 8000
        assert np.array_equal(got[:, 0], left), mode
        assert np.array_equal(got[:, 1], right), mode


def test_flac_crcs_and_malformed():
    s = np.arange(500, dtype=np.int64) % 100 - 50
    good = encode_flac(s, 8000)
    # frame CRC-16 tamper
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad))
    # header CRC-8 tamper: flip a bit in the frame header (the
    # blocksize-low byte right before the CRC-8)
    frame_start = 4 + 4 + 34
    bad = bytearray(good)
    bad[frame_start + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|sync|coded number"):
        decode_flac(bytes(bad))
    # MD5 tamper in STREAMINFO
    bad = bytearray(good)
    bad[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # truncations at structural boundaries
    for cut in (2, 6, 30, 44, len(good) - 3):
        with pytest.raises(ValueError):
            decode_flac(good[:cut])
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")
    # utf-8 coded-number round trip across the 36-bit range
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, (1 << 31) - 5,
              (1 << 36) - 1):
        br = F._BitReaderMSB(F._utf8_code(n))
        assert F._read_utf8_code(br) == n


def test_flac_vectorized_rice_extremes():
    """r16 optimization pins: the bulk rice writer decomposes long
    unary runs into 32-bit zero chunks and the pointer-doubling reader
    chases them exactly — exercised by a lone spike (q ≈ 2^16 at p=0),
    by all-zero partitions, and by a partition whose parameter search
    lands on each boundary p."""
    # spike → enormous unary run through the chunked bulk path
    s = np.zeros(1024, np.int64)
    s[100] = 32767
    _rt(s, force="fixed0")
    # spike in a multi-partition layout (first partition shortened by order)
    s2 = np.zeros(2048, np.int64)
    s2[3] = -30000
    s2[2000] = 29999
    _rt(s2, force="fixed1", partition_order=3)
    # alternating extremes: every value pays a long-ish run at best p
    s3 = np.tile(np.array([32767, -32768], np.int64), 512)
    _rt(s3, force="fixed0")
    # tiny block (n < one chunk) and exact chunk-boundary runs
    for q_target in (31, 32, 33, 63, 64, 65):
        v = (q_target >> 1) ^ -(q_target & 1)  # un-zigzag of q at p=0
        sq = np.zeros(16, np.int64)
        sq[7] = v
        _rt(sq, force="fixed0")


def test_flac_synth_blob_matches_formula():
    """Every synth_flac_blob variant decodes to the shared PCM formula
    — the multimodal_flac_stats oracle property."""
    from es_ch_sync_spark.operators.multimodal import synth_flac_blob

    for mid in (0, 1, 2, 3, 4, 17, 42, 103):
        n = (mid % 20 + 5) * 80
        i = np.arange(n, dtype=np.int64)
        want = ((mid * 31 + 7 * i) % 4096) - 2048
        got, rate = decode_flac(synth_flac_blob(mid))
        assert rate == 8000
        assert np.array_equal(got, want), mid
