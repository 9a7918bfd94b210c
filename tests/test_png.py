"""PNG codec (functions/png.py) + multimodal integration.

Decoder independence is pinned with HAND-BUILT spec bitstreams (chunks and
filtered scanlines assembled with test-local struct/zlib code, never
encode_png) — the same stance as test_jpeg: a codec round-tripped only
against itself proves nothing. Roundtrips then cover every (channel count
x filter type) cell, and refusals pin the loud-failure contract.
"""

import struct
import zlib

import numpy as np
import pytest

from picdexer_spark.functions.png import PngError, decode_png, encode_png

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _hand_png(w, h, color, scanlines, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    return (SIG + body + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


def test_hand_built_up_and_sub_filters():
    # 2x2 RGB, row 0 unfiltered, row 1 Up-filtered: stored = cur - above
    row0 = [10, 20, 30, 40, 50, 60]
    row1 = [13, 24, 35, 46, 57, 68]
    up = bytes([0] + row0) + bytes(
        [2] + [(c - a) % 256 for c, a in zip(row1, row0)])
    got = decode_png(_hand_png(2, 2, 2, up))
    assert got.tolist() == [[[10, 20, 30], [40, 50, 60]],
                            [[13, 24, 35], [46, 57, 68]]]
    # 1x3 gray, Sub-filtered: stored = cur - left (left of first = 0)
    vals = [100, 150, 90]
    sub = bytes([1, 100, (150 - 100) % 256, (90 - 150) % 256])
    assert decode_png(_hand_png(3, 1, 0, sub))[:, :, 0].tolist() == [vals]


def test_hand_built_average_and_paeth():
    # 2x1 gray, two rows: row 1 Average (pred = (left + up)//2)
    avg = bytes([0, 8, 16]) + bytes([3, (20 - 4) % 256,
                                     (30 - (20 + 16) // 2) % 256])
    assert decode_png(_hand_png(2, 2, 0, avg))[:, :, 0].tolist() \
        == [[8, 16], [20, 30]]
    # Paeth row: predictors resolve per spec (a=left, b=up, c=up-left)
    # pixel (1,0): a=0,b=8,c=0 -> p=8 -> nearest is b=8; stored 25-8
    # pixel (1,1): a=25,b=16,c=8 -> p=33; pa=8,pb=17,pc=25 -> a=25
    pae = bytes([0, 8, 16]) + bytes([4, (25 - 8) % 256, (40 - 25) % 256])
    assert decode_png(_hand_png(2, 2, 0, pae))[:, :, 0].tolist() \
        == [[8, 16], [25, 40]]


def test_roundtrip_all_channels_all_filters():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(9, 5, ch), dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(arr, filter_type=ft))
            assert out.shape == arr.shape and (out == arr).all(), (ch, ft)


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    scan = bytes([0, 0, 1]) + bytes([0, 2, 2])
    got = decode_png(_hand_png(2, 2, 3, scan, plte=plte))
    assert got.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [0, 0, 255]]]
    with pytest.raises(PngError, match="palette index"):
        decode_png(_hand_png(1, 1, 3, bytes([0, 9]), plte=plte))


def test_refusals():
    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(PngError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    # flip one IDAT payload byte -> CRC refusal (never decodes garbage)
    bad = bytearray(good)
    bad[good.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(bad))
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    with pytest.raises(PngError, match="bit depth"):
        decode_png(SIG + _chunk(b"IHDR", ihdr16)
                   + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                   + _chunk(b"IEND", b""))
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    with pytest.raises(PngError, match="Adam7"):
        decode_png(SIG + _chunk(b"IHDR", ihdr_i)
                   + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                   + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="geometry"):
        decode_png(_hand_png(3, 3, 2, bytes([0, 1, 2, 3])))
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 3), np.uint8), filter_type=9)


def test_resize_png_nearest_neighbor():
    from picdexer_spark.operators.multimodal import resize_png_bytes

    grad = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    out = decode_png(resize_png_bytes(encode_png(grad), 4, 3))
    rows = (np.arange(3) * 6) // 3
    cols = (np.arange(4) * 8) // 4
    assert (out == grad[rows][:, cols]).all()
    # gray stays single-channel through the resize
    g = decode_png(resize_png_bytes(
        encode_png(np.full((5, 5), 77, np.uint8)), 2, 2))
    assert g.shape == (2, 2, 1) and (g == 77).all()


def test_spark_media_pipeline_decodes_png(spark):
    from picdexer_spark.operators.multimodal import (
        extract_media_features, resize_media)

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 4 + i, 3), dtype=np.uint8)
            for i in range(3)}
    rows = [(i, bytearray(encode_png(a))) for i, a in imgs.items()]
    rows.append((9, bytearray(SIG + b"not really a png")))  # corrupt row
    df = spark.createDataFrame(rows, "id long, media binary")

    feats = {r["id"]: r for r in
             extract_media_features(df, "id", "media").collect()}
    for i, a in imgs.items():
        assert feats[i]["decode_ok"] and feats[i]["mime"] == "image/png"
        assert (feats[i]["width"], feats[i]["height"]) == (a.shape[1],
                                                           a.shape[0])
        assert feats[i]["mean_luma"] == pytest.approx(a.mean() / 255.0)
    assert not feats[9]["decode_ok"]

    rz = {r["id"]: r for r in
          resize_media(df, "id", "media", 3, 2).collect()}
    for i in imgs:
        assert rz[i]["resize_ok"]
        assert decode_png(bytes(rz[i]["media"])).shape == (2, 3, 3)
    assert not rz[9]["resize_ok"] and rz[9]["media"] is None


def test_malformed_chunk_refusals_stay_png_errors():
    """Bad IHDR/PLTE lengths must refuse as PngError (the documented
    contract), never as struct.error / numpy ValueError."""
    ihdr12 = struct.pack(">IIBBBB", 1, 1, 8, 0, 0, 0)  # 12 bytes, not 13
    with pytest.raises(PngError, match="IHDR length"):
        decode_png(SIG + _chunk(b"IHDR", ihdr12))
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    with pytest.raises(PngError, match="PLTE length"):
        decode_png(SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", b"\x01\x02")
                   + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                   + _chunk(b"IEND", b""))


from hypothesis import given, settings
from hypothesis import strategies as st


@given(w=st.integers(1, 17), h=st.integers(1, 13),
       ch=st.sampled_from([1, 2, 3, 4]), ft=st.integers(0, 4),
       seed=st.integers(0, 2**16))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ch, ft, seed):
    """decode(encode(x, any filter)) == x for arbitrary geometry including
    1-pixel rows/columns (where left/up predecessors are all zeros)."""
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.uint8)
    out = decode_png(encode_png(arr, filter_type=ft))
    assert out.shape == arr.shape and (out == arr).all()
