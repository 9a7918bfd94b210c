"""Baseline JPEG codec: spec-derived hand-built bitstream (decoder
independence), encode/decode round-trips across subsampling/quality/
restart, refusals, and the multimodal decode/resize integration."""

import struct

import numpy as np
import pytest

from picdexer_spark.functions.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // (w - 1), yy * 255 // (h - 1),
        (xx + yy) * 255 // (w + h - 2),
    ], axis=-1).astype(np.uint8)


def _handmade_dc_only(v=8, q=16):
    """8x8 grayscale JPEG built bit-by-bit FROM THE SPEC (not via
    encode_jpeg): quant table all `q`, single DC coefficient `v`, no AC.
    Expected image: every pixel = round(v*q/8) + 128."""
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes([q] * 64)
    out += b"\xFF\xC0" + struct.pack(">H", 11) + bytes([8]) \
        + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xFF\xC4" + struct.pack(">H", 19 + sum(DC_LUMA_BITS)) \
        + bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xFF\xC4" + struct.pack(">H", 19 + sum(AC_LUMA_BITS)) \
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xFF\xDA" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC category 4 (v=8) = canonical luma-DC code '101',
    # then 4 magnitude bits '1000', then AC EOB = '1010'; pad 1s
    bits = "101" + "1000" + "1010"
    bits += "1" * (-len(bits) % 8)
    for i in range(0, len(bits), 8):
        byte = int(bits[i:i + 8], 2)
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)
    out += b"\xFF\xD9"
    return bytes(out)


def test_handmade_dc_only_block():
    img = decode_jpeg(_handmade_dc_only(v=8, q=16))
    assert img.shape == (8, 8, 3)
    # DC 8 * quant 16 = 128; constant basis 1/8 -> 16; +128 level shift
    assert (img == 144).all()


def test_handmade_negative_dc():
    # v = -3, category 2, magnitude bits = v + 2^t - 1 = 0b00
    out = bytearray(_handmade_dc_only())
    # rebuild entropy by hand: code for t=2 is '011', bits '00', EOB '1010'
    base = _handmade_dc_only()
    idx = base.rindex(b"\xFF\xDA")
    head = base[: idx + 2 + 8]
    bits = "011" + "00" + "1010"
    bits += "1" * (-len(bits) % 8)
    body = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    img = decode_jpeg(head + body + b"\xFF\xD9")
    # -3 * 16 = -48 -> -6 + 128 = 122
    assert (img == 122).all()


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 75])
def test_roundtrip(sub, quality):
    img = _gradient()
    dec = decode_jpeg(encode_jpeg(img, quality, sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= (10 if sub == "444" else 16)
    assert err.mean() < 4.0


def test_roundtrip_odd_dimensions():
    img = _gradient(h=13, w=21)   # forces MCU padding both axes
    dec = decode_jpeg(encode_jpeg(img, 90, "420"))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_restart_interval_roundtrip():
    img = _gradient()
    for ri in (1, 3):
        dec = decode_jpeg(encode_jpeg(img, 85, "444", restart_interval=ri))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 10


def test_solid_color_near_exact():
    img = np.full((17, 23, 3), [200, 30, 90], np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_refusals():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive (SOF2) refused by marker, not mis-decoded
    buf = bytearray(encode_jpeg(_gradient(), 85))
    i = buf.index(b"\xFF\xC0")
    buf[i + 1] = 0xC2
    with pytest.raises(JpegError, match="SOF"):
        decode_jpeg(bytes(buf))
    # truncated entropy stream
    with pytest.raises(JpegError):
        decode_jpeg(bytes(encode_jpeg(_gradient(), 85))[:-40])


def test_multimodal_decode_and_resize(spark):
    from picdexer_spark.operators.multimodal import (
        extract_media_features,
        resize_media,
    )

    img = _gradient()
    jpg = encode_jpeg(img, 85)
    ppm = b"P6\n4 2\n255\n" + bytes(range(24))
    df = spark.createDataFrame(
        [(0, bytearray(jpg)), (1, bytearray(ppm)),
         (2, bytearray(b"\x89PNG\r\n\x1a\nnope"))],
        "id long, media binary")
    feats = {r["id"]: r for r in
             extract_media_features(df, "id", "media").collect()}
    assert feats[0]["decode_ok"] and feats[0]["mime"] == "image/jpeg"
    assert (feats[0]["width"], feats[0]["height"]) == (56, 40)
    assert abs(feats[0]["mean_luma"] - img.mean() / 255.0) < 0.02
    assert feats[1]["decode_ok"]
    assert not feats[2]["decode_ok"]          # png still refused, visible
    rs = {r["id"]: r for r in
          resize_media(df, "id", "media", 16, 12).collect()}
    assert rs[0]["resize_ok"]
    small = decode_jpeg(bytes(rs[0]["media"]))
    assert small.shape == (12, 16, 3)
    assert not rs[2]["resize_ok"] and rs[2]["media"] is None


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code (ADVICE r6 — such legal files were refused as 'marker
    sync lost'). Insert fill bytes between segments; decode must equal
    the unpadded stream's output."""
    img = _gradient(24, 24)
    buf = encode_jpeg(img, 85, "444")
    # after SOI (2 bytes), before the next marker's 0xFF: add fills
    padded = buf[:2] + b"\xFF\xFF\xFF" + buf[2:]
    ref = decode_jpeg(buf)
    got = decode_jpeg(padded)
    assert np.array_equal(ref, got)
