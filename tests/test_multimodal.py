"""Multimodal binary-column operators: sniffing, metadata, REAL binary-PPM
decode/resize kernels (numpy, byte-exact), vectorized frame fan-out.
Compressed formats (jpeg/png/...) are sniffed but not decodable in this
runtime image — those rows flow through with decode_ok=false."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import multimodal as mm


def make_ppm(w: int, h: int, pattern: str = "const", c: int = 77) -> bytes:
    header = b"P6\n%d %d\n255\n" % (w, h)
    if pattern == "const":
        px = np.full((h, w, 3), c, np.uint8)
    else:  # gradient: pixel value = (row + col) % 256
        r = np.arange(h)[:, None] + np.arange(w)[None, :]
        px = np.repeat((r % 256).astype(np.uint8)[:, :, None], 3, axis=2)
    return header + px.tobytes()


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, b"\xff\xd8\xff\xe0" + b"J" * 100),          # jpeg (no codec here)
        (1, b"\x89PNG\r\n\x1a\n" + b"P" * 100),         # png (no codec here)
        (2, b"GIF89a" + b"G" * 50),                      # gif
        (3, b"ID3\x04" + b"M" * 64),                     # mp3
        (4, b"\x00" * 40),                               # unknown
        (5, b"\x01"),                                    # truncated
        (6, make_ppm(8, 4, "const", c=100)),             # decodable PPM
        (7, make_ppm(6, 6, "grad")),                     # decodable PPM
        (8, make_ppm(8, 4)[:10]),                        # truncated PPM
    ]
    pdf = pd.DataFrame(rows, columns=["id", "media"])
    return spark.createDataFrame(pdf)


def test_sniff_and_metadata(media_df):
    got = {r["id"]: r for r in mm.media_metadata(media_df, "id", "media").collect()}
    assert got[0]["mime"] == "image/jpeg"
    assert got[1]["mime"] == "image/png"
    assert got[2]["mime"] == "image/gif"
    assert got[3]["mime"] == "audio/mpeg"
    assert got[4]["mime"] == "application/octet-stream"
    assert got[6]["mime"] == "image/x-portable-pixmap"
    assert got[0]["n_bytes"] == 104
    assert len(got[0]["content_md5"]) == 32


def test_decode_ppm_kernel_exact():
    w, h, px, maxval = mm._decode_ppm(make_ppm(8, 4, "const", c=100))
    assert (w, h, maxval) == (8, 4, 255)
    assert px.shape == (4, 8, 3) and (px == 100).all()
    with pytest.raises(ValueError):
        mm._decode_ppm(make_ppm(8, 4)[:10])   # truncated pixel array
    with pytest.raises(ValueError):
        mm._decode_ppm(b"\xff\xd8\xffnotppm")  # wrong magic


def test_extract_features_real_ppm(media_df):
    feats = {r["id"]: r for r in
             mm.extract_media_features(media_df, "id", "media").collect()}
    assert len(feats) == 9  # failed rows kept, flagged
    # PPM rows really decode: exact dimensions and luma
    assert feats[6]["decode_ok"] is True
    assert (feats[6]["width"], feats[6]["height"], feats[6]["n_channels"]) == (8, 4, 3)
    assert feats[6]["mean_luma"] == pytest.approx(100 / 255.0, abs=0)
    assert feats[7]["decode_ok"] is True
    assert (feats[7]["width"], feats[7]["height"]) == (6, 6)
    # compressed/garbage/truncated rows flow through, not fatal
    for i in (0, 1, 2, 3, 4, 5, 8):
        assert feats[i]["decode_ok"] is False
        assert feats[i]["width"] == 0


def test_resize_ppm_nearest_neighbor(media_df):
    out = {r["id"]: r for r in
           mm.resize_media(media_df, "id", "media", 4, 2).collect()}
    assert out[6]["resize_ok"] is True
    w, h, px, _ = mm._decode_ppm(bytes(out[6]["media"]))
    assert (w, h) == (4, 2) and (px == 100).all()
    # gradient resize picks exact source pixels (index arithmetic)
    w2, h2, px2, _ = mm._decode_ppm(bytes(out[7]["media"]))
    src_r = (np.arange(2) * 6) // 2
    src_c = (np.arange(4) * 6) // 4
    expect = ((src_r[:, None] + src_c[None, :]) % 256).astype(np.uint8)
    assert (px2[:, :, 0] == expect).all()
    # non-PPM rows: kept, flagged, null payload
    assert out[0]["resize_ok"] is False and out[0]["media"] is None
    assert out[8]["resize_ok"] is False


def test_frame_sample_fanout(media_df):
    frames = mm.frame_sample_plan(media_df, "id", "media", every_n=30).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    assert 5 not in by_id  # truncated row contributes nothing
    assert sorted(by_id) == [0, 1, 2, 3, 4, 6, 7, 8]
    for rid, rs in by_id.items():
        assert sorted(x["frame_no"] for x in rs) == [0, 30]
        # frame = head (up to 16 bytes) + 1 frame-index byte
        assert all(9 <= len(x["frame"]) <= 17 for x in rs)
        if rid != 8:  # id 8's payload is only 10 bytes
            assert all(len(x["frame"]) == 17 for x in rs)


def test_resize_preserves_maxval(spark):
    """Resizing must emit the SOURCE maxval (pixels are copied unchanged;
    a hardcoded 255 header would silently rescale brightness)."""
    buf = b"P6\n4 4\n100\n" + bytes([100] * 48)
    df = spark.createDataFrame([(0, buf)], "id long, media binary")
    out = mm.resize_media(df, "id", "media", 2, 2).first()
    w, h, px, maxval = mm._decode_ppm(bytes(out["media"]))
    assert (w, h, maxval) == (2, 2, 100) and (px == 100).all()
    # luma stays 1.0 through the round trip
    feats = mm.extract_media_features(
        mm.resize_media(df, "id", "media", 2, 2), "id", "media"
    ).first()
    assert feats["mean_luma"] == 1.0
