"""Multimodal binary-column operators: sniffing, metadata, stubbed decode
plumbing (schemas/batch shapes real; codecs stubbed — no image libs here)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, b"\xff\xd8\xff\xe0" + b"J" * 100),          # jpeg
        (1, b"\x89PNG\r\n\x1a\n" + b"P" * 100),         # png
        (2, b"GIF89a" + b"G" * 50),                      # gif
        (3, b"ID3\x04" + b"M" * 64),                     # mp3
        (4, b"\x00" * 40),                               # unknown
        (5, b"\x01"),                                    # truncated
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
    assert got[0]["n_bytes"] == 104
    assert len(got[0]["content_md5"]) == 32


def test_extract_features_stub(media_df):
    feats = {r["id"]: r for r in
             mm.extract_media_features(media_df, "id", "media").collect()}
    assert len(feats) == 6  # failed rows kept, flagged
    for i in range(5):
        assert feats[i]["decode_ok"] is True
        assert 64 <= feats[i]["width"] <= 255
        assert feats[i]["n_channels"] == 3
        assert 0.0 <= feats[i]["mean_luma"] <= 1.0
    assert feats[5]["decode_ok"] is False  # truncated -> kept, not fatal
    # determinism: same bytes -> same features
    feats2 = {r["id"]: r for r in
              mm.extract_media_features(media_df, "id", "media").collect()}
    assert all(feats[i]["width"] == feats2[i]["width"] for i in range(6))


def test_frame_sample_fanout(media_df):
    frames = mm.frame_sample_plan(media_df, "id", "media", every_n=30).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    assert 5 not in by_id  # truncated row contributes nothing
    assert sorted(by_id) == [0, 1, 2, 3, 4]
    for rid, rs in by_id.items():
        assert sorted(x["frame_no"] for x in rs) == [0, 30]
        assert all(len(x["frame"]) == 17 for x in rs)


def test_resize_stub_raises(media_df):
    plan = mm.resize_media(media_df, "id", "media", 64, 64)
    with pytest.raises(Exception) as ei:
        plan.collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
