"""Bit-identity of the round-3 posting pipeline (map-side partial encode ->
compressed-run exchange -> merge/re-block) against the straightforward
reference encoding: per (term, shard), sort the full posting run and
encode_blocks it in one piece. Every block row — metadata AND encoded
payloads — must match exactly, with and without positions.

Also property-tests the batched codec helpers (encode_concat,
segmented_delta_decode) against their one-run-at-a-time counterparts.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index, tf_stream
from picdexer_spark.index.codec import (
    delta_decode,
    delta_encode,
    encode_blocks,
    encode_concat,
    segmented_delta_decode,
    varint_decode,
    varint_encode,
    varint_lengths,
)
from picdexer_spark.sources.catalog import IndexCatalog

ENC_COLS = ("doc_ids_enc", "tfs_enc", "dls_enc", "pos_enc")


def _reference_blocks(tf_pdf: pd.DataFrame, store_pos: bool) -> pd.DataFrame:
    tf_pdf = tf_pdf.sort_values(["term", "shard_id", "doc_id"]).reset_index(
        drop=True
    )
    rows = []
    for (t, s), g in tf_pdf.groupby(["term", "shard_id"], sort=True):
        ids = g["doc_id"].to_numpy(np.uint64)
        tfs = g["tf"].to_numpy(np.uint64)
        dls = g["dl"].to_numpy(np.uint64)
        poss = list(g["positions"]) if store_pos else None
        for b in encode_blocks(ids, tfs, dls, 128, positions=poss):
            b["term"] = t
            b["shard_id"] = s
            rows.append(b)
    return pd.DataFrame(rows)


@pytest.mark.parametrize("store_pos", [False, True])
def test_posting_pipeline_bit_identical_to_reference(
    spark, tmp_path, store_pos
):
    idx = str(tmp_path / f"parity_{store_pos}")
    pages = spark.createDataFrame(gen_pages(600, seed=7))
    build_index(
        spark, pages, idx,
        IndexConfig(shard_range=128, store_positions=store_pos),
    )
    cat = IndexCatalog(idx)
    docs = cat.read(spark, "docs")
    # round 5: the build also indexes the url field into a SEPARATE
    # per-field table (Lucene per-field terms dictionary) — the
    # reference encoding for it is the SAME tf stream run over a
    # url-projected docs frame, namespaced in pandas
    from pyspark.sql import functions as F

    from picdexer_spark.functions.tokenize import tokens_col
    from picdexer_spark.sources.catalog import URL_FIELD_NS

    docs_url = docs.select(
        "doc_id",
        F.col("url").alias("text"),
        F.size(tokens_col("url")).cast("long").alias("doc_len"),
    ).filter(F.col("doc_len") > 0)
    tf_url = tf_stream(docs_url, 128, store_pos).toPandas()
    tf_url["term"] = URL_FIELD_NS + tf_url["term"]
    sides = [
        (cat.read(spark, "postings").toPandas(),
         tf_stream(docs, 128, store_pos).toPandas()),
        (cat.read(spark, "postings_url").toPandas(), tf_url),
    ]
    for posts, tf_pdf in sides:
        ref = _reference_blocks(tf_pdf, store_pos)
        key = ["term", "shard_id", "block_no"]
        got = posts.sort_values(key).reset_index(drop=True)
        want = ref[posts.columns].sort_values(key).reset_index(drop=True)
        assert got.shape == want.shape
        for c in posts.columns:
            if c in ENC_COLS:
                for x, y in zip(got[c], want[c]):
                    if x is None or y is None:
                        assert x is None and y is None, c
                    else:
                        assert bytes(x) == bytes(y), c
            else:
                assert (got[c] == want[c]).all(), c


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**63), min_size=0,
                 max_size=20),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_encode_concat_matches_per_segment_encode(segments):
    values = np.array([v for seg in segments for v in seg], np.uint64)
    counts = np.array([len(seg) for seg in segments], np.int64)
    got = encode_concat(values, counts)
    assert len(got) == len(segments)
    for buf, seg in zip(got, segments):
        assert buf == varint_encode(np.array(seg, np.uint64))
        assert (varint_decode(buf) == np.array(seg, np.uint64)).all()


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1,
                max_size=50))
@settings(max_examples=200, deadline=None)
def test_varint_lengths_matches_encoding(values):
    v = np.array(values, np.uint64)
    nb = varint_lengths(v)
    assert int(nb.sum()) == len(varint_encode(v))
    for x, n in zip(values, nb):
        assert n == len(varint_encode(np.array([x], np.uint64)))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # base (first id)
            st.lists(st.integers(min_value=1, max_value=1000), min_size=0,
                     max_size=15),  # gaps
        ),
        min_size=1, max_size=10,
    )
)
@settings(max_examples=200, deadline=None)
def test_segmented_delta_decode_matches_per_run(runs):
    deltas, counts, bases, want = [], [], [], []
    for base, gaps in runs:
        ids = np.cumsum([base] + gaps).astype(np.uint64)
        d = delta_encode(ids, base)
        assert (delta_decode(d, base) == ids).all()
        deltas.extend(d.tolist())
        counts.append(ids.size)
        bases.append(base)
        want.extend(ids.tolist())
    got = segmented_delta_decode(
        np.array(deltas, np.uint64), np.array(counts, np.int64),
        np.array(bases, np.int64),
    )
    assert got.tolist() == want
