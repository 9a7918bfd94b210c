"""Snapshot-chain merge (streaming/incremental.py::merge_chain).

Contracts: folding the chain tail is PHYSICAL only — every read over the
rewired chain is row-identical (docs, postings, tombstones, stats), search
results bit-match, the segment count shrinks, pre-merge snapshot pinning
still works (expire=False), and expire=True reclaims dirs + manifest
entries. compact() semantics (re-id, tombstone drop) must NOT happen here.
"""

import datetime as dt
import os

import pytest

from picdexer_spark.index.build import IndexConfig
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.catalog import IndexCatalog
from picdexer_spark.streaming.incremental import (build_incremental,
                                                  delete_by_query,
                                                  merge_chain)

CFG = IndexConfig(shard_range=64)
PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, text string,"
                " lang string")


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), None, t, "en") for u, t in rows],
        PAGES_SCHEMA,
    )


@pytest.fixture(scope="module")
def chained(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("merge_idx"))
    for b in range(5):  # 5 append snapshots
        rows = [(f"u{b}-{i}", f"batch{b} common words doc number{i} filler")
                for i in range(30)]
        build_incremental(spark, _pages(spark, rows), idx, CFG, f"s{b}")
    # a delete-only snapshot rides the chain too (tombstones must survive)
    n = delete_by_query(spark, idx, ["batch1"], "disjunctive")
    assert n == 30
    return idx


def _probe(spark, idx, snapshot_id=None):
    eng = SearchEngine(spark, idx, snapshot_id=snapshot_id)
    top = eng.search_topk(["common", "filler"], "disjunctive", 25)
    docs = sorted(
        (r["doc_id"], r["url"]) for r in
        eng.cat.read_live_docs(spark, eng.snapshot_id).collect())
    return top, docs, eng.n_docs, eng.avgdl, eng.index_stats()


def test_merge_preserves_everything_rowwise(spark, chained):
    idx = chained
    before = _probe(spark, idx)
    cat = IndexCatalog(idx)
    assert len(cat.parent_chain()) == 6
    pinned = cat.parent_chain()[3]  # will be folded away

    merged = merge_chain(spark, idx, max_segments=2)
    assert merged is not None
    chain = cat.parent_chain()
    assert len(chain) == 2 and chain[1] == merged
    after = _probe(spark, idx)
    assert after[:4] == before[:4]  # top-k, live docs, n_docs, avgdl
    assert after[4]["segments"] == 2
    assert {k: v for k, v in after[4].items() if k != "segments"} \
        == {k: v for k, v in before[4].items() if k != "segments"}
    # expire=False: the folded snapshot is still pinnable by id
    old_top, old_docs, *_ = _probe(spark, idx, snapshot_id=pinned)
    assert len(old_docs) == 90  # 3 append batches deep, pre-delete
    # idempotent: short chain -> no-op
    assert merge_chain(spark, idx, max_segments=2) is None


def test_merge_whole_chain_and_expire(spark, tmp_path):
    idx = str(tmp_path / "idx")
    for b in range(3):
        rows = [(f"w{b}-{i}", f"chunk{b} shared tokens number{i}")
                for i in range(10)]
        build_incremental(spark, _pages(spark, rows), idx, CFG, f"w{b}")
    cat = IndexCatalog(idx)
    folded = cat.parent_chain()
    before = _probe(spark, idx)
    merged = merge_chain(spark, idx, max_segments=1, expire=True)
    assert cat.current_snapshot() == merged
    assert cat.parent_chain() == [merged]
    assert _probe(spark, idx)[:4] == before[:4]
    # expired from the manifest, but dirs get ONE fold cycle of deletion
    # grace (ADVICE r6: an in-flight reader pinned to a just-folded
    # snapshot must be able to drain) — recorded under expire_pending,
    # still readable, immune to crash-orphan cleanup
    m = cat.read_manifest()
    listed = {s["id"] for s in m["snapshots"]}
    for sid in folded:
        assert sid not in listed
        assert os.path.isdir(os.path.join(idx, "snapshots", sid))
    assert sorted(m["expire_pending"]) == sorted(folded)
    # the pending dirs' files stay readable (an in-flight reader's
    # resolved paths keep working until the next fold)
    assert spark.read.parquet(
        os.path.join(idx, "snapshots", folded[0], "docs")).count() == 10
    cat.abort_uncommitted()  # must NOT reap the pending dirs
    for sid in folded:
        assert os.path.isdir(os.path.join(idx, "snapshots", sid))
    # appends continue on top of the merged base
    build_incremental(spark, _pages(
        spark, [("w9-0", "chunk9 fresh tokens appended")]), idx, CFG, "w9")
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == 31
    assert eng.search_topk(["chunk9"], "disjunctive", 5)
    # the NEXT expiring fold reclaims the previous fold's pending dirs
    merged2 = merge_chain(spark, idx, max_segments=1, expire=True)
    assert merged2 is not None
    for sid in folded:
        assert not os.path.isdir(os.path.join(idx, "snapshots", sid))
    with pytest.raises(ValueError):
        merge_chain(spark, idx, max_segments=0)


def test_dropzone_auto_merge_bounds_segments(spark, tmp_path):
    """Streaming ingest with max_segments: the chain stays bounded while
    batches keep landing, and the drained index equals the unbounded one
    row-wise (same live docs, same search results)."""
    from picdexer_spark.streaming.incremental import run_dropzone_stream

    import pyarrow as pa
    import pyarrow.parquet as pq

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "idx")
    os.makedirs(drop)
    for b in range(5):
        # flat parquet FILES (the dropzone contract), not Spark dirs
        tbl = pa.table({
            "url": [f"d{b}-{i}" for i in range(12)],
            "warc_ts": pa.array([dt.datetime(2024, 1, 1)] * 12,
                                pa.timestamp("us")),
            "html": pa.array([None] * 12, pa.binary()),
            "text": [f"wave{b} shared stream words {i}" for i in range(12)],
            "lang": ["en"] * 12,
        })
        pq.write_table(tbl, os.path.join(drop, f"b{b}.parquet"))
        run_dropzone_stream(spark, drop, idx, checkpoint_dir=ckpt, cfg=CFG,
                            available_now=True,
                            max_segments=2).awaitTermination(300)
        assert len(IndexCatalog(idx).parent_chain()) <= 2
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == 60
    assert eng.index_stats()["segments"] <= 2
    for b in range(5):  # every wave still findable post-merges
        assert len(eng.search_topk([f"wave{b}"], "disjunctive", 20)) == 12


def test_merge_and_build_survive_orphan_snapshot_dirs(spark, tmp_path):
    """Crash-recovery: an uncommitted (orphan) dir under the next
    snapshot id must neither wedge a merge retry nor leak stale tables
    (e.g. a folded deletes) into the next committed build."""
    idx = str(tmp_path / "idx")
    for b in range(3):
        build_incremental(spark, _pages(
            spark, [(f"o{b}-{i}", f"set{b} words here {i}")
                    for i in range(8)]), idx, CFG, f"o{b}")
    cat = IndexCatalog(idx)
    nxt = cat.new_snapshot_id()

    # plant an orphan with a junk deletes table under the next id (what a
    # crash between merge's writes and its manifest commit leaves behind)
    junk = os.path.join(idx, "snapshots", nxt, "deletes")
    os.makedirs(junk)
    spark.createDataFrame([(999, "junk", "junk")],
                          "doc_id long, reason string, snapshot_id string") \
        .write.mode("overwrite").parquet(junk)

    # (a) merge retry under the recycled id succeeds and folds ONLY the
    # real chain (the planted tombstone must not surface)
    before = _probe(spark, idx)
    merged = merge_chain(spark, idx, max_segments=1)
    assert merged == nxt
    after = _probe(spark, idx)
    assert after[:4] == before[:4]
    assert after[4]["deleted_docs"] == 0

    # (b) a build under a recycled id must not commit stale extras either
    nxt2 = cat.new_snapshot_id()
    junk2 = os.path.join(idx, "snapshots", nxt2, "deletes")
    os.makedirs(junk2)
    spark.createDataFrame([(998, "junk", "junk")],
                          "doc_id long, reason string, snapshot_id string") \
        .write.mode("overwrite").parquet(junk2)
    build_incremental(spark, _pages(
        spark, [("o9-0", "fresh appended words")]), idx, CFG, "o9")
    eng = SearchEngine(spark, idx)
    assert eng.index_stats()["deleted_docs"] == 0
    assert eng.n_docs == 25
