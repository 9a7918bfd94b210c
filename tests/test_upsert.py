"""Upsert-by-content + tombstones + compaction (Q9 complete: the ES
index-by-id overwrite, re-expressed as Lucene-style delete-bitmap +
append, with an Iceberg rewrite_data_files-style compaction).

Contracts tested:
- re-sent url with identical text: pure redelivery, nothing indexed;
- re-sent url with NEW text: old doc_id tombstoned (never surfaces in any
  query again), new content indexed and findable;
- live statistics (n_docs/avgdl) are tombstone-adjusted at commit;
- compact(): the rewritten snapshot is BIT-IDENTICAL to a from-scratch
  build over the live corpus (posting blocks, stats), and per-term df is
  exact again.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.catalog import IndexCatalog
from picdexer_spark.streaming.incremental import build_incremental, compact

CFG = IndexConfig(shard_range=64)
PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), None, t, "en") for u, t in rows],
        PAGES_SCHEMA,
    )


@pytest.fixture(scope="module")
def upserted(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("upsert_idx"))
    base = [(f"u{i:03d}", f"base text number{i} common filler words here")
            for i in range(120)]
    r1 = build_incremental(spark, _pages(spark, base), idx, CFG, "s1")
    assert r1.n_docs == 120

    batch2 = (
        [(f"u{i:03d}", f"base text number{i} common filler words here")
         for i in range(10)]                                  # identical: drop
        + [(f"u{i:03d}", f"replacement uniqword{i} fresh content entirely")
           for i in range(10, 20)]                            # changed: upsert
        + [(f"u{i:03d}", f"brandnew doc number{i} common filler words here")
           for i in range(120, 150)]                          # new: append
    )
    r2 = build_incremental(spark, _pages(spark, batch2), idx, CFG, "s2")
    live = {f"u{i:03d}": (f"replacement uniqword{i} fresh content entirely"
                          if 10 <= i < 20 else
                          (f"brandnew doc number{i} common filler words here"
                           if i >= 120 else
                           f"base text number{i} common filler words here"))
            for i in list(range(120)) + list(range(120, 150))}
    return idx, r2, live


def test_upsert_counts_and_tombstones(spark, upserted):
    idx, r2, live = upserted
    # 30 new + 10 replacements indexed; 10 tombstoned -> net live 150
    assert r2.n_docs == 150
    cat = IndexCatalog(idx)
    dels = cat.read(spark, "deletes").collect()
    assert len(dels) == 10 and all(r["reason"] == "upsert" for r in dels)
    st = cat.committed_stats(spark)
    assert st["n_docs"] == 150
    # allocated ids ran past the live count (tombstones never reused)
    assert st["next_doc_id"] == 120 + 40


def test_tombstoned_doc_never_surfaces(spark, upserted):
    idx, _, _ = upserted
    eng = SearchEngine(spark, idx)
    # old text of u010..u019 contained 'number10'..'number19' (now only in
    # other docs' base text... use a term unique to the OLD versions: the
    # base text of u015 had 'number15'; u115 also has number115 != number15.
    # 'number15' appears ONLY in old u015 -> must now match nothing.
    assert eng.search_topk(["number15"], "disjunctive", 10) == []
    # the replacement content is findable
    hits = eng.search_topk(["uniqword15"], "disjunctive", 10)
    assert len(hits) == 1
    # and a common-term query never returns a tombstoned doc_id
    dels = {r["doc_id"] for r in IndexCatalog(idx).read(spark, "deletes").collect()}
    got = eng.search_topk(["common", "filler"], "disjunctive", 150)
    assert dels.isdisjoint({d for d, _ in got})


def test_delete_filter_backfills_to_k(spark, upserted):
    """The shard scorer over-fetches k + |tombstones in shard| then filters,
    so live docs beyond the raw top-k still backfill the result."""
    idx, _, live = upserted
    eng = SearchEngine(spark, idx)
    got = eng.search_topk(["common", "filler"], "disjunctive", 140)
    # 140 live docs contain 'common filler' (120 base+new minus 10 upserted
    # originals... : 110 base + 30 new = 140). All must be returned.
    assert len(got) == 140


def test_compact_equals_fresh_build(spark, upserted, tmp_path):
    idx, _, live = upserted
    res = compact(spark, idx, CFG)
    assert res.n_docs == 150 and res.docs_dropped == 0
    cat = IndexCatalog(idx)
    # fresh chain: no tombstones, exact stats
    assert cat.read(spark, "deletes").count() == 0

    fresh_idx = str(tmp_path / "fresh")
    rows = sorted(live.items())
    build_index(spark, _pages(spark, rows), fresh_idx, CFG)

    def block_sig(i):
        return {
            tuple(r) for r in IndexCatalog(i).read(spark, "postings")
            .selectExpr("term", "shard_id", "block_no",
                        "md5(doc_ids_enc) AS m1", "md5(tfs_enc) AS m2",
                        "md5(dls_enc) AS m3").collect()
        }

    assert block_sig(idx) == block_sig(fresh_idx)
    s1 = cat.committed_stats(spark)
    s2 = IndexCatalog(fresh_idx).committed_stats(spark)
    assert (s1["n_docs"], s1["total_len"], s1["avgdl"]) == \
           (s2["n_docs"], s2["total_len"], s2["avgdl"])

    # post-compaction BM25 is rank-identical to the from-scratch oracle
    urls = sorted(live)
    oracle = OracleIndex([(i, live[u]) for i, u in enumerate(urls)])
    eng = SearchEngine(spark, idx)
    for terms, mode in ([["common", "filler"], "disjunctive"],
                        [["uniqword12"], "disjunctive"],
                        [["common", "words"], "conjunctive"]):
        got = eng.search_topk(terms, mode, 10)
        exp = oracle.search(terms, mode, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], terms
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12)


def test_first_batch_inbatch_url_dedup(spark, tmp_path):
    """Duplicate urls inside the FIRST batch must collapse to one live doc
    (previously the parent-None path bypassed dedup and every later upsert
    of that url fanned out over the duplicates)."""
    idx = str(tmp_path / "dup0")
    rows = [("u1", "version one text"), ("u1", "version one text"),
            ("u2", "other doc")]
    r1 = build_incremental(spark, _pages(spark, rows), idx, CFG, "s1")
    assert r1.n_docs == 2
    # upsert u1 once: exactly one tombstone, one replacement
    r2 = build_incremental(
        spark, _pages(spark, [("u1", "version two text")]), idx, CFG, "s2"
    )
    assert r2.n_docs == 2
    assert IndexCatalog(idx).read(spark, "deletes").count() == 1


def test_inbatch_conflict_last_write_wins(spark, tmp_path):
    """Two versions of a url in ONE batch: the later warc_ts wins (the ES
    index-by-id overwrite semantics), not the smaller md5."""
    idx = str(tmp_path / "lww")
    pages = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 10, 0), None, "older version words", "en"),
         ("u1", dt.datetime(2024, 1, 1, 10, 5), None, "newest version words", "en")],
        PAGES_SCHEMA,
    )
    build_incremental(spark, pages, idx, CFG, "s1")
    eng = SearchEngine(spark, idx)
    assert eng.search_topk(["newest"], "disjunctive", 5) != []
    assert eng.search_topk(["older"], "disjunctive", 5) == []


def test_upsert_respects_committed_shard_range(spark, tmp_path):
    """A delta batch built with a DIFFERENT cfg.shard_range must still map
    tombstones to the committed index's shard layout (otherwise deleted
    docs resurface in shards the filter never sees)."""
    idx = str(tmp_path / "sr")
    base = [(f"u{i:03d}", f"doc number{i} words") for i in range(200)]
    build_incremental(spark, _pages(spark, base), idx,
                      IndexConfig(shard_range=64), "s1")
    # upsert with a mismatched shard_range in cfg: doc u150 (doc_id 150,
    # shard 2 under range 64) gets new content
    build_incremental(
        spark, _pages(spark, [("u150", "replacement uniqword here")]),
        idx, IndexConfig(shard_range=1 << 20), "s2",
    )
    eng = SearchEngine(spark, idx)
    assert eng.search_topk(["number150"], "disjunctive", 5) == []
    assert len(eng.search_topk(["uniqword"], "disjunctive", 5)) == 1


def test_dashboard_views_count_live_docs_only(spark, upserted):
    """register_views must expose `docs` as the LIVE set: a doc-count
    dashboard over a post-upsert index must not count superseded versions
    (raw chain stays available as `docs_all`)."""
    idx, _, _ = upserted
    cat = IndexCatalog(idx)
    cat.install_dashboards(spark)
    # live view = raw chain minus tombstones, regardless of whether the
    # shared fixture index has been compacted by an earlier test
    n_dels = cat.read(spark, "deletes").count()
    n_all = spark.sql("SELECT count(*) AS n FROM docs_all").first()["n"]
    assert spark.sql("SELECT n FROM dash_doc_count").first()["n"] == 150
    assert n_all == 150 + n_dels
