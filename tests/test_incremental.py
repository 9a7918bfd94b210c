"""Incremental/streaming builds + resumability (SURVEY.md §5(e), north rule).

- two-batch incremental == results of querying everything (stats, BM25)
- idempotent source re-delivery (no-op) and url-level dedup
- kill/resume: crash mid-batch leaves the previous snapshot queryable;
  re-running the batch converges to the same final index
- streaming dropzone: availableNow drains files through foreachBatch
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.catalog import IndexCatalog
from picdexer_spark.streaming.incremental import (
    build_incremental,
    run_dropzone_stream,
)

N = 600
CFG = IndexConfig(shard_range=128)


@pytest.fixture(scope="module")
def corpus():
    pdf = gen_pages(N, seed=7)
    return pdf


def _oracle_for(pdf_parts):
    import pandas as pd

    rows = []
    offset = 0
    for part in pdf_parts:  # ids assigned batch-by-batch, url-ranked
        urls = sorted(part["url"])
        by_url = dict(zip(part["url"], part["text"]))
        for i, u in enumerate(urls):
            rows.append((offset + i, by_url[u]))
        offset += len(urls)
    return OracleIndex(rows)


def test_incremental_append_matches_oracle(spark, corpus, tmp_path):
    pdf = corpus
    a, b = pdf.iloc[:400], pdf.iloc[400:]
    idx = str(tmp_path / "inc")
    r1 = build_incremental(spark, spark.createDataFrame(a), idx, CFG, "src-a")
    r2 = build_incremental(spark, spark.createDataFrame(b), idx, CFG, "src-b")
    assert r1.n_docs == 400 and r2.n_docs == N
    cat = IndexCatalog(idx)
    assert cat.parent_chain() == [r2.snapshot_id, r1.snapshot_id]

    oracle = _oracle_for([a, b])
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == oracle.n_docs
    assert eng.avgdl == pytest.approx(oracle.avgdl, abs=1e-12)
    for terms, mode in ((["w0"], "disjunctive"), (["w1", "w3"], "conjunctive"),
                        (["w2", "w10", "w40"], "disjunctive")):
        got = eng.search_topk(terms, mode, 10)
        exp = oracle.search(terms, mode, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], (terms, mode)
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12)

    # chained docs read covers both batches, text byte-identical
    docs = cat.read(spark, "docs")
    assert docs.count() == N
    assert docs.select("doc_id").distinct().count() == N


def test_redelivery_and_url_dedup(spark, corpus, tmp_path):
    pdf = corpus.iloc[:200]
    idx = str(tmp_path / "re")
    df = spark.createDataFrame(pdf)
    r1 = build_incremental(spark, df, idx, CFG, "s1")
    # same source id -> no-op
    assert build_incremental(spark, df, idx, CFG, "s1") is None
    # same rows, new source id -> url dedup, zero new docs
    r2 = build_incremental(spark, df, idx, CFG, "s2")
    assert r2 is not None and r2.n_docs == r1.n_docs
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == 200


def test_kill_resume(spark, corpus, tmp_path):
    """Crash mid-second-batch: previous snapshot stays queryable; resume
    converges to the same index as a clean two-batch run."""
    pdf = corpus
    a, b = pdf.iloc[:300], pdf.iloc[300:]
    clean = str(tmp_path / "clean")
    build_incremental(spark, spark.createDataFrame(a), clean, CFG, "a")
    build_incremental(spark, spark.createDataFrame(b), clean, CFG, "b")

    crashy = str(tmp_path / "crashy")
    build_incremental(spark, spark.createDataFrame(a), crashy, CFG, "a")
    cat = IndexCatalog(crashy)
    snap_before = cat.current_snapshot()

    # simulate a crash: a half-written snapshot dir, manifest NOT advanced
    half = os.path.join(crashy, "snapshots", "snap-000002")
    os.makedirs(os.path.join(half, "docs"), exist_ok=True)
    with open(os.path.join(half, "docs", "junk"), "w") as f:
        f.write("partial write then crash")

    # restart: previous snapshot still the current, still queryable
    assert cat.current_snapshot() == snap_before
    assert SearchEngine(spark, crashy).n_docs == 300
    cat.abort_uncommitted()
    assert not os.path.exists(half)

    # resume the failed batch
    build_incremental(spark, spark.createDataFrame(b), crashy, CFG, "b")

    for d in (clean, crashy):
        pass
    e1, e2 = SearchEngine(spark, clean), SearchEngine(spark, crashy)
    assert e1.n_docs == e2.n_docs == N
    got1 = e1.search_topk(["w0", "w5"], "disjunctive", 10)
    got2 = e2.search_topk(["w0", "w5"], "disjunctive", 10)
    assert got1 == got2


def test_stream_delete_compact_equals_fresh(spark, corpus, tmp_path):
    """Streaming x mutation interplay in ONE e2e: dropzone batch ->
    delete_by_query mid-stream -> two more streamed batches -> a second
    delete -> compact(). The final index must be bit-identical (docs
    table, term_stats, rankings) to a fresh build over exactly the
    surviving pages — streams, tombstones and segment-merge compose."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from picdexer_spark.fixtures.pages import PAGES_SCHEMA
    from picdexer_spark.streaming.incremental import compact, delete_by_query

    pdf = corpus
    drop = str(tmp_path / "dropm")
    os.makedirs(drop)
    idx = str(tmp_path / "midx")
    ckpt = str(tmp_path / "mckpt")
    parts = [pdf.iloc[:200], pdf.iloc[200:400], pdf.iloc[400:]]

    def drip(part, name):
        pq.write_table(
            pa.Table.from_pandas(part, schema=PAGES_SCHEMA,
                                 preserve_index=False),
            os.path.join(drop, name))

    def live_urls():
        e = SearchEngine(spark, idx)
        return {r["url"] for r in
                e.cat.read_live_docs(spark, e.snapshot_id)
                .select("url").collect()}

    drip(parts[0], "b0.parquet")
    run_dropzone_stream(spark, drop, idx, checkpoint_dir=ckpt, cfg=CFG,
                        available_now=True).awaitTermination(300)
    # mutation 1, mid-stream: tombstone every German doc indexed so far
    before = live_urls()
    n1 = delete_by_query(spark, idx, [], "disjunctive",
                         [("lang", "=", "de")])
    assert n1 == len(before - live_urls()) > 0
    # two more batches land AFTER the delete (their de docs survive)
    drip(parts[1], "b1.parquet")
    drip(parts[2], "b2.parquet")
    run_dropzone_stream(spark, drop, idx, checkpoint_dir=ckpt, cfg=CFG,
                        available_now=True).awaitTermination(300)
    # mutation 2 on the grown corpus: tombstone every w0 doc
    n2 = delete_by_query(spark, idx, ["w0"], "disjunctive")
    assert n2 > 0
    survivors = live_urls()
    compact(spark, idx)

    by_url = pdf.set_index("url")
    fresh_pdf = by_url.loc[sorted(survivors)].reset_index()[
        ["url", "warc_ts", "html", "text", "lang"]]
    fidx = str(tmp_path / "freshm")
    build_index(spark, spark.createDataFrame(fresh_pdf), fidx, CFG)
    eng, feng = SearchEngine(spark, idx), SearchEngine(spark, fidx)
    assert eng.n_docs == feng.n_docs == len(survivors)
    assert eng.avgdl == feng.avgdl
    assert sorted(
        (int(r["doc_id"]), r["url"]) for r in
        eng.cat.read(spark, "docs").select("doc_id", "url").collect()
    ) == sorted(
        (int(r["doc_id"]), r["url"]) for r in
        feng.cat.read(spark, "docs").select("doc_id", "url").collect()
    )
    assert sorted(
        (r["term"], int(r["df"])) for r in
        eng.term_stats.select("term", "df").collect()
    ) == sorted(
        (r["term"], int(r["df"])) for r in
        feng.term_stats.select("term", "df").collect()
    )
    for terms, mode in ((["w1", "w3"], "disjunctive"),
                        (["w2"], "conjunctive"),
                        (["w5", "w9"], "disjunctive")):
        assert eng.search_topk(terms, mode, 20) == \
            feng.search_topk(terms, mode, 20), (terms, mode)


def test_dropzone_stream(spark, corpus, tmp_path):
    pdf = corpus
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    # two files land in the dropzone
    import pyarrow as pa
    import pyarrow.parquet as pq

    from picdexer_spark.fixtures.pages import PAGES_SCHEMA

    for i, part in enumerate((pdf.iloc[:300], pdf.iloc[300:])):
        pq.write_table(
            pa.Table.from_pandas(part, schema=PAGES_SCHEMA, preserve_index=False),
            os.path.join(drop, f"drop-{i}.parquet"),
        )
    q = run_dropzone_stream(spark, drop, idx, checkpoint_dir=ckpt, cfg=CFG,
                            available_now=True)
    q.awaitTermination(300)
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == N
    # restart the stream with no new files: no new snapshot
    chain_before = IndexCatalog(idx).parent_chain()
    q2 = run_dropzone_stream(spark, drop, idx, checkpoint_dir=ckpt, cfg=CFG,
                             available_now=True)
    q2.awaitTermination(300)
    assert IndexCatalog(idx).parent_chain() == chain_before


def test_reindex_with_query_equals_fresh_subset_build(spark, corpus,
                                                      tmp_path):
    """ES _reindex with a query: the destination index must equal a
    from-scratch build over exactly the live docs matching the query —
    tombstones excluded, typed filter applied, stats exact."""
    from picdexer_spark.streaming.incremental import (delete_by_query,
                                                      reindex)

    pdf = corpus
    src = str(tmp_path / "resrc")
    build_index(spark, spark.createDataFrame(pdf), src, CFG)
    # tombstone some docs first: reindex must not resurrect them
    n_del = delete_by_query(spark, src, ["w13"], "disjunctive")
    assert n_del > 0
    dst = str(tmp_path / "redst")
    reindex(spark, src, dst, query_terms=["w0"],
            filters=[("lang", "=", "en")])

    seng = SearchEngine(spark, src)
    keep_urls = {
        r["url"] for r in
        seng.cat.read_live_docs(spark, seng.snapshot_id)
        .join(seng.match_ids(["w0"], "disjunctive",
                             [("lang", "=", "en")]), "doc_id")
        .select("url").collect()
    }
    assert keep_urls  # the query selects something
    by_url = pdf.set_index("url")
    fresh_pdf = by_url.loc[sorted(keep_urls)].reset_index()[
        ["url", "warc_ts", "html", "text", "lang"]]
    fidx = str(tmp_path / "refresh")
    build_index(spark, spark.createDataFrame(fresh_pdf), fidx, CFG)
    deng, feng = SearchEngine(spark, dst), SearchEngine(spark, fidx)
    assert deng.n_docs == feng.n_docs == len(keep_urls)
    assert deng.avgdl == feng.avgdl
    assert sorted(
        (r["term"], int(r["df"])) for r in
        deng.term_stats.select("term", "df").collect()
    ) == sorted(
        (r["term"], int(r["df"])) for r in
        feng.term_stats.select("term", "df").collect()
    )
    for terms, mode in ((["w0", "w3"], "disjunctive"),
                        (["w2"], "conjunctive")):
        assert deng.search_topk(terms, mode, 15) == \
            feng.search_topk(terms, mode, 15), (terms, mode)
    # unrestricted reindex = compact-into-a-new-dir (all live docs)
    dst2 = str(tmp_path / "redst2")
    reindex(spark, src, dst2)
    assert SearchEngine(spark, dst2).n_docs == seng.n_docs


def test_update_by_query_equals_delete_plus_reingest(spark, corpus,
                                                     tmp_path):
    """ES _update_by_query: match set -> transform -> upsert must land
    the SAME index as delete_by_query of the match set + re-ingest of
    the transformed pages — checked bit-identically through compact()
    (posting payload md5s + stats), plus the live docs table directly.
    Noop pin: matched docs whose transformed text is unchanged are not
    reindexed and not counted."""
    from picdexer_spark.streaming.incremental import (
        compact, delete_by_query, update_by_query)

    pdf = corpus

    def fresh_idx(name):
        idx = str(tmp_path / name)
        build_index(spark, spark.createDataFrame(pdf), idx, CFG)
        return idx

    def transform(pages):
        # "script": uppercase the language token inside the text of
        # every matched doc (changes content deterministically), keep
        # url/warc_ts/lang
        return pages.withColumn(
            "text", F.concat(F.col("text"), F.lit(" updatedmark")))

    idx_a = fresh_idx("ubq_a")
    eng0 = SearchEngine(spark, idx_a)
    match_urls = {
        r["url"] for r in
        eng0.cat.read_live_docs(spark, eng0.snapshot_id)
        .join(eng0.match_ids(["w7"], "disjunctive", [("lang", "en")]),
              "doc_id").select("url").collect()}
    assert match_urls
    n_upd = update_by_query(spark, idx_a, transform, ["w7"],
                            "disjunctive", [("lang", "en")])
    assert n_upd == len(match_urls)  # every transform changed content

    # route B: delete the match set, re-ingest the transformed pages
    idx_b = fresh_idx("ubq_b")
    n_del = delete_by_query(spark, idx_b, ["w7"], "disjunctive",
                            [("lang", "en")])
    assert n_del == len(match_urls)
    by_url = pdf.set_index("url")
    sub = by_url.loc[sorted(match_urls)].reset_index()[
        ["url", "warc_ts", "html", "text", "lang"]]
    sub["html"] = None
    sub["text"] = sub["text"] + " updatedmark"
    build_incremental(spark, spark.createDataFrame(sub), idx_b,
                      IndexConfig(import_id="reingest"),
                      source_id="reingest-after-delete")

    # live docs identical (url, text, lang, doc_len) — doc_ids too,
    # since both routes assign fresh ids from the same next_doc_id
    def live_sig(idx):
        e = SearchEngine(spark, idx)
        return sorted(
            (r["doc_id"], r["url"], r["text_md5"], r["doc_len"])
            for r in e.cat.read_live_docs(spark, e.snapshot_id)
            .select("doc_id", "url", "text_md5", "doc_len").collect())

    assert live_sig(idx_a) == live_sig(idx_b)

    # compact both: bit-identical posting payloads and stats
    compact(spark, idx_a, CFG)
    compact(spark, idx_b, CFG)

    def block_sig(i):
        return {
            tuple(r) for r in IndexCatalog(i).read(spark, "postings")
            .selectExpr("term", "shard_id", "block_no",
                        "md5(doc_ids_enc) AS m1", "md5(tfs_enc) AS m2",
                        "md5(dls_enc) AS m3").collect()}

    assert block_sig(idx_a) == block_sig(idx_b)
    sa = IndexCatalog(idx_a).committed_stats(spark)
    sb = IndexCatalog(idx_b).committed_stats(spark)
    assert (sa["n_docs"], sa["total_len"], sa["avgdl"]) == \
           (sb["n_docs"], sb["total_len"], sb["avgdl"])

    # the updated docs really match the new content
    enga = SearchEngine(spark, idx_a)
    hits = enga.match_ids(["updatedmark"], "disjunctive").count()
    assert hits == len(match_urls)


def test_update_by_query_noop_and_refusals(spark, corpus, tmp_path):
    from picdexer_spark.streaming.incremental import update_by_query

    pdf = corpus
    idx = str(tmp_path / "ubq_noop")
    build_index(spark, spark.createDataFrame(pdf), idx, CFG)
    cat = IndexCatalog(idx)
    snap0 = cat.current_snapshot()

    # identity transform: every matched doc is a noop -> 0 updated
    assert update_by_query(spark, idx, lambda p: p, ["w7"]) == 0
    # empty match set: 0, nothing committed
    assert update_by_query(
        spark, idx, lambda p: p, ["zz_no_such_term_zz"]) == 0

    with pytest.raises(ValueError, match="_id"):
        update_by_query(
            spark, idx,
            lambda p: p.withColumn("url", F.concat(F.col("url"),
                                                   F.lit("x"))),
            ["w7"])
    with pytest.raises(ValueError, match="one row per matched doc"):
        update_by_query(spark, idx, lambda p: p.limit(1), ["w7"])
    with pytest.raises(ValueError, match="pages columns"):
        update_by_query(spark, idx, lambda p: p.drop("lang"), ["w7"])
    with pytest.raises(ValueError, match="metadata"):
        update_by_query(
            spark, idx,
            lambda p: p.withColumn("lang", F.lit("xx")), ["w7"])
    # refusals never committed anything on top of the noop snapshots
    eng = SearchEngine(spark, idx)
    assert eng.n_docs == N
    assert cat.read(spark, "deletes").count() == 0
    assert snap0 is not None
