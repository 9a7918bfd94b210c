"""End-to-end: build the index on the synthetic `pages` fixture, then assert
(FIXTURES.md §3, SURVEY.md §5):

- byte-identical extracted text per url (the per-row invariant / golden
  pattern of reference metadata_test.go:301-334);
- docs/term_stats agree with the pure-Python oracle (doc_len, df, avgdl);
- decoded postings == oracle postings exactly;
- salted (multi-shard) build bit-identical to single-shard build;
- rank-identical BM25 top-k (ids exact, scores exact float64) vs oracle for
  the whole reference query set, conjunctive + disjunctive, WAND on and off.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from picdexer_spark.fixtures.pages import gen_pages, gen_queries
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.index.codec import decode_block
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.catalog import IndexCatalog

N_DOCS = 1200
SHARD_RANGE = 256  # small so the fixture really exercises multi-shard salting


@pytest.fixture(scope="module")
def corpus():
    pdf = gen_pages(N_DOCS, seed=42)
    url_sorted = sorted(pdf["url"])
    url_to_id = {u: i for i, u in enumerate(url_sorted)}
    text_by_url = dict(zip(pdf["url"], pdf["text"]))
    oracle = OracleIndex(
        [(url_to_id[u], text_by_url[u]) for u in url_sorted]
    )
    return pdf, url_to_id, oracle


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    pdf, url_to_id, oracle = corpus
    index_dir = str(tmp_path_factory.mktemp("idx"))
    pages = spark.createDataFrame(pdf)
    res = build_index(
        spark, pages, index_dir,
        IndexConfig(shard_range=SHARD_RANGE, import_id="t-e2e"),
    )
    return index_dir, res


def test_build_counts(built, corpus):
    _, res = built
    assert res.n_docs == N_DOCS  # every fixture row extracts or has text
    assert res.docs_dropped == 0


def test_extracted_text_byte_identical(spark, built, corpus):
    pdf, url_to_id, _ = corpus
    index_dir, _ = built
    docs = IndexCatalog(index_dir).read(spark, "docs").select("url", "text", "doc_id")
    got = {r["url"]: (r["text"], r["doc_id"]) for r in docs.collect()}
    assert len(got) == len(pdf)
    for u, t in zip(pdf["url"], pdf["text"]):
        assert got[u][0] == t, f"text mismatch for {u}"
        assert got[u][1] == url_to_id[u], f"doc_id mismatch for {u}"


def test_doc_stats_match_oracle(spark, built, corpus):
    _, _, oracle = corpus
    index_dir, _ = built
    cat = IndexCatalog(index_dir)
    docs = cat.read(spark, "docs").select("doc_id", "doc_len").collect()
    for r in docs:
        assert r["doc_len"] == oracle.doc_len[r["doc_id"]]
    st = cat.read(spark, "stats").first()
    assert st["n_docs"] == oracle.n_docs
    assert st["total_len"] == oracle.total_len
    assert st["avgdl"] == pytest.approx(oracle.avgdl, abs=0)


def test_term_stats_match_oracle(spark, built, corpus):
    _, _, oracle = corpus
    index_dir, _ = built
    ts = [r for r in
          IndexCatalog(index_dir).read(spark, "term_stats").collect()
          if not r["term"].startswith("\x1f")]  # content field only; the
    # url-field namespace is pinned in test_build_parity/test_multifield
    assert len(ts) == len(oracle.postings)
    for r in ts:
        assert r["df"] == oracle.df(r["term"]), r["term"]
        assert r["cf"] == sum(oracle.postings[r["term"]].values())


def _decode_term(rows):
    """rows of one term (any shards) -> (ids, tfs, dls) concatenated sorted."""
    rows = sorted(rows, key=lambda r: (r["shard_id"], r["block_no"]))
    ids, tfs, dls = [], [], []
    for r in rows:
        a, t, d = decode_block(r["first_doc"], r["doc_ids_enc"],
                               r["tfs_enc"], r["dls_enc"])
        ids.append(a)
        tfs.append(t)
        dls.append(d)
    return (np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls))


def test_postings_match_oracle(spark, built, corpus):
    _, _, oracle = corpus
    index_dir, _ = built
    rows = IndexCatalog(index_dir).read(spark, "postings").collect()
    by_term = {}
    for r in rows:
        if r["term"].startswith("\x1f"):
            continue  # url-field postings: test_build_parity pins them
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(oracle.postings)
    for term, trows in by_term.items():
        ids, tfs, dls = _decode_term(trows)
        exp = sorted(oracle.postings[term].items())
        assert list(ids) == [d for d, _ in exp], term
        assert list(tfs) == [tf for _, tf in exp], term
        assert [oracle.doc_len[d] for d, _ in exp] == list(dls), term


def test_salting_parity(spark, corpus, tmp_path_factory):
    """Multi-shard (salted) build decodes to the same global postings as a
    single-shard build — the salted runs concatenate losslessly."""
    pdf, _, _ = corpus
    small = pdf.iloc[:300]
    pages = spark.createDataFrame(small)
    d1 = str(tmp_path_factory.mktemp("idx1"))
    d2 = str(tmp_path_factory.mktemp("idx2"))
    build_index(spark, pages, d1, IndexConfig(shard_range=64))
    build_index(spark, pages, d2, IndexConfig(shard_range=1 << 40))
    out = []
    for d in (d1, d2):
        rows = IndexCatalog(d).read(spark, "postings").collect()
        by_term = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        out.append(
            {t: tuple(map(tuple, _decode_term(rs))) for t, rs in by_term.items()}
        )
    assert out[0] == out[1]
    # and the salted build really did split head terms across shards
    shards = (
        IndexCatalog(d1).read(spark, "postings")
        .groupBy("term").agg(F.countDistinct("shard_id").alias("ns"))
        .agg(F.max("ns")).first()[0]
    )
    assert shards > 1


def test_bm25_rank_identical_full_query_set(spark, built, corpus):
    _, _, oracle = corpus
    index_dir, _ = built
    eng = SearchEngine(spark, index_dir)
    queries = gen_queries(seed=42)
    checked = 0
    for q in queries.itertuples():
        exp = oracle.search(list(q.terms), q.mode, q.k)
        got = eng.search_topk(list(q.terms), q.mode, q.k)
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"q{q.query_id} {q.mode} {list(q.terms)}: {got[:5]} != {exp[:5]}"
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), f"q{q.query_id} doc {gd}"
        checked += 1
    assert checked == len(queries)


def test_wand_pruning_exact(spark, built, corpus):
    """Pruned disjunctive == exhaustive disjunctive, bit for bit."""
    index_dir, _ = built
    eng = SearchEngine(spark, index_dir)
    for terms in (["w0", "w1", "w2"], ["w5", "w300"], ["rareterm3", "w0"]):
        a = eng.search_topk(terms, "disjunctive", 10, prune=True)
        b = eng.search_topk(terms, "disjunctive", 10, prune=False)
        assert a == b, terms


def test_cache_free_assign_ids_bit_identical(spark, tmp_path, monkeypatch):
    """The size-gated cache-free id layout (driver-sampled boundaries +
    hash-preimage routing, round 7) assigns EXACTLY the ids of the legacy
    pre-cached range exchange, with partition i holding the i-th url
    interval (one interval per partition — no hash-collision skew) and no
    RangePartitioning exchange in the plan."""
    import picdexer_spark.index.build as B

    pdf = gen_pages(700, seed=9)
    path = str(tmp_path / "pages")
    spark.createDataFrame(pdf).write.parquet(path)
    pages = spark.read.parquet(path)
    extracted = B.extract_text(pages).drop("html")

    def ids_of(out):
        return sorted(
            (r["url"], r["doc_id"])
            for r in out.select("url", "doc_id").collect()
        )

    # legacy path (gate far above the fixture's size)
    monkeypatch.setattr(B, "_CACHE_FREE_ASSIGN_MIN_BYTES", 1 << 60)
    out1, p1, s1, d1, t1 = B.assign_doc_ids(
        extracted, ok_col="extract_ok", num_partitions=5)
    legacy = ids_of(out1)
    p1.unpersist()

    # cache-free path (gate forced on)
    monkeypatch.setattr(B, "_CACHE_FREE_ASSIGN_MIN_BYTES", 0)
    out2, p2, s2, d2, t2 = B.assign_doc_ids(
        extracted, ok_col="extract_ok", num_partitions=5)
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    got = ids_of(out2)
    # layout invariant: partition i holds a contiguous ascending id range
    pids = (
        p2.filter(F.col("_ok"))
        .groupBy("_pid").count().orderBy("_pid").collect()
    )
    assert [r["_pid"] for r in pids] == list(range(len(pids)))
    p2.unpersist()

    assert got == legacy
    assert (s2, d2, t2) == (s1, d1, t1)
