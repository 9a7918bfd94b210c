"""delete_by_query: tombstone every live doc matching a query (the ES
_delete_by_query), as a delete-only snapshot composed from match_ids +
the existing tombstone machinery.

- deleted docs vanish from search / match_ids / read_live_docs at once;
- the returned count is the live match count; re-running returns 0;
- kuery filters compose; stats go live (n_docs/avgdl) immediately;
- compact() after the delete is bit-identical to a fresh build over the
  survivors (the established upsert invariant, now for query deletes).
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.catalog import IndexCatalog
from picdexer_spark.streaming.incremental import compact, delete_by_query

N = 300


@pytest.fixture()
def built(spark, tmp_path):
    pdf = gen_pages(N, seed=37)
    idx = str(tmp_path / "dbqidx")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64))
    return idx, pdf


def test_delete_by_query_hides_matches(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    terms = ["w7", "w31"]
    before = {int(r["doc_id"])
              for r in eng.match_ids(terms, "conjunctive").collect()}
    assert before
    n = delete_by_query(spark, idx, terms, "conjunctive")
    assert n == len(before)

    eng2 = SearchEngine(spark, idx)  # new snapshot
    assert eng2.n_docs == eng.n_docs - n  # live stats immediately
    assert eng2.match_ids(terms, "conjunctive").count() == 0
    hits = {d for d, _ in eng2.search_topk(terms, "disjunctive", N)}
    assert not hits & before
    live = {int(r["doc_id"]) for r in
            eng2.cat.read_live_docs(spark, eng2.snapshot_id)
            .select("doc_id").collect()}
    assert not live & before

    # idempotent: nothing left to delete, no snapshot committed
    snap = eng2.snapshot_id
    assert delete_by_query(spark, idx, terms, "conjunctive") == 0
    assert IndexCatalog(idx).current_snapshot() == snap


def test_delete_by_query_with_filter_and_compact(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    langs = sorted({r["lang"] for r in
                    eng.cat.read_live_docs(spark, eng.snapshot_id)
                    .select("lang").distinct().collect() if r["lang"]})
    lang = langs[0]
    # pick a term matching SOME but not ALL docs of the lang, so the
    # filter genuinely restricts the delete and survivors remain
    in_lang = eng.cat.read_live_docs(spark, eng.snapshot_id) \
        .filter(f"lang = '{lang}'")
    n_lang = in_lang.count()
    term = next(
        t for t in ("w20", "w30", "w40", "w15", "w8")
        if 0 < eng.match_ids([t], "disjunctive",
                             filters=[("lang", lang)]).count() < n_lang
    )
    expect = {int(r["doc_id"]) for r in
              eng.match_ids([term], "disjunctive",
                            filters=[("lang", lang)]).collect()}
    n = delete_by_query(spark, idx, [term], "disjunctive",
                        filters=[("lang", lang)])
    assert n == len(expect) > 0

    # survivors with lang still exist (filter restricted the delete)
    eng2 = SearchEngine(spark, idx)
    still = eng2.cat.read_live_docs(spark, eng2.snapshot_id) \
        .filter(f"lang = '{lang}'").count()
    assert still > 0

    # compact == fresh build over the survivors, bit-identical ranking
    compact(spark, idx)
    eng3 = SearchEngine(spark, idx)
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    survivors = [u for i, u in enumerate(urls) if i not in expect]
    fresh_pdf = by_url.loc[survivors].reset_index()[
        ["url", "warc_ts", "html", "text", "lang"]]
    import tempfile

    fidx = tempfile.mkdtemp(prefix="dbq_fresh_")
    build_index(spark, spark.createDataFrame(fresh_pdf), fidx,
                IndexConfig(shard_range=64))
    feng = SearchEngine(spark, fidx)
    for q, m in ((["w2", "w9"], "disjunctive"), (["w3"], "disjunctive")):
        assert eng3.search_topk(q, m, 20) == feng.search_topk(q, m, 20), q


def test_delete_snapshot_carries_no_term_stats_bytes(spark, built):
    """A delete-only snapshot records a parent POINTER for term_stats
    (catalog.read resolves non-chained tables up the chain) — at web
    scale the old copytree duplicated a vocabulary-sized table per
    delete. The resolved stats must still be the parent's, exactly."""
    import os

    idx, _ = built
    cat = IndexCatalog(idx)
    parent = cat.current_snapshot()
    before = {(r["term"], r["df"]) for r in
              cat.read(spark, "term_stats").collect()}
    n = delete_by_query(spark, idx, ["w1"], "disjunctive")
    assert n > 0
    snap = cat.current_snapshot()
    assert snap != parent
    snap_dir = cat.snapshot_dir(snap)
    assert not os.path.exists(os.path.join(snap_dir, "term_stats"))
    # chained resolution serves the parent's table (as-built df, the
    # Lucene deleted-docs-in-stats contract until compact)
    after = {(r["term"], r["df"]) for r in
             cat.read(spark, "term_stats", snap).collect()}
    assert after == before
    # and the engine still scores from it
    eng = SearchEngine(spark, idx)
    assert eng.search_topk(["w2"], "disjunctive", 5)


def test_mass_delete_scoring_stays_sound(spark, built):
    """After deleting MOST docs, per-term df (as-built) exceeds the live
    doc count — scoring must use the as-built maxDoc/avgdl pair (Lucene
    contract) so idf stays positive and block-max pruning stays exact:
    pruned == unpruned bit-for-bit, and both match a python reference
    computed with the same as-built statistics over stale df."""
    import math

    idx, pdf = built
    eng0 = SearchEngine(spark, idx)
    # delete everything containing mid-df term w5: the majority goes,
    # but rich survivors remain (deleting by the w0 head term leaves only
    # degenerate near-empty docs)
    n = delete_by_query(spark, idx, ["w5"], "disjunctive")
    assert n > N / 3

    eng = SearchEngine(spark, idx)
    assert eng.n_docs == N - n            # live stats for aggs
    assert eng.n_docs_scoring == N        # as-built pair for scoring
    got = eng.search_topk(["w1", "w6"], "disjunctive", 15)
    assert got and all(s > 0 for _d, s in got)
    got_np = eng.search_topk(["w1", "w6"], "disjunctive", 15, prune=False)
    assert got == got_np

    # python reference: stale df + as-built N/avgdl over LIVE docs only
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    toks = {i: tokenize_py(by_url.loc[u, "text"] or "")
            for i, u in enumerate(urls)}
    deleted = {i for i, v in toks.items() if "w5" in v}
    dfc = {t: sum(1 for v in toks.values() if t in v)
           for t in ("w1", "w6")}
    avgdl = sum(len(v) for v in toks.values()) / N
    rows = []
    for i, v in toks.items():
        if i in deleted:
            continue
        s = 0.0
        for t in ("w1", "w6"):
            tf = v.count(t)
            if tf:
                widf = math.log(1 + (N - dfc[t] + 0.5) / (dfc[t] + 0.5))
                s += widf * (tf * 2.2) / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if s > 0:
            rows.append((i, s))
    rows.sort(key=lambda x: (-x[1], x[0]))
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in rows[:15]] == got
