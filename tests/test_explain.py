"""ES _explain contract: the per-term breakdown must recompose the
kernels' scores exactly.

- sum of per-term scores == the disjunctive search score for that doc
  (bit-for-bit over every top-10 doc);
- tf/df match a python recount of the corpus; idf the closed form;
- terms absent from the doc, unknown terms, absent docs -> 0 rows;
- boosts scale only their own term's row; field="url" explains with the
  url field's stats and unprefixed display terms.
"""

import math

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine

N = 500
TERMS = ["w0", "w3", "w11"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=77)
    idx = str(tmp_path_factory.mktemp("explainidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    texts = {i: by_url.loc[u, "text"] for i, u in enumerate(urls)}
    return idx, oracle, texts


def test_explain_recomposes_search_scores(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    for d, s in oracle.search(TERMS, "disjunctive", 10):
        rows = eng.explain(TERMS, d).collect()
        assert rows
        assert sum(r["score"] for r in rows) == pytest.approx(s, abs=1e-12)


def test_explain_components_match_bruteforce(spark, built):
    idx, oracle, texts = built
    eng = SearchEngine(spark, idx)
    d = oracle.search(TERMS, "disjunctive", 1)[0][0]
    toks = texts[d].lower().split()
    import re
    toks = re.findall(r"[a-z0-9]+", texts[d].lower())
    rows = {r["term"]: r for r in eng.explain(TERMS, d).collect()}
    for t, r in rows.items():
        assert r["tf"] == toks.count(t)
        assert r["dl"] == len(toks)
        want_df = sum(
            1 for txt in texts.values()
            if t in re.findall(r"[a-z0-9]+", txt.lower())
        )
        assert r["df"] == want_df
        assert r["idf"] == pytest.approx(
            math.log(1 + (N - want_df + 0.5) / (want_df + 0.5)), rel=1e-12)
        assert r["boost"] == 1.0
    # a query term the doc lacks gets NO row
    assert set(rows) <= set(TERMS)


def test_explain_empty_cases(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    assert eng.explain(["zzznope"], 0).count() == 0
    assert eng.explain(TERMS, 10 ** 9).count() == 0
    assert eng.explain([], 0).count() == 0


def test_explain_boost_scales_one_term(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    d = oracle.search(TERMS, "disjunctive", 1)[0][0]
    plain = {r["term"]: r["score"] for r in eng.explain(TERMS, d).collect()}
    boosted = {r["term"]: (r["score"], r["boost"])
               for r in eng.explain(TERMS, d, boosts={"w0": 2.5}).collect()}
    for t, s in plain.items():
        bs, b = boosted[t]
        if t == "w0":
            assert b == 2.5 and bs == pytest.approx(2.5 * s, rel=1e-12)
        else:
            assert b == 1.0 and bs == pytest.approx(s, rel=1e-12)


def test_explain_url_field(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    # fixture urls are https://site<s>.example/p/<i> — 'example'
    # analyzes out of every url; the explain row must come back with the
    # url field's own stats and the namespace prefix stripped
    hits = eng.search(["example"], "disjunctive", 1, field="url").collect()
    assert hits
    d = hits[0]["doc_id"]
    rows = eng.explain(["example"], d, field="url").collect()
    assert len(rows) == 1 and rows[0]["term"] == "example"
    assert rows[0]["df"] == N  # every url carries it
    assert sum(r["score"] for r in rows) == pytest.approx(
        hits[0]["score"], abs=1e-12)


def test_termvectors_matches_reanalysis(spark, built):
    """ES _termvectors: tf + 0-based positions from re-analyzing the
    stored text, corpus df joined in — vs the oracle token lists."""
    idx, oracle = built[0], built[1]
    eng = SearchEngine(spark, idx)
    d = 17
    got = {r["term"]: (r["tf"], r["df"], list(r["positions"]))
           for r in eng.termvectors(d).collect()}
    toks = oracle.tokens[d]
    want = {}
    for pos, t in enumerate(toks):
        tf, df_, ps = want.get(t, (0, oracle.df(t), []))
        want[t] = (tf + 1, df_, ps + [pos])
    assert got == want and got
    # a tombstone-free unknown doc id yields an empty vector
    assert eng.termvectors(10**9).count() == 0


def test_index_stats_summary(spark, tmp_path):
    """ES _stats/_cat analogue: metadata-sized operational summary,
    correct across append + delete (segments = parent-chain length)."""
    from picdexer_spark.index.build import IndexConfig, build_index
    from picdexer_spark.streaming.incremental import (
        build_incremental,
        delete_by_query,
    )

    d = str(tmp_path / "sidx")
    pages = spark.createDataFrame(
        [(f"u{i}", None, None, f"alpha w{i} beta gamma", "en")
         for i in range(20)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    build_index(spark, pages, d, IndexConfig(shard_range=64))
    eng = SearchEngine(spark, d)
    st = eng.index_stats()
    assert st["n_docs"] == 20 and st["live_docs"] == 20
    assert st["deleted_docs"] == 0 and st["segments"] == 1
    assert st["postings_rows"] > 0 and st["postings_bytes"] > 0
    assert st["url_field"] and not st["positions"]
    assert st["stopwords"] == []

    more = spark.createDataFrame(
        [("u99", None, None, "alpha delta epsilon", "en")],
        pages.schema)
    build_incremental(spark, more, d, source_id="b1")
    delete_by_query(spark, d, ["w3"], "disjunctive")
    st2 = SearchEngine(spark, d).index_stats()
    assert st2["n_docs"] == 21
    assert st2["deleted_docs"] == 1 and st2["live_docs"] == 20
    assert st2["segments"] == 3          # full + append + delete patch
    assert st2["postings_rows"] > st["postings_rows"]
