"""ES bool `minimum_should_match` on disjunctive queries.

Contract (Lucene MinShouldMatchSumScorer): a doc qualifies only if it
matches at least `msm` of the should terms; its score is the BM25 sum
over ALL its matched terms. Pins:

- rank identity vs the brute-force python oracle at msm 1..n;
- msm=1 bit-identical to the plain disjunctive path;
- pruned and bulk kernels bit-identical under msm;
- every returned doc really matches >= msm terms (and some doc excluded
  at msm=2 exists, so the constraint is exercised, not vacuous);
- msm > |terms| is empty; msm on conj/phrase refuses; msm < 1 refuses;
- filtered search composes (filter whitelist AND >= msm matched terms).
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine

N = 600
TERMS = ["w0", "w3", "w11"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=47)
    idx = str(tmp_path_factory.mktemp("msmidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    langs = {i: by_url.loc[u, "lang"] for i, u in enumerate(urls)}
    return idx, oracle, langs


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_msm_matches_oracle_all_levels(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    for msm in (1, 2, 3):
        got = _rows(eng.search(TERMS, "disjunctive", 10,
                               min_should_match=msm))
        want = [(d, round(s, 9))
                for d, s in oracle.search(TERMS, "disjunctive", 10,
                                          msm=msm)]
        assert got == want, f"msm={msm}"


def test_msm_1_is_plain_disjunctive(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    assert _rows(eng.search(TERMS, "disjunctive", 10)) == \
        _rows(eng.search(TERMS, "disjunctive", 10, min_should_match=1))


def test_msm_pruned_and_bulk_identical(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    a = _rows(eng.search(TERMS, "disjunctive", 10, prune=True,
                         min_should_match=2))
    b = _rows(eng.search(TERMS, "disjunctive", 10, prune=False,
                         min_should_match=2))
    assert a == b and a


def test_msm_constraint_is_exercised(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    full = {d for d, _ in oracle.search(TERMS, "disjunctive", N, msm=1)}
    kept = {d for d, _ in oracle.search(TERMS, "disjunctive", N, msm=2)}
    assert kept < full  # some doc matches only one term -> not vacuous
    got = {r["doc_id"] for r in
           eng.search(TERMS, "disjunctive", N,
                      min_should_match=2).collect()}
    assert got == kept


def test_msm_unsatisfiable_and_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    assert eng.search(TERMS, "disjunctive", 10,
                      min_should_match=4).count() == 0
    with pytest.raises(ValueError):
        eng.search(TERMS, "conjunctive", 10, min_should_match=2)
    with pytest.raises(ValueError):
        eng.search(TERMS, "disjunctive", 10, min_should_match=0)


def test_msm_filtered_composes(spark, built):
    idx, oracle, langs = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.search_filtered(TERMS, "disjunctive",
                                    [("lang", "en")], 10,
                                    min_should_match=2))
    want = [(d, round(s, 9))
            for d, s in oracle.search(TERMS, "disjunctive", N, msm=2)
            if langs[d] == "en"][:10]
    assert got == want and got


def test_msm_spec_grammar_resolves_against_clause_count(spark, built):
    """The ES minimum_should_match STRING grammar (percentages,
    negatives, conditionals) resolves against the unique-term count and
    then behaves exactly like the integer form."""
    from picdexer_spark.query.parser import parse_min_should_match as p
    # the ES reference examples
    assert p("-2", 5) == 3 and p("75%", 5) == 3 and p("-25%", 4) == 3
    assert p("3<90%", 3) == 3 and p("3<90%", 10) == 9
    assert (p("2<-25% 9<-3", 2), p("2<-25% 9<-3", 8),
            p("2<-25% 9<-3", 12)) == (2, 6, 9)
    assert p("0", 5) == 1 and p("200%", 5) == 5  # clamped
    with pytest.raises(ValueError):
        p("nope<x", 5)
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    want = _rows(eng.search(TERMS, "disjunctive", 10, min_should_match=2))
    assert _rows(eng.search(TERMS, "disjunctive", 10,
                            min_should_match="66%")) == want
    assert _rows(eng.search(TERMS, "disjunctive", 10,
                            min_should_match="-1")) == want
    assert _rows(eng.search_filtered(TERMS, "disjunctive",
                                     [("lang", "en")], 10,
                                     min_should_match="66%")) == \
        _rows(eng.search_filtered(TERMS, "disjunctive",
                                  [("lang", "en")], 10,
                                  min_should_match=2))


def test_field_caps_reports_the_queryable_surface(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    caps = {c["field"]: c for c in eng.field_caps()}
    # the content field is reported under the name the engine's own
    # query surface accepts ('text'), with its stored docs column as
    # the .keyword twin — same multi-field shape as url/url.keyword
    assert caps["text"]["type"] == "text"
    assert caps["text"]["searchable"] is True
    assert caps["text"]["aggregatable"] is False
    assert caps["text.keyword"]["type"] == "keyword"
    assert "content" not in caps
    if eng.has_url_field:
        # the ES text + .keyword multi-field shape
        assert caps["url"]["type"] == "text"
        assert caps["url.keyword"]["type"] == "keyword"
    assert caps["lang"] == {"field": "lang", "type": "keyword",
                            "searchable": True, "aggregatable": True}
    assert caps["doc_id"]["type"] == "long"
    # every typed-filter field the compiler accepts is listed (scored
    # multi-fields under their .keyword twin)
    listed = {f.removesuffix(".keyword") for f in caps} | set(caps)
    assert set(eng._docs_fields) <= listed
