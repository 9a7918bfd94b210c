"""Analyzed field-scoped match — the ES text-vs-keyword multi-field
contract (reference mapping internal/setup/assets/picdexer.json:7-96:
every string field is `text` + `.keyword`; Kibana KQL `field:value` on the
text side is a match query, `field:"value"` a match_phrase,
`field.keyword:value` exact).

Engine surface: SearchEngine(analyzed_fields=("url",)) routes equality
qualifiers on `url` through query-time analysis of the VALUE against the
tokenized field; everything else stays exact keyword. Oracle = pandas
re-tokenization of the same fixture.
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.query.parser import parse_kuery

N = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=31)
    idx = str(tmp_path_factory.mktemp("anidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    return idx, pdf


def _url_toks(pdf):
    # engine doc_id = url-rank (dense from 0 over sorted urls)
    urls = sorted(pdf["url"])
    return {i: tokenize_py(u) for i, u in enumerate(urls)}, urls


def test_unquoted_value_is_any_token_match(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    toks, urls = _url_toks(pdf)
    # urls look like https://siteNN.example/p/NNN -> tokens include siteNN
    site = next(t for t in toks[0] if t.startswith("site"))
    expected = {i for i, v in toks.items() if site in v}
    assert expected and len(expected) < N
    got = {r["doc_id"] for r in
           eng.match_ids([], "disjunctive", [("url", "=", site)]).collect()}
    assert got == expected
    # a multi-token unquoted value ORs its tokens (ES match default)
    site2 = next(t for v in toks.values() for t in v
                 if t.startswith("site") and t != site)
    both = {i for i, v in toks.items() if site in v or site2 in v}
    got2 = {r["doc_id"] for r in eng.match_ids(
        [], "disjunctive", [("url", "=", f"{site} {site2}")]).collect()}
    assert got2 == both > expected
    # exact-keyword semantics would match NOTHING for a bare token — the
    # discover-box divergence this feature closes
    assert eng.count([], "disjunctive", [("url.keyword", "=", site)]) == 0


def test_quoted_value_is_phrase_match(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    toks, urls = _url_toks(pdf)
    site = next(t for t in toks[0] if t.startswith("site"))
    in_order = {i for i, v in toks.items() if site in v}
    # [siteNN, example] are consecutive in every matching url
    assert eng.count([], "disjunctive",
                     [("url", "=q", f"{site} example")]) == len(in_order)
    # reversed order: phrase must NOT match (an OR-match would)
    assert eng.count([], "disjunctive",
                     [("url", "=q", f"example {site}")]) == 0
    # single-token quoted == single-token unquoted
    assert eng.count([], "disjunctive", [("url", "=q", site)]) == \
        eng.count([], "disjunctive", [("url", "=", site)])


def test_keyword_suffix_and_negation(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    toks, urls = _url_toks(pdf)
    # .keyword: full exact value matches exactly one doc
    assert eng.count([], "disjunctive",
                     [("url.keyword", "=", urls[5])]) == 1
    site = next(t for t in toks[0] if t.startswith("site"))
    n_site = eng.count([], "disjunctive", [("url", "=", site)])
    # NOT analyzed-match is null-safe must_not
    assert eng.count([], "disjunctive",
                     [("url", "!=", site)]) == N - n_site
    # zero-token value: match nothing ('=') / everything ('!=') — the ES
    # zero_terms_query: none contract
    assert eng.count([], "disjunctive", [("url", "=", "!!!")]) == 0
    assert eng.count([], "disjunctive", [("url", "!=", "!!!")]) == N
    # .keyword on a non-string field refuses
    with pytest.raises(ValueError):
        eng.count([], "disjunctive", [("warc_ts.keyword", "=", "x")])
    # non-analyzed string fields keep exact semantics even unquoted
    lang = pdf["lang"].iloc[0]
    assert eng.count([], "disjunctive", [("lang", "=", lang)]) == \
        int((pdf["lang"] == lang).sum())


def test_query_string_end_to_end(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    toks, urls = _url_toks(pdf)
    site = next(t for t in toks[0] if t.startswith("site"))
    member = {i for i, v in toks.items() if site in v}
    res = eng.search_query_string(f"url:{site} w0 OR w1", 50).collect()
    assert res and all(r["doc_id"] in member for r in res)
    # scores must equal the API-filtered equivalent bit-for-bit
    api = eng.search_filtered(["w0", "w1"], "disjunctive",
                              [("url", "=", site)], 50).collect()
    assert [(r["doc_id"], r["score"]) for r in res] == \
        [(r["doc_id"], r["score"]) for r in api]
    # glued quoted value with a space stays one token end-to-end
    assert parse_kuery(f'url:"{site} example" w0')[2] == \
        [("url", "=q", f"{site} example")]
    res2 = eng.search_query_string(f'url:"{site} example" w0', 50).collect()
    assert {r["doc_id"] for r in res2} <= member
    # .keyword through the discover box
    one = eng.search_query_string(f'url.keyword:"{urls[5]}" *', 10).collect()
    assert [r["doc_id"] for r in one] == [5]
