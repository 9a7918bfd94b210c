"""kuery field qualifiers + filtered BM25 search (the discover-panel
`lang:en some query` construct, reference kibana.ndjson:8).

- parse_kuery accept/refuse boundaries;
- filtered top-k is exact vs a brute-force oracle at every filter
  selectivity (BM25 statistics stay corpus-wide — ES filter context);
- filter-only queries behave as constant-score match_all within the filter;
- tombstoned (upserted-away) docs never match a filter.
"""

import math
import tempfile

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import B, K1
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.query.parser import parse_kuery

N = 700


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=23)
    idx = str(tmp_path_factory.mktemp("filtidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    return idx, pdf


def _oracle(pdf):
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    toks = {i: tokenize_py(by_url.loc[u, "text"] or "")
            for i, u in enumerate(urls)}
    langs = {i: by_url.loc[u, "lang"] for i, u in enumerate(urls)}
    n = len(urls)
    dls = {i: len(v) for i, v in toks.items()}
    avgdl = sum(dls.values()) / n

    def search(terms, mode, lang, k):
        dfc = {t: sum(1 for v in toks.values() if t in v)
               for t in set(terms)}
        rows = []
        for i, v in toks.items():
            if langs[i] != lang:
                continue
            parts = []
            for t in sorted(set(terms)):
                tf = v.count(t)
                if tf == 0:
                    if mode == "conjunctive":
                        parts = None
                        break
                    continue
                idf = math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
                parts.append(idf * (tf * (K1 + 1))
                             / (tf + K1 * (1 - B + B * dls[i] / avgdl)))
            if parts:
                rows.append((i, sum(parts)))
        rows.sort(key=lambda x: (-x[1], x[0]))
        return rows[:k]

    return search, sorted(set(langs.values())), langs


def test_parse_kuery_boundaries():
    assert parse_kuery("lang:en batch OR vector") == (
        ["batch", "vector"], "disjunctive", [("lang", "=", "en")]
    )
    # quoted values carry the '=q' op (semantic on text-analyzed fields:
    # quoted = match_phrase, unquoted = any-token match; keyword fields
    # treat both as exact)
    assert parse_kuery('lang:"en" url:doc://x "part filter"') == (
        ["part", "filter"], "phrase",
        [("lang", "=q", "en"), ("url", "=", "doc://x")]
    )
    assert parse_kuery('NOT lang:"de" batch') == (
        ["batch"], "disjunctive", [("lang", "!=q", "de")]
    )
    # .keyword suffix: the ES multi-field exact-match escape hatch
    assert parse_kuery("url.keyword:doc://x") == (
        [], "disjunctive", [("url.keyword", "=", "doc://x")]
    )
    assert parse_kuery("lang:en a AND b") == (
        ["a", "b"], "conjunctive", [("lang", "=", "en")]
    )
    assert parse_kuery("lang:en") == ([], "disjunctive",
                                      [("lang", "=", "en")])
    # NOT + KQL ranges (filter context only)
    assert parse_kuery("NOT lang:de batch") == (
        ["batch"], "disjunctive", [("lang", "!=", "de")]
    )
    assert parse_kuery('warc_ts >= "2024-01-01 00:02:00" batch') == (
        ["batch"], "disjunctive",
        [("warc_ts", ">=", "2024-01-01 00:02:00")]
    )
    assert parse_kuery("warc_ts < 2024-02-01 lang:en") == (
        [], "disjunctive",
        [("warc_ts", "<", "2024-02-01"), ("lang", "=", "en")]
    )
    for bad_new in ("NOT batch", "warc_ts >=", "warc_ts>=2024-01-01",
                    "a NOT lang:en AND b OR c", "batch NOT"):
        with pytest.raises(ValueError):
            parse_kuery(bad_new)
    assert parse_kuery("plain words") == (
        ["plain", "words"], "disjunctive", []
    )
    for bad in ["(a OR b)", 'lang:en "a" b "c"', "a AND b OR c",
                'f:"x" y "z" "w"']:
        with pytest.raises(ValueError):
            parse_kuery(bad)


def test_filtered_search_exact_vs_bruteforce(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    oracle, langs, _ = _oracle(pdf)
    checked = 0
    for lang in langs:
        for terms, mode in (
            (["w0", "w3", "w7"], "disjunctive"),
            (["w2", "w5"], "conjunctive"),
            (["w1"], "disjunctive"),
        ):
            got = [
                (int(r["doc_id"]), float(r["score"]))
                for r in eng.search_filtered(
                    terms, mode, [("lang", lang)], 10
                ).collect()
            ]
            exp = oracle(terms, mode, lang, 10)
            assert [d for d, _ in got] == [d for d, _ in exp], (lang, terms)
            for (gd, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, rel=1e-12), (lang, terms, gd)
            checked += bool(exp)
    assert checked >= 10


def test_filtered_phrase(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    _, langs, doc_langs = _oracle(pdf)
    # a phrase hit set restricted by lang must equal the unfiltered hit set
    # intersected with that lang (scores unchanged: corpus-wide stats)
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    phrase = None
    for u in urls:
        toks = tokenize_py(by_url.loc[u, "text"] or "")
        if len(toks) >= 3 and toks[0] != toks[1]:
            phrase = [toks[0], toks[1]]
            break
    assert phrase
    unfiltered = {
        int(r["doc_id"]): float(r["score"])
        for r in eng.search(phrase, "phrase", N).collect()
    }
    for lang in langs[:2]:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in eng.search_filtered(
                phrase, "phrase", [("lang", lang)], N
            ).collect()
        ]
        exp = sorted(
            ((d, s) for d, s in unfiltered.items() if doc_langs[d] == lang),
            key=lambda x: (-x[1], x[0]),
        )
        assert got == exp, lang


def test_filter_only_is_constant_score_match_all(spark, built):
    idx, pdf = built
    eng = SearchEngine(spark, idx)
    _, langs, doc_langs = _oracle(pdf)
    lang = langs[0]
    got = eng.search_filtered([], "disjunctive", [("lang", lang)], 7).collect()
    exp_ids = sorted(d for d, lg in doc_langs.items() if lg == lang)[:7]
    assert [int(r["doc_id"]) for r in got] == exp_ids
    assert all(float(r["score"]) == 1.0 for r in got)


def test_filtered_rejects_unknown_field(spark, built):
    idx, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError) as ei:
        eng.search_filtered(["w0"], "disjunctive", [("nope", "x")], 5)
    assert "nope" in str(ei.value)


def test_filtered_excludes_tombstoned_docs(spark, tmp_path):
    """After an upsert changes a doc's text, a filtered search over its lang
    must see only the LIVE version (the old doc_id is tombstoned)."""
    from picdexer_spark.streaming.incremental import build_incremental

    idx = str(tmp_path / "filtups")
    pdf = gen_pages(120, seed=9)
    spark_df = spark.createDataFrame(pdf)
    build_incremental(spark, spark_df, idx, IndexConfig(shard_range=64),
                      source_id="b0")
    # upsert: one url gets brand-new text with a unique marker term
    import pandas as pd

    row = pdf.iloc[3:4].copy()
    row["text"] = "zzzmarker " + row["text"]
    row["html"] = None
    build_incremental(spark, spark.createDataFrame(row), idx,
                      IndexConfig(shard_range=64), source_id="b1")
    eng = SearchEngine(spark, idx)
    lang = row["lang"].iloc[0]
    got = eng.search_filtered(["zzzmarker"], "disjunctive",
                              [("lang", lang)], 10).collect()
    assert len(got) == 1  # only the new version matches
    url_filtered = eng.search_filtered(
        ["zzzmarker"], "disjunctive", [("url", row["url"].iloc[0])], 10
    ).collect()
    assert [r["doc_id"] for r in url_filtered] == [got[0]["doc_id"]]


def test_range_and_not_filters_exact(spark, built):
    """KQL range (`warc_ts >= ts`) and negation (`NOT lang:x`) are exact:
    the filtered top-k equals the unfiltered FULL ranking restricted to the
    allowed doc set. '!='-negation must also match docs missing the field
    (ES must_not)."""
    idx, _ = built
    eng = SearchEngine(spark, idx)
    live = eng.cat.read_live_docs(spark, eng.snapshot_id) \
        .select("doc_id", "warc_ts", "lang").collect()
    full = [(int(r["doc_id"]), float(r["score"]))
            for r in eng.search(["w1", "w4"], "disjunctive", N).collect()]

    cut = sorted(r["warc_ts"] for r in live)[len(live) // 2]
    iso = cut.isoformat(sep=" ")
    allowed_ts = {r["doc_id"] for r in live if r["warc_ts"] >= cut}
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in eng.search_filtered(
               ["w1", "w4"], "disjunctive",
               [("warc_ts", ">=", iso)], 10).collect()]
    assert got == [p for p in full if p[0] in allowed_ts][:10]
    # query-string path compiles to the same thing
    via_qs = [(int(r["doc_id"]), float(r["score"]))
              for r in eng.search_query_string(
                  f'warc_ts >= "{iso}" w1 OR w4', 10).collect()]
    assert via_qs == got

    allowed_not = {r["doc_id"] for r in live if r["lang"] != "de"}
    got_not = [(int(r["doc_id"]), float(r["score"]))
               for r in eng.search_query_string(
                   "NOT lang:de w1 OR w4", 10).collect()]
    assert got_not == [p for p in full if p[0] in allowed_not][:10]

    # strict exclusive bound: `<` at an EXISTING timestamp excludes it
    got_lt = {int(r["doc_id"]) for r in eng.search_filtered(
        ["w1", "w4"], "disjunctive", [("warc_ts", "<", iso)], N).collect()}
    assert got_lt == {p[0] for p in full} - allowed_ts

    with pytest.raises(ValueError):
        eng.search_filtered(["w1"], "disjunctive",
                            [("warc_ts", ">=", "not-a-date")], 5)
    with pytest.raises(ValueError):
        eng.search_filtered(["w1"], "disjunctive",
                            [("lang", ">=", "de")], 5)  # range on keyword


def test_exists_query(spark, tmp_path):
    """KQL `field:*` is the ES exists query (round 5): docs with the
    field non-null match; `NOT field:*` is the missing form; the two
    partition the corpus. Unknown fields refuse."""
    from picdexer_spark.query.parser import parse_kuery

    pdf = gen_pages(120, seed=9)
    pdf.loc[pdf.index % 3 == 0, "lang"] = None
    n_missing = int((pdf.index % 3 == 0).sum())
    idx = str(tmp_path / "existsidx")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64))
    eng = SearchEngine(spark, idx)

    assert parse_kuery("lang:* w0") == (
        ["w0"], "disjunctive", [("lang", "exists", None)])
    assert parse_kuery("NOT lang:*") == (
        [], "disjunctive", [("lang", "!exists", None)])

    n_with = eng.count([], "disjunctive", [("lang", "exists", None)])
    n_without = eng.count([], "disjunctive", [("lang", "!exists", None)])
    assert n_with == 120 - n_missing
    assert n_without == n_missing
    # query-string route: filter-only exists is the constant-score path
    rows = eng.search_query_string("NOT lang:* *", 200).collect()
    assert len(rows) == n_missing
    with pytest.raises(ValueError, match="unknown filter field"):
        eng.count([], "disjunctive", [("nope", "exists", None)])


def test_geo_bbox_leaf_composes_with_kuery_filters(spark, built):
    """The geo_bounding_box filter leaf — ((lat_f, lon_f), 'geo_bbox',
    (top, left, bottom, right)) — rides the same _filter_cond machinery
    as every other kuery leaf (the Kibana map viewport composing with
    the query bar). Docs numeric columns stand in for coordinates; the
    wiring, validation, and AND-composition are what's under test."""
    from pyspark.sql import functions as F

    idx, _pdf = built
    eng = SearchEngine(spark, idx)
    box = (90.0, -180.0, 10.0, 180.0)  # doc_id in [10, 90], any doc_len
    flt = [("lang", "en"), (("doc_id", "doc_len"), "geo_bbox", box)]
    got = sorted(r["doc_id"] for r in
                 eng.match_ids(["w1"], "disjunctive", flt).collect())
    live = eng.cat.read_live_docs(spark, eng.snapshot_id)
    want_meta = {
        r["doc_id"] for r in live.filter(
            (F.col("lang") == "en") & F.col("doc_id").between(10, 90)
            & F.col("doc_len").between(-180, 180)).collect()}
    base = {r["doc_id"] for r in
            eng.match_ids(["w1"], "disjunctive", [("lang", "en")])
            .collect()}
    assert got == sorted(base & want_meta) and got
    assert set(got) < base  # the box really restricted something
    # scored path accepts the same leaf
    top = eng.search_filtered(["w1"], "disjunctive", flt, 5).collect()
    assert {r["doc_id"] for r in top} <= set(got)
    # refusals: non-numeric field, malformed box
    with pytest.raises(ValueError, match="numeric"):
        eng.match_ids(["w1"], "disjunctive",
                      [(("lang", "doc_len"), "geo_bbox", box)])
    with pytest.raises(ValueError, match="bottom"):
        eng.match_ids(["w1"], "disjunctive",
                      [(("doc_id", "doc_len"), "geo_bbox",
                        (0.0, 0.0, 10.0, 5.0))])
