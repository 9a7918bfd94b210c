"""ES agg-tree composer: nested buckets in one rollup pass, per-level
top-k cascade, parent denormalization, refusals."""

import pytest

from picdexer_spark.operators.aggtree import agg_tree

ROWS = [
    # (lang, source, n_chars)
    ("en", "a", 100), ("en", "a", 200), ("en", "b", 300), ("en", "b", 50),
    ("en", "c", 10),
    ("de", "a", 400), ("de", "a", 100), ("de", "d", 80),
    ("fr", "e", 900), ("fr", "e", 100), ("fr", "e", 50), ("fr", "f", 70),
    (None, "x", 1),          # null level-1 key: no bucket anywhere
    ("en", None, 999),       # null level-2 key: counts in en, no child
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "lang string, source string, n_chars long")


def test_two_level_terms_with_metrics(docs):
    out = agg_tree(docs, {
        "by_lang": {"terms": {"field": "lang", "size": 2},
                    "aggs": {
                        "by_src": {"terms": {"field": "source", "size": 1},
                                   "aggs": {"avg_len": {
                                       "avg": {"field": "n_chars"}}}},
                        "max_len": {"max": {"field": "n_chars"}},
                    }},
    }).collect()
    rows = {(r["by_lang"], r["by_src"]): r for r in out}
    # top-2 langs by count: en(6 — incl. the null-source doc), fr(4);
    # de(3) eliminated; the null-lang doc buckets nowhere
    assert set(rows) == {("en", "a"), ("fr", "e")}
    en = rows[("en", "a")]
    assert en["by_lang_doc_count"] == 6
    assert en["max_len"] == 999          # parent metric sees the null-child doc
    assert en["doc_count"] == 2          # leaf bucket en/a
    assert en["avg_len"] == pytest.approx(150.0)
    fr = rows[("fr", "e")]
    assert fr["by_lang_doc_count"] == 4 and fr["doc_count"] == 3
    assert fr["max_len"] == 900
    assert fr["avg_len"] == pytest.approx((900 + 100 + 50) / 3)


def test_child_topk_is_per_parent_and_tiebreak(docs):
    out = agg_tree(docs, {
        "by_lang": {"terms": {"field": "lang", "size": 3},
                    "aggs": {"by_src": {
                        "terms": {"field": "source", "size": 1}}}},
    }).collect()
    got = {(r["by_lang"], r["by_src"]) for r in out}
    # en: a(2) vs b(2) tie -> key asc picks a; de: a(2); fr: e(3)
    assert got == {("en", "a"), ("de", "a"), ("fr", "e")}


def test_cardinality_and_histogram_levels(docs):
    out = agg_tree(docs, {
        "len_bins": {"histogram": {"field": "n_chars", "interval": 100},
                     "aggs": {"n_langs": {
                         "cardinality": {"field": "lang"}}}},
    }).collect()
    by_bin = {r["len_bins"]: r for r in out}
    # bin 0.0: 10,50,50,70,80,1 -> 6 rows; langs en,fr,de (+null row's
    # n_chars=1 has null LANG? no — lang is the metric field, null lang
    # row still counts in doc_count but not in cardinality)
    assert by_bin[0.0]["doc_count"] == 6
    assert by_bin[0.0]["n_langs"] == 3
    assert by_bin[900.0]["doc_count"] == 2   # 900 (fr) + 999 (en)
    assert by_bin[900.0]["n_langs"] == 2


def test_range_buckets_keep_all(docs):
    out = agg_tree(docs, {
        "len_rng": {"range": {"field": "n_chars",
                              "ranges": [{"to": 100},
                                         {"from": 100, "to": 400},
                                         {"from": 400, "key": "big"}]}},
    }).collect()
    by_key = {r["len_rng"]: r["doc_count"] for r in out}
    assert by_key == {"*-100": 6, "100-400": 5, "big": 3}


def test_refusals(docs):
    with pytest.raises(ValueError, match="one bucket"):
        agg_tree(docs, {
            "a": {"terms": {"field": "lang"}},
            "b": {"terms": {"field": "source"}},
        })
    with pytest.raises(ValueError, match="no bucket"):
        agg_tree(docs, {})
    with pytest.raises(ValueError, match="top-level metric"):
        agg_tree(docs, {"m": {"avg": {"field": "n_chars"}}})
    with pytest.raises(ValueError, match="unsupported"):
        agg_tree(docs, {"a": {"geo_bounds": {"field": "lang"}}})


def test_single_rollup_scan_plan(docs):
    """The whole tree is ONE data-sized aggregation pass: the rollup is
    materialized (localCheckpoint) before the cascade, so the returned
    plan contains NO Expand — every level reads the bucket-space-sized
    checkpoint, never rescanning the input per level."""
    out = agg_tree(docs, {
        "by_lang": {"terms": {"field": "lang", "size": 2},
                    "aggs": {"by_src": {
                        "terms": {"field": "source", "size": 2}}}},
    })
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" not in plan
    # the cascade's per-parent top-k runs as WindowGroupLimit pushdown
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in phys
