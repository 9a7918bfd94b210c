"""Analyzer customization: index-time stop filter (position gaps, norms,
stats round-trip, incremental inheritance) and query-time synonym
blending (Lucene SynonymQuery: tf summed, df = max over the class)."""

import math

import pytest
from pyspark.sql import functions as F

from picdexer_spark.functions.analysis import (
    ENGLISH_STOPWORDS,
    analyze_py,
    normalize_stopwords,
    synonym_classes,
)
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.query.bm25 import K1, B, SearchEngine

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows], PAGES_SCHEMA
    )


CORPUS = [
    ("u0", "the quick fox jumps over the lazy dog"),
    ("u1", "quick fox quick run"),
    ("u2", "a lazy afternoon with the dog"),
    ("u3", "fox and dog and fox"),
    ("u4", "run fast run far run"),
]


@pytest.fixture(scope="module")
def stop_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stopidx"))
    build_index(
        spark, _pages(spark, CORPUS), d,
        IndexConfig(shard_range=64, store_positions=True,
                    stopwords="_english_"),
    )
    return d


def test_normalize_stopwords():
    assert normalize_stopwords("_english_") == ENGLISH_STOPWORDS
    assert normalize_stopwords(["b", "a", "b"]) == ("a", "b")
    assert normalize_stopwords(None) == ()
    with pytest.raises(ValueError):
        normalize_stopwords(["not a token"])
    with pytest.raises(ValueError):
        normalize_stopwords("_german_")


def test_analyze_py_drops_stopwords():
    assert analyze_py("The quick, the fox!", ("the",)) == ["quick", "fox"]


def test_stopwords_absent_from_dictionary(spark, stop_idx):
    eng = SearchEngine(spark, stop_idx)
    assert eng.stopwords == ENGLISH_STOPWORDS
    dfs = eng.term_dfs(["the", "and", "a", "fox"])
    assert "the" not in dfs and "and" not in dfs and "a" not in dfs
    assert dfs["fox"] == 3
    # analyze() applies the snapshot's stop set
    assert eng.analyze("The fox and the dog") == ["fox", "dog"]


def test_norms_count_kept_tokens_only(spark, stop_idx):
    eng = SearchEngine(spark, stop_idx)
    # u0: "the quick fox jumps over the lazy dog" -> the,the stopped,
    # 'over' stopped? 'over' not in Lucene set -> kept. dl = 6
    docs = {r["url"]: r["doc_len"]
            for r in eng.cat.read(eng.spark, "docs").collect()}
    assert docs["u0"] == 6
    assert docs["u2"] == 3  # a, with?, the stopped: 'with' IS in the set
    assert docs["u3"] == 3  # and, and stopped


def test_phrase_gap_blocks_adjacency(spark, stop_idx):
    eng = SearchEngine(spark, stop_idx)
    # u2 "a lazy afternoon with the dog": 'the' stopped at position 4,
    # dog at 5 -> "afternoon dog" (pos 2,5) is NOT adjacent, and the
    # pre-stop neighbours "with dog" can't even be queried; but
    # slop >= 2 bridges the gap
    assert eng.search(["lazy", "afternoon"], "phrase", 5).count() == 1
    assert eng.search(["afternoon", "dog"], "phrase", 5).count() == 0
    assert eng.search(["afternoon", "dog"], "phrase", 5, slop=2).count() == 1


def test_query_string_tree_drops_stopwords(spark, stop_idx):
    """ADVICE r6: the boolean-TREE path must analyze stopwords away like
    the flat path — a stopword inside a parenthesized group must not be
    looked up as a normal term (it is absent from the index and would
    silently fail a conjunction ES satisfies)."""
    eng = SearchEngine(spark, stop_idx)
    # '(the OR fox) AND run': 'the' drops from its group -> (fox) AND run
    tree = eng.search_query_string("(the OR fox) AND run", 5).collect()
    flat = eng.search_query_string("fox AND run", 5).collect()
    assert [(r["doc_id"], r["score"]) for r in tree] == \
        [(r["doc_id"], r["score"]) for r in flat]
    # a group emptied of all terms disappears from the conjunction
    tree2 = eng.search_query_string("(the OR a) AND fox", 5).collect()
    flat2 = eng.search_query_string("fox", 5).collect()
    assert [(r["doc_id"], r["score"]) for r in tree2] == \
        [(r["doc_id"], r["score"]) for r in flat2]
    # every group emptied -> empty result, not an executor error
    assert eng.search_query_string("(the OR a) AND (of OR with)",
                                   5).count() == 0


def test_validate_query_agrees_with_execution(spark, stop_idx):
    """ADVICE r6: validate_query must never disagree with
    search_query_string — it now builds the real (lazy) plan, so the
    refusal matrix is shared by construction. Probe the shapes that had
    drifted: phrase with a stop-filtered term, synonym terms with
    operators, synonym terms in a boolean tree."""
    eng = SearchEngine(spark, stop_idx,
                       synonyms=[["quick", "fast"]])
    probes = [
        '"the fox"',            # phrase w/ stopped term -> refuse
        "quick AND lazy",       # synonym flat conj -> executes (blended)
        "quick*",               # synonym term w/ operator -> refuse
        "(quick OR lazy) AND dog",  # synonym in tree -> refuse
        "fox AND run",          # plain -> executes
        "lang:",                # malformed -> refuse
    ]
    for q in probes:
        try:
            eng.search_query_string(q, 3)
            executed = True
        except ValueError:
            executed = False
        assert eng.validate_query(q)["valid"] == executed, q


def test_query_string_drops_stopwords(spark, stop_idx):
    eng = SearchEngine(spark, stop_idx)
    # conjunctive with a stopword: ES analyzes it away — must NOT
    # empty the result
    with_stop = eng.search_query_string("fox AND the", 5).collect()
    without = eng.search_query_string("fox", 5).collect()
    assert [(r["doc_id"], r["score"]) for r in with_stop] == \
        [(r["doc_id"], r["score"]) for r in without]
    # all-stopword query -> empty, not an error
    assert eng.search_query_string("the", 5).count() == 0
    # phrase with a stopped slot: refused, not approximated
    with pytest.raises(ValueError):
        eng.search_query_string('"the fox"', 5)


def test_stopword_build_matches_prefiltered_text(spark, tmp_path):
    """tf/df/dl parity: an index built WITH the stop filter must score
    identically to one built over pre-filtered text (positions differ —
    gaps — so compare the non-positional scoring surface)."""
    stopped = str(tmp_path / "s")
    prefilt = str(tmp_path / "p")
    build_index(spark, _pages(spark, CORPUS), stopped,
                IndexConfig(shard_range=64, stopwords=("the", "a", "and")))
    pre = [(u, " ".join(w for w in t.split()
                        if w not in ("the", "a", "and")))
           for u, t in CORPUS]
    build_index(spark, _pages(spark, pre), prefilt,
                IndexConfig(shard_range=64))
    e1, e2 = SearchEngine(spark, stopped), SearchEngine(spark, prefilt)
    assert e1.n_docs == e2.n_docs and e1.avgdl == e2.avgdl
    for q in (["fox"], ["quick", "fox"], ["run", "dog"]):
        r1 = [(r["doc_id"], r["score"])
              for r in e1.search(q, "disjunctive", 10).collect()]
        r2 = [(r["doc_id"], r["score"])
              for r in e2.search(q, "disjunctive", 10).collect()]
        assert r1 == r2


def test_incremental_inherits_stopwords(spark, tmp_path):
    from picdexer_spark.streaming.incremental import build_incremental

    d = str(tmp_path / "inc")
    build_index(spark, _pages(spark, CORPUS), d,
                IndexConfig(shard_range=64, stopwords=("the", "a")))
    res = build_incremental(
        spark, _pages(spark, [("u9", "the fox of the a river")]), d,
        source_id="b1")
    assert res is not None
    eng = SearchEngine(spark, d)
    assert eng.stopwords == ("a", "the")
    dfs = eng.term_dfs(["the", "fox", "of", "river"])
    assert "the" not in dfs           # delta batch filtered it too
    assert dfs["fox"] == 4
    assert dfs["of"] == 1             # 'of' only stopped by _english_
    docs = {r["url"]: r["doc_len"]
            for r in eng.cat.read(spark, "docs").collect()}
    assert docs["u9"] == 3            # the, the, a stopped


def test_synonym_classes_validation():
    m = synonym_classes([["fast", "quick"], ["dog", "hound"]])
    assert m["fast"] == ("fast", "quick") and m["hound"] == ("dog", "hound")
    with pytest.raises(ValueError):
        synonym_classes([["solo"]])
    with pytest.raises(ValueError):
        synonym_classes([["a b", "c"]])
    with pytest.raises(ValueError):
        synonym_classes([["x", "y"], ["y", "z"]])


@pytest.fixture(scope="module")
def plain_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plainidx"))
    build_index(spark, _pages(spark, CORPUS), d,
                IndexConfig(shard_range=64))
    return d


def _bm25(tf, dl, df, n, avgdl):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_synonym_blended_scoring(spark, plain_idx):
    eng = SearchEngine(spark, plain_idx)
    got = {r["doc_id"]: r["score"]
           for r in eng.search_synonyms(
               ["quick"], [["quick", "fast"]], k=10).collect()}
    docs = {r["url"]: (r["doc_id"], r["doc_len"])
            for r in eng.cat.read(spark, "docs").collect()}
    n, avgdl = eng.n_docs, eng.avgdl
    # df blend = max(df(quick)=2, df(fast)=1) = 2
    # u0: tf(quick)=1; u1: tf=2; u4: tf(fast)=1
    for url, tf in (("u0", 1), ("u1", 2), ("u4", 1)):
        did, dl = docs[url]
        assert got[did] == pytest.approx(_bm25(tf, dl, 2, n, avgdl))
    assert len(got) == 3


def test_synonym_no_double_count(spark, plain_idx):
    """A doc containing BOTH members scores ONE clause with tf summed —
    strictly less than the bool-OR double-count."""
    eng = SearchEngine(spark, plain_idx)
    # u4 "run fast run far run": tf(run)=3, tf(fast)=1 -> blended tf=4
    got = {r["doc_id"]: r["score"]
           for r in eng.search_synonyms(
               ["run"], [["run", "fast"]], k=10).collect()}
    docs = {r["url"]: (r["doc_id"], r["doc_len"])
            for r in eng.cat.read(spark, "docs").collect()}
    did, dl = docs["u4"]
    df_blend = max(eng.term_dfs(["run", "fast"]).values())
    expect = _bm25(4, dl, df_blend, eng.n_docs, eng.avgdl)
    assert got[did] == pytest.approx(expect)
    both = eng.search(["run", "fast"], "disjunctive", 10).collect()
    assert got[did] < {r["doc_id"]: r["score"] for r in both}[did]


def test_synonyms_empty_config_bitmatches_search(spark, plain_idx):
    eng = SearchEngine(spark, plain_idx)
    a = [(r["doc_id"], r["score"])
         for r in eng.search_synonyms(["fox", "dog"], [], k=10).collect()]
    b = [(r["doc_id"], r["score"])
         for r in eng.search(["fox", "dog"], "disjunctive", 10).collect()]
    assert a == b


def test_synonyms_conjunctive(spark, plain_idx):
    eng = SearchEngine(spark, plain_idx)
    # every class must match: class {quick,fast} AND class {dog}
    got = {r["doc_id"] for r in eng.search_synonyms(
        ["quick", "dog"], [["quick", "fast"]], mode="conjunctive",
        k=10).collect()}
    docs = {r["url"]: r["doc_id"]
            for r in eng.cat.read(spark, "docs").collect()}
    assert got == {docs["u0"]}  # only u0 has (quick|fast) and dog
    # a required class with no indexed member -> empty
    assert eng.search_synonyms(
        ["zzz", "dog"], [["zzz", "qqq"]], mode="conjunctive",
        k=10).count() == 0


def test_engine_synonyms_route_query_strings(spark, plain_idx):
    """SearchEngine(synonyms=...): bare flat query strings with a
    class term score as SynonymQuery; unsupported shapes refuse."""
    groups = [["quick", "fast"]]
    eng = SearchEngine(spark, plain_idx, synonyms=groups)
    via_qs = [(r["doc_id"], round(r["score"], 9)) for r in
              eng.search_query_string("quick", 10).collect()]
    direct = [(r["doc_id"], round(r["score"], 9)) for r in
              eng.search_synonyms(["quick"], groups, k=10).collect()]
    assert via_qs == direct and len(via_qs) == 3
    # non-class terms are untouched
    plain = SearchEngine(spark, plain_idx)
    a = [(r["doc_id"], r["score"]) for r in
         eng.search_query_string("dog", 10).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         plain.search_query_string("dog", 10).collect()]
    assert a == b
    # refusals: filters / operators / boolean trees with a class term
    with pytest.raises(ValueError, match="filters"):
        eng.search_query_string("lang:en quick", 10)
    with pytest.raises(ValueError, match="wildcard"):
        eng.search_query_string("quick OR do*", 10)
    with pytest.raises(ValueError, match="boolean-tree"):
        eng.search_query_string("(quick OR dog) AND run", 10)
