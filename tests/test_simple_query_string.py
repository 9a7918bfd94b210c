"""ES simple_query_string + terms_set.

simple_query_string (Lucene SimpleQueryParser subset, forgiving):
- flat `a | b` delegates to the pruned disjunctive kernel bit-for-bit;
- CNF `a | b + c` rank/score-matches the groups oracle;
- default_operator=and whitespace conjuncts;
- `-term` excludes (brute-force set oracle), only-negative is pinned
  constant-score match_all-minus;
- phrase / prefix / fuzzy clauses compose with AND groups;
- query content NEVER raises (gibberish, bare operators, empty).

terms_set (Lucene CoveringQuery): per-doc threshold column, score =
BM25 sum over matched terms, threshold clamped to >= 1.
"""

import pytest
from pyspark.sql import functions as F

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.query.parser import parse_simple_query_string

N = 600


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=47)
    idx = str(tmp_path_factory.mktemp("sqsidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    return idx, oracle


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _approx_eq(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_parser_cnf_normalization():
    groups, neg = parse_simple_query_string("a | b + c -d")
    assert groups == [[("terms", ["a"]), ("terms", ["b"])],
                      [("terms", ["c"])]]
    assert neg == [("terms", ["d"])]
    # default AND: whitespace separates groups; | still merges
    groups, _ = parse_simple_query_string("a b | c", "and")
    assert groups == [[("terms", ["a"])],
                      [("terms", ["b"]), ("terms", ["c"])]]
    # parens are whitespace (pinned divergence), bare ops drop
    assert parse_simple_query_string("(a) | + -") == \
        ([[("terms", ["a"])]], [])
    with pytest.raises(ValueError):
        parse_simple_query_string("a", "xor")


def test_flat_or_delegates_to_search_kernel(spark, built):
    idx, _ = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("w0 | w3 | w11", 10))
    want = _rows(eng.search(["w0", "w3", "w11"], "disjunctive", 10))
    assert got == want  # bit-identical: same kernel


def test_default_and_matches_conjunctive_oracle(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("w0 w3", 10,
                                        default_operator="and"))
    _approx_eq(got, oracle.search(["w0", "w3"], "conjunctive", 10))


def test_cnf_matches_groups_oracle(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("w0 | w3 + w11", 10))
    _approx_eq(got, oracle.search_groups([["w0", "w3"], ["w11"]], 10))


def test_negation_excludes(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("w0 -w3", 20))
    w3_docs = set(oracle.postings.get("w3", {}))
    want = [(d, s) for d, s in oracle.search(["w0"], "disjunctive", N)
            if d not in w3_docs][:20]
    _approx_eq(got, want)
    assert w3_docs & {d for d, _ in got} == set()


def test_only_negative_is_constant_score_match_all_minus(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("-w0", N))
    w0_docs = set(oracle.postings.get("w0", {}))
    assert {d for d, _ in got} == set(range(N)) - w0_docs
    assert all(s == 1.0 for _, s in got)


def test_phrase_clause_composes_with_and_group(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string('"w0 w1" + w3', 10))
    ph = dict(oracle.search_phrase(["w0", "w1"], N))
    w3 = dict(oracle.search(["w3"], "disjunctive", N))
    want = sorted(((d, ph[d] + w3[d]) for d in ph.keys() & w3.keys()),
                  key=lambda x: (-x[1], x[0]))[:10]
    _approx_eq(got, want)


def test_prefix_and_fuzzy_clauses_use_the_standard_rewrites(spark, built):
    idx, _ = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.simple_query_string("w1*", 10))
    want = _rows(eng.search(eng.expand_prefix("w1"), "disjunctive", 10))
    _approx_eq(got, want)
    got = _rows(eng.simple_query_string("w123~1", 10))
    want = _rows(eng.search(eng.expand_fuzzy("w123", 1),
                            "disjunctive", 10))
    _approx_eq(got, want)


def test_forgiving_never_raises(spark, built):
    idx, _ = built
    eng = SearchEngine(spark, idx)
    for q in ("(((", "|||", '"', "", "   ", "+ | -", "a AND", "-",
              'missing"quote', "zzz_not_in_corpus*"):
        eng.simple_query_string(q, 3).collect()  # must not raise
    assert _rows(eng.simple_query_string("(((", 3)) == []
    # a required group whose prefix expands to nothing matches nothing
    assert _rows(eng.simple_query_string("w0 + zzznope*", 3)) == []


# ------------------------------------------------------------ terms_set

def test_terms_set_per_doc_threshold(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    terms = ["w0", "w3", "w11"]
    got = _rows(eng.terms_set(terms, (F.col("doc_id") % 3 + 1), 20))
    want = []
    for d in range(N):
        matched = [t for t in terms if d in oracle.postings.get(t, {})]
        req = max(d % 3 + 1, 1)
        if len(matched) >= req:
            want.append((d, sum(oracle.score_one(t, d) for t in matched)))
    want.sort(key=lambda x: (-x[1], x[0]))
    _approx_eq(got, want[:20])
    # the per-doc threshold must actually bite: some doc matching >= 1
    # term is excluded by its own requirement
    assert len(want) < sum(
        1 for d in range(N)
        if any(d in oracle.postings.get(t, {}) for t in terms))


def test_terms_set_threshold_clamped_to_one(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    terms = ["w0", "w3"]
    got = _rows(eng.terms_set(terms, F.lit(0), N))
    matched_any = {d for d in range(N)
                   if any(d in oracle.postings.get(t, {}) for t in terms)}
    assert {d for d, _ in got} == matched_any  # never matches 0-term docs
    assert _rows(eng.terms_set([], F.lit(1), 5)) == []
