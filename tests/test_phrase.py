"""Positional postings + phrase queries (Lucene match_phrase, slop 0).

- position codec roundtrip happens inside the real build (store_positions);
- phrase results are rank-identical (ids + float64 scores) to the
  pure-Python oracle across a generated phrase set;
- an index built WITHOUT positions refuses phrase queries;
- non-positional results are byte-unaffected by enabling positions.
"""

import pytest
from pyspark.sql import functions as F

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.query.parser import parse_query_string
from picdexer_spark.sources.catalog import IndexCatalog

N = 600


@pytest.fixture(scope="module")
def built_pos(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=17)
    urls = sorted(pdf["url"])
    by_url = dict(zip(pdf["url"], pdf["text"]))
    docs = [(i, by_url[u]) for i, u in enumerate(urls)]
    oracle = OracleIndex(docs)
    idx = str(tmp_path_factory.mktemp("posidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=200, store_positions=True))
    return idx, oracle, docs


def _phrases_from(docs, n=12, length=2):
    """Deterministic phrase set: adjacent token pairs/triples sampled from
    real documents (so matches exist), plus one absent phrase."""
    out = []
    for doc_id, text in docs[: n * 7 : 7]:
        toks = text.lower().split()
        if len(toks) >= length + 2:
            out.append(toks[2:2 + length])
    out.append(["zzz", "qqq"])  # matches nothing
    return out


def test_phrase_rank_identical_to_oracle(spark, built_pos):
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    checked_nonempty = 0
    for phrase in _phrases_from(docs, n=10, length=2) + \
            _phrases_from(docs, n=4, length=3):
        got = eng.search_topk(phrase, "phrase", 10)
        exp = oracle.search_phrase(phrase, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], phrase
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), (phrase, gd)
        checked_nonempty += bool(exp)
    assert checked_nonempty >= 8  # the phrase set wasn't vacuous


def test_phrase_requires_adjacency_and_order(spark, built_pos):
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrase = None
    for _d, text in docs:
        toks = text.lower().split()
        if len(toks) >= 4 and toks[0] != toks[1]:
            phrase = [toks[0], toks[1]]
            break
    assert phrase is not None
    fwd = eng.search_topk(phrase, "phrase", 10)
    assert fwd  # the source doc matches
    # reversed order is a DIFFERENT phrase: results must match the oracle
    rev = eng.search_topk(list(reversed(phrase)), "phrase", 10)
    exp_rev = oracle.search_phrase(list(reversed(phrase)), 10)
    assert [d for d, _ in rev] == [d for d, _ in exp_rev]
    # conjunctive is a superset of (or equal to) the phrase hit set
    conj = {d for d, _ in eng.search_topk(sorted(set(phrase)),
                                          "conjunctive", N)}
    assert {d for d, _ in fwd} <= conj


def test_phrase_refused_without_positions(spark, tmp_path):
    pdf = gen_pages(100, seed=5)
    idx = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64))  # store_positions=False
    eng = SearchEngine(spark, idx)
    with pytest.raises(Exception) as ei:
        eng.search_topk(["w0", "w1"], "phrase", 5)
    assert "position" in str(ei.value).lower()


def test_positions_do_not_change_nonpositional_results(spark, built_pos,
                                                       tmp_path):
    """Enabling positions adds a column; doc_ids/tf/dl blocks and all
    BM25 results stay bit-identical to a positions-off build."""
    idx_pos, oracle, docs = built_pos
    pdf = gen_pages(N, seed=17)
    idx_plain = str(tmp_path / "plain")
    build_index(spark, spark.createDataFrame(pdf), idx_plain,
                IndexConfig(shard_range=200))

    def sig(i):
        return {
            tuple(r) for r in IndexCatalog(i).read(spark, "postings")
            .selectExpr("term", "shard_id", "block_no",
                        "md5(doc_ids_enc) m1", "md5(tfs_enc) m2",
                        "md5(dls_enc) m3").collect()
        }

    assert sig(idx_pos) == sig(idx_plain)
    a = SearchEngine(spark, idx_pos).search_topk(["w0", "w3"], "disjunctive", 10)
    b = SearchEngine(spark, idx_plain).search_topk(["w0", "w3"], "disjunctive", 10)
    assert a == b


def test_parser_phrase_mode():
    assert parse_query_string('"a b c"') == (["a", "b", "c"], "phrase")
    assert parse_query_string('"Batch, DATA!"') == (["batch", "data"], "phrase")
    with pytest.raises(ValueError):
        parse_query_string('hello "a b"')  # mixed phrase + bare terms
    with pytest.raises(ValueError):
        parse_query_string('"a" "b"')
