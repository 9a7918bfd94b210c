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


def test_phrase_slop_rank_identical_to_oracle(spark, built_pos):
    """Ordered sloppy phrases (the ES match_phrase `slop`) match the
    brute-force oracle rank-identically at slop 1 and 2, for bigrams and
    trigrams; slop widens (never shrinks) the match set."""
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrases = _phrases_from(docs, n=8, length=2) + \
        _phrases_from(docs, n=4, length=3)
    widened = 0
    for phrase in phrases:
        base_ids = {d for d, _ in oracle.search_phrase(phrase,
                                                       oracle.n_docs)}
        for slop in (1, 2):
            got = [
                (int(r["doc_id"]), float(r["score"]))
                for r in eng.search(phrase, "phrase", 10,
                                    slop=slop).collect()
            ]
            exp = oracle.search_phrase(phrase, 10, slop=slop)
            assert [d for d, _ in got] == [d for d, _ in exp], (phrase, slop)
            for (gd, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, rel=1e-12), (phrase, gd, slop)
            sl_ids = {d for d, _ in oracle.search_phrase(phrase,
                                                         oracle.n_docs,
                                                         slop=slop)}
            assert base_ids <= sl_ids
            widened += len(sl_ids) > len(base_ids)
    assert widened >= 3  # slop actually relaxed something in this corpus


def test_phrase_slop_randomized_sweep(spark, built_pos):
    """Randomized hardening for the sloppy chain kernel: 20 seeded random
    (phrase, slop) cases — phrases are real in-document token windows
    (sometimes with a gap token dropped, so slop>=1 is required to
    match), slop 0-3 — all rank-identical to the brute-force oracle."""
    import random

    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    rng = random.Random(13)
    nonempty = 0
    for trial in range(20):
        doc_id, text = docs[rng.randrange(len(docs))]
        toks = text.lower().split()
        if len(toks) < 8:
            continue
        i = rng.randrange(len(toks) - 5)
        m = rng.choice((2, 3))
        phrase = toks[i:i + m]
        if rng.random() < 0.5 and m == 2:
            # take tokens one apart: exact adjacency fails, slop>=1 hits
            phrase = [toks[i], toks[i + 2]]
        slop = rng.randrange(4)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in eng.search(phrase, "phrase", 10, slop=slop).collect()
        ]
        exp = oracle.search_phrase(phrase, 10, slop=slop)
        assert [d for d, _ in got] == [d for d, _ in exp], (phrase, slop)
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), (phrase, gd, slop)
        nonempty += bool(exp)
    assert nonempty >= 10


def test_phrase_slop_zero_bit_identical(spark, built_pos):
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrase = _phrases_from(docs, n=1, length=2)[0]
    a = eng.search_topk(phrase, "phrase", 10)
    b = [(int(r["doc_id"]), float(r["score"]))
         for r in eng.search(phrase, "phrase", 10, slop=0).collect()]
    assert a == b


def test_phrase_slop_query_string_and_validation(spark, built_pos):
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrase = _phrases_from(docs, n=1, length=2)[0]
    qs = f'"{phrase[0]} {phrase[1]}"~2'
    got = [(int(r["doc_id"]), float(r["score"]))
           for r in eng.search_query_string(qs, 10).collect()]
    exp = oracle.search_phrase(phrase, 10, slop=2)
    assert [d for d, _ in got] == [d for d, _ in exp]
    with pytest.raises(ValueError, match="slop"):
        eng.search(phrase, "conjunctive", 10, slop=1)
    with pytest.raises(ValueError):
        eng.search_query_string('"a b"~x', 10)


def test_filtered_phrase_slop(spark, built_pos):
    """Sloppy phrases through the COGROUPED (filtered) kernel path —
    `lang:en "a b"~1` style — match the oracle restricted to the filter
    set (BM25 statistics stay corpus-wide, ES filter context)."""
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    langs = {
        int(r["doc_id"]): r["lang"]
        for r in eng.cat.read_live_docs(spark, eng.snapshot_id)
        .select("doc_id", "lang").collect()
    }
    checked = 0
    for phrase in _phrases_from(docs, n=6, length=2):
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in eng.search_filtered(
                phrase, "phrase", [("lang", "=", "en")], 10,
                slop=1).collect()
        ]
        exp = [(d, s) for d, s in
               oracle.search_phrase(phrase, oracle.n_docs, slop=1)
               if langs.get(d) == "en"][:10]
        assert [d for d, _ in got] == [d for d, _ in exp], phrase
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), (phrase, gd)
        checked += bool(exp)
    assert checked >= 4
    # and through the query string: filter + sloppy phrase in one kuery
    p = _phrases_from(docs, n=1, length=2)[0]
    qs = f'lang:en "{p[0]} {p[1]}"~1'
    got_qs = [(int(r["doc_id"]), float(r["score"]))
              for r in eng.search_query_string(qs, 10).collect()]
    exp_qs = [(d, s) for d, s in
              oracle.search_phrase(p, oracle.n_docs, slop=1)
              if langs.get(d) == "en"][:10]
    assert [d for d, _ in got_qs] == [d for d, _ in exp_qs]


def test_batch_phrase_slop_matches_single_path(spark, built_pos):
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrases = _phrases_from(docs, n=3, length=2)
    queries = [
        {"query_id": i, "terms": p, "mode": "phrase", "k": 10, "slop": 1}
        for i, p in enumerate(phrases)
    ]
    res = eng.search_batch(queries).collect()
    by_qid: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        by_qid.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"])))
    for i, p in enumerate(phrases):
        single = [(int(r["doc_id"]), float(r["score"]))
                  for r in eng.search(p, "phrase", 10, slop=1).collect()]
        assert by_qid.get(i, []) == single, p
    with pytest.raises(ValueError, match="slop"):
        eng.search_batch([{"query_id": 0, "terms": ["a"],
                           "mode": "disjunctive", "k": 5, "slop": 1}])


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


def test_bigram_slop_out_of_order_lucene_semantics(spark, built_pos):
    """Round-5 un-pinning: a TRANSPOSED bigram matches at slop 2 (spread
    2 over phrase positions, the Lucene adjacent-swap cost), not at slop
    1, and sloppy matches weight 1/(1+spread) into phrase_tf — verified
    against the definitional greedy simulation in the oracle."""
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrase = None
    for _d, text in docs:
        toks = text.lower().split()
        if len(toks) >= 4 and toks[0] != toks[1]:
            phrase = [toks[0], toks[1]]
            break
    assert phrase is not None
    rev = list(reversed(phrase))
    fwd_docs = {d for d, _ in eng.search_topk(phrase, "phrase", N)}
    # the swapped phrase reaches the forward docs once slop covers the
    # transposition (spread 2)
    rev2 = {int(r["doc_id"]) for r in
            eng.search(rev, "phrase", N, slop=2).collect()}
    assert fwd_docs <= rev2
    # ...but NOT at slop 1 unless the doc happens to contain the reversed
    # adjacency itself: slop-1 reverse matches == oracle's, exactly
    rev1 = [(int(r["doc_id"]), float(r["score"])) for r in
            eng.search(rev, "phrase", N, slop=1)
            .orderBy("score", ascending=False).collect()]
    exp1 = oracle.search_phrase(rev, N, slop=1)
    assert [d for d, _ in rev1] == [d for d, _ in exp1]
    for (gd, gs), (_, es) in zip(rev1, exp1):
        assert gs == pytest.approx(es, rel=1e-12), gd
    # weighted freq: slop-2 reverse scores equal the simulation's
    got2 = [(int(r["doc_id"]), float(r["score"])) for r in
            eng.search(rev, "phrase", 20, slop=2).collect()]
    exp2 = oracle.search_phrase(rev, 20, slop=2)
    assert [d for d, _ in got2] == [d for d, _ in exp2]
    for (gd, gs), (_, es) in zip(got2, exp2):
        assert gs == pytest.approx(es, rel=1e-12), gd


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


# ---------------------------------------------------------------------------
# round-3: phrase pruning + batch phrase
# ---------------------------------------------------------------------------
def test_phrase_block_range_pruning_skips_decode():
    """The conjunctive block-range keep-mask must run BEFORE decoding the
    driver term: blocks of the rarest term whose doc range no other phrase
    term touches are never decoded — and the result is exact."""
    import numpy as np

    from picdexer_spark.index.codec import encode_blocks
    from picdexer_spark.query.wand import TermBlocks, score_phrase

    def mk(ids, positions):
        tfs = np.array([len(p) for p in positions], np.uint64)
        dls = np.full(ids.size, 10, np.uint64)
        rows = encode_blocks(ids, tfs, dls, block_size=4,
                             positions=positions)
        return TermBlocks(
            np.array([r["first_doc"] for r in rows], np.int64),
            np.array([r["last_doc"] for r in rows], np.int64),
            np.array([r["max_tf"] for r in rows], np.int64),
            np.array([r["min_dl"] for r in rows], np.int64),
            [(r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"]) for r in rows],
            pos_enc=[r["pos_enc"] for r in rows],
        )

    # term 'a' in 96 docs (24 blocks of 4) at position 0; term 'b' only in
    # docs 0..7 (2 blocks) at position 1 -> phrase "a b" matches docs 0..7
    ids_a = np.arange(96, dtype=np.uint64)
    a = mk(ids_a, [np.array([0], np.uint64)] * 96)
    ids_b = np.arange(8, dtype=np.uint64)
    b = mk(ids_b, [np.array([1], np.uint64)] * 8)
    blocks = {"a": a, "b": b}
    idf = {"a": 1.0, "b": 1.0}
    got_ids, got_scores = score_phrase(["a", "b"], blocks, idf, 1.2, 0.75,
                                       10.0, 8)
    assert list(got_ids) == list(range(8))
    assert (got_scores > 0).all()
    # only the driver ('a' is NOT the driver here: b is rarer) ... count
    # decodes on the larger list: blocks of 'a' touched must be only the
    # two ranges where 'b' has blocks
    assert len(a._cache) <= 3, len(a._cache)  # 2 blocks cover docs 0..7
    assert len(b._cache) <= 3


def test_batch_phrase_bit_identical_to_single_path(spark, built_pos):
    """A phrase query through search_batch must return exactly what the
    single-query search() path returns — same ids, same float64 scores —
    alongside conj/disj queries in the same batch."""
    idx, oracle, docs = built_pos
    eng = SearchEngine(spark, idx)
    phrases = [p for p in _phrases_from(docs, n=6, length=2) if len(p) == 2]
    assert len(phrases) >= 4
    batch = [
        {"query_id": i, "terms": p, "mode": "phrase", "k": 10}
        for i, p in enumerate(phrases)
    ]
    batch.append({"query_id": 90, "terms": ["w0", "w3"],
                  "mode": "disjunctive", "k": 10})
    batch.append({"query_id": 91, "terms": ["w5", "w9"],
                  "mode": "conjunctive", "k": 10})
    got = eng.search_batch(batch).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for q in batch:
        single = eng.search_topk(
            q["terms"], q["mode"], q["k"]
        )
        rows = sorted(by_qid.get(q["query_id"], []))
        assert [(d, s) for _, d, s in rows] == single, q


def test_search_batch_rejects_unknown_mode(spark, built_pos):
    idx, _, _ = built_pos
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError) as ei:
        eng.search_batch([{"query_id": 0, "terms": ["w0"],
                           "mode": "fuzzy", "k": 5}])
    assert "fuzzy" in str(ei.value)


def test_search_batch_phrase_refused_without_positions(spark, tmp_path):
    pdf = gen_pages(80, seed=6)
    idx = str(tmp_path / "nopos_batch")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64))
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError) as ei:
        eng.search_batch([{"query_id": 0, "terms": ["w0", "w1"],
                           "mode": "phrase", "k": 5}])
    assert "position" in str(ei.value).lower()
