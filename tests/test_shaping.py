"""Result shaping: ES field collapsing, query rescore, function_score
(field_value_factor) and the discover sort clause.

Each is pinned rank-identical against a brute-force composition of the
python oracle's full match/score sets with the documented ES formula:

- collapse: one best hit per collapse-key (score desc, doc_id asc both
  within and across groups); null keys form one group; the collapsed
  top-k differs from the plain top-k (not vacuous);
- rescore: total = qw*base + rw*phrase within the top-window only; docs
  outside the window can never enter; qw/rw weights exercised;
- function_score: score' = bm25 (*|+) f(factor*field) over the FULL
  match set — a doc outside the bm25 top-k can win (exercised);
- sort_by_field: top-k matches by docs-table column, no scores.
"""

import math

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine

N = 600
TERMS = ["w0", "w3", "w11"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=61)
    idx = str(tmp_path_factory.mktemp("shapeidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    meta = {
        i: (by_url.loc[u, "lang"], by_url.loc[u, "warc_ts"])
        for i, u in enumerate(urls)
    }
    return idx, oracle, meta


def _rows(df, cols=("doc_id", "score")):
    return [tuple(round(r[c], 9) if c == "score" else r[c] for c in cols)
            for r in df.collect()]


# ------------------------------------------------------------- collapse

def test_collapse_matches_bruteforce(spark, built):
    idx, oracle, meta = built
    eng = SearchEngine(spark, idx)
    full = oracle.search(TERMS, "disjunctive", N)
    best: dict[str, tuple[int, float]] = {}
    for d, s in sorted(full, key=lambda x: (-x[1], x[0])):
        lang = meta[d][0]
        if lang not in best:
            best[lang] = (d, s)
    want = sorted(
        [(lang, d, round(s, 9)) for lang, (d, s) in best.items()],
        key=lambda x: (-x[2], x[1]),
    )[:10]
    got = [(r["lang"], r["doc_id"], round(r["score"], 9))
           for r in eng.collapse(TERMS, "lang", 10).collect()]
    assert got == want and got
    # collapsing actually removed same-key runs from the head
    plain_head = [d for d, _ in oracle.search(TERMS, "disjunctive", 10)]
    assert [d for _, d, _ in got] != plain_head


def test_collapse_one_hit_per_key(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    rows = eng.collapse(TERMS, "lang", 50).collect()
    keys = [r["lang"] for r in rows]
    assert len(keys) == len(set(keys)) and rows


def test_collapse_unknown_field_refuses(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.collapse(TERMS, "nope", 10)


# -------------------------------------------------------------- rescore

PHRASE = ["w0", "w1"]


def test_rescore_matches_bruteforce(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    window, k, qw, rw = 50, 10, 0.7, 1.5
    base = oracle.search(TERMS, "disjunctive", window)
    ph = dict(oracle.search_phrase(PHRASE, N))
    assert any(d in ph for d, _ in base)  # the window overlaps the phrase
    total = [
        (d, s * qw + (ph[d] * rw if d in ph else 0.0)) for d, s in base
    ]
    want = [(d, round(s, 9))
            for d, s in sorted(total, key=lambda x: (-x[1], x[0]))[:k]]
    got = _rows(eng.rescore(TERMS, PHRASE, window, k,
                            query_weight=qw, rescore_query_weight=rw))
    assert got == want and got


def test_rescore_only_reorders_within_window(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    window = 30
    window_ids = {d for d, _ in oracle.search(TERMS, "disjunctive", window)}
    got_ids = {d for d, _ in _rows(eng.rescore(TERMS, PHRASE, window, 30))}
    assert got_ids <= window_ids


def test_rescore_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.rescore(TERMS, PHRASE, window_size=10, k=20)
    with pytest.raises(ValueError):
        eng.rescore(TERMS, [], 50, 10)


# ------------------------------------------------------- function_score

def test_function_score_matches_bruteforce(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    full = oracle.search(TERMS, "disjunctive", N)
    for modifier, boost_mode, factor in (
        ("ln1p", "multiply", 1.0),
        ("sqrt", "sum", 2.0),
        ("none", "multiply", 0.5),
    ):
        def fx(v):
            v = v * factor
            if modifier == "ln1p":
                return math.log1p(v)
            if modifier == "sqrt":
                return math.sqrt(v)
            return v

        total = [
            (d, s * fx(float(oracle.doc_len[d]))) if boost_mode == "multiply"
            else (d, s + fx(float(oracle.doc_len[d])))
            for d, s in full
        ]
        want = [(d, round(s, 9))
                for d, s in sorted(total, key=lambda x: (-x[1], x[0]))[:10]]
        got = _rows(eng.function_score(TERMS, "doc_len", 10,
                                       factor=factor, modifier=modifier,
                                       boost_mode=boost_mode))
        assert got == want, (modifier, boost_mode, factor)


def test_function_score_beats_plain_topk(spark, built):
    """A length-boosted ranking must admit some doc the plain BM25 top-k
    did not contain — shaping runs over the full match set."""
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    plain = {d for d, _ in oracle.search(TERMS, "disjunctive", 10)}
    shaped = {d for d, _ in _rows(eng.function_score(TERMS, "doc_len", 10))}
    assert shaped - plain


def test_function_score_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.function_score(TERMS, "lang", 10)  # non-numeric
    with pytest.raises(ValueError):
        eng.function_score(TERMS, "nope", 10)
    with pytest.raises(ValueError):
        eng.function_score(TERMS, "doc_len", 10, modifier="log2p")
    with pytest.raises(ValueError):
        eng.function_score(TERMS, "doc_len", 10, boost_mode="max")


# -------------------------------------------------------- sort_by_field

def test_sort_by_field_matches_bruteforce(spark, built):
    idx, oracle, meta = built
    eng = SearchEngine(spark, idx)
    match = [d for d, _ in oracle.search(TERMS, "disjunctive", N)]
    for ascending in (False, True):
        want = sorted(
            match,
            key=lambda d: ((meta[d][1], d) if ascending
                           else (-meta[d][1].value, d)),
        )[:10]
        got = [r["doc_id"]
               for r in eng.sort_by_field(TERMS, "warc_ts", 10,
                                          ascending=ascending).collect()]
        assert got == want, ascending


def test_sort_by_field_refuses_unknown(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.sort_by_field(TERMS, "nope", 10)


# ------------------------------------------- compound queries (wave 3)

def test_constant_score(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    match = sorted(d for d, _ in oracle.search(TERMS, "disjunctive", N))
    rows = eng.constant_score(TERMS, 10, boost=1.7).collect()
    assert [r["doc_id"] for r in rows] == match[:10]
    assert all(r["score"] == 1.7 for r in rows)


def test_dis_max_matches_bruteforce(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    subs = [["w0"], ["w3", "w11"]]
    tie = 0.3
    per: dict[int, list[float]] = {}
    for ts in subs:
        for d, s in oracle.search(ts, "disjunctive", N):
            per.setdefault(d, []).append(s)
    total = [(d, max(ss) + tie * (sum(ss) - max(ss)))
             for d, ss in per.items()]
    want = [(d, round(s, 9))
            for d, s in sorted(total, key=lambda x: (-x[1], x[0]))[:10]]
    got = _rows(eng.dis_max(subs, 10, tie_breaker=tie))
    assert got == want and got
    # pure max at tie 0 vs bool-sum at tie 1 must differ on this corpus
    assert _rows(eng.dis_max(subs, 10, 0.0)) != _rows(eng.dis_max(subs, 10, 1.0))


def test_dis_max_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.dis_max([], 10)
    with pytest.raises(ValueError):
        eng.dis_max([["w0"], []], 10)
    with pytest.raises(ValueError):
        eng.dis_max([["w0"]], 10, tie_breaker=1.5)


def test_boosting_demotes_not_excludes(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    nb = 0.4
    neg_ids = {d for d, _ in oracle.search(["w3"], "disjunctive", N)}
    total = [(d, s * nb if d in neg_ids else s)
             for d, s in oracle.search(TERMS, "disjunctive", N)]
    want = [(d, round(s, 9))
            for d, s in sorted(total, key=lambda x: (-x[1], x[0]))[:10]]
    got = _rows(eng.boosting(TERMS, ["w3"], 10, negative_boost=nb))
    assert got == want and got
    # demotion changed the head vs the plain top-k (not vacuous), and
    # demoted docs are still present further down, never excluded
    plain = [d for d, _ in oracle.search(TERMS, "disjunctive", 10)]
    assert [d for d, _ in got] != plain
    all_ids = {d for d, _ in _rows(eng.boosting(TERMS, ["w3"], N,
                                                negative_boost=nb))}
    assert neg_ids & {d for d, _ in oracle.search(TERMS, "disjunctive", N)} \
        <= all_ids


def test_boosting_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.boosting([], ["w1"], 10)
    with pytest.raises(ValueError):
        eng.boosting(["w0"], ["w1"], 10, negative_boost=-0.1)


def test_rrf_fuse_reciprocal_rank_formula(spark):
    """ES rrf retriever: score = sum 1/(rank_constant + rank) over each
    retriever's window; ranks re-derived by (score desc, doc_id asc)."""
    from picdexer_spark.query.bm25 import rrf_fuse
    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0)], "doc_id long, score double")
    b = spark.createDataFrame(
        [(3, 0.9), (1, 0.8), (5, 0.7)], "doc_id long, score double")
    got = {r["doc_id"]: r["score"]
           for r in rrf_fuse([a, b], k=10, rank_constant=60).collect()}
    want = {
        1: 1 / 61 + 1 / 62,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 64,
        5: 1 / 63,
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-15, d
    # window_size truncates each retriever before fusing
    w2 = {r["doc_id"]: r["score"]
          for r in rrf_fuse([a, b], k=10, window_size=2).collect()}
    assert set(w2) == {1, 2, 3}
    assert abs(w2[1] - (1 / 61 + 1 / 62)) < 1e-15
    # ties within a retriever break doc_id-asc, deterministically
    t = spark.createDataFrame([(7, 1.0), (6, 1.0)], "doc_id long, score double")
    rt = {r["doc_id"]: r["score"] for r in rrf_fuse([t], k=2).collect()}
    assert abs(rt[6] - 1 / 61) < 1e-15 and abs(rt[7] - 1 / 62) < 1e-15
    import pytest as _pt
    with _pt.raises(ValueError):
        rrf_fuse([])
    with _pt.raises(ValueError):
        rrf_fuse([a], rank_constant=0)


def test_mget_and_validate_query(spark, engine_idx=None):
    """ES _mget (batch live-doc fetch, one pushed In scan) and
    _validate/query (parse dry-run: never raises, mirrors the real
    dispatch's refusals)."""
    import datetime as dt

    from picdexer_spark.index.build import IndexConfig
    from picdexer_spark.query.bm25 import SearchEngine
    from picdexer_spark.streaming.incremental import (build_incremental,
                                                      delete_by_query)

    idx = "/tmp/mget_idx"
    import shutil
    shutil.rmtree(idx, ignore_errors=True)
    pages = spark.createDataFrame(
        [(f"m{i}", dt.datetime(2024, 1, 1), None,
          f"mget words {i} target{i}", "en") for i in range(20)],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string")
    build_incremental(spark, pages, idx, IndexConfig(shard_range=64), "s1")
    assert delete_by_query(spark, idx, ["target3"], "disjunctive") == 1
    eng = SearchEngine(spark, idx)

    rows = eng.mget(list(range(20)) + [999]).collect()
    assert len(rows) == 19  # one tombstoned, 999 never existed
    assert "m3" not in {r["url"] for r in rows}  # the target3 doc is gone
    assert eng.mget([]).count() == 0
    # the In filter must push into the docs scan
    plan = eng.mget([1, 5])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(doc_id" in plan

    assert eng.validate_query("mget AND words") == \
        {"valid": True, "error": None}
    v = eng.validate_query("lang:")  # malformed qualifier
    assert v["valid"] is False and v["error"]
    v = eng.validate_query('"mget words"')  # phrase, positions off
    assert v["valid"] is False and "store_positions" in v["error"]
    v = eng.validate_query("(a AND b) OR c")  # unsupported tree shape
    assert v["valid"] is False and v["error"]
