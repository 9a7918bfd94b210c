"""track_total_hits, match_bool_prefix, and the ES TERM suggester
("did you mean"), each pinned against brute-force compositions of the
python oracle.

- search_with_total: exact total + 'eq'; int threshold clips to
  (threshold, 'gte') only when exceeded; top-k rows identical to the
  plain search's;
- match_bool_prefix: no adjacency; or = disjunction over fixed terms +
  df-order stem expansions (each with own idf); and = all fixed
  required + >=1 expansion, score sums all matched clauses; collision
  between a fixed term and an expansion refuses under 'and';
- suggest_term: OSA distance, prefix_length filter, (distance, -df,
  term) rank, input never suggested, missing/popular/always modes,
  min_doc_freq floor.
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages, rare_term
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine, damerau_capped

N = 600


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=71)
    idx = str(tmp_path_factory.mktemp("tthidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    return idx, oracle


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


# ------------------------------------------------------ track_total_hits

def test_track_total_hits_exact(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    terms = [rare_term(0), rare_term(1)]
    full = oracle.search(terms, "disjunctive", N)
    got = eng.search_with_total(terms, k=5).collect()
    want_top = sorted(full, key=lambda x: (-x[1], x[0]))[:5]
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(d, round(s, 9)) for d, s in want_top]
    assert all(r["total_hits"] == len(full) and r["relation"] == "eq"
               for r in got)


def test_track_total_hits_threshold(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    terms = [rare_term(0), rare_term(1)]
    n = len(oracle.search(terms, "disjunctive", N))
    over = eng.search_with_total(terms, k=1, track_total_hits=n - 1)
    assert [(r["total_hits"], r["relation"]) for r in over.collect()] \
        == [(n - 1, "gte")]
    under = eng.search_with_total(terms, k=1, track_total_hits=n + 5)
    assert [(r["total_hits"], r["relation"]) for r in under.collect()] \
        == [(n, "eq")]
    with pytest.raises(ValueError):
        eng.search_with_total(terms, track_total_hits=-1).collect()


# ----------------------------------------------------- match_bool_prefix

def _brute_disj(oracle, terms, k):
    per = {}
    for t in set(terms):
        for d in oracle.postings.get(t, {}):
            per[d] = per.get(d, 0.0) + oracle.score_one(t, d)
    top = sorted(per.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(d, round(s, 9)) for d, s in top]


def test_match_bool_prefix_or(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    stem = "rareterm4"  # expands to rareterm4, rareterm40..49
    alts = eng.expand_prefix(stem)
    assert len(alts) > 3
    want = _brute_disj(oracle, [rare_term(0)] + alts, 10)
    got = _rows(eng.match_bool_prefix([rare_term(0), stem], 10))
    assert got == want and got


def test_match_bool_prefix_and(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    stem, fixed = "rareterm4", "w0"
    alts = set(eng.expand_prefix(stem))
    per = {}
    for d in oracle.postings.get(fixed, {}):
        matched = [t for t in alts if oracle.postings.get(t, {}).get(d)]
        if matched:
            per[d] = oracle.score_one(fixed, d) + sum(
                oracle.score_one(t, d) for t in matched)
    want = [(d, round(s, 9)) for d, s in
            sorted(per.items(), key=lambda x: (-x[1], x[0]))[:10]]
    got = _rows(eng.match_bool_prefix([fixed, stem], 10, operator="and"))
    assert got == want and got
    # and-mode is a strict subset of or-mode's match set here
    assert got != _rows(eng.match_bool_prefix([fixed, stem], 10))


def test_match_bool_prefix_refusals(spark, built):
    idx, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.match_bool_prefix([], 10)
    with pytest.raises(ValueError):
        eng.match_bool_prefix(["w0", ""], 10)
    with pytest.raises(ValueError):
        eng.match_bool_prefix(["w0", "w0"], 10, operator="xor")
    with pytest.raises(ValueError):
        # the stem w1 expands to w1 itself, colliding with the fixed term
        eng.match_bool_prefix(["w1", "w1"], 10, operator="and")


# --------------------------------------------------------- term suggester

def _brute_suggest(oracle, t, size=5, max_edits=2, prefix_length=1,
                   min_doc_freq=0, popular_gt=None):
    hits = []
    for c, post in oracle.postings.items():
        if c == t or c[:prefix_length] != t[:prefix_length]:
            continue
        if abs(len(c) - len(t)) > max_edits:
            continue
        d = damerau_capped(t, c, max_edits)
        if d > max_edits:
            continue
        df = len(post)
        if df < min_doc_freq or (popular_gt is not None and df <= popular_gt):
            continue
        hits.append((d, -df, c))
    hits.sort()
    return [(c, -ndf, d) for d, ndf, c in hits[:size]]


def test_suggest_term_always(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    want = _brute_suggest(oracle, "rareterm3", size=8)
    got = eng.suggest_term("rareterm3", size=8, suggest_mode="always")
    assert got == want and got


def test_suggest_term_missing_and_popular(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    # a term present in the index is never corrected under 'missing'
    assert eng.suggest_term("w0") == []
    # an absent misspelling is
    miss = "rareterm3x"
    assert oracle.df(miss) == 0
    assert eng.suggest_term(miss) == _brute_suggest(oracle, miss)
    # popular: only suggestions strictly more frequent than the input
    t = rare_term(3)
    want = _brute_suggest(oracle, t, popular_gt=oracle.df(t))
    assert eng.suggest_term(t, suggest_mode="popular") == want and want


def test_suggest_term_knobs_and_refusals(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    t = "rareterm3x"
    assert eng.suggest_term(t, max_edits=1, prefix_length=4) == \
        _brute_suggest(oracle, t, max_edits=1, prefix_length=4)
    assert eng.suggest_term(t, min_doc_freq=5) == \
        _brute_suggest(oracle, t, min_doc_freq=5)
    with pytest.raises(ValueError):
        eng.suggest_term("two words")
    with pytest.raises(ValueError):
        eng.suggest_term(t, suggest_mode="sometimes")
    with pytest.raises(ValueError):
        eng.suggest_term(t, size=0)


# ------------------------------------------------- ES phrase suggester

def _brute_phrase(oracle, toks, size=5, max_errors=1.0, confidence=1.0,
                  rwel=0.95, max_candidates=5):
    """Independent noisy-channel composition over _brute_suggest
    candidates: unigram Laplace LM (df+0.5)/(N+0.5V), channel rwel for
    kept slots / (1-rwel)^dist for corrected ones, confidence
    threshold vs the input phrase's own likelihood."""
    from itertools import combinations, product

    n, v = oracle.n_docs, len(oracle.postings)
    lm = lambda df: math.log10(df + 0.5) - math.log10(n + 0.5 * v)
    keep, err = math.log10(rwel), math.log10(1.0 - rwel)
    m = len(toks)
    budget = min(int(max_errors) if max_errors >= 1
                 else max(1, int(max_errors * m)), m)
    cands = [_brute_suggest(oracle, t, size=max_candidates) for t in toks]
    base = [lm(oracle.df(t)) + keep for t in toks]
    base_score = sum(base)
    out = []
    for r in range(1, budget + 1):
        for slots in combinations(range(m), r):
            for pick in product(*[cands[i] for i in slots]):
                s = base_score
                words = list(toks)
                for i, (c, df_c, d) in zip(slots, pick):
                    s += (lm(df_c) + d * err) - base[i]
                    words[i] = c
                out.append((s, " ".join(words)))
    thr = (-math.inf if confidence <= 0.0
           else base_score + math.log10(confidence))
    out = [o for o in out if o[0] > thr]
    out.sort(key=lambda o: (-o[0], o[1]))
    return [(p, s) for s, p in out[:size]]


import math  # noqa: E402  (used by _brute_phrase)


def test_suggest_phrase_matches_bruteforce(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = eng.suggest_phrase("w0x w1", size=8, confidence=0.0)
    want = _brute_phrase(oracle, ["w0x", "w1"], size=8, confidence=0.0)
    assert [(p, round(s, 9)) for p, s, _h in got] == \
        [(p, round(s, 9)) for p, s in want] and got


def test_suggest_phrase_corrects_and_highlights(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    got = eng.suggest_phrase("w0x w1")  # default confidence=1.0
    assert got and got[0][0] == "w0 w1"
    assert got[0][2] == "<em>w0</em> w1"
    # every suggestion beats the input's own likelihood
    assert all(s > _brute_phrase(oracle, ["w0x", "w1"], size=1,
                                 confidence=0.0)[0][1] - 50  # sanity
               for _p, s, _h in got)
    # the unchanged input itself is never suggested
    assert all(p != "w0x w1" for p, _s, _h in got)


def test_suggest_phrase_max_errors(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    one = eng.suggest_phrase("w0x w1x", max_errors=1, confidence=0.0,
                             size=20)
    # budget 1: every suggestion keeps one of the two typo slots
    assert one
    for p, _s, _h in one:
        a, b = p.split()
        assert (a == "w0x") != (b == "w1x")
    two = eng.suggest_phrase("w0x w1x", max_errors=2, confidence=0.0,
                             size=50)
    assert any(p == "w0 w1" for p, _s, _h in two)
    # fraction: 0.5 of 2 terms -> budget 1, identical to absolute 1
    frac = eng.suggest_phrase("w0x w1x", max_errors=0.5, confidence=0.0,
                              size=20)
    assert [(p, round(s, 9)) for p, s, _h in frac] == \
        [(p, round(s, 9)) for p, s, _h in one]


def test_suggest_phrase_confidence_and_refusals(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    assert eng.suggest_phrase("w0x w1", confidence=1e12) == []
    for bad in (dict(text=".,!"), dict(text="w0x", max_errors=0),
                dict(text="w0x", real_word_error_likelihood=1.0),
                dict(text="w0x", size=0)):
        with pytest.raises(ValueError):
            eng.suggest_phrase(**bad)


def test_suggest_phrase_collate(spark, built):
    idx, oracle = built
    eng = SearchEngine(spark, idx)
    # find two rare terms that never co-occur in a live doc
    pair = None
    for g in range(10):
        for h in range(10):
            if g == h:
                continue
            a, b = rare_term(g), rare_term(h)
            if not set(oracle.postings[a]) & set(oracle.postings[b]):
                pair = (a, b)
                break
        if pair:
            break
    assert pair, "fixture lost its disjoint rare groups"
    a, b = pair
    # transposition typo: its ONLY distance-1 neighbor is `b` itself,
    # so the correction can't be crowded out of the candidate cap by
    # same-distance higher-df siblings (rareterm1x's x->digit problem)
    typo = b[:6] + b[7] + b[6] + b[8:]
    text = f"{a} {typo}"
    plain = eng.suggest_phrase(text, size=20, confidence=0.0)
    assert any(p == f"{a} {b}" for p, _s, _h in plain)
    collated = eng.suggest_phrase(text, size=20, confidence=0.0,
                                  collate=True)
    assert all(p != f"{a} {b}" for p, _s, _h in collated)
    for p, _s, _h in collated:
        terms = p.split()
        docs = set(oracle.postings.get(terms[0], {}))
        for t in terms[1:]:
            docs &= set(oracle.postings.get(t, {}))
        assert docs, p
