"""Boolean kuery: parentheses + explicit OR (the discover search box's
most-typed compound construct, reference kibana.ndjson:8).

- parse_kuery_tree accept/refuse boundaries (shapes whose ES scoring a CNF
  sum cannot reproduce are refused, never guessed);
- flat parse_kuery folds `lang:en OR lang:de` qualifier chains into one
  or-filter entry (previously the OR dropped and the filters silently
  ANDed — matching nothing);
- mode='groups' rank identity vs the brute-force CNF oracle, pruned and
  exhaustive paths bit-identical;
- degenerate shapes reduce to the flat kernels bit-for-bit;
- filter-OR + scored groups end-to-end through search_query_string;
- schema-driven typed filters (doc_len range, url exact) — accept +
  refuse by the docs-table schema, not an allowlist.
"""

import math

import pytest

from picdexer_spark.fixtures.pages import gen_pages, rare_term
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.query.parser import parse_kuery, parse_kuery_tree

N = 700


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=31)
    idx = str(tmp_path_factory.mktemp("boolidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    langs = {i: by_url.loc[u, "lang"] for i, u in enumerate(urls)}
    return idx, oracle, langs


# ---------------------------------------------------------------- parser --

def test_tree_parses_scored_groups():
    assert parse_kuery_tree("(Batch, OR vector) AND spark") == (
        [["batch", "vector"], ["spark"]], None)
    assert parse_kuery_tree("(a OR b) AND (c OR d) AND e") == (
        [["a", "b"], ["c", "d"], ["e"]], None)
    # nested same-op parens flatten; adjacency = OR (default_operator)
    assert parse_kuery_tree("((a OR b))") == ([["a", "b"]], None)
    assert parse_kuery_tree("(a b) AND c") == ([["a", "b"], ["c"]], None)
    # prefix/fuzzy markers survive into their group
    assert parse_kuery_tree("(s* OR dup) AND spark") == (
        [["s*", "dup"], ["spark"]], None)
    # in-group duplicates dedupe (flat disjunctive dedupes too)
    assert parse_kuery_tree("(a OR a OR b) AND c") == (
        [["a", "b"], ["c"]], None)


def test_tree_parses_filter_groups():
    assert parse_kuery_tree("(lang:en OR lang:de) AND spark") == (
        [["spark"]],
        ("or", [("leaf", ("lang", "=", "en")),
                ("leaf", ("lang", "=", "de"))]))
    groups, fast = parse_kuery_tree(
        'NOT (lang:en OR lang:de) AND (a OR b) AND c')
    assert groups == [["a", "b"], ["c"]]
    assert fast == ("not", ("or", [("leaf", ("lang", "=", "en")),
                                   ("leaf", ("lang", "=", "de"))]))
    # range leaves participate in filter groups
    assert parse_kuery_tree(
        '(warc_ts >= "2024-01-01" OR lang:de) AND dup') == (
        [["dup"]],
        ("or", [("leaf", ("warc_ts", ">=", "2024-01-01")),
                ("leaf", ("lang", "=", "de"))]))
    # filter-only boolean query: no scored groups
    assert parse_kuery_tree("(lang:en OR lang:de)") == (
        [], ("or", [("leaf", ("lang", "=", "en")),
                    ("leaf", ("lang", "=", "de"))]))


def test_tree_refusals():
    bad = [
        "(a AND b) OR c",          # DNF — per-clause sums diverge
        "(a OR (b AND c))",        # AND inside an OR group
        "(lang:en OR batch)",      # constant-score SHOULD mix
        "(NOT a) AND b",           # NOT over scored terms
        '("x y") AND c',           # phrase inside a group
        "(a",                      # unbalanced
        "(a OR b))",               # unbalanced
        "(a OR *) AND b",          # match-all inside an OR group
        "(a OR b) AND a",          # duplicate term across groups
        "(lang: OR x)",            # malformed qualifier
        "(a OR ) AND b",           # dangling operator
        "() AND a",                # empty group
    ]
    for q in bad:
        with pytest.raises(ValueError):
            parse_kuery_tree(q)


def test_flat_qualifier_or_folds_filters():
    # previously: OR dropped into the scored remainder, the two filters
    # silently ANDed -> matched nothing
    assert parse_kuery("lang:en OR lang:de") == (
        [], "disjunctive",
        [("or", [("lang", "=", "en"), ("lang", "=", "de")])])
    assert parse_kuery("lang:en OR lang:de OR lang:fr batch") == (
        ["batch"], "disjunctive",
        [("or", [("lang", "=", "en"), ("lang", "=", "de"),
                 ("lang", "=", "fr")])])
    # the pinned flat convention is untouched: word-OR chains score,
    # qualifiers AND
    assert parse_kuery("lang:de Batch, OR vector OR spark") == (
        ["batch", "vector", "spark"], "disjunctive", [("lang", "=", "de")])
    # qualifier-OR-word stays ambiguous -> refuse with a parens hint
    with pytest.raises(ValueError, match="parentheses"):
        parse_kuery("lang:en OR batch")


# ---------------------------------------------------------------- engine --

def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _want(pairs):
    return [(d, round(s, 9)) for d, s in pairs]


GROUP_SHAPES = [
    [["w1", "w2"], ["w3"]],
    [["w0", "w1"], ["w2", "w3"], ["w5"]],
    [[rare_term(0), "w1"], ["w0"]],
    [["w7", rare_term(1)], ["w2", rare_term(2)]],
    [["w1", "zzz-nope"], ["w2"]],          # absent term inside a group
]


def test_groups_rank_identity(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    for groups in GROUP_SHAPES:
        flat = [t for g in groups for t in g]
        want = _want(oracle.search_groups(groups, k=10))
        got = _rows(eng.search(flat, "groups", 10, groups=groups))
        assert got == want, groups
        # pruned and exhaustive paths bit-identical
        got_np = _rows(eng.search(flat, "groups", 10, prune=False,
                                  groups=groups))
        assert got_np == got, groups


def test_groups_required_group_absent(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    got = eng.search(["w1", "zzz-nope"], "groups", 10,
                     groups=[["w1"], ["zzz-nope"]])
    assert got.count() == 0


def test_groups_degenerate_shapes_match_flat_kernels(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    one = _rows(eng.search(["w1", "w2"], "groups", 10,
                           groups=[["w1", "w2"]]))
    assert one == _rows(eng.search(["w1", "w2"], "disjunctive", 10))
    singles = _rows(eng.search(["w1", "w2"], "groups", 10,
                               groups=[["w1"], ["w2"]]))
    assert singles == _rows(eng.search(["w1", "w2"], "conjunctive", 10))


def test_groups_duplicate_across_groups_refused(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="one boolean group"):
        eng.search(["w1", "w1"], "groups", 10, groups=[["w1"], ["w1"]])


def test_groups_search_after_pages_concatenate(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    groups = [["w0", "w1"], ["w2", "w3"]]
    flat = [t for g in groups for t in g]
    big = _rows(eng.search(flat, "groups", 10, groups=groups))
    p1 = _rows(eng.search(flat, "groups", 5, groups=groups))
    cursor = (p1[-1][1], p1[-1][0])
    p2 = _rows(eng.search(flat, "groups", 5, groups=groups, after=cursor))
    assert p1 + p2 == big


def test_query_string_boolean_e2e(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.search_query_string("(w1 OR w2) AND w3", 10))
    assert got == _want(oracle.search_groups([["w1", "w2"], ["w3"]], 10))


def test_query_string_filter_or_e2e(spark, built):
    idx, oracle, langs = built
    eng = SearchEngine(spark, idx)
    got = _rows(eng.search_query_string("(lang:en OR lang:de) AND w1 AND w2", 10))
    allowed = {i for i, lg in langs.items() if lg in ("en", "de")}
    want = [(d, s) for d, s in
            oracle.search_groups([["w1"], ["w2"]], k=oracle.n_docs)
            if d in allowed][:10]
    assert got == _want(want)
    # bare qualifier-OR (no parens) goes through the flat fold — same docs
    got2 = _rows(eng.search_query_string("lang:en OR lang:de w1 AND w2", 10))
    assert got2 == _want(want)


def test_query_string_prefix_inside_group(spark, built):
    """(w1* OR rareterm0) AND w2 — the prefix expands INSIDE its group
    (Lucene top_terms rewrite within a MUST clause)."""
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    exp = eng.expand_prefix("w11")  # w11, w110..w119 (vocab w0..w9999)
    assert len(exp) > 1
    got = _rows(eng.search_query_string(
        f"(w11* OR {rare_term(0)}) AND w2", 10))
    want = oracle.search_groups([sorted(set(exp) | {rare_term(0)}), ["w2"]],
                                k=10)
    assert got == _want(want)


def test_groups_randomized_shapes_rank_identity(spark, built):
    """Randomized sweep: 25 seeded random CNF shapes (1-4 groups, 1-3
    terms each, head/torso/rare mix incl. absent terms) must all be
    rank-identical to the brute-force oracle, pruned and exhaustive."""
    import random

    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    vocab = (["w%d" % i for i in range(0, 40, 3)]
             + [rare_term(g) for g in range(4)] + ["zz-absent"])
    rng = random.Random(97)
    nonempty = 0
    for trial in range(25):
        n_groups = rng.randint(1, 4)
        pool = vocab[:]
        rng.shuffle(pool)
        groups, used = [], 0
        for _g in range(n_groups):
            k = rng.randint(1, 3)
            groups.append(pool[used:used + k])
            used += k
        flat = [t for g in groups for t in g]
        want = _want(oracle.search_groups(groups, k=10))
        got = _rows(eng.search(flat, "groups", 10, groups=groups))
        assert got == want, (trial, groups)
        got_np = _rows(eng.search(flat, "groups", 10, prune=False,
                                  groups=groups))
        assert got_np == got, (trial, groups)
        nonempty += bool(want)
    assert nonempty >= 12  # the sweep wasn't vacuous


def test_match_ids_groups(spark, built):
    """A boolean query-bar query drives the dashboard panels: match_ids
    in groups mode returns the FULL CNF match set, with and without a
    filter-OR tree."""
    idx, oracle, langs = built
    eng = SearchEngine(spark, idx)
    groups = [["w1", "w2"], ["w3"]]
    flat = [t for g in groups for t in g]
    got = {int(r["doc_id"])
           for r in eng.match_ids(flat, "groups", groups=groups).collect()}
    want = {d for d, _ in oracle.search_groups(groups, k=oracle.n_docs)}
    assert got and got == want
    fast = ("or", [("leaf", ("lang", "=", "en")),
                   ("leaf", ("lang", "=", "de"))])
    got2 = {int(r["doc_id"])
            for r in eng.match_ids(flat, "groups", filters=fast,
                                   groups=groups).collect()}
    assert got2 == {d for d in want if langs[d] in ("en", "de")}


def test_groups_exclude_tombstones(spark, tmp_path):
    """Boolean searches ride the same tombstone plumbing: after
    delete_by_query, groups-mode results contain no deleted doc."""
    from picdexer_spark.streaming.incremental import delete_by_query

    pdf = gen_pages(200, seed=53)
    idx = str(tmp_path / "gtomb")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64))
    eng = SearchEngine(spark, idx)
    groups = [["w0", "w1"], ["w2"]]
    before = _rows(eng.search(["w0", "w1", "w2"], "groups", 20,
                              groups=groups))
    assert before
    n = delete_by_query(spark, idx, ["w2"], "disjunctive")
    assert n > 0  # every group-match doc contains w2 -> all tombstoned
    eng2 = SearchEngine(spark, idx)
    after = _rows(eng2.search(["w0", "w1", "w2"], "groups", 20,
                              groups=groups))
    assert after == []


# ------------------------------------------------------ schema filters --

def test_typed_filters_schema_driven(spark, built):
    idx, oracle, langs = built
    eng = SearchEngine(spark, idx)
    # numeric range over doc_len (a bigint docs column)
    got = _rows(eng.search_query_string("doc_len >= 300 w1 OR w2", 10))
    allowed = {d for d, n in oracle.doc_len.items() if n >= 300}
    want = [(d, s) for d, s in
            oracle.search(["w1", "w2"], "disjunctive", k=oracle.n_docs)
            if d in allowed][:10]
    assert got == _want(want)
    # exact match on a non-lang string field (url)
    urls = sorted({f"https://site{s}.example/p/{i}"
                   for i, s in [(5, 1)]})  # deterministic fixture url shape
    # find doc 5's url by probing the docs table
    row = eng.cat.read_live_docs(spark, eng.snapshot_id) \
        .filter("doc_id = 5").select("url").first()
    got = eng.search_query_string(f'url:"{row["url"]}" w1 OR w2', 10)
    ids = [r["doc_id"] for r in got.collect()]
    assert ids in ([], [5])  # doc 5 iff it contains w1 or w2


def test_typed_filter_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="unknown filter field"):
        eng.search_query_string("nope:1 w1", 10)
    with pytest.raises(ValueError, match="ordered field"):
        eng.search_query_string("lang >= en w1", 10)
    with pytest.raises(ValueError, match="unparsable"):
        eng.search_query_string("doc_len >= abc w1", 10)
    with pytest.raises(ValueError, match="unparsable"):
        eng.search_query_string('warc_ts >= "not-a-ts" w1', 10)
