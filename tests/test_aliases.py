"""Index aliases (`_aliases` analogue, sources/aliases.py).

Contracts tested:
- add/resolve/remove round-trip; unregistered names resolve to themselves;
- the atomic remove+add swap (one update call, one file write);
- refusals: re-add to a different target without remove, mismatched
  `remove {index}`, unknown remove, nonexistent target dir, two-verb action;
- end-to-end blue/green: build v1, alias prod->v1, reindex to v2,
  `swap` — a search through the alias flips corpora with no config change
  (the zero-downtime promotion every ES reindex runbook ends with);
- CLI: conf names the ALIAS as index.dir; `alias swap` re-points what
  `search` queries.
"""

import datetime as dt
import io
import json
import os
from contextlib import redirect_stdout

import pytest

from picdexer_spark.index.build import IndexConfig
from picdexer_spark.query.bm25 import SearchEngine
from picdexer_spark.sources.aliases import AliasRegistry
from picdexer_spark.streaming.incremental import build_incremental

CFG = IndexConfig(shard_range=64)
PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, text string,"
                " lang string")


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), None, t, "en") for u, t in rows],
        PAGES_SCHEMA,
    )


# ---- registry unit ------------------------------------------------------

def test_registry_roundtrip_and_resolution(tmp_path):
    root = str(tmp_path)
    os.makedirs(tmp_path / "idx_v1")
    reg = AliasRegistry(root)
    assert reg.read() == {}
    # unregistered name resolves to itself under the root
    assert reg.resolve("idx_v1") == os.path.join(root, "idx_v1")
    reg.update([{"add": {"alias": "prod", "index": "idx_v1"}}])
    assert reg.resolve("prod") == os.path.join(root, "idx_v1")
    # re-add same target is a no-op, not an error (idempotent runbooks)
    reg.update([{"add": {"alias": "prod", "index": "idx_v1"}}])
    reg.update([{"remove": {"alias": "prod", "index": "idx_v1"}}])
    assert reg.read() == {}


def test_registry_refusals(tmp_path):
    root = str(tmp_path)
    os.makedirs(tmp_path / "idx_v1")
    os.makedirs(tmp_path / "idx_v2")
    reg = AliasRegistry(root)
    reg.update([{"add": {"alias": "prod", "index": "idx_v1"}}])
    # silent re-target without remove: refused (single-target invariant)
    with pytest.raises(ValueError, match="already points"):
        reg.update([{"add": {"alias": "prod", "index": "idx_v2"}}])
    # stale-runbook remove (wrong index named): refused
    with pytest.raises(ValueError, match="refusing the mismatched"):
        reg.update([{"remove": {"alias": "prod", "index": "idx_v2"}}])
    with pytest.raises(KeyError):
        reg.update([{"remove": {"alias": "nope"}}])
    with pytest.raises(FileNotFoundError):
        reg.update([{"add": {"alias": "x", "index": "missing_dir"}}])
    with pytest.raises(ValueError, match="one verb"):
        reg.update([{"add": {"alias": "a", "index": "idx_v1"},
                     "remove": {"alias": "prod"}}])
    # nothing above may have half-applied: prod still -> idx_v1, no x
    assert reg.read() == {"prod": "idx_v1"}


def test_swap_is_one_atomic_update(tmp_path):
    root = str(tmp_path)
    os.makedirs(tmp_path / "idx_v1")
    os.makedirs(tmp_path / "idx_v2")
    reg = AliasRegistry(root)
    reg.swap("prod", "idx_v1")  # swap on a fresh alias = plain add
    assert reg.read() == {"prod": "idx_v1"}
    reg.swap("prod", "idx_v2")
    assert reg.read() == {"prod": "idx_v2"}
    # a failed swap (bad target) leaves the registry untouched
    with pytest.raises(FileNotFoundError):
        reg.swap("prod", "missing_dir")
    assert reg.read() == {"prod": "idx_v2"}


# ---- blue/green end-to-end ---------------------------------------------

def test_blue_green_reindex_swap(spark, tmp_path):
    root = str(tmp_path)
    v1, v2 = os.path.join(root, "idx_v1"), os.path.join(root, "idx_v2")
    build_incremental(spark, _pages(spark, [
        ("u1", "bluecorpus alpha words"), ("u2", "bluecorpus beta words"),
    ]), v1, CFG, "s1")
    build_incremental(spark, _pages(spark, [
        ("u1", "greencorpus alpha words"), ("u3", "greencorpus gamma words"),
    ]), v2, CFG, "s1")

    reg = AliasRegistry(root)
    reg.swap("prod", "idx_v1")
    eng = SearchEngine(spark, reg.resolve("prod"))
    assert eng.search(["bluecorpus"], k=10).count() == 2
    assert eng.search(["greencorpus"], k=10).count() == 0

    reg.swap("prod", "idx_v2")  # the promotion: clients re-open and see v2
    eng2 = SearchEngine(spark, reg.resolve("prod"))
    assert eng2.search(["greencorpus"], k=10).count() == 2
    assert eng2.search(["bluecorpus"], k=10).count() == 0
    # the already-open engine keeps serving v1 (ES: in-flight PIT/scroll
    # contexts survive an alias swap; here the engine is snapshot-bound)
    assert eng.search(["bluecorpus"], k=10).count() == 2


def test_cli_search_through_alias(spark, tmp_path):
    root = str(tmp_path)
    v1, v2 = os.path.join(root, "idx_v1"), os.path.join(root, "idx_v2")
    build_incremental(spark, _pages(spark, [
        ("u1", "oldword common"), ("u2", "oldword common"),
    ]), v1, CFG, "s1")
    build_incremental(spark, _pages(spark, [
        ("u9", "newword common"),
    ]), v2, CFG, "s1")

    from picdexer_spark.cli import main

    conf = {"index": {"dir": os.path.join(root, "prod"), "shardRange": 64},
            "spark": {"master": "local[4]"}}
    cp = str(tmp_path / "conf.json")
    with open(cp, "w") as f:
        json.dump(conf, f)

    assert main(["alias", "-c", cp, "swap", "--alias", "prod",
                 "--index", "idx_v1"]) == 0
    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["search", "-c", cp, "-q", "oldword"]) == 0
    assert out.getvalue().count("\n") == 2

    assert main(["alias", "-c", cp, "swap", "--alias", "prod",
                 "--index", "idx_v2"]) == 0
    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["search", "-c", cp, "-q", "newword"]) == 0
    assert "u9" in out.getvalue()
    # list prints the current mapping
    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["alias", "-c", cp, "list"]) == 0
    assert out.getvalue().strip() == "prod\tidx_v2"


def test_search_indices_query_then_fetch(spark, tmp_path):
    """Cross-index search: per-index statistics (query_then_fetch), global
    top-k merge, stable (score, index, doc_id) order, name mapping."""
    from picdexer_spark.query.bm25 import SearchEngine, search_indices

    root = str(tmp_path)
    a, b = os.path.join(root, "idx_a"), os.path.join(root, "idx_b")
    # 'needle' is rare in idx_a (1/20 docs) and common in idx_b (5/5):
    # per-index idf must make the idx_a hit outrank every idx_b hit
    build_incremental(spark, _pages(spark, [
        ("a0", "needle in a big haystack of words"),
        *[(f"a{i}", f"plain haystack filler words {i}") for i in range(1, 20)],
    ]), a, CFG, "s1")
    build_incremental(spark, _pages(spark, [
        (f"b{i}", f"needle needle words {i}") for i in range(5)
    ]), b, CFG, "s1")

    got = search_indices(spark, [a, b], ["needle"], "disjunctive", k=4) \
        .collect()
    assert len(got) == 4
    assert got[0]["index"] == "idx_a"
    assert {r["index"] for r in got[1:]} == {"idx_b"}
    # per-index scores are bit-identical to single-index searches
    sa = {r["doc_id"]: r["score"]
          for r in SearchEngine(spark, a).search(["needle"], k=4).collect()}
    for r in got:
        if r["index"] == "idx_a":
            assert r["score"] == sa[r["doc_id"]]
    # named mapping + k cap + refusals
    named = search_indices(spark, {"blue": a, "green": b},
                           ["words"], k=3).collect()
    assert len(named) == 3 and {r["index"] for r in named} <= {"blue",
                                                               "green"}
    with pytest.raises(ValueError):
        search_indices(spark, [], ["x"])
    with pytest.raises(ValueError):
        search_indices(spark, [a, os.path.join(root, "..",
                                               os.path.basename(root),
                                               "idx_a")], ["x"])


def test_search_indices_dfs_matches_union_index(spark, tmp_path):
    """dfs_query_then_fetch: scores across two indexes must BIT-MATCH a
    single index built over the union corpus (same global df, docCount,
    blended avgdl — the ES DFS contract)."""
    from picdexer_spark.query.bm25 import SearchEngine, search_indices

    root = str(tmp_path)
    a, b, u = (os.path.join(root, n) for n in ("idx_a", "idx_b", "idx_u"))
    ra = [("a0", "needle in a big haystack of words"),
          *[(f"a{i}", f"plain haystack filler words {i}")
            for i in range(1, 20)]]
    rb = [(f"b{i}", f"needle needle words {i}") for i in range(5)]
    build_incremental(spark, _pages(spark, ra), a, CFG, "s1")
    build_incremental(spark, _pages(spark, rb), b, CFG, "s1")
    build_incremental(spark, _pages(spark, ra + rb), u, CFG, "s1")

    dfs = search_indices(spark, [a, b], ["needle", "haystack"], k=30,
                         stats="dfs_query_then_fetch").collect()
    eng_u = SearchEngine(spark, u)
    union = eng_u.search(["needle", "haystack"], k=30).collect()
    durl = {r["doc_id"]: r["url"] for r in
            eng_u.cat.read_live_docs(spark).select("doc_id", "url")
            .collect()}
    # per-index doc_ids differ from union ids — compare by url
    ab_urls = {}
    for name, d in (("idx_a", a), ("idx_b", b)):
        e = SearchEngine(spark, d)
        ab_urls[name] = {r["doc_id"]: r["url"] for r in
                         e.cat.read_live_docs(spark)
                         .select("doc_id", "url").collect()}
    got = sorted((ab_urls[r["index"]][r["doc_id"]], r["score"])
                 for r in dfs)
    want = sorted((durl[r["doc_id"]], r["score"]) for r in union)
    assert got == want  # bit-identical scores, same doc set
    # and it genuinely differs from per-index stats on this corpus
    qtf = search_indices(spark, [a, b], ["needle", "haystack"],
                         k=30).collect()
    assert sorted((ab_urls[r["index"]][r["doc_id"]], r["score"])
                  for r in qtf) != want
    with pytest.raises(ValueError):
        search_indices(spark, [a, b], ["x"], stats="nope")


def test_search_indices_dfs_groups_mode(spark, tmp_path):
    """groups-mode terms live in the kwarg, not `terms` — the DFS
    pre-phase must still collect their dfs (was a KeyError)."""
    from picdexer_spark.query.bm25 import search_indices

    root = str(tmp_path)
    a, b = os.path.join(root, "idx_a"), os.path.join(root, "idx_b")
    build_incremental(spark, _pages(spark, [
        ("a0", "needle haystack words"), ("a1", "plain words only")]),
        a, CFG, "s1")
    build_incremental(spark, _pages(spark, [
        ("b0", "needle words extra")]), b, CFG, "s1")
    got = search_indices(spark, [a, b], [], mode="groups",
                         groups=[["needle", "haystack"]], k=5,
                         stats="dfs_query_then_fetch").collect()
    assert len(got) == 2  # a0 and b0 match the disjunction group
