"""Highlighting: term_offsets (the positional-payload term-vector read)
and search_highlight (ES highlight block on discover hits).

- offsets are exact vs python re-tokenization of the stored text;
- snippet window semantics pinned vs a python reference, including the
  clamped edges (term at doc start / doc end);
- phrase-mode hits highlight too; an index without positions refuses
  driver-side.
"""

import pandas as pd
import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.query.bm25 import SearchEngine, idf

N = 250
WINDOW = 2


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=19)
    # force edge cases: rare term at doc START and at doc END
    extra = pd.DataFrame([
        {"url": "zzz://edge-start", "warc_ts": pdf["warc_ts"].iloc[0],
         "html": None, "text": "qqedge w0 w1 w2 w3", "lang": "en"},
        {"url": "zzz://edge-end", "warc_ts": pdf["warc_ts"].iloc[0],
         "html": None, "text": "w0 w1 w2 w3 qqedge", "lang": "en"},
    ])
    pdf = pd.concat([pdf, extra], ignore_index=True)
    idx = str(tmp_path_factory.mktemp("hlidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64, store_positions=True))
    return idx


def _stored_texts(spark, eng):
    return {
        int(r["doc_id"]): r["text"]
        for r in eng.cat.read_live_docs(spark, eng.snapshot_id)
        .select("doc_id", "text").collect()
    }


def _py_highlight(texts, dfs, n_docs, hits, terms, window):
    out = []
    for doc_id, score in hits:
        toks = tokenize_py(texts[doc_id])
        cand = []
        for t in sorted(set(terms)):
            if t in dfs and t in toks:
                cand.append((-idf(n_docs, dfs[t]), t, toks.index(t)))
        cand.sort()
        _, best, pos = cand[0]
        a = max(0, pos - window)
        out.append((doc_id, score, best, pos,
                    " ".join(toks[a: pos + window + 1])))
    return out


def test_term_offsets_exact(spark, built):
    eng = SearchEngine(spark, built)
    texts = _stored_texts(spark, eng)
    some = sorted(texts)[:40]
    m = spark.createDataFrame([(i,) for i in some], "doc_id long")
    got = {}
    for r in eng.term_offsets(["w0", "w5"], m).collect():
        got.setdefault((r["doc_id"], r["term"]), []).append(r["pos"])
    for d in some:
        toks = tokenize_py(texts[d])
        for t in ("w0", "w5"):
            want = [i for i, x in enumerate(toks) if x == t]
            assert sorted(got.get((d, t), [])) == want, (d, t)


def test_search_highlight_matches_python_reference(spark, built):
    eng = SearchEngine(spark, built)
    texts = _stored_texts(spark, eng)
    terms = ["w2", "w30"]
    hits = [(int(r["doc_id"]), float(r["score"]))
            for r in eng.search(terms, "disjunctive", 8).collect()]
    dfs = eng.term_dfs(sorted(set(terms)))
    want = _py_highlight(texts, dfs, eng.n_docs, hits, terms, WINDOW)
    got = [(int(r["doc_id"]), float(r["score"]), r["best_term"],
            int(r["first_pos"]), r["snippet"])
           for r in eng.search_highlight(terms, "disjunctive", 8,
                                         window=WINDOW).collect()]
    assert got == want


def test_highlight_edge_clamping(spark, built):
    """qqedge occurs at token 0 of one doc and at the last token of
    another: the snippet window must clamp, never re-center or pad."""
    eng = SearchEngine(spark, built)
    got = {r["first_pos"]: r["snippet"]
           for r in eng.search_highlight(["qqedge"], "disjunctive", 5,
                                         window=WINDOW).collect()}
    assert got[0] == "qqedge w0 w1"          # doc-start clamp
    assert got[4] == "w2 w3 qqedge"          # doc-end clamp


def test_highlight_phrase_mode(spark, built):
    eng = SearchEngine(spark, built)
    rows = eng.search_highlight(["w0", "w1"], "phrase", 5,
                                window=WINDOW).collect()
    phits = [(int(r["doc_id"]), float(r["score"]))
             for r in eng.search(["w0", "w1"], "phrase", 5).collect()]
    assert [(int(r["doc_id"]), float(r["score"])) for r in rows] == phits


def test_highlight_refused_without_positions(spark, tmp_path):
    pdf = gen_pages(60, seed=3)
    idx = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64, store_positions=False))
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="store_positions"):
        eng.search_highlight(["w0"], "disjunctive", 3)
