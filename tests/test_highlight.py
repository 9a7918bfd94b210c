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


def _py_fragments(texts, dfs, n_docs, hits, terms, window, nf):
    """Python reference for search_highlight_fragments: one fragment per
    matched term (first occurrence), ranked idf desc / term asc, capped
    at nf, every query-term occurrence in the span <em>-wrapped."""
    present = sorted(t for t in set(terms) if t in dfs)
    out = []
    for doc_id, score in hits:
        toks = tokenize_py(texts[doc_id])
        cand = sorted(
            (-idf(n_docs, dfs[t]), t, toks.index(t))
            for t in present if t in toks
        )
        for rank, (_i, t, pos) in enumerate(cand[:nf], 1):
            a = max(0, pos - window)
            frag = " ".join(
                f"<em>{w}</em>" if w in present else w
                for w in toks[a: pos + window + 1]
            )
            out.append((doc_id, score, rank, t, pos, frag))
    return out


def test_highlight_fragments_match_python_reference(spark, built):
    eng = SearchEngine(spark, built)
    terms = ["w0", "w3"]
    hits = eng.search_topk(terms, "conjunctive", 8)
    texts = _stored_texts(spark, eng)
    dfs = eng.term_dfs(sorted(set(terms)))
    want = _py_fragments(texts, dfs, eng.n_docs_scoring, hits, terms,
                         WINDOW, nf=3)
    got = [
        (int(r["doc_id"]), float(r["score"]), int(r["frag_rank"]),
         r["term"], int(r["first_pos"]), r["fragment"])
        for r in eng.search_highlight_fragments(
            terms, "conjunctive", 8, window=WINDOW,
            number_of_fragments=3).collect()
    ]
    assert got == want
    # both matched terms produced fragments, every anchor term em-marked
    assert {r[3] for r in got} == {"w0", "w3"}
    assert all(f"<em>{r[3]}</em>" in r[5] for r in got)


def test_highlight_fragments_cap(spark, built):
    eng = SearchEngine(spark, built)
    terms = ["w0", "w1", "w2", "w3"]
    got = eng.search_highlight_fragments(
        terms, "conjunctive", 5, window=WINDOW,
        number_of_fragments=2).collect()
    per_doc: dict[int, int] = {}
    for r in got:
        per_doc[int(r["doc_id"])] = per_doc.get(int(r["doc_id"]), 0) + 1
    assert per_doc and all(n == 2 for n in per_doc.values())
    # rank 1 anchors the rarest matched term in every doc
    dfs = eng.term_dfs(terms)
    rarest = min(terms, key=lambda t: (dfs[t], t))
    assert all(r["term"] == rarest for r in got if r["frag_rank"] == 1)


def test_highlight_refused_without_positions(spark, tmp_path):
    pdf = gen_pages(60, seed=3)
    idx = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64, store_positions=False))
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="store_positions"):
        eng.search_highlight(["w0"], "disjunctive", 3)
