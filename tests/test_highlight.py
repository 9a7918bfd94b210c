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
    """Python reference for search_highlight_fragments: one anchor span
    per matched term (first occurrence), OVERLAPPING spans merged
    transitively into passages, passages ranked (sum-of-anchor-idfs
    desc, top term asc), capped at nf, every query-term occurrence in
    the passage <em>-wrapped."""
    present = sorted(t for t in set(terms) if t in dfs)
    out = []
    for doc_id, score in hits:
        toks = tokenize_py(texts[doc_id])
        anchors = sorted(
            (toks.index(t), t, idf(n_docs, dfs[t]))
            for t in present if t in toks
        )
        passages = []  # [start, end, [(pos, term, idf), ...]]
        for pos, t, w in anchors:
            s, e = max(0, pos - window), pos + window
            if passages and s <= passages[-1][1]:
                passages[-1][1] = max(passages[-1][1], e)
                passages[-1][2].append((pos, t, w))
            else:
                passages.append([s, e, [(pos, t, w)]])
        ranked = []
        for s, e, members in passages:
            score_p = sum(w for _p, _t, w in members)
            _p, top_t, _w = min(members, key=lambda m: (-m[2], m[1]))
            top_pos = next(p for p, t, _ in members if t == top_t)
            ranked.append((-score_p, top_t, top_pos, s, e))
        ranked.sort()
        for rank, (_ns, t, pos, s, e) in enumerate(ranked[:nf], 1):
            frag = " ".join(
                f"<em>{w}</em>" if w in present else w
                for w in toks[s: e + 1]
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
    # every passage's top term is em-marked inside its own fragment
    assert {r[3] for r in got} <= {"w0", "w3"}
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
    # merging can leave fewer passages than the cap, never more
    assert per_doc and all(1 <= n <= 2 for n in per_doc.values())
    # rank-1 equals the python reference's top passage per doc
    texts = _stored_texts(spark, eng)
    dfs = eng.term_dfs(terms)
    hits = eng.search_topk(terms, "conjunctive", 5)
    want = _py_fragments(texts, dfs, eng.n_docs_scoring, hits, terms,
                         WINDOW, nf=2)
    top_want = {d: t for d, _s, rk, t, _p, _f in want if rk == 1}
    assert all(r["term"] == top_want[int(r["doc_id"])]
               for r in got if r["frag_rank"] == 1)


def test_highlight_fragments_merge_overlap(spark, built):
    """The edge fixture doc 'qqedge w0 w1 w2 w3' makes qqedge@0 (span
    [0,2]) and w3@4 (span [2,6]) overlap at token 2: they must merge
    into ONE passage [0,4] covering the whole doc, top term = qqedge
    (rarest), both query terms em-wrapped — the unified highlighter's
    passage merging."""
    eng = SearchEngine(spark, built)
    rows = eng.search_highlight_fragments(
        ["qqedge", "w3"], "conjunctive", 5, window=WINDOW,
        number_of_fragments=3).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    texts = _stored_texts(spark, eng)
    start_doc = next(d for d, t in texts.items()
                     if t == "qqedge w0 w1 w2 w3")
    frags = by_doc[start_doc]
    assert len(frags) == 1                       # merged, not two spans
    f = frags[0]
    assert f["term"] == "qqedge" and int(f["first_pos"]) == 0
    assert f["fragment"] == "<em>qqedge</em> w0 w1 w2 <em>w3</em>"


def test_highlight_refused_without_positions(spark, tmp_path):
    pdf = gen_pages(60, seed=3)
    idx = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=64, store_positions=False))
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="store_positions"):
        eng.search_highlight(["w0"], "disjunctive", 3)
