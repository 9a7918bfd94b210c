"""search_after deep pagination (the ES contract: each page costs O(k)
per shard — the cursor filters inside the shard kernels before top-k
selection, so no page ever materializes offset+k docs).

- paging through the WHOLE result set in small pages reproduces the
  single big top-N bit-for-bit, for every mode, pruned and unpruned,
  with and without filters;
- an exact score TIE at a page boundary pages correctly (doc_id
  tie-break side of the cursor);
- the filter-only constant-score path pages by doc_id.
"""

import pandas as pd
import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.query.bm25 import SearchEngine

N = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=29)
    # two IDENTICAL docs -> guaranteed exact score tie on any query both
    # match (same tf, same dl)
    twin = "w3 w9 w3 w777 w12"
    extra = pd.DataFrame([
        {"url": "zzz://twin-a", "warc_ts": pdf["warc_ts"].iloc[0],
         "html": None, "text": twin, "lang": "en"},
        {"url": "zzz://twin-b", "warc_ts": pdf["warc_ts"].iloc[0],
         "html": None, "text": twin, "lang": "en"},
    ])
    pdf = pd.concat([pdf, extra], ignore_index=True)
    idx = str(tmp_path_factory.mktemp("pageidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=128, store_positions=True))
    return idx


def _page_all(eng, terms, mode, page, total, prune=True, filters=()):
    out, after = [], None
    while len(out) < total:
        rows = eng.search_filtered(terms, mode, list(filters), page,
                                   prune=prune, after=after) \
            if filters else \
            eng.search(terms, mode, page, prune=prune, after=after)
        got = [(int(r["doc_id"]), float(r["score"])) for r in rows.collect()]
        if not got:
            break
        out.extend(got)
        # cursor is in SORT-KEY order (score, doc_id) — the ES
        # search_after array for sort [_score, doc_id]
        after = (got[-1][1], got[-1][0])
    return out


@pytest.mark.parametrize("mode,terms", [
    ("disjunctive", ["w1", "w6"]),
    ("conjunctive", ["w2", "w5"]),
    ("phrase", ["w3", "w9"]),
])
def test_paging_equals_big_topn(spark, built, mode, terms):
    eng = SearchEngine(spark, built)
    full = eng.search_topk(terms, mode, 60)
    for page in (7, 10):
        paged = _page_all(eng, terms, mode, page, len(full))
        assert paged[:len(full)] == full, (mode, page)
    # unpruned path pages identically (bulk disjunctive / no-θ conj)
    paged_np = _page_all(eng, terms, mode, 9, len(full), prune=False)
    assert paged_np[:len(full)] == full


def test_paging_across_exact_tie(spark, built):
    """The twin docs tie exactly; k=1 pages must walk doc_id asc through
    the tie without skipping or repeating."""
    eng = SearchEngine(spark, built)
    full = eng.search_topk(["w777"], "disjunctive", 10)
    twins = [p for p in full if p[1] == full[0][1]]
    assert len(twins) == 2 and twins[0][1] == twins[1][1]
    paged = _page_all(eng, ["w777"], "disjunctive", 1, len(full))
    assert paged == full


def test_paging_filtered_and_match_all(spark, built):
    eng = SearchEngine(spark, built)
    filt = [("lang", "en")]
    full = [(int(r["doc_id"]), float(r["score"]))
            for r in eng.search_filtered(["w1", "w6"], "disjunctive",
                                         filt, 40).collect()]
    paged = _page_all(eng, ["w1", "w6"], "disjunctive", 6, len(full),
                      filters=filt)
    assert paged[:len(full)] == full
    # filter-only constant-score: cursor walks doc_id
    p1 = eng.search_filtered([], "disjunctive", filt, 5).collect()
    p2 = eng.search_filtered([], "disjunctive", filt, 5,
                             after=(1.0, int(p1[-1]["doc_id"]))).collect()
    ids = [int(r["doc_id"]) for r in p1 + p2]
    assert ids == sorted(set(ids)) and len(ids) == 10
