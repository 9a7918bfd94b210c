"""ES percolate — reverse search (stored queries vs incoming docs).

Pins: conj/disj(msm)/phrase semantics vs a brute-force python oracle on
a seeded corpus slice; the doc side is broadcast (plan-checked) so the
stored-query table never shuffles; unknown modes fail the job loudly;
empty term lists match nothing.
"""

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.functions.tokenize import tokenize_py
from picdexer_spark.query.percolate import percolate


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = gen_pages(120, seed=31)
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    rows = [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


QUERIES = [
    (1, ["w0", "w3"], "conjunctive", None),
    (2, ["w0", "w3"], "disjunctive", 1),
    (3, ["w0", "w3", "w11"], "disjunctive", 2),
    (4, ["w0", "w1"], "phrase", None),
    (5, [], "conjunctive", None),
]


def _py_percolate(rows):
    out = set()
    for doc_id, text in rows:
        toks = tokenize_py(text)
        tset = set(toks)
        pad = " " + " ".join(toks) + " "
        for qid, terms, mode, msm in QUERIES:
            if not terms:
                continue
            n = len(tset & set(terms))
            if mode == "conjunctive":
                hit = n == len(terms)
            elif mode == "disjunctive":
                hit = n >= (msm or 1)
            else:
                hit = (" " + " ".join(terms) + " ") in pad
            if hit:
                out.add((qid, doc_id))
    return out


def test_percolate_matches_python_oracle(spark, corpus):
    docs, rows = corpus
    qs = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>, mode string, msm int")
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(qs, docs).collect()}
    want = _py_percolate(rows)
    assert got == want
    # every mode actually fired and the msm=2 query is a strict subset
    fired = {q for q, _ in got}
    assert {1, 2, 3, 4} <= fired
    assert {d for q, d in got if q == 3} < {d for q, d in got if q == 2} \
        | {d for q, d in got if q == 3}


def test_percolate_broadcasts_the_doc_side(spark, corpus):
    docs, _ = corpus
    qs = spark.createDataFrame(
        QUERIES, "query_id long, terms array<string>, mode string, msm int")
    plan = percolate(qs, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # the query side must never shuffle


def test_percolate_unknown_mode_fails_loudly(spark, corpus):
    docs, _ = corpus
    bad = spark.createDataFrame(
        [(9, ["w0"], "bogus", None)],
        "query_id long, terms array<string>, mode string, msm int")
    with pytest.raises(Exception, match="unknown percolate mode"):
        percolate(bad, docs).collect()
