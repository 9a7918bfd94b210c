"""ES sampler / diversified_sampler scope + significant_text agg.

Pinned against brute-force compositions of the python oracle:

- sampler: top shard_size by (score desc, doc_id asc) WITHIN each
  doc-range shard — not a global top-k (exercised: shards whose local
  head would lose a global cut still contribute);
- diversified_sampler: per-(shard, field value) cap applied BEFORE the
  per-shard cut; caps exercised so the diversified sample differs from
  the plain one;
- significant_text: JLH over the scoped fg; filter_duplicate_text
  counts byte-identical texts once (whole-doc digest pin);
  sample_shard_size scopes fg to the sampler output.
"""

import math

import pytest

from picdexer_spark.fixtures.pages import gen_pages
from picdexer_spark.index.build import IndexConfig, build_index
from picdexer_spark.oracle.reference import OracleIndex
from picdexer_spark.query.bm25 import SearchEngine

N = 600
SHARD = 128
TERMS = ["w0", "w3", "w11"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=67)
    # plant exact-duplicate texts (3 copies) carrying a rare marker
    # token, so filter_duplicate_text has something real to collapse;
    # the build extracts from html, so re-wrap those rows' html too
    from picdexer_spark.functions.extract import wrap_html_series

    dup_text = "dupmarker shared boilerplate w0 page " * 3
    rows = [5, 210, 470]
    pdf.loc[rows, "text"] = dup_text
    pdf.loc[rows, "html"] = wrap_html_series(
        pdf.loc[rows, "text"], pdf.loc[rows, "url"])
    idx = str(tmp_path_factory.mktemp("samplidx"))
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(shard_range=SHARD, store_positions=True))
    urls = sorted(pdf["url"])
    by_url = pdf.set_index("url")
    oracle = OracleIndex(
        [(i, by_url.loc[u, "text"]) for i, u in enumerate(urls)]
    )
    langs = {i: by_url.loc[u, "lang"] for i, u in enumerate(urls)}
    return idx, oracle, langs


def _rows(df):
    return sorted((r["doc_id"], round(r["score"], 9)) for r in df.collect())


def _brute_sample(oracle, terms, shard_size, langs=None, cap=None):
    full = oracle.search(terms, "disjunctive", N)
    shards: dict[int, list[tuple[int, float]]] = {}
    for d, s in full:
        shards.setdefault(d // SHARD, []).append((d, s))
    out = []
    for rows in shards.values():
        rows.sort(key=lambda x: (-x[1], x[0]))
        if cap is not None:
            seen: dict[str, int] = {}
            kept = []
            for d, s in rows:
                v = langs[d]
                if seen.get(v, 0) < cap:
                    seen[v] = seen.get(v, 0) + 1
                    kept.append((d, s))
            rows = kept
        out.extend(rows[:shard_size])
    return sorted((d, round(s, 9)) for d, s in out)


def test_sampler_is_per_shard(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    want = _brute_sample(oracle, TERMS, 3)
    got = _rows(eng.sampler(TERMS, shard_size=3))
    assert got == want and got
    # per-shard, NOT global: a global top-|sample| cut picks a
    # different doc set on this corpus
    full = sorted(oracle.search(TERMS, "disjunctive", N),
                  key=lambda x: (-x[1], x[0]))
    glob = sorted((d, round(s, 9)) for d, s in full[:len(want)])
    assert got != glob


def test_diversified_sampler(spark, built):
    idx, oracle, langs = built
    eng = SearchEngine(spark, idx)
    want = _brute_sample(oracle, TERMS, 4, langs, cap=1)
    got = _rows(eng.sampler(TERMS, shard_size=4,
                            field_col="lang", max_docs_per_value=1))
    assert got == want and got
    assert got != _rows(eng.sampler(TERMS, shard_size=4))  # cap bites


def test_sampler_refusals(spark, built):
    idx, _, _ = built
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError):
        eng.sampler(TERMS, shard_size=0)
    with pytest.raises(ValueError):
        eng.sampler(TERMS, field_col="lang")  # cap missing
    with pytest.raises(ValueError):
        eng.sampler(TERMS, max_docs_per_value=2)  # field missing
    with pytest.raises(ValueError):
        eng.sampler(TERMS, field_col="lang", max_docs_per_value=0)


def _brute_jlh(oracle, fg_ids, k=10):
    n_fg, n = len(fg_ids), oracle.n_docs
    out = []
    terms = {t for d in fg_ids for t in oracle.tokens[d]}
    for t in terms:
        fg_df = sum(1 for d in fg_ids if oracle.postings[t].get(d))
        bg_df = oracle.df(t)
        fgp, bgp = fg_df / n_fg, bg_df / n
        if fgp > bgp:
            out.append((t, fg_df, bg_df, round((fgp - bgp) * (fgp / bgp), 9)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:k]


def test_significant_text_filter_duplicate(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    match = {d for d, _ in oracle.search(["dupmarker"], "disjunctive", N)}
    assert len(match) == 3
    # dedup keeps the lowest doc_id of the identical-text trio
    want = _brute_jlh(oracle, {min(match)})
    got = [(r["term"], r["fg_df"], r["bg_df"], round(r["score"], 9))
           for r in eng.significant_text(["dupmarker"],
                                         filter_duplicate_text=True)
           .collect()]
    assert got == want and got
    # and WITHOUT the filter the trio all count (different fg sizes)
    got_all = [(r["term"], r["fg_df"])
               for r in eng.significant_text(["dupmarker"]).collect()]
    assert any(fg == 3 for _, fg in got_all)


def test_significant_text_sampled(spark, built):
    idx, oracle, _ = built
    eng = SearchEngine(spark, idx)
    fg = {d for d, _ in _brute_sample(oracle, TERMS, 2)}
    want = _brute_jlh(oracle, fg)
    got = [(r["term"], r["fg_df"], r["bg_df"], round(r["score"], 9))
           for r in eng.significant_text(TERMS, sample_shard_size=2)
           .collect()]
    assert got == want and got
