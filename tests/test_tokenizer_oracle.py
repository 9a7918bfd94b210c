"""Tokenizer golden vectors + oracle BM25 hand-computed micro-corpus
(FIXTURES.md §4), plus extraction inverse property."""

import math

import pandas as pd

from picdexer_spark.functions.extract import (
    extract_text_series,
    wrap_html_series,
)
from picdexer_spark.functions.tokenize import term_freqs_py, tokenize_py
from picdexer_spark.oracle.reference import B, K1, OracleIndex


def test_tokenizer_golden():
    assert tokenize_py("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize_py("a-b_c d.e") == ["a", "b", "c", "d", "e"]
    assert tokenize_py("") == []
    assert tokenize_py("   ") == []
    assert tokenize_py("ALLCAPS MiXeD") == ["allcaps", "mixed"]
    assert tokenize_py("x1y2 3z") == ["x1y2", "3z"]
    assert tokenize_py(None) == []


def test_term_freqs():
    assert term_freqs_py("a b a B") == {"a": 2, "b": 2}


def _bm25_hand(tf, df, n, dl, avgdl):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_bm25_micro_corpus():
    # 3-doc corpus, hand-checkable
    docs = [(0, "cat dog"), (1, "cat cat fish"), (2, "dog dog dog bird")]
    idx = OracleIndex(docs)
    assert idx.n_docs == 3
    assert idx.avgdl == (2 + 3 + 4) / 3
    assert idx.df("cat") == 2 and idx.df("dog") == 2 and idx.df("bird") == 1
    # score of 'cat' in doc 1: tf=2, dl=3
    expect = _bm25_hand(2, 2, 3, 3, 3.0)
    assert abs(idx.score_one("cat", 1) - expect) < 1e-12
    top = idx.search(["cat"], "disjunctive", 10)
    assert [d for d, _ in top] == [1, 0]
    # conjunctive
    assert [d for d, _ in idx.search(["cat", "dog"], "conjunctive", 10)] == [0]
    assert idx.search(["nosuch"], "disjunctive", 10) == []
    assert idx.search(["cat", "nosuch"], "conjunctive", 10) == []


def test_tie_break_doc_id_asc():
    docs = [(5, "x y"), (3, "x y"), (9, "x y")]  # identical docs -> tied scores
    idx = OracleIndex(docs)
    assert [d for d, _ in idx.search(["x"], "disjunctive", 3)] == [3, 5, 9]


def test_extract_inverse():
    texts = pd.Series(
        ["plain words here", "with & ampersand < tag > 'q' \"dq\"", "", "a  b",
         # real web text spans newlines: without DOTALL extraction the '.'
         # never crosses '\n' and these rows silently became None
         "line one\nline two", "para\n\npara\r\nwindows line"]
    )
    urls = pd.Series([f"https://site{i}.example/p/{i}" for i in range(len(texts))])
    html = wrap_html_series(texts, urls)
    back = extract_text_series(html)
    assert list(back) == list(texts)
    # it's a real wrapper: boilerplate surrounds the (escaped) text
    assert html[0].startswith(b"<html><head><title>") and b"<nav>" in html[0]
    assert texts[0].encode() in html[0]
    assert b"&amp;" in html[1] and b"&lt;" in html[1]


def test_extract_jvm_column_twin_parity(spark):
    """The all-JVM extract_text_col must match the pandas
    extract_text_series/extract_pages_batches semantics ROW-FOR-ROW,
    including the edges: multiline bodies, all five entities, empty
    article, no-article html, null html with/without incoming text."""
    import pandas as pd

    from picdexer_spark.functions.extract import (
        extract_pages_batches,
        wrap_html_series,
    )
    from picdexer_spark.index.build import extract_text

    texts = [
        "plain words",
        "line one\nline two\n\ttabbed",
        "all entities: & < > \" ' and again &amp; (literal)",
        "",  # empty article body
        "unicode: café — emoji \U0001f600",
    ]
    urls = [f"https://s{i}.example/p" for i in range(len(texts))]
    pdf = pd.DataFrame({
        "url": urls,
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": wrap_html_series(pd.Series(texts), pd.Series(urls)),
        "text": [None] * len(texts),
        "lang": "en",
    })
    edge = pd.DataFrame({
        "url": ["https://e0.example/p", "https://e1.example/p",
                "https://e2.example/p"],
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": [b"<html><body>no article here</body></html>", None, None],
        "text": [None, "kept incoming text", None],
        "lang": "en",
    })
    # malformed UTF-8 inside an intact article: real crawl input routinely
    # carries invalid bytes — the row must DEGRADE (U+FFFD), never abort
    # the job (Spark 4's F.decode raises MALFORMED_CHARACTER_CODING; the
    # cast-based path must not). Both twins agree byte-for-byte on these
    # classes: lone continuation, truncated 3-/4-byte seqs, overlong, 0xFF.
    bad_bodies = [b"a\x80b", b"a\xe2\x82b", b"a\xf0\x9f\x92b",
                  b"a\xc0\xafb", b"a\xffb", b"trail\xe2\x82"]
    malformed = pd.DataFrame({
        "url": [f"https://m{i}.example/p" for i in range(len(bad_bodies))],
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": [b"<html><body><article>" + b + b"</article></body></html>"
                 for b in bad_bodies],
        "text": [None] * len(bad_bodies),
        "lang": "en",
    })
    pdf = pd.concat([pdf, edge, malformed], ignore_index=True)

    want = pd.concat(list(extract_pages_batches(iter([pdf]))),
                     ignore_index=True)
    sdf = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string,"
             " lang string")
    got = {r["url"]: (r["text"], r["extract_ok"])
           for r in extract_text(sdf).collect()}
    for i, u in enumerate(pdf["url"]):
        wt = want.loc[i, "text"]
        wt = None if pd.isna(wt) else wt
        assert got[u] == (wt, bool(want.loc[i, "extract_ok"])), u
    # round-trip byte identity through the JVM path
    for i, t in enumerate(texts):
        assert got[urls[i]][0] == t, repr(t)
    # malformed bytes degraded to U+FFFD, not fatal, and matched pandas
    for i, b in enumerate(bad_bodies):
        assert got[f"https://m{i}.example/p"][0] == b.decode(
            "utf-8", errors="replace")


def test_extract_jvm_surrogate_divergence(spark):
    """Pin the ONE known decode divergence between the twins: CESU-8
    lone-surrogate bytes (ED A0 80). Java's UTF-8 decoder substitutes one
    U+FFFD for the 3-byte ill-formed sequence; Python's maximal-subpart
    rule emits three. Neither aborts; real crawl text is unaffected
    (surrogate encodings are not produced by any UTF-8 encoder)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from picdexer_spark.functions.extract import (
        extract_text_col,
        extract_text_series,
    )

    html = b"<html><body><article>a\xed\xa0\x80b</article></body></html>"
    sdf = spark.createDataFrame([(html,)], "html binary")
    jvm = sdf.select(extract_text_col(F.col("html")).alias("t")).first().t
    pandas_side = extract_text_series(pd.Series([html]))[0]
    assert jvm == "a�b"
    assert pandas_side == "a���b"
