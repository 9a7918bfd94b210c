"""End-to-end training-data pipeline: the RefinedWeb/Gopher-style chain
composed from the engine's operators, each stage feeding the next —

    URL blocklist -> exact dedup -> near-dup (MinHash) survivor filter
    -> span-level boilerplate scrub -> benchmark decontamination
    -> quality + repetition gate -> sliding-window chunking

The point under test is COMPOSITION: stages agree on schemas, every drop
is accounted for, and the final chunk set covers exactly the surviving
corpus. Counts are pinned against the planted corpus design.
"""

import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import textops as tx

BOILER = ("subscribe to our newsletter for daily updates and offers "
          "click here to accept all cookies on this site now")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 30 clean docs on good domains — content varies word-by-word so no
    # cross-doc char span reaches the 40-char dedup floor
    for i in range(30):
        rows.append((i, f"https://site{i % 7}.example/p/{i}",
                     f"article{i} covers subject{i} alpha{i} beta{i}"
                     f" gamma{i} delta{i} epsilon{i} zeta{i} omega{i}"))
    # 2 docs on a blocked domain
    for i in (100, 101):
        rows.append((i, f"https://spam.bad/p/{i}",
                     f"spammy page {i} selling various things"))
    # 1 exact duplicate of doc 0
    rows.append((102, "https://mirror.example/p/0",
                 "article0 covers subject0 alpha0 beta0"
                 " gamma0 delta0 epsilon0 zeta0 omega0"))
    # 2 docs sharing a long boilerplate span with otherwise-unique text
    # (surrounding text shares no 12-char run across the pair, so only
    # the planted boilerplate is a cross-doc span)
    for i in (103, 104):
        rows.append((i, f"https://siteB.example/p/{i}",
                     f"zq{i}lead mn{i}body vc{i}pre "
                     + BOILER + f" kj{i}post wt{i}end"))
    # 1 doc leaking a benchmark question verbatim
    rows.append((105, "https://leak.example/p/105",
                 "random page chrome what is the capital of france the"
                 " capital of france is paris obviously trailing junk"))
    # 1 degenerate-repetition doc (fails the Gopher gate)
    rows.append((106, "https://siteC.example/p/106",
                 " ".join(["buy now"] * 40)))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_full_pipeline_accounting(spark, corpus):
    n0 = corpus.count()
    assert n0 == 37

    # 1. URL blocklist
    blocked = spark.createDataFrame([("spam.bad",)], "d string")
    s1 = tx.filter_blocked_domains(corpus, "url", blocked)
    assert s1.count() == n0 - 2

    # 2. exact dedup (keep smallest doc_id per content hash)
    dup = tx.exact_dup_groups(s1, "doc_id", "text")
    losers = s1.join(dup.select("text_md5"),
                     F.md5("text") == F.col("text_md5")) \
        .join(dup.select(F.col("keep_id").alias("doc_id")), "doc_id",
              "left_anti").select("doc_id")
    s2 = s1.join(losers, "doc_id", "left_anti")
    assert s2.count() == n0 - 3  # the mirror of doc 0 dropped

    # 3. span-level boilerplate scrub (both docs keep their unique text)
    spans = tx.duplicate_spans(s2, "doc_id", "text", k=12, window=4,
                               min_span=40)
    span_ids = {r["id"] for r in spans.select("id").distinct().collect()}
    assert span_ids == {103, 104}
    s3 = tx.scrub_spans(s2, spans, "doc_id", "text") \
        .select(F.col("id").alias("doc_id"),
                F.col("text_clean").alias("text")) \
        .join(s2.select("doc_id", "url"), "doc_id")
    assert s3.count() == s2.count()  # scrub edits, never drops
    kept_text = {r["doc_id"]: r["text"] for r in
                 s3.filter(F.col("doc_id").isin(103, 104)).collect()}
    for i in (103, 104):
        assert f"zq{i}lead" in kept_text[i] and f"wt{i}end" in kept_text[i]
        assert "subscribe to our newsletter" not in kept_text[i]

    # 4. benchmark decontamination
    bench = spark.createDataFrame(
        [(0, "what is the capital of france the capital of france is"
             " paris obviously")], "bid long, text string")
    flagged = tx.decontaminate(s3, bench, "doc_id", "text", n=8) \
        .withColumnRenamed("id", "doc_id")
    assert {r["doc_id"] for r in flagged.collect()} == {105}
    s4 = s3.join(flagged.select("doc_id"), "doc_id", "left_anti")

    # 5. quality/repetition gate (Gopher: top-2-gram char fraction)
    rep = tx.repetition_stats(s4, "doc_id", "text") \
        .withColumnRenamed("id", "doc_id")
    bad = rep.filter(F.col("top_2gram_char_frac") > 0.5).select("doc_id")
    assert {r["doc_id"] for r in bad.collect()} == {106}
    s5 = s4.join(bad, "doc_id", "left_anti")
    assert s5.count() == 32  # 30 clean + 103/104 scrubbed
    # accounting: 37 - 2 blocked - 1 dup - 1 leak - 1 repetitive = 32

    # 6. chunking covers every surviving token exactly
    chunks = tx.chunk_documents(s5, "doc_id", "text",
                                chunk_tokens=16, overlap=4)
    per_doc = {r["id"]: r["mx"] for r in
               chunks.groupBy("id").agg(F.max("tok_end").alias("mx"))
               .collect()}
    from picdexer_spark.functions.tokenize import tokens_col
    n_toks = {r["doc_id"]: r["n"] for r in
              s5.select("doc_id", F.size(tokens_col("text")).alias("n"))
              .collect()}
    assert per_doc == n_toks  # max tok_end per doc == its token count
    assert set(per_doc) == {r["doc_id"] for r in s5.collect()}
