"""Training-data text pipeline operators over a documents-style table.

The large-scale-corpus operations a 100 TB web-text pipeline needs around the
index build: dedup (exact, n-gram Jaccard, MinHash-LSH, SimHash), language
heuristics, quality scoring, token statistics, fingerprinting. All built-in
DataFrame ops (JVM, codegen) except MinHash permutation hashing, which is a
vectorized arithmetic projection over xxhash64 — no Python in any hot path.

Dedup-by-content is native to the reference's design: its FileID is
md5(content), so re-ingest of identical bytes upserts rather than duplicates
(reference: internal/common/common.go:44-63, elasticsearch.go:185-190).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from picdexer_spark.functions.tokenize import tokens_col

# small deterministic English stopword list (shared with oracle SQL)
EN_STOPWORDS = [
    "the", "of", "and", "a", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "that", "are", "was",
]


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc token counts: total, distinct, char length."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash (md5 — the reference's FileID hash).

    Returns one row per duplicated content: (text_md5, n_dups, keep_id)
    where keep_id = smallest id (the canonical survivor).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def _shingles(text_col: str, n: int = 3):
    """Sorted distinct n-gram (token) shingles as an array column."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_sort(F.array_distinct(grams))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard similarity.

    Candidate generation is a shingle-bucket self-join (pairs must share at
    least one shingle — at scale the shuffle key is the shingle, and the
    head-shingle skew is bounded by a per-shingle doc-list cap), then exact
    |A∩B| / |A∪B| verification via array ops. Returns (id_a, id_b, jaccard)
    with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    ex = sh.select("id", F.explode("sh").alias("g"))
    cand = (
        ex.alias("x")
        .join(ex.alias("y"), "g")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures: sig[j] = min over shingles of h_j(shingle).

    h_j(s) = xxhash64(s, seed=j) — one JVM hash per permutation, arithmetic
    projection, no UDF. Output: (id, sig array<long>).
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("sh"), lambda s, j=j: F.xxhash64(s, F.lit(j)))
            )
            for j in range(num_hashes)
        ]
    )
    return sh.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    num_hashes: int = 32, bands: int = 8, threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified by signature similarity.

    shingle -> minhash -> band -> bucket-join: signatures are cut into
    `bands` bands of num_hashes/bands rows; docs colliding in any band
    become candidates (the bucket join shuffles on the band hash — uniform
    by construction); candidate pairs are scored by fraction of equal
    signature positions (the MinHash estimate of Jaccard).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", bnd * rows + r + 1)
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
            lambda x: x,
        )
    ) / F.lit(num_hashes)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    bit_i(doc) = 1 iff sum over distinct tokens of sign(bit_i(xxhash64(tok)))
    > 0. Pure array arithmetic (transform/aggregate), no UDF. Returns
    (id, simhash long).
    """
    toks = F.array_distinct(tokens_col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(mask):
        # 2-arg merge lambda (a 3-arg lambda would receive the array index)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bit_votes = [vote(F.lit(1 << i)) for i in range(bits)]
    fp = None
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return df.select(F.col(id_col).alias("id"), fp.cast("long").alias("simhash"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality metrics: length, mean token length, stopword ratio,
    digit ratio, and a composite score — the usual pre-training filters."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-overlap
    n_digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, F.length(F.regexp_replace(F.lower(text_col), "[^a-z0-9]", "")) / n_tok).otherwise(0.0), 4
        ).alias("mean_token_len"),
        F.round(
            F.when(n_tok > 0, n_stop / F.size(F.array_distinct(toks))).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(F.length(text_col) > 0, n_digit / F.length(text_col)).otherwise(0.0), 4
        ).alias("digit_ratio"),
    )


def lang_id_heuristic(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language-ID heuristic: English-stopword hit ratio over distinct
    tokens -> is_en flag (n-gram-free stand-in; real lang-id would be a
    model behind mapInPandas)."""
    toks = F.array_distinct(tokens_col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = F.when(
        F.size(toks) > 0, F.size(F.array_intersect(toks, stop_arr)) / F.size(toks)
    ).otherwise(0.0)
    return df.select(
        F.col(id_col),
        F.round(ratio, 4).alias("en_ratio"),
        (ratio >= 0.05).alias("is_en"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Document fingerprint: md5 over the k lexicographically-smallest
    distinct tokens (deterministic, locality-insensitive key for clustering;
    the md5-identity pattern of reference common.go:44-63)."""
    toks = F.slice(F.array_sort(F.array_distinct(tokens_col(text_col))), 1, k)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    )
