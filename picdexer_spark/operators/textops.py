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


#: GPT-2-ish pre-tokenizer classes: letter runs, digit runs, punctuation
#: runs (whitespace never a token) — shared verbatim with the DuckDB oracle
BPE_PIECE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r]+"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token-count estimators a training-data pipeline budgets with:

    - n_ws: whitespace-delimited words;
    - n_pieces: BPE-ish pre-token pieces (letter/digit/punct runs over
      lowercased text, :data:`BPE_PIECE_PATTERN`);
    - n_subwords: sum over pieces of ceil(len/4) — the classic ~4-chars-
      per-token BPE budget estimate, cheap enough to run over 100 TB.

    All JVM regex/array arithmetic, no UDF.
    """
    low = F.lower(F.col(text_col))
    ws = F.filter(F.split(F.col(text_col), "[ \\t\\n\\r]+"),
                  lambda x: x != F.lit(""))
    pieces = F.regexp_extract_all(low, F.lit(BPE_PIECE_PATTERN), 0)
    subwords = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.floor((F.length(p) + 3) / 4),
    )
    # coalesce: NULL text must count as 0 everywhere (matches the oracle's
    # coalesce — without it size(split(NULL)) yields NULL and the value
    # gate diverges on the first NULL-text row)
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(ws).cast("long"), F.lit(0)).alias("n_ws"),
        F.coalesce(F.size(pieces).cast("long"), F.lit(0)).alias("n_pieces"),
        F.coalesce(subwords.cast("long"), F.lit(0)).alias("n_subwords"),
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


def decontaminate(df: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, bench_text_col: str | None = None,
                  n: int = 13, min_matches: int = 1) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing token n-grams
    with an evaluation set — the GPT-3-style 13-gram collision rule every
    pretraining pipeline runs before training (Brown et al. 2020 §C;
    PaLM/Llama use the same shape with n 8-13).

    Returns (id, n_matched) for docs whose distinct-shingle overlap with
    the UNION of benchmark shingles reaches ``min_matches``; scrub with
    ``docs.join(result, id, "left_anti")``.

    Scale shape (the decisive property): the benchmark side is eval-set
    sized (10^3-10^6 shingles — model-sized, never corpus-sized), so it
    aggregates to a distinct shingle set and BROADCASTS; the corpus side
    explodes map-side into (id, shingle) and the broadcast hash semi-join
    filters it in place — rows surviving to the groupBy are matched
    shingles only (contamination-sized, ~0 on clean corpora). No
    corpus-sized shuffle, no literal-array plan embedding (the
    frequent_item_sets lesson: a 10^5-element lit() array is a
    codegen/plan blowup — the broadcast JOIN carries the set instead).
    """
    if min_matches < 1:
        raise ValueError(f"min_matches must be >= 1, got {min_matches}")
    bcol = bench_text_col or text_col
    bench_sh = (
        benchmark.select(F.explode(_shingles(bcol, n)).alias("g"))
        .distinct()
    )
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("g")
    )
    return (
        ex.join(F.broadcast(bench_sh), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_matched"))  # shingles are distinct/doc
        .filter(F.col("n_matched") >= min_matches)
    )


def _shingles(text_col: str, n: int = 3):
    """Sorted distinct n-gram (token) shingles as an array column.

    Documents with fewer than n tokens yield an EMPTY array (guarded:
    F.sequence(0, size-n) with size<n would produce a descending [0,-1]
    sequence — Spark sequences are never empty — and the slice(toks, 0, n)
    it implies throws INVALID_PARAMETER_VALUE.START, aborting the job on
    the first short/empty doc)."""
    toks = tokens_col(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(grams))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.8, max_shingle_df: int = 500,
    log_dropped: bool = False,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard similarity.

    Candidate generation is a shingle-bucket self-join (pairs must share at
    least one shingle with document frequency <= ``max_shingle_df``), then
    exact |A∩B| / |A∪B| verification via array ops over the FULL shingle
    sets. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The df cap is the scale guard: a head shingle shared by B docs emits
    O(B^2) candidate pairs in the self-join — one boilerplate phrase across
    10^8 pages is quadratic. A shingle carried by more than ``max_shingle_df``
    docs carries no near-dup signal (standard MinHash-era practice), so it is
    excluded from candidate generation only; verification still uses every
    shingle. Pairs whose ONLY shared shingles are capped ones are missed —
    that is the documented trade. ``max_shingle_df=0`` disables the cap;
    ``log_dropped=True`` counts and prints the capped shingles (one extra
    job, off the hot path by default).
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    ex = sh.select("id", F.explode("sh").alias("g"))
    if max_shingle_df:
        gdf = ex.groupBy("g").agg(F.count("*").alias("df_g"))
        if log_dropped:
            n_dropped = gdf.filter(F.col("df_g") > max_shingle_df).count()
            print(f"[ngram_jaccard_pairs] shingles dropped by df cap "
                  f"{max_shingle_df}: {n_dropped}")
        ex = ex.join(
            gdf.filter(F.col("df_g") <= max_shingle_df).select("g"), "g"
        )
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


def hash60(col, *salt) -> F.Column:
    """Engine-portable 60-bit hash: int(md5(x || '#' || salt)[:15hex], 16).

    Chosen over xxhash64 because every engine in the correctness loop can
    compute it bit-identically — Spark `conv(substr(md5(..),1,15),16,10)`,
    DuckDB `('0x'||substr(md5(..),1,15))::BIGINT`, Python
    `int(hashlib.md5(..).hexdigest()[:15],16)` — so MinHash/SimHash get a
    full value-hash oracle instead of a rows-only check. 60 bits keeps the
    value positive in int64 on all three. md5 costs ~2x xxhash64 JVM-side;
    pass hasher='xxhash64' to the callers for the non-oracle fast path.
    """
    c = F.col(col) if isinstance(col, str) else col
    for s in salt:
        c = F.concat(c, F.lit("#"), F.lit(str(s)))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _perm_hash(col, j: int, hasher: str) -> F.Column:
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(j))
    return hash60(col, j)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    num_hashes: int = 32, hasher: str = "md5_60",
) -> DataFrame:
    """MinHash signatures: sig[j] = min over shingles of h_j(shingle).

    h_j(s) = hash of (s, seed=j) — one JVM hash per permutation, arithmetic
    projection, no UDF. Output: (id, sig array<long>). hasher='md5_60'
    (default, oracle-portable — see :func:`hash60`) or 'xxhash64' (faster,
    engine-internal).
    """
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)

    def _mk(j):
        # MUST be a ONE-parameter lambda: PySpark treats a second transform()
        # lambda parameter as the array index, which would silently override
        # the permutation seed (`lambda s, j=j: ...` hashed every shingle
        # with its own position instead of the seed)
        return lambda s: _perm_hash(s, j, hasher)

    sig = F.array(
        *[F.array_min(F.transform(F.col("sh"), _mk(j)))
          for j in range(num_hashes)]
    )
    return sh.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    num_hashes: int = 32, bands: int = 8, threshold: float = 0.5,
    hasher: str = "md5_60", max_bucket_size: int = 200,
    log_dropped: bool = False,
) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified by signature similarity.

    shingle -> minhash -> band -> bucket-join: signatures are cut into
    `bands` bands of num_hashes/bands rows; docs colliding in any band
    become candidates; candidate pairs are scored by fraction of equal
    signature positions (the MinHash estimate of Jaccard).

    Scale shape: the band self-join shuffles only (id, band, bucket) — the
    32-long signatures do NOT ride the band exchange; they are joined back
    onto the (small) deduped candidate set for verification. Buckets larger
    than ``max_bucket_size`` are dropped before the self-join (one
    boilerplate-heavy bucket of B docs is O(B^2) pairs; docs in a bucket
    that hot are near-identical to ~B others and surface through their
    other, smaller buckets or exact dedup). ``max_bucket_size=0`` disables;
    ``log_dropped=True`` prints the dropped-bucket count.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, hasher)
    band_bucket = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bnd).alias("band"),
                    _perm_hash(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bnd * rows + r + 1)
                                for r in range(rows)
                            ],
                        ),
                        bnd,
                        hasher,
                    ).alias("bucket"),
                )
                for bnd in range(bands)
            ]
        )
    ).alias("bb")
    banded = sigs.select("id", band_bucket).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket_size:
        bsize = banded.groupBy("band", "bucket").agg(
            F.count("*").alias("bsz")
        )
        if log_dropped:
            n_dropped = bsize.filter(F.col("bsz") > max_bucket_size).count()
            print(f"[minhash_lsh_pairs] buckets dropped by size cap "
                  f"{max_bucket_size}: {n_dropped}")
        banded = banded.join(
            bsize.filter(F.col("bsz") <= max_bucket_size)
            .select("band", "bucket"),
            ["band", "bucket"],
        )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(sigs.select(F.col("id").alias("id_a"),
                              F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"),
                          F.col("sig").alias("sig_b")), "id_b")
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


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16,
            hasher: str = "md5_60") -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    bit_i(doc) = 1 iff sum over distinct tokens of sign(bit_i(h(tok))) > 0.
    Pure array arithmetic (transform/aggregate), no UDF. Returns
    (id, simhash long). hasher as in :func:`minhash_signatures`.
    """
    toks = F.array_distinct(tokens_col(text_col))
    hashes = F.transform(toks, lambda t: _perm_hash(t, 0, hasher))

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


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Sliding-window chunking — the embedding/RAG preparation step
    beside :func:`pack_sequences` (pack fills training bins exactly;
    chunking slides a fixed window WITH OVERLAP so no sentence is cut
    without context on the other side): per doc, windows of
    ``chunk_tokens`` analyzer tokens advancing by ``chunk_tokens -
    overlap``. Returns (id, chunk_no, tok_start, tok_end, chunk_text)
    where chunk_text is the space-joined normalized token slice and
    [tok_start, tok_end) indexes the doc's token array.

    Pins: a doc with 0 < n <= chunk_tokens emits exactly one full-doc
    chunk; the final window is short rather than re-anchored (every token
    appears, ceil((n - overlap) / stride) windows); empty/NULL docs emit
    nothing. overlap >= chunk_tokens refuses (the window would never
    advance — an infinite-output request).

    Shape: per-doc sequence + explode, all JVM — a map-side fan-out with
    no shuffle, the same 100 TB contract as the other per-doc textops.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(F.floor((n - overlap - 1) / stride) + 1)
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"),
                     n.alias("n"), n_chunks.cast("int").alias("nc"))
    ex = base.filter(F.col("nc") > 0).select(
        "id", "toks", "n",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_no"),
    )
    start = F.col("chunk_no") * stride
    end = F.least(start + chunk_tokens, F.col("n"))
    return ex.select(
        "id", "chunk_no",
        start.cast("long").alias("tok_start"),
        end.cast("long").alias("tok_end"),
        F.array_join(
            F.slice(F.col("toks"), start + 1, (end - start).cast("int")),
            " ").alias("chunk_text"),
    )


#: one regex set shared verbatim with the DuckDB oracle (the tokenizer
#: discipline): scheme, authority host (userinfo/port stripped), path
URL_SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
URL_HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
URL_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_features(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL structure features — the RefinedWeb/C4-style URL preparation
    stage (Penedo et al. 2023 §3.1 run URL filtering before any content
    look): per doc (id, scheme, host, registered_domain, tld, path_depth,
    is_https), all JVM regexp/array ops, zero shuffle.

    Pins: host lowercased with userinfo and port stripped;
    ``registered_domain`` is the LAST TWO dot-labels — a deliberate
    public-suffix-list-free approximation (a real PSL maps co.uk-style
    suffixes; carrying the PSL as data is the production path and this
    column is where it plugs in). Unparsable urls yield empty-string
    parts and path_depth 0 — they stay visible for a downstream filter,
    never dropped silently."""
    u = F.lower(F.col(url_col))
    host = F.regexp_extract(u, URL_HOST_RE, 1)
    path = F.regexp_extract(u, URL_PATH_RE, 1)
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract(u, URL_SCHEME_RE, 1).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(host, "([^.]+[.][^.]+)$", 1)
         .alias("registered_domain"),
        F.regexp_extract(host, "[.]([^.]+)$", 1).alias("tld"),
        F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))
         .cast("long").alias("path_depth"),
        (F.regexp_extract(u, URL_SCHEME_RE, 1) == "https").alias("is_https"),
    )


def filter_blocked_domains(df: DataFrame, url_col: str,
                           blocked: DataFrame) -> DataFrame:
    """Drop docs whose registered domain is on a blocklist — the first
    gate of every web-corpus pipeline (RefinedWeb runs a 4.6M-domain
    list). ``blocked`` is a 1-column DataFrame of registered domains
    (list-sized: even production blocklists are ~10^6 rows = model-sized),
    so it BROADCASTS and the corpus side anti-joins in place with no
    corpus shuffle — same shape as :func:`decontaminate`."""
    bcol = blocked.columns[0]
    dom = F.regexp_extract(
        F.regexp_extract(F.lower(F.col(url_col)), URL_HOST_RE, 1),
        "([^.]+[.][^.]+)$", 1)
    tmp = "__dom"
    while tmp in df.columns:  # never clobber a caller column
        tmp += "_"
    return df.withColumn(tmp, dom).join(
        F.broadcast(blocked.select(F.col(bcol).alias(tmp)).distinct()),
        tmp, "left_anti",
    ).drop(tmp)


REPETITION_SCHEMA = (
    "id long, n_lines long, dup_line_frac double,"
    " dup_line_char_frac double, top_2gram_char_frac double,"
    " top_3gram_char_frac double, top_4gram_char_frac double"
)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, table A1 — the standard
    pre-training removal rules beside :func:`quality_score`'s ratios):

    * ``dup_line_frac`` — fraction of line instances whose exact trimmed
      form occurs >= 2 times in the doc (machine-generated boilerplate
      repeats lines);
    * ``dup_line_char_frac`` — fraction of line characters contained in
      those duplicate instances;
    * ``top_{2,3,4}gram_char_frac`` — fraction of token characters covered
      by the single most frequent n-gram (count x gram char length /
      total token chars; top gram pinned count desc, gram asc).

    Pins (ambiguities in the paper resolved deterministically): lines split
    on ``\\n`` and trimmed, empties dropped; n-grams are ANALYZED tokens
    (the engine tokenizer) counted with overlap; docs with < n tokens score
    0. Gopher's duplicate-n-gram-char family (n 5-10) is out of scope —
    its overlap-counting rule is underspecified in the paper, and a pinned
    guess would be noise rather than parity.

    Shape: one Arrow-batched mapInPandas pass, O(tokens) per doc via
    counters — a per-doc map with NO shuffle (embarrassingly parallel, the
    100 TB-safe shape). The pure-JVM alternative (higher-order-function
    self-counts) is O(tokens^2) per doc — 25M comparisons on a 5k-token
    page — which is why this is one of the few textops where the Arrow
    batch path beats built-ins.
    """
    import pandas as pd

    from picdexer_spark.functions.tokenize import tokenize_py

    def batches(it):
        from collections import Counter

        for pdf in it:
            out = {k: [] for k in (
                "id", "n_lines", "dup_line_frac", "dup_line_char_frac",
                "top_2gram_char_frac", "top_3gram_char_frac",
                "top_4gram_char_frac")}
            for rid, text in zip(pdf["id"], pdf["text"]):
                text = text or ""
                # trim set pinned to space/tab/CR EXACTLY (the oracle's
                # trim(x, ' '||chr(9)||chr(13)) — str.strip()'s full
                # Unicode whitespace set (\f \v \xa0 ...) is not
                # replicable in SQL and would silently diverge)
                lines = [ln.strip(" \t\r") for ln in text.split("\n")]
                lines = [ln for ln in lines if ln]
                lc = Counter(lines)
                n_chars_lines = sum(len(ln) for ln in lines)
                dups = [ln for ln in lines if lc[ln] >= 2]
                out["id"].append(rid)
                out["n_lines"].append(len(lines))
                out["dup_line_frac"].append(
                    len(dups) / len(lines) if lines else 0.0)
                out["dup_line_char_frac"].append(
                    sum(len(ln) for ln in dups) / n_chars_lines
                    if n_chars_lines else 0.0)
                toks = tokenize_py(text)
                tot = sum(len(t) for t in toks)
                for n in (2, 3, 4):
                    key = f"top_{n}gram_char_frac"
                    if len(toks) < n or not tot:
                        out[key].append(0.0)
                        continue
                    grams = Counter(
                        tuple(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
                    # pin: count desc, gram asc
                    g, c = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))
                    out[key].append(c * sum(len(t) for t in g) / tot)
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(batches, REPETITION_SCHEMA)


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


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 8, window: int = 6,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
    hash every char k-gram of the normalized text, slide a window of
    ``window`` consecutive hashes, keep each window's MINIMUM — guaranteed
    to share fingerprints with any document overlapping by >= k+window-1
    chars. The standard local fingerprinting scheme for plagiarism/near-dup
    detection at corpus scale.

    All JVM array arithmetic (hash60 per k-gram, transform windows,
    array_min) — no UDF; O(len * window) expression work per doc. Returns
    (id, fps array<long> — sorted distinct selected hashes).
    """
    # normalization = the analyzer's view: lowercase, alnum runs joined by
    # single spaces (whitespace/punct variations don't perturb k-grams)
    norm = F.concat_ws(" ", tokens_col(text_col))
    n = F.length(norm)
    # hashes[i] = hash60 of the k-gram at 1-based char position i; guarded:
    # a sequence with stop < start is DESCENDING in Spark, never empty
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: hash60(norm.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # MATERIALIZE the hash array as a column before windowing: referencing
    # the hashes EXPRESSION inside the window transform would re-embed (and
    # re-evaluate) the whole O(len) md5 chain per window — O(len^2) md5s
    staged = df.select(F.col(id_col).alias("id"), hashes.alias("_h"))
    h = F.col("_h")
    nh = F.size(h)
    mins = (
        F.when(
            nh >= window,
            F.transform(
                F.sequence(F.lit(1), nh - window + 1),
                lambda j: F.array_min(F.slice(h, j, window)),
            ),
        )
        .when(nh > 0, F.array(F.array_min(h)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return staged.select(
        "id", F.array_sort(F.array_distinct(mins)).alias("fps")
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


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """Connected components over an undirected edge list — the cluster
    step every near-dup pipeline needs between "candidate pairs" and
    "keep one per group" (MinHash/SimHash pairs chain: A~B, B~C puts
    A,C in one component even when A!~C).

    Min-label propagation WITH pointer jumping: every node starts
    labelled with itself; each round (a) pushes the minimum label
    across edges (one edges-sized shuffle join + map-side-combinable
    min) and (b) path-halves — component <- component(component), one
    node-sized self-join — so label distance to the root roughly
    halves per round and convergence takes O(log diameter) rounds
    (~4 for a 20-link chain) instead of O(diameter); near-dup graphs
    (cliques and stars around a template document) converge in 2.
    `max_iter` guards pathological inputs. Per-round
    `localCheckpoint` cuts the iterative lineage so plans stay O(1)
    deep; the convergence probe is a LIMIT-1 existence check, not a
    count over the labels.

    Returns (node, component), component = smallest node id reachable.
    Nodes appear once; isolated nodes (absent from `edges`) are the
    caller's to add — see :func:`near_dup_clusters`."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
        .filter(F.col("u") != F.col("v")).distinct()
    e = e.localCheckpoint()
    labels = (e.select(F.col("u").alias("node")).distinct()
              .select("node", F.col("node").alias("component"))
              .localCheckpoint())
    for _ in range(max_iter):
        prop = (
            e.join(labels, e["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    "component",
                    F.coalesce("nbr_min", "component"),
                ).alias("component"),
            )
        )
        # pointer jump (path halving): component <- component(component)
        tgt = new.select(F.col("node").alias("c_node"),
                         F.col("component").alias("c_comp"))
        new = (
            new.join(tgt, new["component"] == tgt["c_node"], "left")
            .select(
                "node",
                F.coalesce("c_comp", "component").alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") < F.col("old"))
            .limit(1).count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the guard — raise max_iter or switch "
        "to star contraction)")


def near_dup_clusters(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5, **lsh_kwargs) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidate pairs
    (:func:`minhash_lsh_pairs`) -> :func:`connected_components` ->
    every document labelled with its cluster (docs in no pair are
    their own singleton cluster) plus `is_survivor` — true for the
    smallest doc id of each cluster, the keep-one-per-group flag a
    dedup pass filters on. One extra broadcast-sized join over the
    clustered minority; the unpaired majority never enters the
    component iteration."""
    pairs = minhash_lsh_pairs(df, id_col, text_col,
                              threshold=threshold, **lsh_kwargs)
    comp = connected_components(pairs, "id_a", "id_b")
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
        .withColumn("is_survivor", F.col("cluster") == F.col(id_col))
    )


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   budget: int, part_col: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    batch prep step (documents concatenated in id order, the token
    stream split into fixed `budget`-token bins; a document spanning a
    bin boundary is SPLIT across bins, nothing is padded or dropped).

    Returns one row per (document, bin) span:
    (part, doc_id, bin, tok_start, tok_end) — tok_start/tok_end the
    doc-LOCAL half-open token range that lands in `bin`. Zero-token
    documents are skipped.

    Scale shape: the running-total window is partitioned by `part_col`
    (the shard/stream key a real pipeline packs within — source,
    language, dump file), so the cumulative sum never serializes the
    whole corpus through one task; each part's bin ids are independent.
    The boundary fan-out is a `sequence()` explode, bounded by
    ceil(ntok/budget) + 1 rows per doc."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window

    ntok = F.size(F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
    w = Window.partitionBy("part").orderBy("doc_id")
    base = (
        df.select(F.col(part_col).alias("part"),
                  F.col(id_col).alias("doc_id"),
                  ntok.alias("ntok"))
        .filter(F.col("ntok") > 0)
        .withColumn("cum", F.sum("ntok").over(w))
        .withColumn("start", F.col("cum") - F.col("ntok"))
    )
    b = F.lit(int(budget))
    return (
        base.select(
            "part", "doc_id", "ntok", "start",
            F.explode(F.sequence(
                F.floor(F.col("start") / b),
                F.floor((F.col("cum") - 1) / b))).alias("bin"))
        .select(
            "part", "doc_id", "bin",
            F.greatest(F.col("bin") * b - F.col("start"),
                       F.lit(0)).alias("tok_start"),
            F.least((F.col("bin") + 1) * b - F.col("start"),
                    F.col("ntok")).alias("tok_end"),
        )
    )


def winnow_positional(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 8, window: int = 6,
) -> DataFrame:
    """Winnowing fingerprints WITH positions — the span-dedup primitive.

    Same scheme as :func:`winnow_fingerprints` (hash every char k-gram of
    the analyzer-normalized text, keep each ``window``'s minimum) but each
    selection also carries the 1-based char position of its k-gram in the
    normalized text (ties -> LEFTMOST position, pinned so the DuckDB
    oracle's `list_position(.., list_min(..))` matches bit-for-bit).
    Returns exploded (id, pos, fp) rows, one per distinct selected
    position. All JVM expressions — no UDF, no shuffle.
    """
    norm = F.concat_ws(" ", tokens_col(text_col))
    n = F.length(norm)
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: hash60(norm.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    staged = df.select(F.col(id_col).alias("id"), hashes.alias("_h"))
    h = F.col("_h")
    nh = F.size(h)
    # per window j: leftmost position of the window minimum
    sel = (
        F.when(
            nh >= window,
            F.transform(
                F.sequence(F.lit(1), nh - window + 1),
                lambda j: (
                    F.array_position(
                        F.slice(h, j, window),
                        F.array_min(F.slice(h, j, window)),
                    ) + j - 1
                ).cast("long"),
            ),
        )
        .when(nh > 0,
              F.array(F.array_position(h, F.array_min(h)).cast("long")))
        .otherwise(F.array().cast("array<bigint>"))
    )
    exploded = staged.select(
        "id", "_h", F.explode(F.array_distinct(sel)).alias("pos")
    )
    return exploded.select(
        "id", "pos", F.element_at("_h", F.col("pos").cast("int")).alias("fp")
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 8, window: int = 6,
    min_docs: int = 2, min_span: int = 30,
    gap: int | None = None,
) -> DataFrame:
    """SPAN-level cross-document dedup — duplicated SUBSTRINGS inside
    otherwise-unique documents (headers, boilerplate, quoted blocks),
    the thing document-granular dedup structurally misses and what
    large pretraining corpora actually scrub (the suffix-array dedup of
    Lee et al. "Deduplicating Training Data Makes Language Models
    Better", approximated here with winnowing fingerprints instead of a
    corpus-wide suffix array — local fingerprints distribute; a suffix
    array does not).

    Pipeline (positions are 1-based chars in the analyzer-normalized
    text — lowercase, alnum runs joined by single spaces):

    1. positional winnowing selections per doc (:func:`winnow_positional`
       — JVM expressions, no shuffle);
    2. fingerprints appearing in >= ``min_docs`` DISTINCT docs: one
       partial-agged groupBy(fp) — Zipfian boilerplate fps are exactly
       the hot keys the map-side combine collapses;
    3. join back (shuffle on fp), then per doc merge selections whose
       positions are within ``gap`` chars (default k + window: winnowing
       guarantees a selection in every window of `window` consecutive
       k-grams, so inside a continuing duplicated region consecutive
       selections sit <= window apart) into spans via lag + running-sum
       — window functions partitioned BY DOC, never corpus-wide;
    4. keep spans of >= ``min_span`` chars.

    Divergence from exact suffix-array dedup, pinned: a merged span is
    the union of fingerprint-shared regions and may span material whose
    duplicate partners are DIFFERENT docs; winnowing guarantees
    detection only for duplicated regions >= k + window - 1 chars.

    Returns (id, span_start, span_end, span_len, n_fps), one row per
    span. 100 TB shape: two shuffles (fp agg, fp join), both on the
    fingerprint key; everything per-doc afterwards.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a span needs a partner)")
    g = (k + window) if gap is None else gap
    sel = winnow_positional(df, id_col, text_col, k=k, window=window)
    shared = (
        sel.groupBy("fp")
        .agg(F.count_distinct("id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("fp")
    )
    hits = sel.join(shared, "fp").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        hits.withColumn(
            "new_span",
            F.when(
                F.col("pos") - F.lag("pos", 1).over(w) <= g, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("span_id", F.sum("new_span").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count("*").alias("n_fps"),
        )
        .withColumn(
            "span_len", F.col("span_end") - F.col("span_start") + 1
        )
    )
    return spans.filter(F.col("span_len") >= min_span).select(
        "id", "span_start", "span_end", "span_len", "n_fps"
    )


def scrub_spans(
    df: DataFrame, spans: DataFrame,
    id_col: str, text_col: str,
) -> DataFrame:
    """The span-dedup REMOVAL action: cut every duplicate span found by
    :func:`duplicate_spans` out of the analyzer-normalized text — the
    step a training-data pipeline actually takes after detection (Lee et
    al. cut exact duplicate spans; boilerplate scrubbing pipelines cut
    shared ones).

    Formulation (all JVM, windows doc-partitioned): per doc, the KEPT
    segments are the complement intervals of its spans (lag over the
    span list), each segment a `substring` of the normalized text;
    segments reassemble ordered (array_sort over (start, piece)
    structs) and the cut joints collapse to single spaces. Docs without
    spans pass through with their normalized text unchanged. Output
    coordinates and text are NORMALIZED space (lowercase, alnum runs,
    single spaces) — spans were detected there; cutting raw text would
    need a char-offset map the tokenizer doesn't keep (pinned).

    Returns (id, text_clean, n_spans, n_removed_chars).
    """
    norm_docs = df.select(
        F.col(id_col).alias("id"),
        F.concat_ws(" ", tokens_col(text_col)).alias("norm"),
    )
    sp = spans.select("id", "span_start", "span_end")
    w = Window.partitionBy("id").orderBy("span_start")
    # complement intervals: the gap BEFORE each span + one tail segment
    before = sp.select(
        "id",
        F.coalesce(F.lag("span_end", 1).over(w) + 1, F.lit(1))
        .alias("seg_start"),
        (F.col("span_start") - 1).alias("seg_end"),
    )
    tail = sp.groupBy("id").agg(
        (F.max("span_end") + 1).alias("seg_start"),
        F.lit(None).cast("long").alias("seg_end"),  # to end of string
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .alias("n_removed_chars"),
    )
    segs = before.unionByName(
        tail.select("id", "seg_start", "seg_end")
    ).join(norm_docs, "id")
    pieces = segs.select(
        "id",
        "seg_start",
        F.when(
            F.col("seg_end").isNotNull(),
            F.col("norm").substr(
                F.col("seg_start").cast("int"),
                F.greatest(
                    F.col("seg_end") - F.col("seg_start") + 1, F.lit(0)
                ).cast("int"),
            ),
        ).otherwise(
            F.col("norm").substr(
                F.col("seg_start").cast("int"),
                F.greatest(
                    F.length("norm") - F.col("seg_start") + 1, F.lit(0)
                ).cast("int"),
            )
        ).alias("piece"),
    )
    rebuilt = (
        pieces.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_start", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
                " ",
            ).alias("glued")
        )
        .select(
            "id",
            F.trim(F.regexp_replace("glued", " +", " ")).alias("text_clean"),
        )
        .join(tail.select("id", "n_spans", "n_removed_chars"), "id")
    )
    untouched = norm_docs.join(sp.select("id").distinct(), "id",
                               "left_anti").select(
        "id", F.col("norm").alias("text_clean"),
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("n_removed_chars"),
    )
    return rebuilt.select("id", "text_clean", "n_spans",
                          "n_removed_chars").unionByName(untouched)
