"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline (all-JVM arithmetic via
zip_with/aggregate — no UDF), and an LSH-bucketed variant (random-hyperplane
signs) as the scale path: at 10^9+ vectors the bucket join prunes the
candidate set to colliding buckets before exact re-scoring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # promote to float64 BEFORE multiplying so the result is bit-comparable
    # across engines (array<float> elements would otherwise multiply in f32)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    # promote to float64 BEFORE squaring (same contract as _dot): squaring
    # array<float> elements in f32 diverges ~1e-9 from the all-DOUBLE oracle,
    # enough to flip round(cos_sim, 6) at a rounding boundary
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    candidate_filter: Column | None = None,
    min_sim: float | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors for each query id.

    ``metric`` covers ES dense_vector's three similarity choices:
    ``cosine`` (default; returns the raw cosine in `cos_sim`, the
    established column), ``dot_product`` and ``l2_norm`` (return ES's
    own _score transforms — (1+dot)/2 and 1/(1+d^2) — in a `score`
    column, so "higher = closer" holds uniformly and `min_sim` floors
    mean the same thing ES's `similarity` knob means). The l2 distance
    is computed as |a|^2+|b|^2-2ab from the same dot/norm kernels — no
    extra array pass.

    The query vectors (a tiny dim table) are broadcast against the full
    embedding table — one scan, no shuffle of the big side; per-query top-k
    via window row_number. Returns (query_id, neighbor_id, cos_sim, rank).

    `candidate_filter`: the ES `knn { filter: ... }` clause with its
    PRE-FILTER semantics — the predicate restricts the NEIGHBOR pool
    before the vector search (query vectors still resolve against the
    full table), so exactly k survivors return whenever k exist; a
    post-filter would silently return fewer. The predicate pushes into
    the candidate scan, so a selective metadata filter prunes
    partitions before any dot product runs — the high-selectivity path
    at 10^9 vectors (low-selectivity callers want :func:`ivf_topk` and
    filter at rescore instead)."""
    q = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    cand = df if candidate_filter is None else df.filter(candidate_filter)
    joined = cand.alias("n").crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    dot = _dot(F.col(vec_col), F.col("qvec"))
    if metric == "cosine":
        expr, out_col = dot / (_norm(F.col(vec_col))
                               * _norm(F.col("qvec"))), "cos_sim"
    elif metric == "dot_product":
        expr, out_col = (F.lit(1.0) + dot) / 2, "score"
    elif metric == "l2_norm":
        sq = (_norm(F.col(vec_col)) ** 2 + _norm(F.col("qvec")) ** 2
              - 2 * dot)
        expr, out_col = 1.0 / (F.lit(1.0) + F.greatest(sq, F.lit(0.0))), \
            "score"
    else:
        raise ValueError(f"unknown metric {metric!r} (cosine, "
                         "dot_product, l2_norm)")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(out_col), F.asc(id_col)
    )
    scored = joined.withColumn(out_col, F.round(expr, 6))
    if min_sim is not None:
        # the ES knn `similarity` threshold: candidates below the floor
        # never enter the per-query heap (fewer than k rows may return —
        # the documented ES behavior, not an error)
        scored = scored.filter(F.col(out_col) >= float(min_sim))
    return (
        scored
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            out_col,
            "rank",
        )
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    seed_ids: list[int],
    n_iter: int = 2,
) -> list[list[float]]:
    """Spherical k-means (Lloyd's) over an embedding column — the trained
    coarse quantizer for :func:`ivf_topk` (which is training-free by
    default; pass these centroids to make recall tunable without changing
    any plan shape).

    Pinned semantics (mirrored by the DuckDB oracle and the numpy
    reference in tests):
    - init: centroids = the vectors with ``seed_ids``, in that order;
    - assign: cell = argmax cosine(vector, centroid), ties -> lowest cell;
    - update: centroid = element-wise MEAN of assigned vectors (cosine
      assignment makes normalization immaterial); an empty cell keeps its
      previous centroid;
    - ``n_iter`` assign+update rounds, deterministic throughout.

    Scale shape: each round is one job — per-dimension partial sums
    (posexplode -> groupBy(cell, dim), map-side combine collapses to
    k*d rows before the exchange) and only the k*d centroid matrix ever
    reaches the driver. At 10^9 vectors the per-round shuffle is k*d rows.
    """
    cent_rows = {
        r[0]: [float(x) for x in r[1]]
        for r in df.filter(F.col(id_col).isin(seed_ids))
        .select(id_col, vec_col)
        .collect()
    }
    cents = [cent_rows[s] for s in seed_ids]
    for _ in range(n_iter):
        cos_arr = F.array(*[
            _dot(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
            / (_norm(F.col(vec_col))
               * F.lit(float(np.sqrt(np.dot(c, c)))))
            for c in cents
        ])
        # 1-based argmax, ties -> first (lowest cell ordinal)
        cell = F.array_position(cos_arr, F.array_max(cos_arr))
        sums = (
            df.select(cell.alias("cell"),
                      F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("v").cast("double")).alias("s"),
                 F.count("*").alias("c"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_cell.setdefault(int(r["cell"]) - 1, {})[int(r["dim"])] = (
                float(r["s"]), int(r["c"])
            )
        new_cents = []
        for j, old in enumerate(cents):
            got = by_cell.get(j)
            if not got:
                new_cents.append(old)  # empty cell keeps its centroid
            else:
                new_cents.append(
                    [got[d][0] / got[d][1] for d in range(len(old))]
                )
        cents = new_cents
    return cents


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_ids: list[int],
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize every vector to its nearest
    centroid cell, search only the query's ``n_probe`` nearest cells.
    ``centroids`` (e.g. from :func:`kmeans_centroids`) overrides the
    training-free ``centroid_ids`` quantizer without changing plan shape.

    The scale path past brute force: at 10^9 vectors the exact scan touches
    everything; IVF touches n_probe/n_cells of it. The quantizer here is
    training-free (centroids = the vectors with ``centroid_ids``, a
    deterministic sample — swap in k-means centroids without changing any
    plan shape). Everything is JVM arithmetic: cell assignment is an argmax
    over the centroid-cosine array, candidates flow through a broadcast
    join on cell, and the final per-query top-k rides WindowGroupLimit
    (pre-trimmed to k per partition before the exchange).

    Returns (query_id, neighbor_id, cos_sim, rank) — approximate: a true
    neighbor living in an unprobed cell is missed, the IVF recall contract.
    """
    if centroids is not None:
        cents = [list(c) for c in centroids]
    else:
        cent_rows = {
            r[0]: list(r[1])
            for r in df.filter(F.col(id_col).isin(centroid_ids))
            .select(id_col, vec_col)
            .collect()
        }
        cents = [cent_rows[c] for c in centroid_ids]

    def cos_to(cvec: list) -> F.Column:
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        return _dot(F.col(vec_col), arr) / (_norm(F.col(vec_col)) * _norm(arr))

    cos_arr = F.array(*[cos_to(c) for c in cents])
    # 1-based cell index; ties -> first (lowest centroid ordinal), matching
    # the oracle's (cos DESC, ordinal ASC) row_number
    cell = F.array_position(cos_arr, F.array_max(cos_arr))
    cells = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        cell.alias("cell"),
    )

    qprobe = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.posexplode(cos_arr).alias("j", "ccos"),
        )
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("ccos"), F.asc("j")
                )
            ),
        )
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "qvec", (F.col("j") + 1).alias("cell"))
    )

    cand = cells.join(F.broadcast(qprobe), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("nvec"), F.col("qvec")) / (
        _norm(F.col("nvec")) * _norm(F.col("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def near_dup_survivors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Embedding-cosine near-dup filter: the ids that SURVIVE dedup.

    Pair generation is the LSH-bucketed candidate path
    (:func:`lsh_candidate_pairs` at >= threshold); the survivor rule is the
    standard greedy keep-smallest-id: a row is dropped iff it is the larger
    member of some near-dup pair (one anti-join — no iterative connected
    components, the usual first-pass web-dedup contract).
    """
    pairs = lsh_candidate_pairs(
        df, id_col, vec_col, dim, n_planes, seed,
        min_cos=threshold, max_bucket_size=max_bucket_size,
    )
    losers = pairs.select(F.col("id_b").alias("_loser")).distinct()
    return (
        df.select(F.col(id_col).alias("id"))
        .join(losers, F.col("id") == F.col("_loser"), "left_anti")
        .select("id")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string of <v, h_j>.

    Hyperplanes are a deterministic seeded numpy matrix broadcast as
    literals (tiny); the signature is all-JVM arithmetic. Cosine-similar
    vectors collide with probability 1 - theta/pi per plane.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in planes[j]]),
                    # explicit f64 promotion: the sign must agree with the
                    # all-DOUBLE oracle computation bit-for-bit
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    sig = F.concat(*[b.cast("string") for b in bits])
    return df.select(F.col(id_col).alias("id"), sig.alias("bucket"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    min_cos: float = 0.0,
    max_bucket_size: int = 200,
    log_dropped: bool = False,
) -> DataFrame:
    """ANN candidate pairs: same-bucket self-join, exact cosine re-score.

    Scale shape: the bucket self-join shuffles only (id, bucket) — vectors
    are joined back onto the (small) deduped candidate set for the exact
    re-score, never riding the bucket exchange. Buckets larger than
    ``max_bucket_size`` are dropped before the self-join: one hot bucket
    (e.g. the all-near-zero-vector bucket) would otherwise emit O(B^2)
    pairs. ``max_bucket_size=0`` disables; ``log_dropped=True`` prints the
    dropped-bucket count (extra job, off the hot path by default).
    """
    b = hyperplane_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed)
    if max_bucket_size:
        bsize = b.groupBy("bucket").agg(F.count("*").alias("bsz"))
        if log_dropped:
            n_dropped = bsize.filter(F.col("bsz") > max_bucket_size).count()
            print(f"[lsh_candidate_pairs] buckets dropped by size cap "
                  f"{max_bucket_size}: {n_dropped}")
        b = b.join(
            bsize.filter(F.col("bsz") <= max_bucket_size).select("bucket"),
            "bucket",
        )
    cand = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    pairs = (
        cand.join(v.select(F.col("id").alias("id_a"),
                           F.col("vec").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"),
                       F.col("vec").alias("vb")), "id_b")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= min_cos)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization — the standard ANN memory
    lever (4x smaller vectors, int arithmetic) used before exact
    rescoring (FAISS SQ8 / Lucene int8 HNSW quantization).

    scale = max(|v_i|)/127 (per vector; 1.0 for the all-zero vector so
    division is total), q_i = round(v_i/scale) in [-127, 127]. All JVM
    array expressions. Returns (id, qvec array<tinyint>, scale double) —
    parquet stores the tinyint array at 1 byte/dim."""
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        / F.lit(127.0),
        F.lit(1e-30),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            v,
            lambda x: F.greatest(
                F.least(F.round(x.cast("double") / scale, 0), F.lit(127.0)),
                F.lit(-127.0),
            ).cast("tinyint"),
        ).alias("qvec"),
        scale.alias("scale"),
    )


def cosine_topk_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 10,
    rescore_factor: int = 4,
) -> DataFrame:
    """Quantized-coarse + exact-rescore cosine top-k: score EVERY
    candidate on int8 vectors (cheap, 4x less memory traffic — at 10^9
    vectors the scan is memory-bandwidth-bound, so int8 is ~4x the
    throughput of f32), keep the top `k * rescore_factor` per query,
    rescore ONLY those with full-precision cosine, return the exact
    top-k of the rescored set.

    Cosine is scale-invariant, so the per-vector quantization scale
    cancels and the coarse score is just the int-dot cosine of the
    quantized vectors. Recall contract (pinned, the FAISS/Lucene SQ8
    shape): coarse ordering can differ from exact near ties; any true
    top-k neighbor whose exact rank fits inside the rescore window is
    returned in exact order — tests pin window-recall on seeded data.
    Returns (query_id, neighbor_id, cos_sim, rank) like
    :func:`cosine_topk`."""
    if rescore_factor < 1:
        raise ValueError("rescore_factor must be >= 1")
    qz = quantize_int8(df, id_col, vec_col)
    qq = (
        qz.filter(F.col("id").isin(query_ids))
        .select(F.col("id").alias("query_id"), F.col("qvec").alias("q8"))
    )
    # zero-norm guard: cosine with the zero vector is undefined; pin it
    # to 0 (dot is 0 too) instead of an ANSI divide-by-zero job failure
    coarse_cos = _dot(F.col("qvec"), F.col("q8")) / F.greatest(
        _norm(F.col("qvec")) * _norm(F.col("q8")), F.lit(1e-300)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("coarse"), F.asc("id")
    )
    survivors = (
        qz.crossJoin(F.broadcast(qq))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("coarse", F.round(coarse_cos, 6))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= k * rescore_factor)
        .select("query_id", "id")
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    qv = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qvec"))
    )
    exact = (
        survivors.join(v, "id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / F.greatest(_norm(F.col("vec")) * _norm(F.col("qvec")),
                             F.lit(1e-300)),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"),
                "cos_sim", "rank")
    )
