"""Text-pipeline operator tests: short-doc guards, candidate-join caps,
and the engine-portable hash60 used by the MinHash/SimHash oracles.

Cap tests follow the VERDICT round-1 contract: plant one hot
shingle/bucket across many docs, assert the candidate output stays bounded
while normal near-dup pairs are unchanged.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import similarity as sim
from picdexer_spark.operators import textops as tx


@pytest.fixture(scope="module")
def short_docs(spark):
    return spark.createDataFrame(
        [(0, "one"), (1, "two toks"), (2, ""), (3, None),
         (4, "the quick brown fox jumps"),
         (5, "the quick brown fox jumps"),
         (6, "totally different words entirely here")],
        "doc_id long, text string",
    )


def test_hash60_golden(spark):
    # pinned cross-engine value: int(md5('hello').hexdigest()[:15], 16)
    expect = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    got = spark.range(1).select(tx.hash60(F.lit("hello")).alias("h")).first()["h"]
    assert got == expect == 419982666956583591
    # salted form used by MinHash permutations
    expect_j = int(hashlib.md5(b"hello#3").hexdigest()[:15], 16)
    got_j = spark.range(1).select(tx.hash60(F.lit("hello"), 3).alias("h")).first()["h"]
    assert got_j == expect_j


def test_shingles_short_docs_no_crash(spark, short_docs):
    """Docs with < n tokens must yield empty shingle sets, not a job abort
    (unguarded F.sequence(0, size-n) emits [0,-1] and slice() throws)."""
    pairs = tx.ngram_jaccard_pairs(
        short_docs, "doc_id", "text", n=3, threshold=0.2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}
    assert pairs[0]["jaccard"] == 1.0
    # minhash path shares _shingles
    mh = tx.minhash_lsh_pairs(short_docs, "doc_id", "text", threshold=0.4).collect()
    assert {(r["id_a"], r["id_b"]) for r in mh} == {(4, 5)}
    # simhash handles empty/None text (empty token array -> fp 0)
    fps = {r["id"]: r["simhash"] for r in tx.simhash(short_docs, "doc_id", "text").collect()}
    assert fps[2] == 0 and fps[3] == 0 and fps[4] == fps[5]


def test_ngram_shingle_df_cap_bounds_hot_shingle(spark):
    """One shingle shared by 60 docs: uncapped -> C(60,2)=1770 candidate
    pairs; with df cap below 60 the hot shingle is excluded while a genuine
    near-dup pair (sharing rare shingles) survives."""
    hot = [(i, f"common boiler plate uniq{i} tail{i}") for i in range(60)]
    # docs 100/101 share their whole (rare) shingle set
    dup = [(100, "alpha beta gamma delta epsilon"),
           (101, "alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(hot + dup, "doc_id long, text string")

    capped = tx.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.01, max_shingle_df=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}

    uncapped = tx.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.01, max_shingle_df=0
    ).count()
    assert uncapped > 1000  # the quadratic blow-up the cap prevents


def test_minhash_bucket_cap_bounds_hot_bucket(spark):
    """50 identical docs collide in every band bucket: uncapped ->
    C(50,2)=1225 pairs; cap 10 drops those buckets, while a distinct
    near-dup pair in its own small bucket survives."""
    clones = [(i, "same exact text in every clone document here") for i in range(50)]
    dup = [(200, "omega psi chi phi upsilon tau sigma"),
           (201, "omega psi chi phi upsilon tau sigma")]
    df = spark.createDataFrame(clones + dup, "doc_id long, text string")
    capped = tx.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.4, max_bucket_size=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(200, 201)}
    uncapped = tx.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.4, max_bucket_size=0
    ).count()
    assert uncapped == 1225 + 1


def test_ann_lsh_bucket_cap(spark):
    """All-parallel vectors land in one bucket; cap bounds the self-join."""
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8).astype("float32")
    rows = [(i, (base * (1.0 + 0.001 * i)).tolist()) for i in range(40)]
    # one pair pointing the other way, its own bucket
    other = (-base).tolist()
    rows += [(100, other), (101, [x * 1.001 for x in other])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = sim.lsh_candidate_pairs(
        df, "vec_id", "embedding", dim=8, n_planes=6, min_cos=0.5,
        max_bucket_size=10,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}
    uncapped = sim.lsh_candidate_pairs(
        df, "vec_id", "embedding", dim=8, n_planes=6, min_cos=0.5,
        max_bucket_size=0,
    ).count()
    assert uncapped == 40 * 39 // 2 + 1


def test_minhash_est_jaccard_is_exact_for_identical_docs(spark, short_docs):
    sigs = tx.minhash_signatures(short_docs, "doc_id", "text")
    rows = {r["id"]: r["sig"] for r in sigs.collect()}
    assert rows[4] == rows[5]
    assert len(rows[4]) == 32
    # doc 0/1 too short for 3-gram shingles -> no signature rows
    assert 0 not in rows and 2 not in rows and 3 not in rows


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "don't stop! 123 here"), (2, ""),
         (3, "supercalifragilistic")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in tx.token_counts(df, "doc_id", "text").collect()}
    assert (got[0]["n_ws"], got[0]["n_pieces"]) == (2, 2)
    # don't -> don | ' | t ; stop! -> stop | ! ; 123 ; here -> 7 pieces
    assert got[1]["n_ws"] == 4 and got[1]["n_pieces"] == 7
    assert got[2]["n_ws"] == 0 and got[2]["n_pieces"] == 0 and got[2]["n_subwords"] == 0
    # 20-letter run -> ceil(20/4) = 5 subword estimate
    assert got[3]["n_pieces"] == 1 and got[3]["n_subwords"] == 5


def test_ivf_topk_probes_subset_and_exact_rescore(spark):
    import numpy as np
    from picdexer_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    res = sim.ivf_topk(df, "vec_id", "embedding",
                       centroid_ids=[0, 10, 20, 30], query_ids=[5],
                       k=5, n_probe=4).collect()
    # n_probe == n_cells -> every cell searched -> equals exact top-k
    exact = sim.cosine_topk(df, "vec_id", "embedding", [5], k=5).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in res] == \
           [(r["neighbor_id"], r["cos_sim"]) for r in exact]
    # with 1 probe the candidate set shrinks (approximate contract)
    res1 = sim.ivf_topk(df, "vec_id", "embedding",
                        centroid_ids=[0, 10, 20, 30], query_ids=[5],
                        k=120, n_probe=1).count()
    assert res1 < 119


def test_near_dup_survivors_greedy_smallest_id(spark):
    import numpy as np
    from picdexer_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8).astype("float32")
    other = rng.standard_normal(8).astype("float32")
    rows = [(0, base.tolist()), (1, (base * 1.001).tolist()),
            (2, (base * 0.999).tolist()), (10, other.tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    surv = {r["id"] for r in sim.near_dup_survivors(
        df, "vec_id", "embedding", dim=8, threshold=0.95, n_planes=4
    ).collect()}
    # 0 survives its clone cluster; 10 is unrelated and survives
    assert surv == {0, 10}


def test_winnow_fingerprints(spark):
    """Winnowing guarantee: documents sharing a substring of length >=
    k+window-1 chars (after normalization) share at least one fingerprint;
    unrelated docs share none (w.h.p.); short/empty/None texts yield empty
    fingerprint sets without error."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight"),
         (1, "INTRO! quick brown fox jumps over the lazy TAIL bits"),
         (2, "completely unrelated words appear in this one thing"),
         (3, "ab"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["id"]: set(r["fps"])
            for r in tx.winnow_fingerprints(df, "doc_id", "text").collect()}
    assert rows[0] & rows[1], "overlapping docs must share a fingerprint"
    assert not (rows[0] & rows[2])
    assert rows[3] == set() and rows[4] == set() and rows[5] == set()
    # punctuation/case robustness: normalization removes them entirely
    df2 = spark.createDataFrame(
        [(0, "Alpha, beta; GAMMA delta epsilon zeta eta theta"),
         (1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    r2 = {r["id"]: set(r["fps"])
          for r in tx.winnow_fingerprints(df2, "doc_id", "text").collect()}
    assert r2[0] == r2[1]


def test_token_counts_null_text(spark):
    df = spark.createDataFrame([(0, None), (1, "two words")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in tx.token_counts(df, "doc_id", "text").collect()}
    assert (got[0]["n_ws"], got[0]["n_pieces"], got[0]["n_subwords"]) == (0, 0, 0)
    assert got[1]["n_ws"] == 2


def test_kmeans_centroids_matches_numpy_reference(spark):
    """Spherical k-means (assign by cosine, mean update, empty cell keeps
    its centroid) must match a straightforward numpy implementation of the
    pinned semantics, and trained centroids must improve (or equal) the
    quantizer's within-cell cosine vs the training-free seeds."""
    import numpy as np
    from picdexer_spark.operators import similarity as sim

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((90, 6)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    seeds = [0, 7, 21, 40]

    def np_kmeans(n_iter):
        v = vecs.astype(np.float64)
        cents = [v[s].copy() for s in seeds]
        for _ in range(n_iter):
            c = np.stack(cents)
            cos = (v @ c.T) / (
                np.linalg.norm(v, axis=1)[:, None]
                * np.linalg.norm(c, axis=1)[None, :]
            )
            cell = np.argmax(cos, axis=1)  # ties -> lowest index
            for j in range(len(cents)):
                sel = v[cell == j]
                if len(sel):
                    cents[j] = sel.mean(axis=0)
        return cents

    for n_iter in (1, 2):
        got = sim.kmeans_centroids(df, "vec_id", "embedding", seeds,
                                   n_iter=n_iter)
        want = np_kmeans(n_iter)
        for g, w in zip(got, want):
            assert np.allclose(np.array(g), w, rtol=1e-9, atol=1e-12)

    # quality: mean within-cell cosine with trained centroids >= seeds'
    def quality(cents):
        c = np.stack([np.asarray(x, np.float64) for x in cents])
        v = vecs.astype(np.float64)
        cos = (v @ c.T) / (
            np.linalg.norm(v, axis=1)[:, None]
            * np.linalg.norm(c, axis=1)[None, :]
        )
        return cos.max(axis=1).mean()

    trained = sim.kmeans_centroids(df, "vec_id", "embedding", seeds, n_iter=2)
    assert quality(trained) >= quality([vecs[s].tolist() for s in seeds])

    # trained centroids drop into ivf_topk unchanged; full-probe == exact
    res = sim.ivf_topk(df, "vec_id", "embedding", centroid_ids=seeds,
                       query_ids=[5], k=5, n_probe=len(seeds),
                       centroids=trained).collect()
    exact = sim.cosine_topk(df, "vec_id", "embedding", [5], k=5).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in res] == \
           [(r["neighbor_id"], r["cos_sim"]) for r in exact]


def test_date_histogram_pipeline(spark):
    """Pipeline aggs over histogram buckets: derivative (first NULL),
    cumulative sum, trailing window-3 moving average (partial head)."""
    import datetime as dt

    from picdexer_spark.operators import dashboards as dash

    base = dt.datetime(2024, 1, 1)
    # bucket counts by 12h period: [2, 1, 3] (one empty period absent)
    rows = [base + dt.timedelta(hours=h) for h in (1, 2, 13, 49, 50, 51)]
    df = spark.createDataFrame([(t,) for t in rows], "ts timestamp")
    got = [(int(r["n"]),
            None if r["delta_n"] is None else int(r["delta_n"]),
            int(r["cum_n"]), float(r["mavg3_n"]))
           for r in dash.date_histogram_pipeline(df, "ts", "12h").collect()]
    assert got == [
        (2, None, 2, 2.0),
        (1, -1, 3, 1.5),
        (3, 2, 6, 2.0),
    ]


def test_range_buckets(spark):
    """ES range agg: half-open [from, to) buckets + unbounded tails, ES
    key format, EVERY configured bucket present (empty -> n=0), nulls
    out, declared order preserved."""
    import pytest as _pytest

    from picdexer_spark.operators import dashboards as dash

    vals = [0.5, 10.0, 10.0, 25.0, 99.0, 100.0, None, -3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [(r["key"], r["n"])
           for r in dash.range_buckets(df, "x", [10.0, 100.0]).collect()]
    # -3, 0.5 below 10; 10,10,25,99 in [10,100); 100 in [100,*); null out
    assert got == [("*-10", 2), ("10-100", 4), ("100-*", 1)]
    # empty middle bucket survives with n=0
    got2 = [(r["key"], r["n"])
            for r in dash.range_buckets(df, "x",
                                        [10.0, 50.0, 60.0]).collect()]
    assert got2 == [("*-10", 2), ("10-50", 3), ("50-60", 0), ("60-*", 2)]
    with _pytest.raises(ValueError):
        dash.range_buckets(df, "x", [])
    with _pytest.raises(ValueError):
        dash.range_buckets(df, "x", [5.0, 1.0])


def test_percentiles_and_cardinality(spark):
    """percentiles pins exact linear interpolation (numpy 'linear'
    definition); cardinality exact==distinct, approx within HLL bounds."""
    import numpy as np

    from picdexer_spark.operators import dashboards as dash

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["pct"]: r["value"]
           for r in dash.percentiles(df, "x", (0.5, 0.9, 0.99)).collect()}
    for p in (0.5, 0.9, 0.99):
        want = float(np.percentile(np.array(vals, float), p * 100,
                                   method="linear"))
        assert got[p] == pytest.approx(want, rel=1e-12), p

    df2 = spark.createDataFrame(
        [(v,) for v in ["a", "b", "a", None, "c", "b"]], "x string")
    assert dash.cardinality(df2, "x", exact=True).first()["n_distinct"] == 3
    approx = dash.cardinality(df2, "x", exact=False).first()["n_distinct"]
    assert 2 <= approx <= 4  # HLL++ on 3 values is near-exact


# ------------------------------- connected components + near-dup clusters

def _uf_components(edges):
    """Brute-force union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in tx.connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_connected_components_deep_chain(spark):
    # a 20-link chain needs ~diameter rounds — the multi-iteration path
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in tx.connected_components(df, max_iter=30).collect()}
    assert got == {i: 0 for i in range(21)}
    with pytest.raises(RuntimeError):
        tx.connected_components(df, max_iter=2)


def test_near_dup_clusters_end_to_end(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    variant = base.replace("tok3 ", "tok3x ")  # near-dup of base
    other = " ".join(f"zz{i}" for i in range(40))
    rows = [(0, base), (1, base + " tail"), (2, variant),
            (3, other), (4, other + " xy"), (5, "totally different text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tx.near_dup_clusters(df, "doc_id", "text", threshold=0.5,
                               num_hashes=32, bands=16)
    rowsd = {r["doc_id"]: (r["cluster"], r["is_survivor"])
             for r in got.collect()}
    # pairs chain 0-1-2 into one cluster rooted at 0; 3-4 cluster at 3;
    # 5 is a singleton surviving as itself
    pairs = [(r["id_a"], r["id_b"]) for r in tx.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, num_hashes=32,
        bands=16).collect()]
    want = _uf_components(pairs)
    for d in range(6):
        want_cluster = want.get(d, d)
        assert rowsd[d] == (want_cluster, want_cluster == d), d
    assert rowsd[5] == (5, True)
    # every cluster has exactly one survivor
    from collections import Counter
    surv = Counter(c for c, s in rowsd.values() if s)
    clusters = set(c for c, _s in rowsd.values())
    assert set(surv) == clusters and all(v == 1 for v in surv.values())


def test_pack_sequences_concat_and_chunk(spark):
    rows = [(0, "en", "a b c d e"), (1, "en", "f g h"),
            (2, "en", "i j k l"), (3, "de", "x y"),
            (4, "de", ""), (5, "de", "z")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted((r["part"], r["doc_id"], r["bin"],
                  r["tok_start"], r["tok_end"])
                 for r in tx.pack_sequences(df, "doc_id", "text",
                                            4, "lang").collect())
    # en stream: doc0 (5 toks) spans bins 0 and 1; doc1 fills bin 1;
    # doc2 starts exactly at bin 2. de: empty doc 4 is skipped.
    assert got == [("de", 3, 0, 0, 2), ("de", 5, 0, 0, 1),
                   ("en", 0, 0, 0, 4), ("en", 0, 1, 4, 5),
                   ("en", 1, 1, 0, 3), ("en", 2, 2, 0, 4)]
    # invariants on a bigger random-ish corpus: spans tile each doc
    # exactly, and each (part, bin) holds <= budget tokens
    import collections
    big = spark.createDataFrame(
        [(i, "p%d" % (i % 3), " ".join("t%d" % j for j in range(i % 17)))
         for i in range(60)], "doc_id long, lang string, text string")
    spans = tx.pack_sequences(big, "doc_id", "text", 10, "lang").collect()
    per_doc = collections.defaultdict(int)
    per_bin = collections.defaultdict(int)
    for r in spans:
        assert 0 <= r["tok_start"] < r["tok_end"]
        per_doc[r["doc_id"]] += r["tok_end"] - r["tok_start"]
        per_bin[(r["part"], r["bin"])] += r["tok_end"] - r["tok_start"]
    for i in range(60):
        want = i % 17
        assert per_doc.get(i, 0) == want
    # every bin except each part's last is exactly full
    for part in {p for p, _ in per_bin}:
        bins = sorted(b for p, b in per_bin if p == part)
        for b in bins[:-1]:
            assert per_bin[(part, b)] == 10
        assert 0 < per_bin[(part, bins[-1])] <= 10
    with pytest.raises(ValueError):
        tx.pack_sequences(df, "doc_id", "text", 0, "lang")


def test_cosine_topk_candidate_filter_is_pre_filter(spark):
    """ES knn-with-filter: the predicate restricts the NEIGHBOR pool
    before the search (query vectors resolve unfiltered), so exactly k
    filtered survivors return — vs the numpy brute force."""
    import numpy as np
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((80, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = sim.cosine_topk(df, "vec_id", "embedding", [7], k=5,
                          candidate_filter=F.col("vec_id") % 2 == 0
                          ).collect()
    q = vecs[7].astype("float64")
    sims = {}
    for i, v in enumerate(vecs):
        if i % 2 == 0 and i != 7:
            v = v.astype("float64")
            sims[i] = round(float(v @ q) / float(
                np.linalg.norm(v) * np.linalg.norm(q)), 6)
    want = sorted(sims.items(), key=lambda it: (-it[1], it[0]))[:5]
    assert [(r["neighbor_id"], r["cos_sim"]) for r in got] == want
    # query id 7 is ODD: with pre-filter semantics it must still drive
    # the search even though the candidate filter excludes it
    assert len(got) == 5 and all(r["neighbor_id"] % 2 == 0 for r in got)


def test_int8_quantize_and_rescore(spark):
    """Quantized coarse + exact rescore: scale/clamp invariants, and with
    a generous rescore window the result must EQUAL exact brute force."""
    import numpy as np

    from picdexer_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_int8,
        quantize_int8,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs[7] = 0.0  # all-zero vector must not divide by zero
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "id long, embedding array<float>")
    qz = {r["id"]: r for r in quantize_int8(df, "id", "embedding").collect()}
    for i in (0, 3, 7):
        q = np.array(qz[i]["qvec"], np.int64)
        assert q.min() >= -127 and q.max() <= 127
        if i != 7:
            # max-|component| quantizes to exactly +-127
            assert np.abs(q).max() == 127
            back = q * qz[i]["scale"]
            assert np.abs(back - vecs[i]).max() <= qz[i]["scale"] / 2 + 1e-9
        else:
            assert (q == 0).all()
    # exact-vs-quantized compare on the non-degenerate set (the exact
    # brute-force kernel predates the zero-norm guard)
    df_nz = df.filter("id != 7")
    exact = [(r["query_id"], r["neighbor_id"], r["rank"])
             for r in cosine_topk(df_nz, "id", "embedding", [0, 5], k=5)
             .orderBy("query_id", "rank").collect()]
    q8 = [(r["query_id"], r["neighbor_id"], r["rank"])
          for r in cosine_topk_int8(df_nz, "id", "embedding", [0, 5], k=5,
                                    rescore_factor=8)
          .orderBy("query_id", "rank").collect()]
    assert q8 == exact
    import pytest as _pt
    with _pt.raises(ValueError):
        cosine_topk_int8(df, "id", "embedding", [0], rescore_factor=0)


def test_cosine_topk_min_sim_threshold(spark):
    """ES knn `similarity`: a score floor — fewer than k rows may
    return, and every returned row clears the floor."""
    import numpy as np

    from picdexer_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "id long, embedding array<float>")
    full = cosine_topk(df, "id", "embedding", [0], k=10).collect()
    floor = sorted((r["cos_sim"] for r in full), reverse=True)[4]
    cut = cosine_topk(df, "id", "embedding", [0], k=10,
                      min_sim=floor).collect()
    assert 0 < len(cut) <= 5 + 1           # ties at the floor included
    assert all(r["cos_sim"] >= floor for r in cut)
    # ranks stay dense 1..n after the cut
    assert [r["rank"] for r in
            sorted(cut, key=lambda r: r["rank"])] == list(
        range(1, len(cut) + 1))


def test_decontaminate_flags_planted_overlap(spark):
    from picdexer_spark.operators.textops import decontaminate

    bench_q = ("what is the capital of france the capital of france is "
               "paris obviously")
    docs = spark.createDataFrame([
        (1, "totally clean document about cooking pasta with tomatoes "
            "and fresh basil in a copper pot"),
        (2, "leaked eval row: what is the capital of france the capital "
            "of france is paris obviously plus some page chrome"),
        (3, "another clean page discussing distributed systems and "
            "consensus protocols at length"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame([(0, bench_q)], "bid long, text string")

    got = {r["id"]: r["n_matched"]
           for r in decontaminate(docs, bench, "doc_id", "text",
                                  n=13).collect()}
    assert set(got) == {2}  # only the leaked doc flags; clean docs absent
    # a tighter rule (more required collisions) can clear it again
    assert decontaminate(docs, bench, "doc_id", "text", n=13,
                         min_matches=got[2] + 1).count() == 0
    # scrub composition: anti-join removes exactly the flagged doc
    flagged = decontaminate(docs, bench, "doc_id", "text", n=13) \
        .withColumnRenamed("id", "doc_id")
    assert sorted(r["doc_id"] for r in
                  docs.join(flagged, "doc_id", "left_anti")
                  .select("doc_id").collect()) == [1, 3]
    import pytest as _pt
    with _pt.raises(ValueError):
        decontaminate(docs, bench, "doc_id", "text", min_matches=0)


def test_repetition_stats_hand_computed(spark):
    from picdexer_spark.operators.textops import repetition_stats

    text = "aa bb aa bb aa\nx y\naa bb aa bb aa\n\n  \nzz"
    df = spark.createDataFrame([(1, text), (2, None), (3, "solo")],
                               "doc_id long, text string")
    r = {row["id"]: row for row in
         repetition_stats(df, "doc_id", "text").collect()}
    got = r[1]
    # lines: ["aa bb aa bb aa", "x y", "aa bb aa bb aa", "zz"]
    assert got["n_lines"] == 4
    assert got["dup_line_frac"] == 0.5          # 2 of 4 instances repeat
    assert got["dup_line_char_frac"] == 28 / 33  # 14+14 of 14+3+14+2 chars
    # tokens (13): aa bb aa bb aa x y aa bb aa bb aa zz; token chars 24
    # top 2-gram (aa,bb) x4 (tie vs (bb,aa) broken gram-asc) -> 4*4/24
    assert got["top_2gram_char_frac"] == 16 / 24
    # top 3-gram (aa,bb,aa) x4 -> 4*6/24 (overlap counting may reach 1.0)
    assert got["top_3gram_char_frac"] == 24 / 24
    # top 4-gram (aa,bb,aa,bb) x2 -> 2*8/24
    assert got["top_4gram_char_frac"] == 16 / 24
    # null text and <n-token docs pin to zeros, never NaN/error
    assert (r[2]["n_lines"], r[2]["dup_line_frac"],
            r[2]["top_2gram_char_frac"]) == (0, 0.0, 0.0)
    assert r[3]["n_lines"] == 1 and r[3]["top_2gram_char_frac"] == 0.0


def test_url_features_and_blocklist(spark):
    from picdexer_spark.operators.textops import (filter_blocked_domains,
                                                  url_features)

    df = spark.createDataFrame([
        (1, "https://User@WWW.News.Example.COM:8443/a/b/c?x=1#f"),
        (2, "http://blog.spam.biz/post"),
        (3, "not a url at all"),
        (4, "https://single/"),
    ], "doc_id long, url string")
    r = {x["id"]: x for x in url_features(df, "doc_id", "url").collect()}
    assert (r[1]["scheme"], r[1]["host"], r[1]["registered_domain"],
            r[1]["tld"], r[1]["path_depth"], r[1]["is_https"]) == \
        ("https", "www.news.example.com", "example.com", "com", 3, True)
    assert (r[2]["registered_domain"], r[2]["path_depth"],
            r[2]["is_https"]) == ("spam.biz", 1, False)
    # unparsable -> empty parts, visible (never dropped)
    assert (r[3]["scheme"], r[3]["host"], r[3]["path_depth"]) == ("", "", 0)
    # single-label host has no registered domain (PSL-free pin)
    assert r[4]["registered_domain"] == ""

    blocked = spark.createDataFrame([("spam.biz",)], "d string")
    kept = filter_blocked_domains(df, "url", blocked)
    assert sorted(x["doc_id"] for x in kept.collect()) == [1, 3, 4]
    assert kept.columns == ["doc_id", "url"]  # helper column dropped
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_chunk_documents_sliding_window(spark):
    from picdexer_spark.operators.textops import chunk_documents

    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"  # 11 tokens
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, ""), (4, None)],
                               "doc_id long, text string")
    rows = sorted(
        (r["id"], r["chunk_no"], r["tok_start"], r["tok_end"],
         r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text",
                                 chunk_tokens=4, overlap=1).collect())
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 7, "t3 t4 t5 t6"),
        (1, 2, 6, 10, "t6 t7 t8 t9"),
        (1, 3, 9, 11, "t9 t10"),  # short final window, never re-anchored
    ]
    # short doc -> one full-doc chunk; empty/NULL -> nothing
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, 2, "a b")]
    assert not [r for r in rows if r[0] in (3, 4)]
    # every token index covered exactly once per non-overlap position
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)


def test_chunk_documents_tiling_invariants(spark):
    """Window-arithmetic invariants across configs and doc lengths: starts
    advance by exactly the stride, ends are monotone and reach n, the
    chunk text is the literal token slice, every token is covered."""
    from picdexer_spark.operators.textops import chunk_documents

    docs = [(n, " ".join(f"w{j}" for j in range(n))) for n in range(0, 41)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk, overlap in ((1, 0), (2, 1), (5, 0), (7, 3), (16, 15)):
        stride = chunk - overlap
        rows = chunk_documents(df, "doc_id", "text", chunk, overlap) \
            .orderBy("id", "chunk_no").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
        for n in range(0, 41):
            got = by_doc.get(n, [])
            if n == 0:
                assert not got
                continue
            assert [r["chunk_no"] for r in got] == list(range(len(got)))
            for i, r in enumerate(got):
                assert r["tok_start"] == i * stride
                assert r["tok_end"] == min(i * stride + chunk, n)
                assert r["chunk_text"] == " ".join(
                    f"w{j}" for j in range(r["tok_start"], r["tok_end"]))
            assert got[-1]["tok_end"] == n          # coverage reaches n
            assert got[0]["tok_start"] == 0
            # exactly enough windows: one fewer would leave a tail
            if len(got) > 1:
                assert (len(got) - 2) * stride + chunk < n


def test_knn_metrics_match_numpy(spark):
    """ES dense_vector metric parity: dot_product / l2_norm rank and
    score exactly as numpy computes the ES _score transforms; cosine
    path and its column name are untouched."""
    import numpy as np

    from picdexer_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")

    for metric, score_fn in (
        ("dot_product", lambda q, n: (1 + q @ n) / 2),
        ("l2_norm", lambda q, n: 1 / (1 + ((q - n) ** 2).sum())),
    ):
        got = cosine_topk(df, "vec_id", "embedding", [0, 5], k=4,
                          metric=metric).collect()
        assert got[0].__fields__[2] == "score"
        for qid in (0, 5):
            want = sorted(((float(score_fn(vecs[qid], vecs[j])), -j)
                           for j in range(30) if j != qid),
                          reverse=True)[:4]
            mine = [(r["score"], -r["neighbor_id"]) for r in got
                    if r["query_id"] == qid]
            assert [j for _, j in mine] == [j for _, j in want]
            for (ms, _), (ws, _) in zip(mine, want):
                assert ms == pytest.approx(ws, abs=1e-5)
    # cosine default unchanged (column name + refusal)
    assert cosine_topk(df, "vec_id", "embedding", [0], k=2) \
        .columns[2] == "cos_sim"
    import pytest as _pt
    with _pt.raises(ValueError):
        cosine_topk(df, "vec_id", "embedding", [0], metric="manhattan")
