"""Terms-agg distributed accuracy contract (top_terms_error_bounds):
ES `show_term_doc_count_error` semantics — per-shard top `shard_size`
lists, coordinator sum, worst-case per-key doc_count_error from the
truncated shards' smallest returned counts.

- a hand-computed two-shard case pins every number;
- a seeded randomized corpus is checked against an independent python
  reference of the ES algorithm;
- a non-truncated run (shard_size >= all keys) must report exact counts
  with zero error everywhere.
"""

import random

import pytest
from collections import Counter

from picdexer_spark.operators.dashboards import top_terms_error_bounds


def _py_reference(rows, k, shard_size):
    """ES terms-agg reduce over per-shard top lists, python-side."""
    by_shard: dict[int, Counter] = {}
    for shard, key in rows:
        by_shard.setdefault(shard, Counter())[key] += 1
    returned = {}   # shard -> [(key, n)] top list
    err_n = {}      # shard -> worst hidden count (0 if complete)
    for shard, cnt in by_shard.items():
        ordered = sorted(cnt.items(), key=lambda it: (-it[1], it[0]))
        returned[shard] = ordered[:shard_size]
        err_n[shard] = ordered[shard_size - 1][1] \
            if len(ordered) > shard_size else 0
    tot = sum(err_n.values())
    combined: dict[str, list] = {}
    for shard, lst in returned.items():
        for key, n in lst:
            agg = combined.setdefault(key, [0, 0])
            agg[0] += n
            agg[1] += err_n[shard]
    out = [(key, n, tot - present) for key, (n, present) in
           combined.items()]
    out.sort(key=lambda it: (-it[1], it[0]))
    return out[:k]


def _run(spark, rows, k, shard_size):
    df = spark.createDataFrame(rows, "shard int, key string")
    got = top_terms_error_bounds(df, "key", "shard", k=k,
                                 shard_size=shard_size).collect()
    return [(r["key"], int(r["n"]), int(r["doc_count_error"]))
            for r in got]


def test_hand_computed_two_shards(spark):
    rows = (
        [(0, "a")] * 5 + [(0, "b")] * 3 + [(0, "c")] * 1
        + [(1, "a")] * 2 + [(1, "d")] * 4 + [(1, "c")] * 2
    )
    # shard 0 top2 = a:5, b:3 (err 3); shard 1 top2 = d:4, a:2 (err 2;
    # the c:2/a:2 tie breaks key-asc to a). tot = 5.
    assert _run(spark, rows, k=3, shard_size=2) == [
        ("a", 7, 0),   # returned by both truncated shards
        ("d", 4, 3),   # missing from shard 0 (err 3)
        ("b", 3, 2),   # missing from shard 1 (err 2)
    ]


def test_randomized_matches_python_reference(spark):
    rng = random.Random(83)
    keys = [f"k{i:02d}" for i in range(40)]
    weights = [1.0 / (i + 1) for i in range(40)]  # Zipf-ish
    rows = [(rng.randrange(6), rng.choices(keys, weights)[0])
            for _ in range(4000)]
    for k, ss in [(10, 5), (15, 3), (5, 40)]:
        assert _run(spark, rows, k, ss) == _py_reference(rows, k, ss), \
            (k, ss)


def test_complete_shards_are_exact(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(4), rng.choice(["x", "y", "z"]))
            for _ in range(500)]
    got = _run(spark, rows, k=3, shard_size=10)
    true_counts = Counter(key for _s, key in rows)
    assert {(k, n) for k, n, _e in got} == set(true_counts.items())
    assert all(e == 0 for _k, _n, e in got)


def _composite_walk(spark, rows, size):
    """Page through ALL buckets with the after cursor; return the walk."""
    from picdexer_spark.operators.dashboards import composite_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "lang string, n int")
    srcs = [("lang", F.col("lang")), ("n", F.col("n"))]
    out, after = [], None
    while True:
        page = composite_agg(df, srcs, size=size, after=after).collect()
        if not page:
            return out
        out.extend((r["lang"], r["n"], r["doc_count"]) for r in page)
        after = (page[-1]["lang"], page[-1]["n"])


def test_composite_agg_pages_reconstruct_everything(spark):
    rng = random.Random(5)
    rows = [(rng.choice(["de", "en", "fr", None]), rng.randrange(6))
            for _ in range(800)]
    want = sorted(
        (lang, n, c) for (lang, n), c in
        Counter((lg, n) for lg, n in rows if lg is not None).items()
    )
    # any page size reconstructs the identical full bucket list, and a
    # page boundary never duplicates or drops a bucket
    for size in (1, 3, 7, 100):
        assert _composite_walk(spark, rows, size) == want, size


def test_composite_agg_after_arity_refused(spark):
    from picdexer_spark.operators.dashboards import composite_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("de", 1)], "lang string, n int")
    with pytest.raises(ValueError, match="after cursor"):
        composite_agg(df, [("lang", F.col("lang"))], after=("de", 1))


# ---- round-5 agg family: histogram / extended_stats / multi_terms / ----
# ---- top_hits ----------------------------------------------------------

def test_histogram_fills_empty_buckets(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.5,), (9.9,), (10.0,), (None,)], "v double")
    got = [(r["key"], r["doc_count"])
           for r in __import__("picdexer_spark.operators.dashboards",
                               fromlist=["histogram_agg"])
           .histogram_agg(df, "v", 2.0).collect()]
    # buckets 0,2,8,10 observed; 4 and 6 must be zero-filled (ES
    # min_doc_count=0 default); NULL skipped
    assert got == [(0.0, 1), (2.0, 1), (4.0, 0), (6.0, 0),
                   (8.0, 1), (10.0, 1)]


def test_histogram_min_doc_count_1_drops_gaps(spark):
    from picdexer_spark.operators.dashboards import histogram_agg
    df = spark.createDataFrame([(1.0,), (9.0,)], "v double")
    got = [(r["key"], r["doc_count"])
           for r in histogram_agg(df, "v", 2.0, min_doc_count=1).collect()]
    assert got == [(0.0, 1), (8.0, 1)]


def test_histogram_negative_values_floor_toward_minus_inf(spark):
    from picdexer_spark.operators.dashboards import histogram_agg
    df = spark.createDataFrame([(-0.5,), (-3.0,), (1.0,)], "v double")
    got = [(r["key"], r["doc_count"])
           for r in histogram_agg(df, "v", 2.0).collect()]
    # ES floors toward -inf: -0.5 -> -2, -3.0 -> -4
    assert got == [(-4.0, 1), (-2.0, 1), (0.0, 1)]


def test_histogram_refuses_nonpositive_interval(spark):
    from picdexer_spark.operators.dashboards import histogram_agg
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram_agg(df, "v", 0)


def test_extended_stats_population_variance(spark):
    from picdexer_spark.operators.dashboards import extended_stats
    import math
    vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = extended_stats(df, "v", sigma=2.0).first()
    assert r["count"] == 8 and r["min"] == 2.0 and r["max"] == 9.0
    assert r["sum"] == sum(vals)
    assert r["sum_of_squares"] == sum(v * v for v in vals)
    # ES extended_stats variance is POPULATION variance (n, not n-1)
    assert abs(r["variance"] - 4.0) < 1e-12
    assert abs(r["std_deviation"] - 2.0) < 1e-12
    assert abs(r["std_upper"] - (5.0 + 4.0)) < 1e-12
    assert abs(r["std_lower"] - (5.0 - 4.0)) < 1e-12
    assert not math.isnan(r["avg"])


def test_multi_terms_orders_and_skips_nulls(spark):
    from picdexer_spark.operators.dashboards import multi_terms
    rows = ([("en", "a")] * 3 + [("de", "a")] * 3 + [("en", "b")] * 1
            + [(None, "x")] + [("fr", None)])
    df = spark.createDataFrame(rows, "lang string, tag string")
    got = [(r["lang"], r["tag"], r["doc_count"])
           for r in multi_terms(df, ["lang", "tag"], k=2).collect()]
    # 3/3 tie breaks by full key tuple asc: de before en
    assert got == [("de", "a", 3), ("en", "a", 3)]


def test_top_hits_per_bucket_topk(spark):
    from picdexer_spark.operators.dashboards import top_hits
    from pyspark.sql import functions as F
    rows = [("en", 1, 10.0), ("en", 2, 30.0), ("en", 3, 20.0),
            ("de", 4, 5.0), ("de", 5, 50.0), (None, 6, 1.0)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, s double")
    got = [(r["lang"], r["rk"], r["doc_id"])
           for r in top_hits(df, "lang",
                             [F.desc("s"), F.asc("doc_id")], k=2,
                             select=["doc_id"])
           .orderBy("lang", "rk").collect()]
    assert got == [("de", 1, 5), ("de", 2, 4),
                   ("en", 1, 2), ("en", 2, 3)]


def test_rare_terms_tail_only(spark):
    from picdexer_spark.operators.dashboards import rare_terms
    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)] + [("d",)] + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    got = [(r["key"], r["doc_count"])
           for r in rare_terms(df, "k", max_doc_count=2).collect()]
    assert got == [("c", 1), ("d", 1), ("b", 2)]
    with pytest.raises(ValueError):
        rare_terms(df, "k", max_doc_count=0)


def test_missing_agg_counts_nulls_only(spark):
    from picdexer_spark.operators.dashboards import missing_agg
    df = spark.createDataFrame([("x",), (None,), ("",), (None,)],
                               "k string")
    assert missing_agg(df, "k").first()["doc_count"] == 2


def test_terms_by_metric_orders_by_subagg(spark):
    from picdexer_spark.operators.dashboards import terms_by_metric
    rows = [("en", 10.0), ("en", 20.0), ("de", 100.0), ("fr", 50.0),
            (None, 999.0)]
    df = spark.createDataFrame(rows, "lang string, v double")
    got = [(r["key"], r["doc_count"], r["metric"])
           for r in terms_by_metric(df, "lang", "v", "avg", k=2).collect()]
    assert got == [("de", 1, 100.0), ("fr", 1, 50.0)]
    got_min = [(r["key"], r["metric"])
               for r in terms_by_metric(df, "lang", "v", "min", k=3,
                                        ascending=True).collect()]
    assert got_min == [("en", 10.0), ("fr", 50.0), ("de", 100.0)]
    with pytest.raises(ValueError):
        terms_by_metric(df, "lang", "v", "median")


def test_percentile_ranks_exact_cdf(spark):
    from picdexer_spark.operators.dashboards import percentile_ranks
    vals = [1.0, 2.0, 3.0, 4.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["value"]: r["rank"]
           for r in percentile_ranks(df, "v", (2.0, 3.5, 0.5)).collect()}
    assert got[2.0] == pytest.approx(50.0)   # 2 of 4 non-null <= 2.0
    assert got[3.5] == pytest.approx(75.0)
    assert got[0.5] == pytest.approx(0.0)


def test_auto_date_histogram_picks_smallest_fitting_interval(spark):
    from picdexer_spark.operators.dashboards import auto_date_histogram
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # span 0..95 min -> 10-bucket target needs >= 1800s (30 min gives
    # buckets 0..3 = 4 <= 10; 600s gives 10 buckets ALSO <= 10 -> the
    # smallest fitting is 600s exactly)
    rows = [(base + dt.timedelta(minutes=m),) for m in (0, 10, 95)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = auto_date_histogram(df, "ts", buckets=10).collect()
    assert all(r["interval_sec"] == 600 for r in got)
    assert [(r["bucket"] // 600) % 1000 for r in got] and len(got) == 3
    # tighter target forces a coarser step
    got2 = auto_date_histogram(df, "ts", buckets=2).collect()
    assert all(r["interval_sec"] == 3600 for r in got2)
    assert len(got2) == 2
    with pytest.raises(ValueError):
        auto_date_histogram(df, "ts", buckets=0)


def test_auto_date_histogram_counts_match_manual(spark):
    from picdexer_spark.operators.dashboards import (
        auto_date_histogram, date_histogram,
    )
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(hours=h),) for h in range(0, 100, 7)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = auto_date_histogram(df, "ts", buckets=12).collect()
    iv = got[0]["interval_sec"]
    assert iv == 43200  # 100h span / 12 buckets -> 12h steps
    manual = {r["bucket"]: r["n"]
              for r in date_histogram(df, "ts", "12h").collect()}
    assert {r["bucket"]: r["n"] for r in got} == manual


def test_bucket_sort_pages_buckets(spark):
    from picdexer_spark.operators.dashboards import bucket_sort
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 1), ("d", 7)], "k string, n long")
    got = [r["k"] for r in
           bucket_sort(df, [F.desc("n"), F.asc("k")],
                       from_=1, size=2).collect()]
    assert got == ["d", "a"]
    assert "_rk" not in bucket_sort(df, [F.asc("k")]).columns
    with pytest.raises(ValueError):
        bucket_sort(df, [F.asc("k")], from_=-1)


def test_max_bucket_returns_tied_keys(spark):
    from picdexer_spark.operators.dashboards import max_bucket
    df = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1)], "k string, n long")
    r = max_bucket(df, "k", "n").first()
    assert r["value"] == 9 and r["keys"] == ["b", "c"]
    r2 = max_bucket(df, "k", "n", minimum=True).first()
    assert r2["value"] == 1 and r2["keys"] == ["d"]


# ---------------------------------------------- round-5 wave-5 aggs

def test_moving_fn_es_frame_semantics(spark):
    """ES moving_fn: shift=0 window = the `window` buckets strictly
    BEFORE the current one; first bucket sees an empty frame -> NULL;
    linearWeightedAvg weights 1..m in frame order (most recent = m)."""
    from picdexer_spark.operators.dashboards import moving_fn
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "b long, n long")
    rows = {r["b"]: r for r in moving_fn(df, "b", "n", 3).collect()}
    r1 = rows[1]
    assert all(r1[c] is None for c in
               ("mmax3_n", "mmin3_n", "msum3_n", "munweightedavg3_n",
                "mstddev3_n", "mlinearweightedavg3_n"))
    assert rows[2]["mmax3_n"] == 10.0 and rows[2]["msum3_n"] == 10.0
    assert rows[2]["mlinearweightedavg3_n"] == 10.0
    assert rows[2]["mstddev3_n"] == 0.0
    # b=4: frame [10,20,30] — linW = (10*1+20*2+30*3)/6
    assert rows[4]["mmax3_n"] == 30.0 and rows[4]["msum3_n"] == 60.0
    assert abs(rows[4]["mlinearweightedavg3_n"] - 140.0 / 6) < 1e-12
    import math
    want_std = math.sqrt(((10 - 20) ** 2 + 0 + (30 - 20) ** 2) / 3)
    assert abs(rows[4]["mstddev3_n"] - want_std) < 1e-9
    # shift=1 slides the window to INCLUDE the current bucket (ES doc)
    inc = {r["b"]: r for r in
           moving_fn(df, "b", "n", 3, fns=("max",), shift=1).collect()}
    assert inc[1]["mmax3_n"] == 10.0 and inc[4]["mmax3_n"] == 40.0
    # positive shift beyond 1 looks FORWARD (ES allows it): shift=3
    # puts bucket 1's frame at [1..3]
    fwd = {r["b"]: r for r in
           moving_fn(df, "b", "n", 3, fns=("max",), shift=3).collect()}
    assert fwd[1]["mmax3_n"] == 30.0 and fwd[4]["mmax3_n"] == 40.0
    with pytest.raises(ValueError):
        moving_fn(df, "b", "n", 3, fns=("bogus",)).collect()


def test_rate_agg_rescales_bucket_counts(spark):
    from picdexer_spark.operators.dashboards import rate_agg
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-01 03:00:00",),
         ("2024-01-01 13:00:00",)], "ts string") \
        .selectExpr("cast(ts as timestamp) ts")
    rows = {r["bucket"]: r for r in rate_agg(df, "ts", "12h", 3600).collect()}
    assert [r["n"] for r in rows.values()] == [2, 1]
    for r in rows.values():
        assert abs(r["rate"] - r["n"] / 12.0) < 1e-12
    with pytest.raises(ValueError):
        rate_agg(df, "ts", "fortnight", 3600)


def test_top_metrics_picks_extreme_sort_row(spark):
    from picdexer_spark.operators.dashboards import top_metrics
    df = spark.createDataFrame(
        [("a", 5, 100, 1), ("a", 9, 200, 2), ("a", 9, 300, 3),
         ("b", 1, 400, 4)],
        "g string, s long, m long, id long") \
        .selectExpr("g", "s", "m", "id", "-id AS neg_id")
    got = {r["g"]: (r["metric"], r["sort_value"]) for r in
           top_metrics(df, "g", "s", "m", "neg_id").collect()}
    # tie on s=9 in group a -> lowest id (2) wins via -id tiebreak
    assert got == {"a": (200, 9), "b": (400, 1)}
    lo = {r["g"]: r["metric"] for r in
          top_metrics(df, "g", "s", "m", "id", desc=False).collect()}
    assert lo == {"a": 100, "b": 400}


def _np_ttest(a, b, typ):
    import numpy as np
    a, b = np.asarray(a, float), np.asarray(b, float)
    if typ == "paired":
        d = a - b
        n = len(d)
        return d.mean() / (d.std(ddof=1) / n ** 0.5), n - 1
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    if typ == "homoscedastic":
        vp = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        return (a.mean() - b.mean()) / (vp * (1 / na + 1 / nb)) ** 0.5, \
            na + nb - 2
    se2 = va / na + vb / nb
    df = se2 ** 2 / (va ** 2 / (na ** 2 * (na - 1))
                     + vb ** 2 / (nb ** 2 * (nb - 1)))
    return (a.mean() - b.mean()) / se2 ** 0.5, df


def test_t_test_agg_all_three_types(spark):
    import random
    from picdexer_spark.operators.dashboards import t_test_agg
    rng = random.Random(3)
    a = [rng.randrange(40, 80) for _ in range(37)]
    b = [rng.randrange(50, 95) for _ in range(41)]
    rows = ([(float(x), None) for x in a]
            + [(None, float(y)) for y in b])
    df = spark.createDataFrame(rows, "a double, b double")
    for typ in ("heteroscedastic", "homoscedastic"):
        r = t_test_agg(df, "a", "b", typ).first()
        t, deg = _np_ttest(a, b, typ)
        assert abs(r["t_stat"] - t) < 1e-9 and abs(r["deg_f"] - deg) < 1e-9
    # paired: NULL rows on either side are skipped (ES missing rule)
    pr = [(float(x), float(x) + rng.random() * 4 - 1) for x in a]
    pdf = spark.createDataFrame(pr + [(None, 1.0), (2.0, None)],
                                "a double, b double")
    r = t_test_agg(pdf, "a", "b", "paired").first()
    t, deg = _np_ttest([x for x, _ in pr], [y for _, y in pr], "paired")
    assert abs(r["t_stat"] - t) < 1e-9 and r["deg_f"] == len(pr) - 1
    with pytest.raises(ValueError):
        t_test_agg(df, "a", "b", "bogus")


def test_t_test_p_value_pins_t_table(spark):
    """Classic two-sided t-table values the ES agg would report."""
    from picdexer_spark.operators.dashboards import t_test_p_value
    for t, deg, want in [(2.228, 10, 0.05), (2.086, 20, 0.05),
                         (1.959964, 1e6, 0.05), (2.0, 10, 0.073388),
                         (0.0, 5, 1.0)]:
        assert abs(t_test_p_value(t, deg) - want) < 5e-4
    assert t_test_p_value(-2.228, 10) == t_test_p_value(2.228, 10)
    with pytest.raises(ValueError):
        t_test_p_value(1.0, 0)


def test_matrix_stats_matches_numpy_moments(spark):
    import random
    import numpy as np
    from picdexer_spark.operators.dashboards import matrix_stats
    rng = random.Random(11)
    xs = [rng.randrange(0, 50) for _ in range(200)]
    ys = [x * 2 + rng.randrange(0, 20) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = {(r["field"], r["stat"], r["other_field"]): r["value"]
           for r in matrix_stats(df, ["x", "y"]).collect()}
    x = np.asarray(xs, float)
    m2 = x.var()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert got[("x", "count", None)] == 200.0
    assert abs(got[("x", "mean", None)] - x.mean()) < 1e-9
    assert abs(got[("x", "variance", None)] - m2) < 1e-6
    assert abs(got[("x", "skewness", None)] - m3 / m2 ** 1.5) < 1e-9
    assert abs(got[("x", "kurtosis", None)] - m4 / m2 ** 2) < 1e-9
    y = np.asarray(ys, float)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    assert abs(got[("x", "covariance", "y")] - cov) < 1e-6
    assert abs(got[("x", "correlation", "y")]
               - cov / (x.std() * y.std())) < 1e-9
    with pytest.raises(ValueError):
        matrix_stats(df, ["x"])


def test_matrix_stats_excludes_incomplete_observations(spark):
    """ES matrix_stats drops a document missing ANY field: rows with a
    NULL in either column contribute to NO statistic — count, means,
    variances, and covariances all agree with the complete-rows-only
    numpy answer (not a mixed denominator)."""
    import numpy as np
    from picdexer_spark.operators.dashboards import matrix_stats
    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (None, 40.0),
            (5.0, 50.0), (None, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {(r["field"], r["stat"], r["other_field"]): r["value"]
           for r in matrix_stats(df, ["x", "y"]).collect()}
    x = np.array([1.0, 3.0, 5.0])
    y = np.array([10.0, 30.0, 50.0])
    assert got[("x", "count", None)] == 3.0
    assert got[("y", "count", None)] == 3.0
    assert abs(got[("x", "mean", None)] - x.mean()) < 1e-12
    assert abs(got[("y", "variance", None)] - y.var()) < 1e-9
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    assert abs(got[("x", "covariance", "y")] - cov) < 1e-9


def test_categorize_text_signature_categories(spark):
    from picdexer_spark.operators.dashboards import categorize_text
    df = spark.createDataFrame(
        [(1, "Connection to 10.0.0.1 failed after 30ms"),
         (2, "Connection to 10.0.0.9 failed after 12ms"),
         (3, "User alice logged in"),
         (4, "12345 67890"),           # all-variable -> no category
         (5, None)],
        "id long, msg string")
    got = [(r["key"], r["doc_count"]) for r in
           categorize_text(df, "msg").collect()]
    assert got == [("connection to failed after", 2),
                   ("user alice logged in", 1)]
    # max_tokens truncates the signature
    one = categorize_text(df, "msg", max_tokens=1).collect()
    assert [(r["key"], r["doc_count"]) for r in one] == \
        [("connection", 2), ("user", 1)]


def test_frequent_item_sets_matches_brute_force(spark):
    from itertools import combinations
    from collections import Counter
    from picdexer_spark.operators.dashboards import frequent_item_sets
    import random
    rng = random.Random(13)
    pool = [f"i{j}" for j in range(12)]
    baskets = [rng.sample(pool, rng.randrange(1, 7)) for _ in range(80)]
    baskets[0] = ["i0", "i0", "i1"]  # dup within a row counts once
    df = spark.createDataFrame([(b,) for b in baskets],
                               "items array<string>")
    for ms in (0.15, 0.3):
        got = [(tuple(r["items"]), r["doc_count"]) for r in
               frequent_item_sets(df, "items", min_support=ms,
                                  size=1000).collect()]
        cnt = Counter()
        for b in baskets:
            s = sorted(set(b))
            for k in (1, 2, 3):
                for c in combinations(s, k):
                    cnt[c] += 1
        import math
        min_n = max(math.ceil(ms * len(baskets)), 1)
        want = sorted(((c, m) for c, m in cnt.items() if m >= min_n),
                      key=lambda it: (-it[1], list(it[0])))
        assert got == want, ms
    # min_set_size trims the small levels; support fraction is n/n_tx
    only23 = frequent_item_sets(df, "items", min_support=0.15,
                                min_set_size=2, size=1000).collect()
    assert all(len(r["items"]) >= 2 for r in only23)
    assert all(abs(r["support"] - r["doc_count"] / 80) < 1e-12
               for r in only23)
    with pytest.raises(ValueError):
        frequent_item_sets(df, "items", min_support=0.0)
    with pytest.raises(ValueError):
        frequent_item_sets(df, "items", max_set_size=4)


def test_terms_agg_include_exclude_missing(spark):
    from picdexer_spark.operators.dashboards import top_terms_with_other
    df = spark.createDataFrame(
        [("apple",)] * 5 + [("banana",)] * 3 + [("avocado",)] * 2
        + [(None,)] * 4, "k string")
    base = {r["key"]: r["n"]
            for r in top_terms_with_other(df, "k", k=2).collect()}
    assert base["apple"] == 5 and base["__other__"] > 0
    # include: whole-value anchored regex narrows the collected universe
    inc = {r["key"]: r["n"] for r in
           top_terms_with_other(df, "k", k=1, include="a.*").collect()}
    assert inc == {"apple": 5, "__other__": 2}  # Other = avocado only
    # exclude wins over include on overlap
    exc = {r["key"]: r["n"] for r in
           top_terms_with_other(df, "k", k=5, include="a.*",
                                exclude="apple").collect()}
    assert exc == {"avocado": 2}
    # missing buckets the NULL keys under the given value
    mis = {r["key"]: r["n"] for r in
           top_terms_with_other(df, "k", k=5, missing="N/A").collect()}
    assert mis["N/A"] == 4
    # the regex is whole-value: 'a' must NOT match 'apple'
    assert top_terms_with_other(df, "k", k=5, include="a").count() == 0


def test_variable_width_histogram_value_atomic_equal_depth(spark):
    from picdexer_spark.operators.dashboards import variable_width_histogram
    vals = [1, 1, 1, 2, 5, 6, 7, 20, 21, 22, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [(r["bucket"], r["key"], r["min"], r["max"], r["doc_count"])
           for r in variable_width_histogram(df, "v", 3).collect()]
    # equal values never split (the three 1s stay in bucket 0); NULL
    # drops; per-bucket key is the weighted mean
    assert got == [(0, 1.25, 1, 2, 4), (1, 6.0, 5, 7, 3),
                   (2, 21.0, 20, 22, 3)]
    # doc counts tile the non-null input for any bucket count
    for b in (1, 2, 5, 100):
        rows = variable_width_histogram(df, "v", b).collect()
        assert sum(r["doc_count"] for r in rows) == 10
        mins = [r["min"] for r in rows]
        assert mins == sorted(mins)  # buckets are ordered, disjoint
    with pytest.raises(ValueError):
        variable_width_histogram(df, "v", 0)


def test_random_sampler_deterministic_scaled(spark):
    from picdexer_spark.operators.dashboards import random_sampler
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    samp, scale = random_sampler(df, 0.25, seed=7)
    n = samp.count()
    assert scale == 4.0
    # the hash membership is uniform enough at 4000 ids and EXACTLY
    # repeatable (same seed -> same rows; different seed -> different set)
    assert 800 <= n <= 1200
    assert samp.count() == n  # re-evaluation is stable (no rand())
    ids_a = {r["doc_id"] for r in samp.collect()}
    samp_b, _ = random_sampler(df, 0.25, seed=7)
    assert {r["doc_id"] for r in samp_b.collect()} == ids_a
    samp_c, _ = random_sampler(df, 0.25, seed=8)
    assert {r["doc_id"] for r in samp_c.collect()} != ids_a
    # p=1 keeps everything; out-of-range p refuses
    full, s1 = random_sampler(df, 1.0)
    assert full.count() == 4000 and s1 == 1.0
    with pytest.raises(ValueError):
        random_sampler(df, 0.0)
    with pytest.raises(ValueError):
        random_sampler(df, 1.5)


def test_random_sampler_threshold_rounds(spark):
    """p=0.3 must use threshold 300000, not the float-truncated 299999."""
    from pyspark.sql import functions as F
    from picdexer_spark.operators.dashboards import random_sampler
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    samp, _ = random_sampler(df, 0.3, seed=1)
    bucket = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.lit("1"), F.col("doc_id").cast("string"))), 1, 15),
        16, 10).cast("long") % 1_000_000
    want = df.filter(bucket < 300000).count()
    assert samp.count() == want


def test_stratified_sample_deterministic(spark):
    from pyspark.sql import functions as F
    from picdexer_spark.operators.dashboards import stratified_sample
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"))
    got = stratified_sample(df, "lang", {"en": 0.5, "de": 1.0}, seed=3)
    by = {r["lang"]: r["n"] for r in
          got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by.get("de") == 1000          # fraction 1.0 keeps everything
    assert 400 <= by.get("en", 0) <= 600  # ~half
    assert "fr" not in by                 # default 0.0 drops the stratum
    # retry-stability: identical re-run, different seed differs
    ids = {r["doc_id"] for r in got.filter("lang = 'en'").collect()}
    again = stratified_sample(df, "lang", {"en": 0.5, "de": 1.0}, seed=3)
    assert {r["doc_id"] for r in again.filter("lang = 'en'").collect()} \
        == ids
    other = stratified_sample(df, "lang", {"en": 0.5}, seed=4)
    assert {r["doc_id"] for r in other.filter("lang = 'en'").collect()} \
        != ids
    import pytest as _pt
    with _pt.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})
    with _pt.raises(ValueError):
        stratified_sample(df, "lang", {}, default_fraction=-0.1)
