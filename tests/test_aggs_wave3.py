"""Round-5 wave-3 agg operators, each pinned against a brute-force
python reference:

- serial_diff: lag-N differencing, first N buckets NULL;
- bucket_script / bucket_selector: per-bucket arithmetic + predicate
  drop (selector after pipeline values, the ES order);
- weighted_avg: sum(v*w)/sum(w), NULL value or weight skips the row;
- median_absolute_deviation: exact interpolated median(|x - median|);
- date_range_buckets: named [from, to) buckets + tails, empties kept,
  NULL timestamps dropped;
- adjacency_matrix: singles + pairwise-intersection counts, 'a&b'
  sorted-name keys, empty intersections absent;
- geo_bounds / geo_centroid: box corners and planar mean.
"""

import math

import pytest
from pyspark.sql import functions as F

from picdexer_spark.operators import dashboards as dash
from picdexer_spark.operators import geo


# --------------------------------------------------- pipeline agg trio

@pytest.fixture(scope="module")
def hist(spark):
    rows = [(b, n) for b, n in zip(range(0, 100, 10),
                                   [5, 12, 3, 40, 7, 7, 21, 9, 30, 2])]
    return spark.createDataFrame(rows, "bucket long, n long")


def test_serial_diff(hist):
    got = {r["bucket"]: r["sdiff2_n"]
           for r in dash.serial_diff(hist, "n", lag=2).collect()}
    ns = [5, 12, 3, 40, 7, 7, 21, 9, 30, 2]
    for i, b in enumerate(range(0, 100, 10)):
        want = None if i < 2 else ns[i] - ns[i - 2]
        assert got[b] == want, b


def test_serial_diff_refuses_bad_lag(hist):
    with pytest.raises(ValueError):
        dash.serial_diff(hist, "n", lag=0)


def test_bucket_script_and_selector(hist):
    h = dash.bucket_script(
        hist, {"double_n": F.col("n") * 2,
               "frac": F.col("n") / F.lit(10.0)})
    rows = {r["bucket"]: r for r in h.collect()}
    assert rows[30]["double_n"] == 80 and rows[30]["frac"] == 4.0
    kept = dash.bucket_selector(h, F.col("n") > 10).collect()
    assert sorted(r["bucket"] for r in kept) == [10, 30, 60, 80]


def test_bucket_selector_null_drops(spark):
    df = spark.createDataFrame([(1, 10), (2, None), (3, 30)],
                               "bucket long, n long")
    kept = dash.bucket_selector(df, F.col("n") > 5).collect()
    assert sorted(r["bucket"] for r in kept) == [1, 3]


# ------------------------------------------------------- weighted_avg

def test_weighted_avg_matches_bruteforce(spark):
    rows = [(10.0, 1.0), (20.0, 3.0), (None, 5.0), (40.0, None),
            (5.0, 2.0)]
    df = spark.createDataFrame(rows, "v double, w double")
    got = dash.weighted_avg(df, "v", "w").collect()[0]["weighted_avg"]
    ok = [(v, w) for v, w in rows if v is not None and w is not None]
    want = sum(v * w for v, w in ok) / sum(w for _, w in ok)
    assert got == pytest.approx(want, rel=1e-12)


# --------------------------------------- median_absolute_deviation

def _interp_median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = (n - 1) / 2
    lo, hi = xs[math.floor(mid)], xs[math.ceil(mid)]
    return lo + (hi - lo) * (mid - math.floor(mid))


def test_mad_matches_bruteforce(spark):
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0]
    df = spark.createDataFrame([(x,) for x in xs] + [(None,)],
                               "x double")
    got = dash.median_absolute_deviation(df, "x").collect()[0]["mad"]
    med = _interp_median(xs)
    want = _interp_median([abs(x - med) for x in xs])
    assert got == pytest.approx(want, rel=1e-12)


# ------------------------------------------------- date_range_buckets

def test_date_range_buckets(spark):
    rows = [("2024-01-05 00:00:00",), ("2024-01-12 12:00:00",),
            ("2024-01-15 00:00:00",), ("2024-02-01 00:00:00",),
            ("2024-01-10 00:00:00",),  # boundary: lands in the middle
            (None,)]
    df = spark.createDataFrame(rows, "ts string") \
        .select(F.col("ts").cast("timestamp").alias("ts"))
    got = [(r["key"], r["n"]) for r in
           dash.date_range_buckets(df, "ts",
                                   ["2024-01-10", "2024-01-20"]).collect()]
    assert got == [("*-2024-01-10", 1),
                   ("2024-01-10-2024-01-20", 3),
                   ("2024-01-20-*", 1)]


def test_date_range_keeps_empty_buckets(spark):
    df = spark.createDataFrame([("2024-06-01 00:00:00",)], "ts string") \
        .select(F.col("ts").cast("timestamp").alias("ts"))
    got = [(r["key"], r["n"]) for r in
           dash.date_range_buckets(df, "ts",
                                   ["2024-01-01", "2024-02-01"]).collect()]
    assert got == [("*-2024-01-01", 0), ("2024-01-01-2024-02-01", 0),
                   ("2024-02-01-*", 1)]


def test_date_range_refuses_unsorted(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "ts string")
    with pytest.raises(ValueError):
        dash.date_range_buckets(df, "ts", ["2024-02-01", "2024-01-01"])


# -------------------------------------------------- adjacency_matrix

def test_adjacency_matrix_matches_bruteforce(spark):
    rows = [(i, "en" if i % 3 == 0 else "de", i * 7 % 50)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v long")
    filters = {"en": F.col("lang") == "en",
               "evenid": F.col("doc_id") % 2 == 0,
               "hi": F.col("v") >= 25}
    got = {r["key"]: r["doc_count"] for r in
           dash.adjacency_matrix(df, filters).collect()}
    preds = {"en": lambda r: r[1] == "en",
             "evenid": lambda r: r[0] % 2 == 0,
             "hi": lambda r: r[2] >= 25}
    names = sorted(preds)
    want = {}
    for i, a in enumerate(names):
        n = sum(1 for r in rows if preds[a](r))
        if n:
            want[a] = n
        for b in names[i + 1:]:
            n = sum(1 for r in rows if preds[a](r) and preds[b](r))
            if n:
                want[f"{a}&{b}"] = n
    assert got == want and len(want) == 6


def test_adjacency_matrix_omits_empty_pairs(spark):
    df = spark.createDataFrame([(1, "en"), (2, "de")],
                               "doc_id long, lang string")
    got = {r["key"] for r in dash.adjacency_matrix(df, {
        "en": F.col("lang") == "en",
        "de": F.col("lang") == "de",
    }).collect()}
    assert got == {"en", "de"}  # no 'de&en' row — disjoint filters


def test_adjacency_matrix_refuses_empty(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        dash.adjacency_matrix(df, {})


# ----------------------------------------------- geo bounds/centroid

def test_geo_bounds_and_centroid(spark):
    pts = [(10.0, -20.0), (30.5, 40.0), (-5.0, 0.0), (None, 7.0),
           (12.0, None)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    b = geo.geo_bounds(df, "lat", "lon").collect()[0]
    assert (b["top"], b["bottom"], b["left"], b["right"]) == \
        (30.5, -5.0, -20.0, 40.0)
    c = geo.geo_centroid(df, "lat", "lon").collect()[0]
    ok = [(la, lo) for la, lo in pts if la is not None and lo is not None]
    assert c["count"] == 3
    assert c["lat"] == pytest.approx(sum(p[0] for p in ok) / 3)
    assert c["lon"] == pytest.approx(sum(p[1] for p in ok) / 3)


# ------------------------------- normalize + cumulative_cardinality

def test_normalize_methods(hist):
    ns = [5, 12, 3, 40, 7, 7, 21, 9, 30, 2]
    lo, hi, tot = min(ns), max(ns), sum(ns)
    mean = tot / len(ns)
    var = sum((x - mean) ** 2 for x in ns) / len(ns)
    import math as m
    sm = sum(m.exp(x) for x in ns)
    want = {
        "rescale_0_1": lambda x: (x - lo) / (hi - lo),
        "rescale_0_100": lambda x: (x - lo) / (hi - lo) * 100,
        "percent_of_sum": lambda x: x / tot,
        "mean": lambda x: (x - mean) / (hi - lo),
        "z-score": lambda x: (x - mean) / m.sqrt(var),
        "softmax": lambda x: m.exp(x) / sm,
    }
    for method, f in want.items():
        col = method.replace("-", "_") + "_n"
        got = {r["bucket"]: r[col]
               for r in dash.normalize_buckets(hist, "n", method).collect()}
        for i, b in enumerate(range(0, 100, 10)):
            assert got[b] == pytest.approx(f(ns[i]), rel=1e-9), (method, b)


def test_normalize_refuses_unknown(hist):
    with pytest.raises(ValueError):
        dash.normalize_buckets(hist, "n", "minmax")


def test_normalize_constant_series_nulls(spark):
    df = spark.createDataFrame([(0, 4), (1, 4)], "bucket long, n long")
    rows = dash.normalize_buckets(df, "n", "rescale_0_1").collect()
    assert all(r["rescale_0_1_n"] is None for r in rows)


def test_cumulative_cardinality(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # user u appears first in bucket: u0->b0, u1->b0, u2->b2, u0 again b2
    rows = [(base + dt.timedelta(hours=12 * b), u) for b, u in
            [(0, 0), (0, 1), (1, 0), (2, 2), (2, 0), (4, 3), (4, 3)]]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    got = [(r["bucket"], r["n"], r["new_n"], r["cumcard_uid"])
           for r in dash.cumulative_cardinality(df, "ts", "uid", "12h")
           .collect()]
    e = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    h12 = 43200
    # bucket 1 has docs but no new users: new_n 0, cum carries forward;
    # bucket 3 empty -> absent (parent histogram min_doc_count=1)
    assert got == [(e, 2, 2, 2), (e + h12, 1, 0, 2),
                   (e + 2 * h12, 2, 1, 3), (e + 4 * h12, 2, 1, 4)]


# ------------------------------------------- boxplot + string_stats

def test_boxplot_matches_bruteforce(spark):
    vals = [3, 1, 41, 7, 9, 2, 8, 6, 5, 4, 100, -50]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = dash.boxplot_agg(df, "v").collect()[0]
    s = sorted(vals)

    def q(p):  # exact linear interpolation, the `percentile` contract
        i = p * (len(s) - 1)
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return s[lo] + (i - lo) * (s[hi] - s[lo])

    q1, q2, q3 = q(0.25), q(0.5), q(0.75)
    iqr = q3 - q1
    assert row["min"] == -50 and row["max"] == 100
    assert (row["q1"], row["q2"], row["q3"]) == (q1, q2, q3)
    assert row["lower"] == min(v for v in vals if v >= q1 - 1.5 * iqr)
    assert row["upper"] == max(v for v in vals if v <= q3 + 1.5 * iqr)
    # the outliers (-50, 100) sit OUTSIDE the whiskers
    assert row["lower"] > -50 and row["upper"] < 100


def test_boxplot_skips_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (3,), (2,)], "v long")
    row = dash.boxplot_agg(df, "v").collect()[0]
    assert (row["min"], row["max"], row["q2"]) == (1, 3, 2.0)
    assert row["lower"] == 1 and row["upper"] == 3


def test_string_stats_matches_bruteforce(spark):
    vals = ["aab", "b", "abab c", None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    row = dash.string_stats(df, "s").collect()[0]
    present = [v for v in vals if v is not None]
    assert row["count"] == 3
    assert row["min_length"] == 1 and row["max_length"] == 6
    assert row["avg_length"] == pytest.approx(
        sum(len(v) for v in present) / 3)
    from collections import Counter
    cnt = Counter("".join(present))
    n = sum(cnt.values())
    want = -sum((k / n) * math.log2(k / n) for k in cnt.values())
    assert row["entropy"] == pytest.approx(want, rel=1e-12)


def test_string_stats_uniform_vs_skewed_entropy(spark):
    # uniform chars score log2(k); a single repeated char scores 0 —
    # the ES docs' gibberish-detection ordering
    uni = spark.createDataFrame([("abcd",)], "s string")
    one = spark.createDataFrame([("aaaa",)], "s string")
    assert dash.string_stats(uni, "s").collect()[0]["entropy"] == \
        pytest.approx(2.0)
    assert dash.string_stats(one, "s").collect()[0]["entropy"] == \
        pytest.approx(0.0)
