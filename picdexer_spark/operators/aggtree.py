"""ES aggregation-TREE composer: run a nested `aggs` request in one pass.

The engine has every ES agg family as a standalone operator
(operators/dashboards.py); real Kibana panels send them COMPOSED — a
`terms` inside a `date_histogram` with an `avg` at the leaf
(reference kibana.ndjson:2-6 are exactly such trees, e.g. the
keyword-cloud panel = terms ⊂ time-filter, the folder panel = terms ⊂
terms). This module executes an ES-DSL-shaped agg tree:

    {"by_lang":  {"terms": {"field": "lang", "size": 5},
      "aggs": {"by_src": {"terms": {"field": "source", "size": 3},
        "aggs": {"avg_len": {"avg": {"field": "n_chars"}},
                 "n_vals":  {"cardinality": {"field": "source"}}}},
               "max_len": {"max": {"field": "n_chars"}}}}}

Spark-first execution — ONE scan via ROLLUP (grouping sets): every
bucket level's aggregates (doc_count + its metric sub-aggs, including
non-decomposable ones like exact `cardinality`) come out of a single
partial-aggregated pass; `grouping_id()` labels which level each row
belongs to. Bucket selection (`terms` size, count desc / key asc, ES
order) cascades top-down: level-k survivors are ranked WITHIN their
surviving parent (bucket-count-sized windows, never data-sized), and
children of eliminated parents drop out — the exact single-node form
of ES's coordinator reduce.

Result shape (pinned): one row per DEEPEST bucket, parent levels
denormalized — per level its key column (the agg's name), its
`<name>_doc_count`, and its metric sub-aggs as plain columns; the leaf
level's count is `doc_count`. ES embeds the same numbers in nested
JSON; a flat frame is the DataFrame-native equivalent.

Pinned divergences / refusals (never guessed):
* exactly ONE bucket sub-agg per level (two siblings would need a union
  of differently-shaped frames — run two trees);
* a NULL bucket key forms no bucket at its own level but the doc still
  counts in every ancestor bucket (the exact ES `missing`-less terms
  semantics); `grouping_id` distinguishes real nulls from rollup's
  subtotal NULLs;
* supported buckets: terms / histogram / date_histogram / range;
  metrics: sum, avg, min, max, value_count, cardinality (exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_TYPES = ("terms", "histogram", "date_histogram", "range")
_METRIC_TYPES = ("sum", "avg", "min", "max", "value_count", "cardinality")


def _bucket_col(kind: str, body: dict):
    """(key Column, size | None). size=None = keep all buckets."""
    field = body["field"]
    if kind == "terms":
        return F.col(field).cast("string"), int(body.get("size", 10))
    if kind == "histogram":
        iv = float(body["interval"])
        if iv <= 0:
            raise ValueError("histogram interval must be > 0")
        return (
            F.floor(F.col(field).cast("double") / iv) * iv,
            None,
        )
    if kind == "date_histogram":
        from picdexer_spark.operators.dashboards import _bucket_key

        return _bucket_key(field, body["calendar_interval"]), None
    if kind == "range":
        ranges = body["ranges"]
        if not ranges:
            raise ValueError("range agg needs at least one range")
        c = F.col(field).cast("double")
        expr = F.lit(None).cast("string")
        for r in reversed(ranges):
            lo, hi = r.get("from"), r.get("to")
            label = r.get("key") or f"{lo if lo is not None else '*'}-" \
                                    f"{hi if hi is not None else '*'}"
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (c >= float(lo))
            if hi is not None:
                cond = cond & (c < float(hi))
            expr = F.when(cond, F.lit(label)).otherwise(expr)
        return expr, None
    raise ValueError(f"unsupported bucket agg {kind!r}")


def _metric_col(kind: str, body: dict):
    field = F.col(body["field"])
    if kind == "sum":
        return F.sum(field.cast("double"))
    if kind == "avg":
        return F.avg(field.cast("double"))
    if kind == "min":
        return F.min(field)
    if kind == "max":
        return F.max(field)
    if kind == "value_count":
        return F.count(field)
    if kind == "cardinality":
        return F.count_distinct(field)
    raise ValueError(f"unsupported metric agg {kind!r}")


def _parse(spec: dict):
    """spec (the ES `aggs` object) -> (levels, metrics).

    levels: [(name, key_col, size)] outermost first;
    metrics: [(depth, out_name, agg_col)] — depth = index of the bucket
    level the metric is nested UNDER (its sub-agg position)."""
    levels: list[tuple] = []
    metrics: list[tuple] = []
    node = spec
    depth = 0
    while node:
        buckets = []
        for name, body in node.items():
            kinds = [k for k in body if k != "aggs"]
            if len(kinds) != 1:
                raise ValueError(
                    f"agg {name!r} must have exactly one type, got {kinds}")
            kind = kinds[0]
            if kind in _BUCKET_TYPES:
                buckets.append((name, kind, body))
            elif kind in _METRIC_TYPES:
                if depth == 0:
                    raise ValueError(
                        "top-level metric aggs have no bucket to attach "
                        "to — aggregate directly instead")
                metrics.append(
                    (depth, name, _metric_col(kind, body[kind])))
            else:
                raise ValueError(f"unsupported agg type {kind!r}")
        if len(buckets) > 1:
            raise ValueError(
                "one bucket sub-agg per level (got "
                f"{[b[0] for b in buckets]}) — run separate trees")
        if not buckets:
            break
        name, kind, body = buckets[0]
        if any(name == lv[0] for lv in levels):
            raise ValueError(f"duplicate agg name {name!r}")
        key, size = _bucket_col(kind, body[kind])
        levels.append((name, key, size))
        node = body.get("aggs") or {}
        depth += 1
    if not levels:
        raise ValueError("agg tree has no bucket agg")
    return levels, metrics


def agg_tree(df: DataFrame, spec: dict) -> DataFrame:
    levels, metrics = _parse(spec)
    names = [n for n, _k, _s in levels]
    nlev = len(levels)
    keyed = df.withColumns({n: key for n, key, _s in levels})
    aggs = [F.count("*").alias("doc_count"),
            F.grouping_id(*names).alias("_gid")]
    for depth, out_name, col in metrics:
        aggs.append(col.alias(out_name))
    # materialize the rolled frame ONCE: the cascade references it per
    # level (+ parent denorm joins), and Catalyst re-expands self-joined
    # aggregates — without this the data-sized Expand scan would run
    # once per level. The rolled frame itself is BUCKET-space-sized
    # (sum of bucket counts over levels — what any agg returns), so the
    # checkpoint is the standard OLAP cube materialization, never a
    # data-sized spill; lineage truncation also keeps the downstream
    # window/join plans flat.
    rolled = keyed.rollup(*names).agg(*aggs).localCheckpoint(eager=True)
    # grouping_id bit i set = names[i] rolled AWAY; level d (keys 0..d
    # grouped, rest away) has gid = 2^(nlev-d-1) - 1
    gid_at = [(1 << (nlev - d - 1)) - 1 for d in range(nlev)]

    # cascade: per level, rank within parent and keep `size`
    survivors = None  # DataFrame of surviving key prefixes
    parent_cols: list[DataFrame] = []
    for d in range(nlev):
        name, _key, size = levels[d]
        # ES terms default: a null key forms no bucket AT ITS OWN level,
        # but the doc still counts in every ancestor bucket (a doc with
        # lang but null source inflates the lang count and just has no
        # source child). grouping_id disambiguates: at this level the
        # keys 0..d are GROUPED, so a null there is a real null key.
        lvl = rolled.filter(F.col("_gid") == gid_at[d])
        for kn in names[: d + 1]:
            lvl = lvl.filter(F.col(kn).isNotNull())
        keep_metrics = [m[1] for m in metrics if m[0] == d + 1]
        cols = names[: d + 1] + ["doc_count"] + keep_metrics
        lvl = lvl.select(*cols)
        if survivors is not None:
            lvl = lvl.join(F.broadcast(survivors), names[:d], "left_semi")
        if size is not None:
            w = Window.partitionBy(*names[:d]).orderBy(
                F.desc("doc_count"), F.asc(names[d]))
            lvl = (lvl.withColumn("_rk", F.row_number().over(w))
                   .filter(F.col("_rk") <= size).drop("_rk"))
        if d < nlev - 1:
            renamed = lvl.withColumnRenamed(
                "doc_count", f"{name}_doc_count")
            parent_cols.append(renamed)
            survivors = lvl.select(*names[: d + 1])
        else:
            out = lvl
    # denormalize parent doc_counts + parent-level metrics onto leaves
    for d, parent in enumerate(parent_cols):
        out = out.join(F.broadcast(parent), names[: d + 1])
    front = []
    for d, (name, _k, _s) in enumerate(levels):
        front.append(name)
        if d < nlev - 1:
            front.append(f"{name}_doc_count")
            front.extend(m[1] for m in metrics if m[0] == d + 1)
    front.append("doc_count")
    front.extend(m[1] for m in metrics if m[0] == nlev)
    return out.select(*front)
