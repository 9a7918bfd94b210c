"""ES COMPLETION suggester — the weight-ordered, FST-backed search-box
autocomplete (`type: completion` mapping + `suggest.completion` query).

This is the third member of the ES suggest trio the engine already has
(term + phrase suggesters, ``bm25.py``) and the one that powers real ES
search boxes — the analogue of the Kibana discover query bar the
reference ships a saved object for (reference ``kibana.ndjson:8``, the
picdexer-nb discover search input). Distinct from
:meth:`SearchEngine.suggest` (df-ranked dictionary-prefix completion):
the completion suggester matches the WHOLE stored input string by
prefix (not analyzed dictionary terms) and ranks by an EXPLICIT
index-time weight, not document frequency.

Spark-first design
------------------
ES builds an in-heap FST from (analyzed input, weight) pairs at
index time and answers a prefix query by weight-ordered automaton
traversal. The Spark analogue of the FST's shared-prefix byte layout is
a completion TABLE written range-partitioned + sorted by the match key:

* parquet min/max row-group statistics on the sorted ``key`` column turn
  the ``StartsWith`` scan into a contiguous range prune (the same
  pushed-scan shape the dictionary prefix path uses) — at 10^12 docs a
  prefix touches O(matching row groups), never the full table;
* top-k by weight is ``TakeOrderedAndProject`` (per-partition heap,
  driver merges k rows per partition) — no global sort, no shuffle.

The completion table is input-cardinality sized (distinct suggestion
surfaces, typically 10^3-10^6 per index — model-sized next to the
corpus), so builds are one narrow shuffle and queries are sub-second
range scans.

Pinned semantics vs ES (divergences documented here):

* the match key is ``lower(trim(input))`` — ES's default completion
  analyzer is ``simple`` (lowercase); the stored surface form is
  returned verbatim, matching ES `options[].text`;
* ``skip_duplicates=True`` collapses options with the same surface form
  keeping the highest weight (ES skips later duplicates during the
  weight-ordered walk — same result set);
* fuzzy completion allows ``fuzziness`` edits inside the TYPED PREFIX
  only (the ES `fuzzy` object): a stored key matches when some prefix
  of it within ±fuzziness of the query length is within ``fuzziness``
  Levenshtein edits of the query, with the first ``fuzzy_prefix_length``
  chars required exact and inputs shorter than ``fuzzy_min_length``
  matched exactly (the ES `min_length` guard). Exact-prefix matches
  rank before fuzzy ones (ES scores exact FST hits first), ties by
  weight desc then surface asc;
* category contexts (the ES `contexts` mapping) are an optional
  ``array<string>`` column filtered with ``arrays_overlap`` — the
  pinned subset is ANY-of (ES's default OR over context values); no
  per-context boosting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: completion options returned per query
COMPLETION_SCHEMA = (
    "input string, weight long, key string, contexts array<string>"
)


def build_completions(
    df: DataFrame,
    out_dir: str,
    input_col: str = "input",
    weight_col: str = "weight",
    contexts_col: str | None = None,
    buckets: int = 32,
) -> None:
    """Materialize the completion index from an (input, weight[, contexts])
    frame — the ES `type: completion` field's index-time half.

    Rows with NULL/empty input are dropped (ES rejects empty completion
    inputs); NULL weights default to 0 (ES default). The table is
    range-partitioned and sorted by the lowercased match key so every
    prefix query prunes to a contiguous row-group range — the scan-side
    analogue of the FST's shared-prefix compression. ``buckets`` bounds
    the output file count (completion tables are model-sized; 32 range
    buckets keep files ~even under Zipfian input skew because the range
    partitioner samples the actual key distribution).
    """
    key = F.lower(F.trim(F.col(input_col)))
    ctx = (
        F.col(contexts_col).cast("array<string>")
        if contexts_col
        else F.lit(None).cast("array<string>")
    )
    rows = (
        df.select(
            F.col(input_col).cast("string").alias("input"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias(
                "weight"
            ),
            key.alias("key"),
            ctx.alias("contexts"),
        )
        .filter(F.col("key").isNotNull() & (F.length("key") > 0))
    )
    (
        rows.repartitionByRange(buckets, "key")
        .sortWithinPartitions("key")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "completions"))
    )


class CompletionSuggester:
    """Query-time half: weight-ordered prefix lookup over the completion
    table built by :func:`build_completions`."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.table = spark.read.parquet(
            os.path.join(index_dir, "completions")
        )

    def complete(
        self,
        prefix: str,
        size: int = 5,
        skip_duplicates: bool = False,
        fuzziness: int = 0,
        fuzzy_prefix_length: int = 1,
        fuzzy_min_length: int = 3,
        contexts: list[str] | None = None,
    ) -> DataFrame:
        """Top-``size`` completion options for ``prefix`` — the ES
        `suggest.completion` request. Returns (input, weight, exact)
        ordered exact-first, weight desc, input asc.

        The exact arm is a pushed ``StartsWith`` range scan; the fuzzy
        arm (``fuzziness > 0``) stays JVM-side: the first
        ``fuzzy_prefix_length`` chars are an exact pushed prefix filter
        (ES's `prefix_length` — typos rarely hit the first letter, and
        it keeps the fuzzy scan pruned too), then a ``least()`` over the
        2*fuzziness+1 candidate key-prefix windows bounds the
        Levenshtein test — whole-stage-codegen expressions, never a
        Python UDF, never a driver pull.
        """
        if size < 1:
            raise ValueError("size must be >= 1")
        if fuzziness < 0 or fuzziness > 2:
            raise ValueError("fuzziness must be 0, 1 or 2 (the ES range)")
        q = prefix.strip().lower()
        if not q:
            raise ValueError("completion prefix must be non-empty")
        t = self.table
        if contexts:
            t = t.filter(
                F.arrays_overlap(
                    "contexts",
                    F.array(*[F.lit(c) for c in contexts]),
                )
            )
        exact = F.col("key").startswith(q)
        if fuzziness == 0 or len(q) < fuzzy_min_length:
            # ES min_length guard: short inputs never fuzz (too noisy)
            cand = t.filter(exact).withColumn("exact", F.lit(True))
        else:
            pl = min(fuzzy_prefix_length, len(q))
            hard = F.col("key").startswith(q[:pl]) if pl else F.lit(True)
            # a stored key fuzzy-matches when SOME prefix window of it
            # (length |q| ± fuzziness) is within `fuzziness` edits of q
            windows = [
                F.levenshtein(F.substring("key", 1, w), F.lit(q))
                for w in range(
                    max(1, len(q) - fuzziness), len(q) + fuzziness + 1
                )
            ]
            d = windows[0] if len(windows) == 1 else F.least(*windows)
            cand = t.filter(hard & (exact | (d <= fuzziness))).withColumn(
                "exact", exact
            )
        if skip_duplicates:
            # ES skips later duplicates during the weight-ordered walk:
            # per surface form keep the best (exact-first, max-weight)
            # option. max_by over a sortable struct = one partial-agg
            # pass, no window shuffle.
            rank = F.struct(
                F.col("exact").cast("int").alias("e"),
                F.col("weight").alias("w"),
            )
            cand = cand.groupBy("input").agg(
                F.max(rank).alias("r")
            ).select(
                "input",
                F.col("r.w").alias("weight"),
                F.col("r.e").cast("boolean").alias("exact"),
            )
        return (
            cand.select("input", "weight", "exact")
            .orderBy(
                F.desc("exact"), F.desc("weight"), F.asc("input")
            )
            .limit(size)
        )
