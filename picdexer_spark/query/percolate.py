"""ES percolate query — REVERSE search.

The percolator stores QUERIES instead of documents (the ES alerting /
saved-search-classification surface: `percolate` query over a
`percolator`-mapped field); an incoming document batch is matched
against every stored query. The reference's Kibana alerts ride exactly
this API on the ES side; here it is one declarative join.

Scale shape — deliberately inverted from search: a percolate call
carries a SMALL document batch (documents arrive one bulk request at a
time) against a LARGE stored-query table (ES percolator indexes scale
to 10^8 alert rules). The doc batch is therefore BROADCAST against the
distributed queries table: no shuffle of the query side ever happens,
and the per-(query, doc) predicates are pure JVM array/string
expressions inside whole-stage codegen — token-set intersection for
bool queries, padded-string containment for phrases (exact adjacency
on the analyzed token stream, the same analyzer as the index build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: modes a stored query row may carry
PERCOLATE_MODES = ("conjunctive", "disjunctive", "phrase")


def percolate(queries_df: DataFrame, docs_df: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id") -> DataFrame:
    """Match every incoming doc against every stored query.

    `queries_df` rows: (query_id, terms array<string>, mode string,
    msm int|null) — mode 'conjunctive' (all terms), 'disjunctive'
    (>= msm terms, msm null = 1), 'phrase' (the exact adjacent token
    sequence). Terms are assumed analyzed (lowercase tokens), the ES
    percolator contract (queries are parsed at index time).

    Returns DataFrame[(query_id, doc_id)] — one row per (stored query,
    matching doc). A row with an unknown mode FAILS the job
    (assert_true, not a silent drop); empty term lists match nothing.
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    d = docs_df.select(
        F.col(id_col).alias("_pid"),
        F.array_distinct(toks).alias("_dtoks"),
        F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
        .alias("_dpad"),
    )
    q = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.col("terms"), F.col("mode"),
        F.coalesce(F.col("msm"), F.lit(1)).alias("_msm"),
    )
    pairs = q.join(F.broadcast(d))
    n_match = F.size(F.array_intersect("terms", "_dtoks"))
    needle = F.concat(F.lit(" "), F.array_join("terms", " "), F.lit(" "))
    cond = (
        F.when(F.col("mode") == "conjunctive",
               n_match == F.size("terms"))
        .when(F.col("mode") == "disjunctive", n_match >= F.col("_msm"))
        .when(F.col("mode") == "phrase",
              F.instr(F.col("_dpad"), needle) > 0)
        .otherwise(F.assert_true(
            F.lit(False),
            F.concat(F.lit("unknown percolate mode: "),
                     F.col("mode"))).isNotNull())
    )
    return (
        pairs.filter((F.size("terms") > 0) & cond)
        .select("query_id", F.col("_pid").alias(id_col))
    )
