"""Physical-plan audit helpers: make the plan the deliverable.

Every operator claim in this engine has a plan-shape invariant behind it
(filter pushed to the scan, partial aggregation before the exchange, exactly
N exchanges, broadcast for the small side). These helpers capture
`explain("formatted")` output so tests can assert those invariants — the
plan-level regression suite the prompt's "iterate until it's the plan you'd
want" demands.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what .explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded; AQE's echoed '== Initial Plan ==' section
    is cut so materialized stages aren't double-counted)."""
    s = explain_str(df, "simple")
    s = s.split("== Initial Plan ==")[0]
    return len(re.findall(r"Exchange (?:hash|range)partitioning", s))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions `fragment`."""
    s = explain_str(df, "formatted")
    for line in s.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet scan's ReadSchema (pruning check)."""
    s = explain_str(df, "formatted")
    out = []
    for line in s.splitlines():
        if "ReadSchema" in line:
            cols = re.findall(r"(\w+):", line.split("struct<", 1)[-1])
            out.append(cols)
    return out


def plan_report(named_plans: dict[str, DataFrame]) -> str:
    """Formatted explain of several plans, for PLANS.md-style dumps."""
    chunks = []
    for name, df in named_plans.items():
        chunks.append(f"## {name}\n\n```\n{explain_str(df, 'formatted')}\n```")
    return "\n\n".join(chunks)
