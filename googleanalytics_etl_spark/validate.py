"""Data-quality validation — constraint checks over ingested tables.

A training-data pipeline gates every batch on declared invariants
(uniqueness, ranges, referential consistency) before it reaches
downstream consumers; the reference validated operationally against the
GA UI [REF-UNVERIFIED: SURVEY.md §5]. Here a rule set is a list of
(name, violation-predicate SQL) pairs evaluated in ONE pass per table
(conditional sums — no per-rule scans), returning a row per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate violation predicates in a single aggregate pass.

    ``rules`` maps rule name → SQL boolean expression that is TRUE for a
    VIOLATING row. Returns (rule STRING, violations BIGINT, total BIGINT)
    — one scan regardless of rule count, fully declarative (the one-row
    aggregate is unpivoted with ``stack``, nothing touches the driver).
    """
    if not rules:
        raise ValueError("check() requires at least one rule")
    for name in rules:
        if "`" in name or "'" in name:
            raise ValueError(f"rule name {name!r} may not contain quotes")
    # internal aliases avoid collisions with user rule names; backticks
    # make arbitrary rule names (spaces, hyphens, keywords) safe
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0))
        .cast("long")
        .alias(f"__r_{i}")
        for i, pred in enumerate(rules.values())
    ]
    agg_df = df.agg(*aggs, F.count(F.lit(1)).alias("__total"))
    pairs = ", ".join(f"'{name}', `__r_{i}`" for i, name in enumerate(rules))
    return agg_df.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, violations)",
        "`__total` AS total",
    )


def check_unique(df: DataFrame, key: str) -> DataFrame:
    """Uniqueness check that stays distributed (no driver-side sets):
    groupBy count > 1, returns offending keys + multiplicity."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
