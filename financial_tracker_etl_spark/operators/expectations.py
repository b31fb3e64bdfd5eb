"""Data-quality expectations: declarative row-level rules evaluated in
ONE pass, reported per rule (the Delta Live Tables / Great Expectations
shape, relationally).

The reference validates row-by-row and raises on the first violation
(P1, reference: etl/fetch_utils.py:30-43); at 100 TB the useful form is
the aggregate report — every rule's pass/fail count from a single scan
(conditional aggregates, no per-rule scan, no Python in the row path)
— plus a quarantine split for the rows any rule failed, mirroring the
dead-letter pattern (ST4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def expectations_report(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """One row per rule: (rule, n_pass, n_fail, fail_ppm). Single scan:
    each rule becomes two conditional counts inside one aggregation —
    adding a rule adds a column, never a pass over the data."""
    total = F.count(F.lit(1))
    aggs = []
    for name, cond in rules.items():
        aggs.append(
            F.count(F.when(cond, 1)).alias(f"__pass_{name}")
        )
    wide = df.agg(total.alias("__total"), *aggs)
    per_rule = [
        wide.select(
            F.lit(name).alias("rule"),
            F.col(f"__pass_{name}").alias("n_pass"),
            (F.col("__total") - F.col(f"__pass_{name}")).alias("n_fail"),
            # integer div both engines (round-vs-truncate hazard);
            # n_fail approaches the full table count when a rule is
            # badly broken, so the ppm product widens to DECIMAL(38,0)
            # (int64 dies near 9.2e12 failing rows). The denominator
            # clamps to >= 1: an EMPTY input (e.g. rules over an
            # already-empty quarantine subset) must yield a 0-fail
            # report, not an ANSI divide-by-zero
            F.expr(
                f"CAST(__total - __pass_{name} AS DECIMAL(38,0))"
                f" * 1000000 div greatest(__total, 1)"
            ).alias("fail_ppm"),
        )
        for name in rules
    ]
    return reduce(lambda a, b: a.unionByName(b), per_rule)


def quarantine_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows failing ANY rule are quarantined with
    the list of failed rule names attached — the row-level companion to
    the report, same dead-letter economics as the stream pipeline."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~cond | cond.isNull(), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    tagged = df.withColumn("_failed_rules", failed)
    clean = tagged.filter(F.size("_failed_rules") == 0).drop("_failed_rules")
    quarantined = tagged.filter(F.size("_failed_rules") > 0)
    return clean, quarantined
