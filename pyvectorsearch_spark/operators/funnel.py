"""Event-sequence analytics: funnel conversion and cohort retention — the
standard product-analytics companions to ``sessionize`` (north-star
extensions; the reference has no event processing).

Scale shape: both operators hinge on per-user window functions over ONE hash
partitioning of the events stream — the sequential-funnel milestones are
nested unordered windows over the same ``partitionBy(user)``, which Spark
plans as a single Exchange (no sort needed: the frames are
whole-partition aggregates). The follow-up rollups reduce user-sized, not
event-sized, tables. At 100 TB the one user-keyed shuffle is unavoidable in
any engine computing per-user sequences; everything after it is
vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict sequential funnel over event types: a user reaches step i+1 at
    the EARLIEST event of type ``steps[i+1]`` at-or-after their step-i
    milestone (min-ts recurrence — the standard ordered-funnel semantics).

    One row out: total users, per-step reach counts, and step-to-step plus
    overall conversion rates (rounded to 6 dp).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        col = f"_t{i}"
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    users = df.select(user_col, *[f"_t{i}" for i in range(len(steps))]).distinct()
    reach = [
        F.count(F.col(f"_t{i}")).cast("bigint").alias(f"n_{step}")
        for i, step in enumerate(steps)
    ]
    agg = users.agg(F.count("*").cast("bigint").alias("n_users"), *reach)
    rates = []
    for i in range(1, len(steps)):
        rates.append(
            F.round(
                F.col(f"n_{steps[i]}")
                / F.greatest(F.col(f"n_{steps[i - 1]}"), F.lit(1)).cast("double"),
                6,
            ).alias(f"conv_{steps[i - 1]}_{steps[i]}")
        )
    rates.append(
        F.round(
            F.col(f"n_{steps[-1]}")
            / F.greatest(F.col(f"n_{steps[0]}"), F.lit(1)).cast("double"),
            6,
        ).alias("conv_overall")
    )
    return agg.select("n_users", *[f"n_{s}" for s in steps], *rates)


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic day-cohort retention: cohort = the date of a user's first
    event; a (cohort, day_offset) cell counts distinct users from that
    cohort active ``day_offset`` days later.

    Returns (cohort, day_offset, n_users) — all exact integers/dates, so the
    oracle comparison is bit-trivial."""
    w = Window.partitionBy(user_col)
    d = events.select(
        F.col(user_col),
        F.to_date(ts_col).alias("_day"),
    ).withColumn("cohort", F.min("_day").over(w))
    return (
        d.select(
            "cohort",
            F.datediff("_day", "cohort").alias("day_offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count_distinct(user_col).cast("bigint").alias("n_users"))
    )
