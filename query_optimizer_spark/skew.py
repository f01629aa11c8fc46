"""Skew-aware join helpers.

At 100 TB a handful of hot keys can pin an entire sort-merge join on one
task.  Two remedies, both result-equivalent to a plain inner join:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
  the ``default`` session profile) -- zero code, preferred.
- Explicit salting for engines/paths where AQE can't help (e.g. a
  skewed key joined to a non-broadcastable mid-size table):
  ``salted_join`` fans each hot build-side row out to N salt replicas
  and scatters probe-side rows across them, so the hot key's work is
  spread over N tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of ``big`` (skewed probe side) with ``small``
    (replicated build side) on equality of ``on`` columns, salted
    ``salt`` ways.

    big rows get a deterministic pseudo-random salt in [0, salt);
    small rows are replicated once per salt value.  The join key becomes
    (on..., salt), splitting every hot key into ``salt`` shuffle
    partitions.  Replication multiplies the small side by ``salt`` --
    use only when small * salt still fits comfortably per executor.
    """
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt)),
    )
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = big_salted.join(small_salted, on=keys + [SALT_COL], how=how)
    return joined.drop(SALT_COL)


def skew_demo(big_or_spark, sf_dir: str | None = None) -> DataFrame:
    """Gate-visible salted-join demo: events (probe side, user_id skew at
    scale) salted-joined to the customer dimension, then aggregated per
    segment.  Results are identical to the plain join -- the DuckDB
    oracle runs the unsalted SQL, so the hash match proves salting is
    result-invariant while the (key, salt) shuffle splits hot keys
    across `salt` tasks."""
    from .session import configure_runtime, events_df

    spark = big_or_spark
    configure_runtime(spark)
    big = events_df(spark, sf_dir).select("user_id", "value")
    small = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = salted_join(big, small, on="user_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 3).alias("total_value"),
    )


def skew_demo_oracle() -> str:
    return """
        SELECT c.c_mktsegment, count(*) AS n_events,
               round(sum(e.value), 3) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """
