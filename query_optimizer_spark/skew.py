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
