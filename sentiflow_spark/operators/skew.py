"""Skew-mitigation operators: salting for hot keys (SURVEY §7.2 M5,
"AQE/salting notes for skew").

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``)
handles most skew for free, but two shapes still need explicit salting
at 100 TB:

1. **Skewed aggregation** — a groupBy key with a few giant groups puts
   an entire group on one reducer. Salting splits each group across
   ``n_salts`` reducers with a partial aggregate, then merges the
   partials with a second (tiny) aggregate. Works for any algebraic
   aggregate (sum/count/min/max); results are exactly equal to the
   unsalted plan because decimal sums and counts are commutative.

2. **Skewed shuffle join** — a fact table whose join key has hot values
   overwhelms one task. Replicating the (much smaller) build side
   ``n_salts``× and scattering the fact side by a deterministic salt
   turns one hot partition into ``n_salts`` even ones. Only needed when
   the build side is too big to broadcast outright.

Both helpers derive the salt from a hash of existing columns (not
``rand()``), so plans stay deterministic and re-executable — a task
retry computes the same salt, which checkpointed/speculative execution
requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_sf_salt"


def _salt_col(salt_on: Sequence[str], n_salts: int) -> Column:
    return F.pmod(F.hash(*[F.col(c) for c in salt_on]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    *,
    n_salts: int = 16,
    salt_on: Sequence[str] = (),
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs`` run per (keys + salt); ``final_aggs`` merge the
    partials per keys (referencing the partial aliases). The first
    shuffle spreads each hot group over ``n_salts`` reducers; the
    second shuffle moves only ``n_salts`` rows per group.
    """
    salted = df.withColumn(_SALT, _salt_col(salt_on or list(df.columns), n_salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    *,
    n_salts: int = 8,
    salt_on: Sequence[str] = (),
) -> DataFrame:
    """Skew-safe equi-join: replicate the build side ``n_salts``× and
    scatter the fact side by a hash-derived salt, so each hot fact key
    lands on ``n_salts`` tasks instead of one. The extra shuffle volume
    is ``n_salts × |build|`` — use only when ``build`` exceeds the
    broadcast threshold but is far smaller than ``fact``."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    build_rep = build.withColumn(_SALT, F.explode(salts))
    # default salt source: ALL fact columns — never just the join key,
    # which would give every row of a hot key the same salt and defeat
    # the whole point
    fact_s = fact.withColumn(_SALT, _salt_col(salt_on or list(fact.columns), n_salts))
    joined = fact_s.join(
        build_rep.hint("shuffle_hash"),
        (fact_s[fact_key] == build_rep[build_key])
        & (fact_s[_SALT] == build_rep[_SALT]),
    )
    return joined.drop(_SALT)
