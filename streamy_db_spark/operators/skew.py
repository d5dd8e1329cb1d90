"""Skew mitigation utilities.

At 100 TB the failure mode of every ``groupBy``/``join`` is one hot key
pinning one reducer. Two standing answers, both here:

1. AQE skew-join splitting — already on in session.py
   (``spark.sql.adaptive.skewJoin.enabled``): Spark splits oversized
   shuffle partitions of a sort-merge join at runtime. Nothing to code.
2. **Salted two-phase aggregation** (this module) for aggregations whose
   combine is associative: spray each hot key across N salt buckets,
   partially aggregate per (key, salt), then merge the N partials per
   key. The second shuffle moves ≤ N rows per key regardless of input
   skew. This is what the reference's per-key serial state machine can
   NEVER do (its per-key order is semantic — SURVEY §2.1 S2); it applies
   to the analytics surface, not the transaction path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    aggs: {out_name: (fn, col)} with fn ∈ {count, sum, min, max}
    (the associative-mergeable set; avg = sum/count composed by caller).

    >>> salted_agg(li, ["l_orderkey"], {"n": ("count", "*"),
    ...                                 "qty": ("sum", "l_quantity")})
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")

    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count("*").alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            merge_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            merge_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            merge_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate: {fn}")

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
    )
    return partial.groupBy(*keys).agg(*merge_exprs)


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key equi-join without AQE: replicate the SMALL side n_salts
    times, salt the big side, join on (key, salt). Each hot key's rows
    spread over n_salts reducers. Use when the small side fits in a
    broadcast anyway this degenerates to plain broadcast — this variant
    is for mid-size dims too big to broadcast but joined against a
    skewed fact."""
    salted_big = big.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(exploded_small, [on, "_salt"]).drop("_salt")
