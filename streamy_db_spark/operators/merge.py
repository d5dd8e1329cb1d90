"""Batch MERGE / upsert: apply a change set to a keyed snapshot.

The maintenance half of any ingest pipeline: yesterday's snapshot +
today's changes → new snapshot (upsert) with optional delete markers.
Formats with a transaction log (Delta/Iceberg/Hudi) expose this as
``MERGE INTO``; on plain parquet the engine composes it from joins —
which is exactly what those formats execute underneath (copy-on-write).

Scale shape: ONE full-outer join hash-partitioned on the key — both
sides shuffle once, no driver involvement, no row multiplication
(keys are unique per side by contract). Updates win by COALESCE
priority, deletes drop the row. Rewriting only affected partitions
(partition-pruned copy-on-write) composes with
sources/files.write_partitioned: merge the changed partitions, keep the
rest by reference.

No reference counterpart (the reference's only state mutation is the
transaction protocol itself, SURVEY.md §2.1); this is the batch-side
complement of the protocol's keyed-cell updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """New snapshot: rows from ``changes`` replace same-key rows in
    ``target``, unmatched change rows insert, and (when ``delete_col``
    names a boolean column in ``changes``) delete-marked keys drop out.
    Both inputs must be unique on ``key`` (enforce upstream with
    last-write-wins — operators/relational.py q_last_write_wins — for
    multi-version change feeds)."""
    val_cols = [c for c in target.columns if c != key]
    ch_cols = set(changes.columns)
    missing = [c for c in val_cols if c not in ch_cols]
    if missing:
        raise ValueError(f"changes missing target columns: {missing}")
    ch = changes.select(
        F.col(key),
        *[F.col(c).alias(f"__ch_{c}") for c in val_cols],
        (
            F.col(delete_col) if delete_col else F.lit(False)
        ).alias("__ch_del"),
    )
    merged = target.join(ch, key, "full_outer")
    out = merged.filter(
        F.coalesce(F.col("__ch_del"), F.lit(False)) == False  # noqa: E712
    )
    return out.select(
        key,
        *[
            F.when(F.col("__ch_del").isNotNull(), F.col(f"__ch_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in val_cols
        ],
    )


# --- test-registry query (oracle-checked; no driver slot used) ---------------


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders snapshot merged with an in-query change feed: every key
    ≡0 (mod 10) gets a +50.00 price adjustment (update; additive so the
    doubles stay bit-identical across engines — no cross-engine round()), keys ≡3 (mod 1000)
    are tombstoned (delete), and one synthetic order per customer 1..5
    inserts. Derived arithmetically so DuckDB builds the identical
    change set."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 50.0).alias("o_totalprice"),
        F.lit(False).alias("is_delete"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 1000 == 3).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice"),
        F.lit(True).alias("is_delete"),
    )
    inserts = (
        spark.range(1, 6)
        .select(
            (F.col("id") + 900_000_000).alias("o_orderkey"),
            F.col("id").alias("o_custkey"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit(False).alias("is_delete"),
        )
    )
    # update/delete sets are disjoint by construction (mod-10 vs mod-1000
    # residues 0 vs 3), so the change feed is unique on the key
    changes = updates.unionByName(deletes).unionByName(inserts)
    return merge_upsert(orders, changes, "o_orderkey", delete_col="is_delete")


# Driver-registered in r5 (slot freed by rotating q_scalar_funcs to the
# test-only registry).
QUERIES = {"q_merge_upsert": q_merge_upsert}

TEST_QUERIES: dict = {}
TEST_ORACLE: dict = {}

ORACLE = {
    "q_merge_upsert": """
        WITH snap AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ),
        changes AS (
            SELECT o_orderkey, o_custkey,
                   o_totalprice + 50.0 AS o_totalprice,
                   FALSE AS is_delete
            FROM snap WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice, TRUE AS is_delete
            FROM snap WHERE o_orderkey % 1000 = 3
            UNION ALL
            SELECT 900000000 + i AS o_orderkey, i AS o_custkey,
                   CAST(100.0 AS DOUBLE) AS o_totalprice, FALSE AS is_delete
            FROM unnest(generate_series(1, 5)) AS t(i)
        )
        SELECT coalesce(c.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey
                    ELSE s.o_custkey END AS o_custkey,
               CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice
                    ELSE s.o_totalprice END AS o_totalprice
        FROM snap s FULL OUTER JOIN changes c ON s.o_orderkey = c.o_orderkey
        WHERE NOT coalesce(c.is_delete, FALSE)
    """,
}
