"""Distributed as-of join — the time-series operator Spark lacks.

`asof_join(left, right)` attaches, to every left row, the latest
right row with the same key whose timestamp is <= the left row's
(backward inclusive — kdb+ `aj` / pandas `merge_asof` semantics).

Spark has no native ASOF JOIN (DuckDB and QuestDB do). The naive
formulation — range join + row_number — explodes into a fanout join
that AQE cannot save. This implements the scale-correct UNION
formulation instead:

    union(left tagged side=1, right tagged side=0)
      -> one shuffle on the join keys
      -> window ordered by (ts, side) carrying last non-null right
         payload forward
      -> keep side=1 rows

One shuffle total, zero join fanout, state bounded per key, no
Python. Ties (equal ts) resolve inclusively: the right row sorts
before the left row at the same instant (side 0 < 1). The right
payload travels as ONE struct (ts + all value columns) carried by a
single `last(ignorenulls=True)` — so a matched right row with NULL
value columns is still carried atomically (no mixing an older row's
value with a newer row's ts), and the struct doubles as the final
window sort key, making equal-(key, ts) right rows resolve
identically on every run.

The reference engine's analogue is matching each processed document
to the source-sync state current at its processing time
(src/scheduling/source_scheduler.rs); generalized here to arbitrary
keyed event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    right_value_cols: list[str],
    prefix: str = "ref_",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns all left columns plus, per right value column,
    `{prefix}{col}` from the latest right row at-or-before the left
    row's ts (NULL when no prior right row exists for the key), and
    `{prefix}{ts_col}` — the matched right timestamp.

    Both inputs must share `keys` and `ts_col` names; right payload
    columns must not collide with left columns.
    """
    carried = list(right_value_cols) + [ts_col]
    left_cols = [c for c in left.columns]
    carry_type = StructType(
        [StructField(f"{prefix}{c}", right.schema[c].dataType) for c in carried]
    )

    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_carry", F.lit(None).cast(carry_type)
    )
    r = right.select(
        *keys,
        F.col(ts_col),
        F.struct(
            *[F.col(c).alias(f"{prefix}{c}") for c in carried]
        ).alias("_carry"),
    ).withColumn("_side", F.lit(0))
    for c in left_cols:
        if c not in keys and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l.select(*left_cols, "_side", "_carry").unionByName(
        r.select(*left_cols, "_side", "_carry")
    )

    # _carry as the final sort key: equal-(key, ts) right rows order by
    # struct value, so the carried match is run- and engine-stable.
    # NULL _carry (left rows) sorts first, which is irrelevant at
    # side=1 since _side already orders right before left.
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side", "_carry")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_match", F.last("_carry", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_match.{prefix}{c}").alias(f"{prefix}{c}") for c in carried],
    )


# ---- driver-contract query ---------------------------------------------


@register(
    "asof_join_attribution",
    oracle="""
    SELECT q.event_id, q.user_id, q.ts,
           r.event_id AS ref_event_id,
           r.ts AS ref_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') q
    ASOF LEFT JOIN
         (SELECT * FROM events WHERE event_type IN ('view', 'click')) r
      ON q.user_id = r.user_id AND q.ts >= r.ts
    """,
)
def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute every error event to the user's latest prior
    view/click — checked against DuckDB's NATIVE ASOF JOIN, so the
    union-window formulation is value-hash-pinned to the reference
    semantics (including NULL for users with no prior interaction)."""
    events = load(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    refs = events.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", F.col("event_id").alias("ref_id")
    )
    out = asof_join(
        errors,
        refs.withColumnRenamed("ref_id", "event_id_r"),
        keys=["user_id"],
        ts_col="ts",
        right_value_cols=["event_id_r"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ref_event_id_r").alias("ref_event_id"),
        "ref_ts",
    )
