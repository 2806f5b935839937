"""State-change sessionization — the reference's flagship batch computation.

Semantics (reference: work/TD_pySpark.ipynb:233-322,391-407): per entity,
ordered by time, detect changes of a boolean "active" state with ``lag``,
number the runs with a running sum of the change flag, keep the active runs,
and aggregate each run into a session row
``(entity, session_id, start, end, avg_value, duration_min)`` with the
reference's ``(epoch(end) - epoch(start)) / 60 + 1`` minute-rounding rule
(reference: work/TD_pySpark.ipynb:399-405).

Differences from the reference, by design:

- The reference used row-at-a-time Python UDFs for timestamp parsing and
  change detection (reference: work/TD_pySpark.ipynb:122,242). Here both are
  native column expressions, so the whole pipeline stays inside
  WholeStageCodegen with zero Python round-trips.
- Duration uses integer microseconds (``unix_micros``), not a seconds cast,
  so sub-second timestamps don't truncate.

Scale notes: the only shuffle is the hash partition by entity for the two
window functions, and it is ONE exchange — both windows and the session
aggregate share the ``partitionBy(entity)`` clustering, so Catalyst reuses
the partitioning across the lag, the running sum, and the groupBy (the
groupBy keys start with the entity column). Skewed entities are handled by
AQE; there is no driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    active: Column,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse per-entity event rows into session (trip) rows.

    ``active`` is any boolean Column; a session is a maximal run of
    consecutive ``active`` rows per entity in time order. ``tiebreak_col``
    makes ordering total when timestamps can tie (determinism for tests).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    state = active.cast("int")
    prev = F.lag(state).over(w)
    # Change flag without a UDF (reference used udf(IntegerType) at
    # work/TD_pySpark.ipynb:242): first row of an entity counts as a change.
    changed = F.when(prev.isNull() | (prev != state), F.lit(1)).otherwise(F.lit(0))

    sessions = (
        df.withColumn("_state", state)
        .withColumn("_changed", changed)
        .withColumn("_run_id", F.sum("_changed").over(w_run))
        .where(F.col("_state") == 1)
    )

    # Session number among *active* runs only, per entity: active runs get
    # run ids 1,3,5,... or 2,4,6,... depending on the leading state, so
    # dense_rank over run_id re-numbers them 1..n (reference numbers trips
    # with the running sum directly because its data starts inactive;
    # dense_rank is the general form).
    w_sess = Window.partitionBy(entity_col).orderBy("_run_id")
    sessions = sessions.withColumn(
        "session_id", F.dense_rank().over(w_sess).cast("long")
    )

    dur_min = (
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
        / F.lit(60_000_000.0)
        + F.lit(1.0)
    )
    return (
        sessions.groupBy(entity_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum -> double division: deterministic across
            # engines regardless of per-partition summation order
            F.round(
                F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
            F.round(dur_min, 6).alias("duration_min"),
        )
        .orderBy(entity_col, "session_id")
    )


def sessionize_events(df: DataFrame) -> DataFrame:
    """Flagship instantiation on the driver's ``events`` table: a user is
    "active" while emitting non-error events; error events break the run
    (analogous to the cyclistes ``sur_velo`` trips,
    reference: work/TD_pySpark.ipynb:313-322)."""
    return sessionize(
        df,
        entity_col="user_id",
        ts_col="ts",
        active=F.col("event_type") != F.lit("error"),
        value_col="value",
        tiebreak_col="event_id",
    )


#: DuckDB oracle for ``sessionize_events`` (same algorithm in ANSI SQL).
SESSIONIZE_EVENTS_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, ts, event_id, value,
    CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS state,
    CASE WHEN LAG(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) IS DISTINCT FROM
              (CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
         THEN 1 ELSE 0 END AS changed
  FROM events
),
runs AS (
  SELECT *,
    SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
  WHERE TRUE
),
active AS (
  SELECT * FROM runs WHERE state = 1
),
numbered AS (
  SELECT *, DENSE_RANK() OVER (PARTITION BY user_id ORDER BY run_id) AS session_id
  FROM active
)
SELECT
  user_id,
  session_id,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
  ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 60000000.0 + 1.0, 6) AS duration_min
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""
