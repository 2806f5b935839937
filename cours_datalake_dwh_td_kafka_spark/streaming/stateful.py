"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the streaming twin of the flagship batch
sessionization (SURVEY.md §2.5 W1-W4; reference case study
work/TD_pySpark.ipynb:233-407 computes trips from state flips in batch;
here sessions close INCREMENTALLY as the stream advances).

Why a custom operator: ``session_window`` covers gap sessions natively
(streaming/pipelines.py), but a hand-held state loop is the engine's
extension point for semantics Spark lacks (per-key business state
machines, custom eviction, enrich-as-you-aggregate). This module keeps
the contract identical to ``F.session_window`` (session_end = last event
+ gap) so the two are interchangeable and cross-checked in tests.

Scale notes: state lives in the executor state store, partitioned by the
group key — state size is O(open sessions), not O(events). Event-time
timeouts + the watermark close idle sessions, so state cannot grow
unboundedly (the reference's unbounded complete-mode state is the
anti-pattern this replaces). Arrow batches move rows to the Python
worker; per-key processing is vectorized pandas, not per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_obs", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

#: open-session state: (start_us, last_us, n_obs, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_obs", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            start_us, last_us, n, s = state.get
            closed.append((start_us, last_us, n, s))
            state.remove()
        else:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            pdf = pdf.sort_values("event_time", kind="stable")
            ts_us = (
                pdf["event_time"].astype("int64") // 1_000
            ).to_numpy()  # ns -> us
            vals = pdf["value"].to_numpy()

            if state.exists:
                start_us, last_us, n, s = state.get
            else:
                start_us = last_us = int(ts_us[0])
                n, s = 0, 0.0
                # brand-new state: seed with the first row below

            for t, v in zip(ts_us, vals):
                t = int(t)
                if n > 0 and t - last_us > gap_us:
                    closed.append((start_us, last_us, n, s))
                    start_us, n, s = t, 0, 0.0
                n += 1
                s += float(v)
                last_us = max(last_us, t) if n > 1 else t
                # a late-but-in-watermark event can PREDATE the open
                # session's start (state carried from a prior batch);
                # F.session_window extends the window start backwards,
                # so the stateful twin must too
                start_us = min(start_us, t)
            state.update((start_us, last_us, n, s))
            # close the open session once the watermark passes last + gap;
            # the timeout must sit strictly above the current watermark
            # (rows may arrive with last+gap already behind it)
            timeout_ms = (last_us + gap_us) // 1_000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(c[0], unit="us") for c in closed
                    ],
                    "session_end": [
                        pd.Timestamp(c[1] + gap_us, unit="us") for c in closed
                    ],
                    "n_obs": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 4 * 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Close gap-based sessions incrementally with explicit per-key state.

    ``events`` needs (user_id, event_time, value) and may be a streaming
    or batch DataFrame — for streams a watermark drives the event-time
    timeout that finalizes idle sessions. Output contract matches
    ``F.session_window``: session_end = last event + gap, and a
    late-but-in-watermark event that predates the open session's start
    extends ``session_start`` backwards (min over observed times), like
    ``session_window`` would. Known divergence: an in-watermark event
    older than ``start - gap`` (a disjoint EARLIER session) is folded
    into the open session instead of being emitted as its own window —
    exact handling needs interval-set state; with watermark <= gap (the
    shipped defaults) the case cannot occur.
    """
    src = events.select("user_id", "event_time", "value")
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_pandas_batch(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Batch twin of :func:`sessionize_stateful` (Spark rejects
    applyInPandasWithState on batch DataFrames), registered as
    ``pandas_sessionization`` so the custom-state machinery gets
    DuckDB-oracle coverage.

    Shape: hash-repartition by user_id, sort within partitions by
    (user_id, event_time), then ONE ``mapInPandas`` pass per partition
    with fully-vectorized numpy session folding. NOT
    ``groupBy().applyInPandas`` — grouped-map invokes the Python UDF once
    PER KEY, and at thousands of keys that per-call overhead dominated
    the query (measured 13.7 s grouped-map vs ~1.5 s partition-local at
    sf0.1, same results). Memory bound = one partition's rows; size
    ``n_partitions`` so partitions fit, the same dial every shuffle has."""
    import numpy as np

    gap_us = gap_seconds * _US

    def fold_partition(batches) -> "pd.DataFrame":
        # a user's rows can straddle Arrow batches, so fold whole
        # partitions (the repartition guarantees user completeness)
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        u = pdf["user_id"].to_numpy()
        ts = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
        vals = pdf["value"].to_numpy(dtype="float64")
        new_session = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (np.diff(ts) > gap_us))
        )
        starts = np.flatnonzero(new_session)
        bounds = np.concatenate((starts[1:], [len(ts)]))
        yield pd.DataFrame(
            {
                "user_id": u[starts],
                "session_start": pd.to_datetime(ts[starts], unit="us"),
                "session_end": pd.to_datetime(
                    ts[bounds - 1] + gap_us, unit="us"
                ),
                "n_obs": (bounds - starts).astype("int64"),
                "sum_value": np.add.reduceat(vals, starts),
            }
        )

    return (
        events.select("user_id", "event_time", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "event_time")
        .mapInPandas(fold_partition, OUTPUT_SCHEMA)
    )
