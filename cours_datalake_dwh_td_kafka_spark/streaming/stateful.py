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
    StringType,
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


# ---------------------------------------------------------------------------
# transformWithState twin (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import guard for older Spark
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    _HAS_TWS = False
    StatefulProcessor = object  # type: ignore[assignment,misc]


class SessionProcessor(StatefulProcessor):
    """Gap sessionizer on the Spark 4 ``transformWithState`` API — the
    successor to ``applyInPandasWithState`` with named state variables,
    explicit timers, and TTL support. Same contract as
    :func:`sessionize_stateful` (session_end = last event + gap; a
    late-but-in-watermark event extends session_start backwards), so the
    two operators are interchangeable and cross-checked in tests.

    State: one ValueState row per open session (start/last/n/sum).
    Timers: one event-time timer at last_event + gap; on expiry, if the
    watermark has truly passed the horizon the session closes, else
    (a stale timer superseded by newer events) it re-registers. Runs on
    the RocksDB state store provider — per-key state is on-disk with an
    in-memory working set, the configuration that holds at millions of
    open sessions per executor."""

    def __init__(self, gap_seconds: int) -> None:
        self._gap_us = gap_seconds * _US

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._handle = handle
        self._open = handle.getValueState("open", STATE_SCHEMA)

    def _emit(self, user_id: int, closed: list) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [
                    pd.Timestamp(c[0], unit="us") for c in closed
                ],
                "session_end": [
                    pd.Timestamp(c[1] + self._gap_us, unit="us")
                    for c in closed
                ],
                "n_obs": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )

    def handleInputRows(self, key, rows, timerValues: "TimerValues"):
        (user_id,) = key
        gap_us = self._gap_us
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(
            "event_time", kind="stable"
        )
        ts_us = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
        vals = pdf["value"].to_numpy()
        if self._open.exists():
            start_us, last_us, n, s = self._open.get()
        else:
            start_us = last_us = int(ts_us[0])
            n, s = 0, 0.0
        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if n > 0 and t - last_us > gap_us:
                closed.append((start_us, last_us, n, s))
                start_us, n, s = t, 0, 0.0
            n += 1
            s += float(v)
            last_us = max(last_us, t) if n > 1 else t
            start_us = min(start_us, t)
        self._open.update((start_us, last_us, int(n), float(s)))
        wm_ms = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(
            max((last_us + gap_us) // 1_000, wm_ms + 1)
        )
        if closed:
            yield self._emit(user_id, closed)

    def handleExpiredTimer(
        self, key, timerValues: "TimerValues", expiredTimerInfo: "ExpiredTimerInfo"
    ):
        (user_id,) = key
        if not self._open.exists():
            return
        start_us, last_us, n, s = self._open.get()
        horizon_ms = (last_us + self._gap_us) // 1_000
        wm_ms = timerValues.getCurrentWatermarkInMs()
        if wm_ms >= horizon_ms:
            self._open.clear()
            yield self._emit(user_id, [(start_us, last_us, n, s)])
        else:
            # stale timer (newer events moved the horizon): rearm
            self._handle.registerTimer(max(horizon_ms, wm_ms + 1))

    def close(self) -> None:
        pass


def sessionize_transform_with_state(
    events: DataFrame,
    gap_seconds: int = 4 * 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """:func:`sessionize_stateful` on ``transformWithStateInPandas``.
    Needs the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``)."""
    if not _HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithState requires Spark >= 4.0"
        )
    src = events.select("user_id", "event_time", "value")
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap_seconds),
        OUTPUT_SCHEMA,
        "append",
        "eventTime",
    )


# ---------------------------------------------------------------------------
# Watermark-ordered streaming EWMA (order-sensitive stateful fold)
# ---------------------------------------------------------------------------
from pyspark.sql.types import ArrayType  # noqa: E402

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_folded", LongType()),
        StructField("ewma_value", DoubleType()),
    ]
)

#: (pending event times us, pending tie-break ids, pending values,
#:  next arrival sequence, folded count, current ewma)
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_ids", ArrayType(LongType())),
        StructField("pend_vals", ArrayType(DoubleType())),
        StructField("next_seq", LongType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def _ewma_fn(alpha: float, beta: float):
    def _fold(pend, n, ewma, wm_us):
        """Fold every pending event at-or-before the watermark, in
        (event time, tie-break id) order — the SAME secondary key the
        batch twin sorts by (timeseries.ewma orders by ts, event_id),
        so two events sharing a timestamp fold in the same order in both
        engines. Later events stay buffered."""
        ripe = sorted(p for p in pend if p[0] <= wm_us)
        rest = [p for p in pend if p[0] > wm_us]
        for _, _, v in ripe:
            ewma = v if n == 0 else alpha * v + beta * ewma
            n += 1
        return rest, n, ewma, len(ripe)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pend_ts, pend_ids, pend_vals, seq, n, ewma = state.get
            pend = list(zip(pend_ts, pend_ids, pend_vals))
        else:
            pend, seq, n, ewma = [], 0, 0, 0.0

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
            vals = pdf["value"].to_numpy()
            if "event_id" in pdf.columns:
                ids = pdf["event_id"].astype("int64").to_numpy()
            else:
                # no upstream id: tie-break by arrival sequence (stable
                # across watermark re-fires because it lives in state)
                ids = range(seq, seq + len(pdf))
                seq += len(pdf)
            pend.extend(
                (int(t), int(i), float(v))
                for t, i, v in zip(ts_us, ids, vals)
            )

        wm_us = state.getCurrentWatermarkMs() * 1_000
        pend, n, ewma, n_ripe = _fold(pend, n, ewma, wm_us)

        state.update(
            (
                [p[0] for p in pend],
                [p[1] for p in pend],
                [p[2] for p in pend],
                int(seq),
                int(n),
                float(ewma),
            )
        )
        if pend:
            # re-fire when the watermark moves past the current horizon so
            # buffered events fold even if this key sees no new data
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if n_ripe:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_folded": [n],
                    "ewma_value": [ewma],
                }
            )

    return fn


def ewma_stateful(
    events: DataFrame,
    alpha: float | None = None,
    beta: float | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the batch EWMA fold (operators/timeseries.py):
    per-key exponentially-weighted moving average emitted incrementally,
    in update mode.

    EWMA is ORDER-SENSITIVE — alpha*x_t + (1-alpha)*ewma gives a
    different answer if events fold out of event-time order — so unlike
    the sessionizer (whose per-session aggregates are order-insensitive
    within a session) this operator cannot fold rows as they arrive.
    Instead it buffers each key's events in state and folds ONLY the
    prefix the watermark has certified complete (ts <= watermark), in
    event-time order; later arrivals within the watermark slot into the
    still-pending suffix. State per key is O(events inside the
    watermark horizon) — bounded by the lateness allowance, not the
    stream length — plus the O(1) running (n, ewma). Same weights as
    the batch twin (explicit alpha AND beta literals: 1 - 0.3 != 0.7
    in IEEE doubles), so a watermark-complete stream replay reproduces
    the batch values bit-for-bit.

    STATE-SCHEMA COMPATIBILITY: round 5 widened EWMA_STATE_SCHEMA
    (added pend_ids + next_seq for the tie-break fix) — a checkpoint
    written by the old 4-field schema cannot restart on this code
    (Spark validates state schemas); drain the old query to a
    watermark-complete stop and start a fresh checkpoint, replaying
    from the last folded offset."""
    from cours_datalake_dwh_td_kafka_spark.operators.timeseries import (
        _EWMA_ALPHA,
        _EWMA_BETA,
    )

    if alpha is None:
        alpha = _EWMA_ALPHA
    if beta is None:
        beta = _EWMA_BETA if alpha == _EWMA_ALPHA else 1.0 - alpha
    cols = ["user_id", "event_time", "value"]
    if "event_id" in events.columns:
        # carry the batch twin's tie-break key so same-timestamp events
        # fold in the identical order stream-side
        cols.append("event_id")
    src = events.select(*cols)
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _ewma_fn(alpha, beta),
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Watermark-ordered streaming Holt (level + trend — the forecasting fold)
# ---------------------------------------------------------------------------
HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_folded", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_1", DoubleType()),
    ]
)

#: the EWMA buffered-fold state widened to the (level, trend) pair
HOLT_STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_ids", ArrayType(LongType())),
        StructField("pend_vals", ArrayType(DoubleType())),
        StructField("next_seq", LongType()),
        StructField("n", LongType()),
        StructField("lvl", DoubleType()),
        StructField("trd", DoubleType()),
    ]
)


def _holt_fn(alpha: float, one_a: float, beta: float, one_b: float):
    def _fold(pend, n, lvl, trd, wm_us):
        """Fold the watermark-certified prefix in (event time, id)
        order — the EWMA recipe with the two-state Holt recurrence,
        spelled with the SAME literals and op order as the batch fold
        (operators/timeseries.holt_forecast) so a watermark-complete
        replay reproduces the batch doubles bit-for-bit."""
        ripe = sorted(p for p in pend if p[0] <= wm_us)
        rest = [p for p in pend if p[0] > wm_us]
        for _, _, v in ripe:
            if n == 0:
                lvl, trd = v, 0.0
            else:
                l_new = alpha * v + one_a * (lvl + trd)
                trd = beta * (l_new - lvl) + one_b * trd
                lvl = l_new
            n += 1
        return rest, n, lvl, trd, len(ripe)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pend_ts, pend_ids, pend_vals, seq, n, lvl, trd = state.get
            pend = list(zip(pend_ts, pend_ids, pend_vals))
        else:
            pend, seq, n, lvl, trd = [], 0, 0, 0.0, 0.0

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
            vals = pdf["value"].to_numpy()
            if "event_id" in pdf.columns:
                ids = pdf["event_id"].astype("int64").to_numpy()
            else:
                ids = range(seq, seq + len(pdf))
                seq += len(pdf)
            pend.extend(
                (int(t), int(i), float(v))
                for t, i, v in zip(ts_us, ids, vals)
            )

        wm_us = state.getCurrentWatermarkMs() * 1_000
        pend, n, lvl, trd, n_ripe = _fold(pend, n, lvl, trd, wm_us)

        state.update(
            (
                [p[0] for p in pend],
                [p[1] for p in pend],
                [p[2] for p in pend],
                int(seq),
                int(n),
                float(lvl),
                float(trd),
            )
        )
        if pend:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if n_ripe:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_folded": [n],
                    "level": [lvl],
                    "trend": [trd],
                    "forecast_1": [lvl + trd],
                }
            )

    return fn


def holt_stateful(
    events: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the batch Holt fold
    (operators/timeseries.holt_forecast): per-key (level, trend)
    emitted incrementally in update mode — the live capacity forecaster.
    Same buffered watermark-ordered fold as :func:`ewma_stateful`
    (order-sensitive recurrence: only the watermark-certified prefix
    folds, later arrivals slot into the pending suffix; state is
    O(events inside the watermark horizon) + the O(1) (n, level,
    trend)); same literal weights as the batch twin, so a
    watermark-complete replay reproduces the batch doubles
    bit-for-bit (pinned in tests, interleaved late rows included)."""
    from cours_datalake_dwh_td_kafka_spark.operators.timeseries import (
        _HOLT_1MA,
        _HOLT_1MB,
        _HOLT_ALPHA,
        _HOLT_BETA,
    )

    cols = ["user_id", "event_time", "value"]
    if "event_id" in events.columns:
        cols.append("event_id")
    src = events.select(*cols)
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _holt_fn(_HOLT_ALPHA, _HOLT_1MA, _HOLT_BETA, _HOLT_1MB),
        HOLT_OUTPUT_SCHEMA,
        HOLT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Watermark-ordered streaming CUSUM (drift monitor vs a KNOWN baseline)
# ---------------------------------------------------------------------------
CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_folded", LongType()),
        StructField("max_pos_cusum", DoubleType()),
        StructField("max_neg_cusum", DoubleType()),
    ]
)

#: (pending buffer) + exact integer-micro running state: cumulative sum,
#: its running min/max, and the two one-sided maxima
CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_ids", ArrayType(LongType())),
        StructField("pend_vals", ArrayType(DoubleType())),
        StructField("next_seq", LongType()),
        StructField("n", LongType()),
        StructField("c_micro", LongType()),
        StructField("min_c", LongType()),
        StructField("max_c", LongType()),
        StructField("spos", LongType()),
        StructField("sneg", LongType()),
    ]
)


def _cusum_fn(mu: float):
    import math

    def _micro(v: float) -> int:
        # Mirror the batch pipeline's TWO rounding steps exactly: it
        # first rounds value to 6 dp (ROUND(value, 6) -> DECIMAL(18,6)),
        # then rounds (v6 - mu). Skipping the pre-round differs by one
        # micro-unit on inputs with > 6 fractional digits.
        v6 = math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6
        d = v6 - mu
        return int(math.copysign(math.floor(abs(d) * 1e6 + 0.5), d))

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pend_ts, pend_ids, pend_vals, seq, n, c, mn, mx, sp, sn = (
                state.get
            )
            pend = list(zip(pend_ts, pend_ids, pend_vals))
        else:
            pend, seq, n, c, mn, mx, sp, sn = [], 0, 0, 0, 0, 0, 0, 0

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
            vals = pdf["value"].to_numpy()
            if "event_id" in pdf.columns:
                ids = pdf["event_id"].astype("int64").to_numpy()
            else:
                ids = range(seq, seq + len(pdf))
                seq += len(pdf)
            pend.extend(
                (int(t), int(i), float(v))
                for t, i, v in zip(ts_us, ids, vals)
            )

        wm_us = state.getCurrentWatermarkMs() * 1_000
        ripe = sorted(p for p in pend if p[0] <= wm_us)
        pend = [p for p in pend if p[0] > wm_us]
        for _, _, v in ripe:
            c += _micro(v)
            if n == 0:
                # the batch twin's running MIN/MAX ranges over rows
                # 1..t (no empty-prefix zero), so seed from the first
                # folded row, not from 0
                mn = mx = c
            else:
                mn, mx = min(mn, c), max(mx, c)
            sp, sn = max(sp, c - mn), max(sn, mx - c)
            n += 1

        state.update(
            (
                [p[0] for p in pend],
                [p[1] for p in pend],
                [p[2] for p in pend],
                int(seq),
                int(n),
                int(c),
                int(mn),
                int(mx),
                int(sp),
                int(sn),
            )
        )
        if pend:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if ripe:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_folded": [n],
                    "max_pos_cusum": [sp / 1e6],
                    "max_neg_cusum": [sn / 1e6],
                }
            )

    return fn


def cusum_stateful(
    events: DataFrame,
    mu: float,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``timeseries.cusum_changepoint(target_mu=mu)``:
    per-key one-sided CUSUM maxima against a KNOWN baseline mean,
    emitted incrementally in update mode. A stream cannot know its
    full-series sample mean, so the monitored form takes the target —
    exactly how production drift monitors run (the batch operator
    accepts the same ``target_mu`` for parity testing).

    Order discipline is the EWMA twin's: buffer events inside the
    watermark horizon, fold only the watermark-certified prefix in
    (event time, tie-break id) order. Exactness: each deviation rounds
    half-away to 6 dp and accumulates as INTEGER micro-units, the same
    integers the batch twin's DECIMAL(28,6) running sums produce — a
    watermark-complete replay reproduces the batch maxima exactly.
    State per key is O(horizon buffer) + seven integers."""
    cols = ["user_id", "event_time", "value"]
    if "event_id" in events.columns:
        cols.append("event_id")
    src = events.select(*cols)
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _cusum_fn(mu),
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Watermark-ordered streaming inter-event gaps (feeds the burstiness
# histogram — streaming twin of operators/analytics.py
# inter_event_time_distribution's gap extraction)
# ---------------------------------------------------------------------------
GAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("gap_s", LongType()),
    ]
)

#: (pending event times us, pending tie-break ids, next arrival
#:  sequence, last folded event time us — -1 before the first fold)
GAP_STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_ids", ArrayType(LongType())),
        StructField("next_seq", LongType()),
        StructField("last_ts", LongType()),
    ]
)


def _gap_fn():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pend_ts, pend_ids, seq, last_ts = state.get
            pend = list(zip(pend_ts, pend_ids))
        else:
            pend, seq, last_ts = [], 0, -1

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (pdf["event_time"].astype("int64") // 1_000).to_numpy()
            if "event_id" in pdf.columns:
                ids = pdf["event_id"].astype("int64").to_numpy()
            else:
                ids = range(seq, seq + len(pdf))
                seq += len(pdf)
            pend.extend((int(t), int(i)) for t, i in zip(ts_us, ids))

        # gaps are ORDER-SENSITIVE (each event's gap is against its
        # event-time predecessor), so fold only the watermark-certified
        # prefix in (ts, id) order — the ewma_stateful discipline
        wm_us = state.getCurrentWatermarkMs() * 1_000
        ripe = sorted(p for p in pend if p[0] <= wm_us)
        pend = [p for p in pend if p[0] > wm_us]
        gaps = []
        for t, _ in ripe:
            if last_ts >= 0:
                # integer microsecond diff -> whole seconds, floored at
                # 1 — the batch twin's exact bucketing input
                gaps.append(max((t - last_ts) // 1_000_000, 1))
            last_ts = t

        state.update(
            (
                [p[0] for p in pend],
                [p[1] for p in pend],
                int(seq),
                int(last_ts),
            )
        )
        if pend:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if gaps:
            yield pd.DataFrame(
                {"user_id": user_id, "gap_s": pd.array(gaps, dtype="int64")}
            )

    return fn


def gap_stateful(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of the batch inter-event-gap extraction
    (operators/analytics.py inter_event_time_distribution): one row per
    (user, consecutive-event gap in whole seconds), emitted as the
    watermark certifies each event's predecessor order is final. The
    downstream histogram is a plain streaming aggregation over these
    rows — gap extraction is the stateful part, bucketing is not.

    Same buffered-fold shape as :func:`ewma_stateful`: state per key is
    the pending suffix inside the watermark horizon plus O(1) (last
    folded event time), and a timeout re-fires buffered keys when the
    watermark advances past them."""
    cols = ["user_id", "event_time"]
    if "event_id" in events.columns:
        cols.append("event_id")
    src = events.select(*cols)
    if events.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _gap_fn(),
        GAP_OUTPUT_SCHEMA,
        GAP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct-count sketch (round 11): the stateful twin of
# operators/sketches.kmv_sketch. KMV merge is ORDER-INSENSITIVE (the k
# smallest of a union does not care about arrival order), so unlike the
# EWMA/Holt folds no watermark buffering is needed: state per key is
# exactly the k smallest hashes seen — k longs, bounded for the life of
# the stream — and after any prefix the emitted estimate equals the
# batch sketch of that prefix bit-for-bit (mergeability, pytest-pinned).
# ---------------------------------------------------------------------------
from pyspark.sql.types import ArrayType  # noqa: E402

KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_seen", LongType()),
        StructField("n_sample", LongType()),
        StructField("distinct_est", DoubleType()),
    ]
)

KMV_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

_KMV_SCALE_STREAM = 4294967296  # 2^32, matches operators/sketches


def _kmv_fn(k: int):
    def fn(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev, n_seen = state.get
            hs = set(prev)
        else:
            hs, n_seen = set(), 0
        for pdf in pdfs:
            n_seen += len(pdf)
            hs.update(int(x) for x in pdf["h"])
        top = sorted(hs)[:k]
        state.update((list(top), int(n_seen)))
        est = (
            float(len(top))
            if len(top) < k
            else (k - 1) * _KMV_SCALE_STREAM / top[-1]
        )
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "n_seen": [int(n_seen)],
                "n_sample": [len(top)],
                "distinct_est": [est],
            }
        )

    return fn


def kmv_stateful(events: DataFrame, k: int | None = None) -> DataFrame:
    """Per-key streaming distinct-count estimate from a bounded KMV
    state. ``events`` carries (key LONG, h LONG) where ``h`` is the
    shared HASH32 of the counted value (hash in the select feeding
    this, exactly as the batch sketch does) — state and estimator are
    the batch functions' twins, so stream == batch on any
    watermark-free replay. Update mode; NoTimeout (the sketch never
    expires — it summarizes the whole history by design)."""
    if k is None:
        from cours_datalake_dwh_td_kafka_spark.operators.sketches import (
            KMV_K,
        )

        k = KMV_K
    return events.select("key", "h").groupBy("key").applyInPandasWithState(
        _kmv_fn(k),
        KMV_OUTPUT_SCHEMA,
        KMV_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters (round 11): the stateful twin of
# operators/sketches.mg_candidates. Values are SHARDED BY HASH so state
# distributes across tasks while the classic guarantee survives: a value's
# entire count lands in exactly one shard, and within shard s the summed
# decrement budget is n_s/(k+1) < n/k, so any GLOBAL > n/k heavy hitter
# must still hold a counter in its shard after any prefix — arrival order
# and micro-batch boundaries can change which LIGHT values ride along,
# never whether a heavy one survives (pytest pins this under multiple
# batch splits, plus the Berinde deficit bound on every emitted counter).
# State per shard: <= k (value, weight) pairs + two longs — bounded for
# the life of the stream.
# ---------------------------------------------------------------------------
MG_STREAM_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("v", StringType()),
        StructField("cnt_lo", LongType()),
        StructField("err_bound", LongType()),
        StructField("n_seen", LongType()),
    ]
)

MG_STREAM_STATE_SCHEMA = StructType(
    [
        StructField("vs", ArrayType(StringType())),
        StructField("ws", ArrayType(LongType())),
        StructField("decr", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _mg_fn(k: int):
    def fn(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vs, ws, decr, n_seen = state.get
            counters = dict(zip(vs, ws))
        else:
            counters, decr, n_seen = {}, 0, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            # same vectorized kernel as the batch summary: one weighted
            # update per DISTINCT value per Arrow batch, never per row
            for v, w in pdf["v"].value_counts().items():
                w = int(w)
                if v in counters:
                    counters[v] += w
                elif len(counters) < k:
                    counters[v] = w
                else:
                    m = min(w, min(counters.values()))
                    for c in list(counters):
                        counters[c] -= m
                        if counters[c] <= 0:
                            del counters[c]
                    decr += m
                    if w - m > 0:
                        counters[v] = w - m
        items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            (
                [v for v, _ in items],
                [int(w) for _, w in items],
                int(decr),
                int(n_seen),
            )
        )
        if items:
            yield pd.DataFrame(
                {
                    "shard": [int(key[0])] * len(items),
                    "v": [v for v, _ in items],
                    "cnt_lo": [int(w) for _, w in items],
                    "err_bound": [int(decr)] * len(items),
                    "n_seen": [int(n_seen)] * len(items),
                }
            )

    return fn


def heavy_hitters_stateful(events: DataFrame, k: int | None = None) -> DataFrame:
    """Per-shard streaming Misra-Gries summary. ``events`` carries
    (shard LONG, v STRING) where shard = pmod(xxhash64(v), n_shards)
    computed in the select feeding this — hashing by VALUE (never
    round-robin) is what keeps the guarantee: each value's full weight
    fights for one shard's counters instead of being diluted across
    all of them.

    Emitted rows per trigger are the shard's live counters with the
    Berinde deficit bound: ``cnt_lo <= true_count <= cnt_lo +
    err_bound`` where ``err_bound`` is the shard's total eviction
    decrement (<= n_shard/(k+1)). Update mode; NoTimeout — like the
    KMV sketch the summary covers the whole history by design. The
    exact-recount second pass of the batch twin
    (operators/sketches.heavy_hitters_mg) remains a batch job over the
    lake; this operator is the candidate-set feed for it."""
    if k is None:
        from cours_datalake_dwh_td_kafka_spark.operators.sketches import (
            MG_K,
        )

        k = MG_K
    return events.select("shard", "v").groupBy("shard").applyInPandasWithState(
        _mg_fn(k),
        MG_STREAM_OUTPUT_SCHEMA,
        MG_STREAM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
