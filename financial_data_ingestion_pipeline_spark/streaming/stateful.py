"""Custom stateful streaming operator: per-symbol running trade stats
(VWAP, totals) via ``applyInPandasWithState``.

This is the ``GroupState`` pattern the built-in streaming aggregates
can't express: state that accumulates *across micro-batches forever*
(a windowed agg expires with its watermark; VWAP-since-open must not),
updated with arbitrary per-group logic and emitted once per batch.

Scale notes: state is one tiny tuple per symbol (three doubles), so
state-store size is O(|symbols|), independent of tick volume; updates
arrive Arrow-batched per group.  The shuffle is the same single
keyBy(symbol) any grouped aggregate pays.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: (sum price*qty, sum qty, tick count)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("sum_pv", T.DoubleType()),
        T.StructField("sum_qty", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("vwap", T.DoubleType()),
        T.StructField("total_qty", T.DoubleType()),
        T.StructField("n_ticks", T.LongType()),
    ]
)


def running_symbol_stats(
    ticks: DataFrame,
    symbol_col: str = "source_symbol",
    price_col: str = "ltp",
    qty_col: str = "ltq",
) -> DataFrame:
    """Streaming per-symbol running VWAP: emits one row per symbol per
    micro-batch with the cumulative stats since the query started."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sum_pv, sum_qty, n_ticks = state.get
        else:
            sum_pv, sum_qty, n_ticks = 0.0, 0.0, 0
        for pdf in pdfs:
            pv = (pdf[price_col] * pdf[qty_col]).sum()
            sum_pv += float(0.0 if pd.isna(pv) else pv)
            q = pdf[qty_col].sum()
            sum_qty += float(0.0 if pd.isna(q) else q)
            n_ticks += len(pdf)
        state.update((sum_pv, sum_qty, n_ticks))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "vwap": [sum_pv / sum_qty if sum_qty else None],
                "total_qty": [sum_qty],
                "n_ticks": [n_ticks],
            }
        )

    return ticks.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("view_ts_micros", T.LongType())]
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_ts", T.TimestampType()),
        T.StructField("click_ts", T.TimestampType()),
        T.StructField("outcome", T.StringType()),
    ]
)


def funnel_alerts(
    events: DataFrame,
    max_wait_seconds: int = 300,
    user_col: str = "user_id",
    ts_col: str = "ts",
    kind_col: str = "kind",
    view_kind: str = "view",
    click_kind: str = "click",
) -> DataFrame:
    """Streaming funnel conversion/abandonment alerts — the GroupState
    EVENT-TIME-TIMEOUT pattern: per user, remember the FIRST view; if a
    click arrives within ``max_wait_seconds`` emit ``converted`` and
    clear; if the watermark passes the deadline with no click, the
    state times out and emits ``abandoned`` — the "didn't happen"
    verdict is driven by event time, not wall clock, so replaying the
    same data gives the same alerts.

    State is one timestamp per in-flight user and is FREED on every
    outcome (click or timeout), so state-store size tracks concurrently
    undecided users, not total users — the property that keeps a funnel
    over months of traffic runnable.  The input must carry a watermark
    on ``ts_col`` (timeouts fire as the watermark advances).

    Output: user_id, view_ts, click_ts (NULL when abandoned), outcome.
    """
    from datetime import datetime, timezone

    def update(key, pdfs, state: GroupState):
        uid = key[0]

        def _ts(micros):
            return datetime.fromtimestamp(micros / 1e6, tz=timezone.utc).replace(
                tzinfo=None
            )

        if state.hasTimedOut:
            (view_micros,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "view_ts": [_ts(view_micros)],
                    "click_ts": [None],
                    "outcome": ["abandoned"],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        view_micros = state.get[0] if state.exists else None
        out = []
        for _, r in rows.iterrows():
            micros = int(r[ts_col].value // 1000)
            if r[kind_col] == view_kind and view_micros is None:
                view_micros = micros
            elif r[kind_col] == click_kind and view_micros is not None:
                if micros - view_micros <= max_wait_seconds * 1_000_000:
                    out.append((uid, _ts(view_micros), _ts(micros), "converted"))
                    view_micros = None
        if view_micros is None:
            if state.exists:
                state.remove()
        else:
            deadline_ms = (view_micros + max_wait_seconds * 1_000_000) // 1000
            # a timeout timestamp at or before the current watermark is
            # rejected by the state store; the deadline having already
            # passed IS the abandoned outcome — emit it now
            if deadline_ms <= state.getCurrentWatermarkMs():
                if state.exists:
                    state.remove()
                out.append((uid, _ts(view_micros), None, "abandoned"))
            else:
                state.update((view_micros,))
                state.setTimeoutTimestamp(deadline_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "view_ts", "click_ts", "outcome"]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


PATTERN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("a_micros", T.LongType()),
        T.StructField("blocked", T.BooleanType()),
    ]
)

PATTERN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("second_ts", T.TimestampType()),
        T.StructField("wait_seconds", T.LongType()),
    ]
)


def pattern_alerts(
    events: DataFrame,
    first: str = "click",
    second: str = "purchase",
    without: str = "error",
    gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    kind_col: str = "kind",
) -> DataFrame:
    """Streaming CEP with negation — the live counterpart of
    ``operators.analytics.pattern_match``: emit every ``second`` event
    arriving within ``gap_seconds`` of the latest ``first`` event with
    no ``without`` event between them, per user.

    GroupState is two scalars per in-flight user: the latest
    ``first`` timestamp and a blocked flag (a ``without`` arrived
    after it).  A ``second`` inside the gap on an unblocked state
    emits a match; a later ``first`` re-arms (and unblocks) the state.
    An EVENT-TIME timeout at ``a_ts + gap`` frees state for users
    whose window expired with no outcome, so the state store tracks
    concurrently armed users only — same bounded-state property as
    :func:`funnel_alerts`.  Requires a watermark on ``ts_col``.

    Batch parity: on the same data, matches equal the batch
    operator's (user, first_ts, second_ts) set whenever each user's
    events arrive in event-time order across micro-batches (the
    in-order replay case the parity test drives); within a single
    micro-batch arrival order is normalized by the event-time sort.

    Output: user_id, first_ts, second_ts, wait_seconds.
    """
    from datetime import datetime, timezone

    def _ts(micros):
        return datetime.fromtimestamp(micros / 1e6, tz=timezone.utc).replace(
            tzinfo=None
        )

    def update(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        a_micros, blocked = state.get if state.exists else (None, False)
        out = []
        for _, r in rows.iterrows():
            micros = int(r[ts_col].value // 1000)
            kind = r[kind_col]
            if kind == first:
                a_micros, blocked = micros, False
            elif kind == without:
                blocked = True
            elif kind == second and a_micros is not None and not blocked:
                if micros - a_micros <= gap_seconds * 1_000_000:
                    out.append(
                        (
                            uid,
                            _ts(a_micros),
                            _ts(micros),
                            (micros - a_micros) // 1_000_000,
                        )
                    )
        if a_micros is None:
            if state.exists:
                state.remove()
        else:
            deadline_ms = (a_micros + gap_seconds * 1_000_000) // 1000
            # expired window: any future second-event is outside the
            # gap, and the store rejects timeouts behind the watermark
            # — free the state now, nothing to emit
            if deadline_ms <= state.getCurrentWatermarkMs():
                if state.exists:
                    state.remove()
            else:
                state.update((a_micros, bool(blocked)))
                state.setTimeoutTimestamp(deadline_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "first_ts", "second_ts", "wait_seconds"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
