"""Grouped-map Pandas operators (applyInPandas) and custom stateful
streaming (applyInPandasWithState).

These are the escape hatches for semantics the built-in operators
can't express (per-group model scoring, custom session state). The
z-score example is deliberately chosen to be oracle-checkable: all
statistics accumulate in int64 (exact, order-independent — numpy
int64 sums don't care about Spark's nondeterministic group row
order), with one final float division of identical shape to the SQL
twin. That is the general recipe for deterministic Pandas UDFs: never
let float reduction order reach the output.

Scale notes: applyInPandas shuffles once on the group key and streams
each group as Arrow batches; per-group state must fit one executor
(bound group cardinality or pre-aggregate). The stateful variant
keeps per-key state in the state store across micro-batches —
watermark-bounded, checkpointed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCALE = 1000  # squares fit int64: (1e5*1e3)^2 * rows << 2^63 for real values


def grouped_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via grouped-map Pandas UDF, bit-deterministic
    across partitionings (see module docstring)."""

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        sv = (pdf[value_col] * SCALE).round().astype("int64")
        n = len(sv)
        s1 = int(sv.sum())  # exact int accumulation
        s2 = int((sv * sv).sum())
        mean_s = s1 / n  # one double op, same shape as the SQL twin
        var_s = s2 / n - (s1 / n) * (s1 / n)
        # Zero-variance groups yield NULL on every engine (Spark's
        # Divide would NULL, DuckDB would inf) — pin the same var > 0
        # guard all three ways so the oracle hash can't diverge.
        if var_s > 0:
            z = (sv - mean_s) / var_s**0.5
        else:
            z = pd.Series([None] * n, dtype="Float64")
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    schema = f"event_id bigint, {group_col} string, {value_col} double, zscore double"
    return df.groupBy(group_col).applyInPandas(_z, schema)


def running_user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user cumulative event
    count + value cents across micro-batches via
    applyInPandasWithState (the §2.12 extension the reference's
    offset-checkpoint loop can't express)."""

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id bigint, n_events bigint, total_cents bigint",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """CUSTOM stateful sessionizer via applyInPandasWithState — the
    §2.12 escape hatch for session semantics session_window can't
    express (the built-in twin is streaming/incremental.py:
    session_agg_plan, the production path).

    Emission contract (append-mode, each session exactly once):
    - a session CLOSES when a later event for the same key arrives
      more than `gap_seconds` after the session's last event (emitted
      immediately, within the batch), or
    - when the EVENT-TIME TIMEOUT fires: the watermark passes
      last_event + gap, so no in-order event can extend the session
      (GroupStateTimeout.EventTimeTimeout; requires a watermark on
      `ts_col`).
    Keys whose final session is still within the gap horizon of the
    watermark stay in state — exactly the rows append-mode
    session_window would also withhold.

    Determinism/ordering: events are sorted by event time WITHIN each
    function invocation; across micro-batches, correctness relies on
    the watermark contract (an event older than state's current
    session end re-opens nothing — same guarantee surface as any
    watermarked streaming sessionizer).

    Output session_start/session_end are epoch MICROS bigints (exact,
    tz-proof through Arrow on both engines).
    """
    gap_us = gap_seconds * 1_000_000

    # per-key invocation cost is THE hot path here: the function runs
    # once per key per micro-batch (data batches) plus once per
    # timed-out key (the trailing no-data batch — nearly every key),
    # so ~15k calls/batch at harness volume. Three deliberate
    # micro-shapes: numpy for the timestamp normalize+sort (no pandas
    # Series machinery), no pd.concat for the single-chunk common
    # case, and NO empty-frame yield when nothing closed (an empty
    # iterator is a valid return and skips a ~50us DataFrame build +
    # Arrow round-trip per silent key).
    import numpy as np

    def _update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            closed.append((uid, s, e, n))
        else:
            arrs = [a for a in (pdf[ts_col].to_numpy() for pdf in pdfs) if len(a)]
            if arrs:
                us = np.sort(
                    (arrs[0] if len(arrs) == 1 else np.concatenate(arrs))
                    .astype("datetime64[us]")
                    .astype("int64")
                )
            else:
                us = ()
            cur = tuple(state.get) if state.exists else None
            for t in us:
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_us:
                    closed.append((uid, *cur))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # fire once no in-order event can extend the session
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                closed, columns=[key_col, "session_start", "session_end", "n_events"]
            )

    return events.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=(
            f"{key_col} bigint, session_start bigint, "
            "session_end bigint, n_events bigint"
        ),
        stateStructType="start_us bigint, end_us bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
