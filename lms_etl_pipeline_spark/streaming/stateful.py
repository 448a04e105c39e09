"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.12 "streaming": the escape hatch when built-in windows can't
express the semantics).

``streaming_first_seen``: exactly-once-per-key emission — a streaming dedup
that lets the FIRST record of every key through and drops all later ones,
with per-key state that outlives micro-batches and a timeout to bound state
size.  This is the canonical custom-stateful example: it is NOT expressible
with ``dropDuplicates`` alone once you need state TTL, and not with window
aggregation at all (no window: state is forever-until-timeout).

Scale posture: state is partitioned by key across executors (one shuffle),
each key holds O(1) bytes, and ``GroupStateTimeout`` evicts idle keys — the
three properties that keep an unbounded stream's state flat.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_SCHEMA = "key STRING, first_ts TIMESTAMP, n_dropped BIGINT"
_STATE_SCHEMA = "seen BOOLEAN, n_dropped BIGINT"


def _make_first_seen_fn(state_ttl_ms: int | None):
    def first_seen_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Emit one row the first time ``key`` appears; count drops after."""
        if state.hasTimedOut:
            state.remove()
            return
        seen, n_dropped = state.get if state.exists else (False, 0)
        out_rows = []
        # Arrow may deliver one micro-batch as several chunks in arbitrary
        # order; concatenate and sort ONCE so "first" means first by ts
        # across the whole micro-batch, not per-chunk.  Stable mergesort:
        # with duplicate min-ts rows the choice among them is arbitrary,
        # but this operator's OUTPUT is invariant to that choice (it emits
        # only (key, ts, 0), identical for every tied row).
        batch = [pdf for pdf in pdfs if not pdf.empty]
        if batch:
            pdf = pd.concat(batch, ignore_index=True).sort_values(
                "ts", kind="stable"
            )
            if not seen:
                first = pdf.iloc[0]
                out_rows.append((key[0], first["ts"], 0))
                seen = True
                n_dropped += len(pdf) - 1
            else:
                n_dropped += len(pdf)
        state.update((seen, n_dropped))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["key", "first_ts", "n_dropped"])

    return first_seen_fn


def streaming_first_seen(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First-seen-wins streaming dedup over ``key_col``.

    Input: any streaming frame with ``key_col`` and a ``ts`` column.
    Output stream: one row per new key, in the micro-batch where it first
    appeared.  Per-key state: (seen flag, drop count).

    ``state_ttl_ms`` evicts idle keys (processing-time timeout) — set it on
    CONTINUOUS streams to bound state.  Leave ``None`` for drain-style
    ``Trigger.AvailableNow`` runs: registered timeouts make the
    no-more-data termination check spin (empty timeout-firing batches keep
    the query alive — observed as a runaway execution thread), and a
    drained query's state is checkpointed anyway.
    """
    timeout = (
        GroupStateTimeout.NoTimeout if state_ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    renamed = stream_df.selectExpr(f"{key_col} AS key", f"{ts_col} AS ts")
    return renamed.groupBy("key").applyInPandasWithState(
        _make_first_seen_fn(state_ttl_ms),
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


SESSION_SCHEMA = "key STRING, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
_SESSION_STATE_SCHEMA = "start_ms BIGINT, last_ms BIGINT, n BIGINT"


def _make_sessionize_fn(gap_ms: int):
    def sessionize_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Accumulate per-key session state; emit the CLOSED session when
        the event-time watermark passes last_event + gap (the timeout)."""
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        key[0],
                        pd.to_datetime(start_ms, unit="ms"),
                        pd.to_datetime(last_ms, unit="ms"),
                        n,
                    )
                ],
                columns=["key", "session_start", "session_end", "n_events"],
            )
            return
        mn = None
        mx = None
        n_new = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000)
            mn = ts_ms.min() if mn is None else min(mn, ts_ms.min())
            mx = ts_ms.max() if mx is None else max(mx, ts_ms.max())
            n_new += len(pdf)
        if n_new == 0:
            return
        if state.exists:
            start_ms, last_ms, n = state.get
            start_ms, last_ms, n = min(start_ms, int(mn)), max(last_ms, int(mx)), n + n_new
        else:
            start_ms, last_ms, n = int(mn), int(mx), n_new
        state.update((start_ms, last_ms, n))
        # the session closes when the watermark crosses last event + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return sessionize_fn


def streaming_sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_ms: int = 600_000,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom sessionization with **event-time timeouts**: sessions close
    exactly when the watermark proves no in-gap event can still arrive,
    and only closed sessions are emitted (contrast ``session_window``,
    whose complete/update modes re-emit open state every batch).

    The state machine is the part built-in windows can't express: emission
    *on close only*, arbitrary per-session payload (here start/end/count;
    extend the state schema for funnels or revenue), and state that is
    removed the moment it is emitted.  Watermark + ``EventTimeTimeout`` is
    what bounds state on an unbounded stream.
    """
    renamed = stream_df.selectExpr(f"{key_col} AS key", f"{ts_col} AS ts").withWatermark(
        "ts", watermark
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _make_sessionize_fn(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = "key STRING, n BIGINT, total DOUBLE, alerted BOOLEAN"


def _make_running_totals_processor(threshold: float):
    """Build the StatefulProcessor lazily so importing this module never
    requires the streaming-state client machinery."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        """Per-key lifetime (count, sum) with a threshold alert flag."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                if pdf.empty:
                    continue
                n += int(len(pdf))
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "total": [total],
                    "alerted": [total >= threshold],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def streaming_running_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = float("inf"),
) -> DataFrame:
    """Lifetime per-key running (count, sum) with threshold alerting, on the
    Spark 4 ``transformWithStateInPandas`` API (the successor to
    ``applyInPandasWithState``): typed, named state variables
    (``ValueState``) managed by the RocksDB state store instead of one
    opaque state tuple.

    Emits one row per key per micro-batch that touched the key, carrying
    the updated lifetime totals — the streaming incremental-metrics /
    budget-alert pattern that a windowed aggregation cannot express
    (state never expires; output is the running value, not a window close).

    Scale posture: state is hash-partitioned by key (one shuffle); each key
    holds two scalars; RocksDB keeps hot state off-heap and checkpoint
    deltas incremental — the 100 TB-stream posture.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider`` (transformWithState's backing store)
    and the ``protobuf`` package (the state-server wire protocol — absent
    from this container, so the runtime test is skipped; the plan-build
    path and processor are still exercised by the skip-guarded test when
    the dependency exists).
    """
    try:
        import google.protobuf  # noqa: F401  # dependency seam
    except ImportError:
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's streaming state-server protocol); install protobuf "
            "to use streaming_running_totals"
        )
    renamed = stream_df.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return renamed.groupBy("key").transformWithStateInPandas(
        _make_running_totals_processor(threshold),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


EWMA_SCHEMA = "key STRING, ts TIMESTAMP, x DOUBLE, ewma DOUBLE"
_EWMA_STATE_SCHEMA = "ew DOUBLE, has_prev BOOLEAN"


def _make_ewma_fn(alpha: float):
    def ewma_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Recursive per-key EWMA: ew_t = alpha*x_t + (1-alpha)*ew_{t-1}.

        The carried state is ONE scalar per key, so any micro-batch
        boundary placement yields identical outputs (the incremental-
        dedup invariance argument applied to a recurrence) — pinned by
        the batch-split test.
        """
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        ew, has_prev = state.get if state.exists else (0.0, False)
        # Concatenate the micro-batch's Arrow chunks and sort ONCE: the
        # recurrence folds across the whole micro-batch in ts order, so a
        # key whose rows span multiple chunks still folds correctly even
        # when the chunks arrive out of order.  (ts, x) with a stable
        # mergesort: duplicate timestamps with different values would
        # otherwise fold in chunk-arrival order, making the emitted
        # intermediate EWMAs nondeterministic run-to-run.
        batch = [pdf for pdf in pdfs if not pdf.empty]
        if batch:
            pdf = pd.concat(batch, ignore_index=True).sort_values(
                ["ts", "x"], kind="stable"
            )
            xs = pdf["x"].astype(float)
            if has_prev:
                # Seed the vectorized recurrence with the carried state:
                # prepend ew_{t-1}, run pandas' adjust=False EWM (exactly
                # ew_t = alpha*x_t + (1-alpha)*ew_{t-1}), drop the seed row.
                seeded = pd.concat([pd.Series([ew]), xs], ignore_index=True)
                ews = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
            else:
                ews = xs.ewm(alpha=alpha, adjust=False).mean()
            ew = float(ews.iloc[-1])
            has_prev = True
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "x": xs.to_numpy(),
                    "ewma": ews.to_numpy(),
                }
            )
        state.update((ew, has_prev))

    return ewma_fn


def streaming_ewma(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    alpha: float = 0.5,
) -> DataFrame:
    """Streaming recursive EWMA per key — the RUNTIME twin of the batch
    ``ewma_smoothing`` plan (which unrolls the truncated recurrence into
    window LAGs): here the true infinite-history recurrence runs as
    per-key streaming state, emitting every update — the smoothed-metric
    feed behind live EWMA alert rules.

    Per-key state: one (ewma, seen) scalar pair — O(keys) state total,
    RocksDB-friendly, and micro-batch-boundary-invariant (the recurrence
    folds left over the per-key ts order regardless of how the stream is
    chopped; pinned by the split-equivalence test).

    Ordering contract: like every per-key streaming recurrence, correctness
    assumes per-key event-time order within the stream (true for replayed
    logs / per-key FIFO sources); out-of-order input needs a watermarked
    sort buffer upstream.
    """
    renamed = stream_df.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"{ts_col} AS ts",
        f"CAST({value_col} AS DOUBLE) AS x",
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _make_ewma_fn(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QUOTA_SCHEMA = (
    "key STRING, ts TIMESTAMP, admitted BOOLEAN, n_used BIGINT, n_rejected BIGINT"
)
_QUOTA_STATE_SCHEMA = "used BIGINT, rejected BIGINT"


def _make_quota_fn(limit: int):
    def quota_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Admit the first ``limit`` events per key (lifetime quota);
        reject and count the rest — the per-tenant budget/quota gate.

        Admission is decided in per-key ts order, so like the EWMA
        recurrence it is micro-batch-boundary invariant: the first
        ``limit`` events by ts are admitted no matter how the stream is
        chopped (pinned by the split test)."""
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        used, rejected = state.get if state.exists else (0, 0)
        # Concatenate the micro-batch's chunks and sort ONCE so admission
        # order is per-key ts order across the whole micro-batch (chunk
        # boundaries within a batch carry no ordering guarantee).  Stable
        # mergesort: with duplicate timestamps at the admission boundary
        # the choice of WHICH tied row is admitted is arbitrary, but the
        # output multiset is invariant to it (tied rows carry identical
        # (key, ts) and differ only in the admitted flag's assignment
        # among interchangeable rows).
        batch = [pdf for pdf in pdfs if not pdf.empty]
        if batch:
            pdf = pd.concat(batch, ignore_index=True).sort_values(
                "ts", kind="stable"
            )
            n = len(pdf)
            # Admits form a prefix of the sorted batch: exactly the first
            # max(0, limit - used) rows are admitted, the rest rejected.
            n_admit = min(n, max(0, limit - used))
            admit = np.arange(n) < n_admit
            n_used = used + np.cumsum(admit)
            n_rejected = rejected + np.cumsum(~admit)
            used = int(n_used[-1])
            rejected = int(n_rejected[-1])
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "admitted": admit,
                    "n_used": n_used,
                    "n_rejected": n_rejected,
                }
            )
        state.update((used, rejected))

    return quota_fn


def streaming_quota_gate(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    limit: int = 100,
) -> DataFrame:
    """Per-key lifetime quota enforcement as streaming state: each key's
    first ``limit`` events are admitted, the rest rejected with running
    usage counters — the tenant budget / API-cap / ingest-quota gate every
    multi-tenant pipeline puts in front of expensive downstream stages
    (dedup, embedding, storage).

    Per-key state is two counters — O(keys) total, checkpoint-tiny; the
    admission decision folds left over per-key ts order, so outputs are
    micro-batch-boundary invariant and replay-safe across
    ``Trigger.AvailableNow`` restarts (pinned in
    `tests/test_stateful_streaming.py`).  The batch twin of the cap shape
    is ``domain_cap_filter`` (keep-first-N per key by deterministic
    order).
    """
    renamed = stream_df.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"{ts_col} AS ts"
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _make_quota_fn(limit),
        outputStructType=QUOTA_SCHEMA,
        stateStructType=_QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
