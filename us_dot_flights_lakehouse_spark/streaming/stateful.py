"""Custom stateful streaming operators (beyond built-in windows/sessions):
``applyInPandasWithState`` for arbitrary per-key state machines, and
watermarked streaming dedup.

Scale notes (100 TB / unbounded streams):
- State lives in the executor state store keyed by group — memory is
  bounded by ACTIVE key cardinality, not stream length. Anything that can
  be expressed as a built-in windowed agg should be (state store handles
  eviction via watermark); applyInPandasWithState is for logic the
  built-ins can't express (custom accumulators, decaying counters,
  per-key ML state).
- ``stream_dedup`` keeps one state entry per key inside the watermark
  horizon; without the watermark the state grows forever — never ship a
  streaming dropDuplicates without one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, total_cents long"


def running_user_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user running (event count, value total), carried across
    micro-batches in the state store and re-emitted on every update —
    the canonical custom-stateful shape (decaying counters, fraud scores,
    rate limiters all follow it).

    Works on a streaming DataFrame grouped by ``user_col``; each batch's
    Arrow frames for a key arrive as an iterator, state is a single
    (n, total_cents) tuple. The total accumulates as INTEGER CENTS, not a
    float: integer addition is order-independent across arrival order /
    partitioning, so the emitted ``total_value`` (cents / 100 as double)
    is bit-stable and cross-engine comparable — a float accumulator would
    drift with micro-batch boundaries and state-store iteration order."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(pdf["value"].mul(100).round().sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key streaming dedup inside the watermark horizon:
    ``withWatermark + dropDuplicatesWithinWatermark`` — per-key state is
    EVICTED once the watermark passes it, so state stays bounded even when
    ``keys`` are pure business keys. (Plain ``dropDuplicates`` only evicts
    state when the event-time column is itself part of the dedup keys —
    with business keys alone its state grows without bound.) Duplicates
    arriving later than the watermark are dropped rather than matched;
    widen the watermark to widen the match window."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


TYPED_COUNTS_OUTPUT = "user_id long, event_type string, n_events long"


def typed_event_counts(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user per-event-type running counts on Spark 4's
    ``transformWithStateInPandas`` (arbitrary-stateful v2): MapState keyed
    by event_type inside each user's state partition — the shape the v1
    ``applyInPandasWithState`` API above cannot express without packing
    the whole map into one value blob. Each micro-batch re-emits the
    user's full current map (update semantics), and counts are integers,
    so emissions are bit-stable and the FINAL state equals the batch
    GROUP BY — which is what makes a SQL oracle possible.

    State size is bounded by (active users x event-type cardinality);
    add ``ttlDurationMs`` on the MapState for unbounded-key streams.

    ENVIRONMENT-GATED RUNNER, VERIFIED LOGIC: Spark's transformWithState
    Python runner talks to the JVM over protobuf, so the end-to-end
    stream needs the ``protobuf`` package at runtime (this container
    doesn't ship it — the runner test skips; the v1 operators above run
    everywhere). The PROCESSOR itself (``make_type_counts_processor``)
    is plain Python over pandas batches, so its semantics — map-state
    accumulation, multi-batch merge, full-map Update re-emission — are
    unit-tested against a faked state handle regardless of protobuf
    (tests/test_streaming.py::test_type_counts_processor_logic)."""
    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=make_type_counts_processor(),
        outputStructType=TYPED_COUNTS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def make_type_counts_processor():
    """Build the ``StatefulProcessor`` behind ``typed_event_counts``.

    Factored out so the processor LOGIC is testable without the
    protobuf-backed runner: ``init`` only calls ``handle.getMapState``
    and ``handleInputRows`` only uses getValue/updateValue/iterator —
    the exact surface a fake in-memory MapState can provide."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for etype, c in pdf["event_type"].value_counts().items():
                    k = (etype,)
                    cur = self._counts.getValue(k)
                    n = (cur[0] if cur is not None else 0) + int(c)
                    self._counts.updateValue(k, (n,))
            items = sorted(
                (k[0], v[0]) for k, v in self._counts.iterator()
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "event_type": [t for t, _ in items],
                    "n_events": [n for _, n in items],
                }
            )

        def close(self) -> None:
            pass

    return TypeCounts()
