"""Custom stateful streaming operator via applyInPandasWithState.

The reference's stream is stateless (SURVEY.md §2.6); this is the
additive capability Spark brings: per-key state across micro-batches.
``account_version_tracker`` maintains, per account key, the running
update count and the highest (slot, write_version) seen — the
streaming analog of the X3 last-write-wins dedup, usable to build an
incrementally-maintained `account` table from the Geyser stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_updates", LongType()),
        StructField("max_slot", LongType()),
        StructField("max_write_version", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key_hex", StringType()),
        StructField("n_updates", LongType()),
        StructField("max_slot", LongType()),
        StructField("max_write_version", LongType()),
    ]
)


def _track(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mslot, mwv = state.get if state.exists else (0, -1, -1)
    for pdf in batches:
        n += len(pdf)
        for slot, wv in zip(pdf["slot"], pdf["write_version"]):
            if (slot, wv) > (mslot, mwv):
                mslot, mwv = int(slot), int(wv)
    state.update((n, mslot, mwv))
    yield pd.DataFrame(
        [(key[0], n, mslot, mwv)],
        columns=["key_hex", "n_updates", "max_slot", "max_write_version"],
    )


def account_version_tracker(updates: DataFrame) -> DataFrame:
    """Streaming (or batch-replay) per-account state: update count +
    latest (slot, write_version). Works on a streaming DataFrame with
    ``applyInPandasWithState``; on a batch frame it degrades to a
    plain groupBy-equivalent (used by tests for parity)."""
    from pyspark.sql import functions as F

    keyed = updates.select(
        F.hex("key").alias("key_hex"), "slot", "write_version"
    ).groupBy("key_hex")
    if updates.isStreaming:
        return keyed.applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return keyed.agg(
        F.count(F.lit(1)).alias("n_updates"),
        F.max("slot").alias("max_slot"),
        F.max_by("write_version", F.struct("slot", "write_version")).alias(
            "max_write_version"
        ),
    )


# full-row streaming X3 (last-write-wins): per-key state carries the
# WINNING row, so the operator incrementally maintains the `account`
# table from the stream — the streaming analog of
# operators/decoders.py:dedup_last_write_wins (reference INSERT OR
# REPLACE, sqlite.rs:221). Binary columns ride the state as bytes.
_LWW_FIELDS = [
    ("slot", LongType()),
    ("write_version", LongType()),
    ("lamports", LongType()),
    ("owner", BinaryType()),
    ("executable", BooleanType()),
    ("rent_epoch", LongType()),
    ("data", BinaryType()),
    ("is_startup", BooleanType()),
]

LWW_STATE_SCHEMA = StructType([StructField(n, t) for n, t in _LWW_FIELDS])

LWW_OUTPUT_SCHEMA = StructType(
    [StructField("key_hex", StringType())]
    + [StructField(n, t) for n, t in _LWW_FIELDS]
)

_LWW_COLS = ["key_hex"] + [n for n, _ in _LWW_FIELDS]


def _lww(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best = tuple(state.get) if state.exists else None
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            cand = (
                int(row.slot),
                int(row.write_version),
                int(row.lamports),
                None if row.owner is None else bytes(row.owner),
                bool(row.executable),
                int(row.rent_epoch),
                None if row.data is None else bytes(row.data),
                bool(row.is_startup),
            )
            if best is None or cand[:2] > best[:2]:
                best = cand
    state.update(best)
    yield pd.DataFrame([(key[0],) + best], columns=_LWW_COLS)


def last_write_wins_stream(updates: DataFrame) -> DataFrame:
    """Streaming X3 over FULL rows: per account key, keep the row with
    the highest (slot, write_version) — each micro-batch emits the
    current winner for every touched key (``update`` output mode), so
    a downstream upsert sink maintains the reference's `account` table
    incrementally. On a batch frame it degrades to the exact batch X3
    (``dedup_last_write_wins``) projected to the same columns, which
    the parity test compares against."""
    from pyspark.sql import functions as F

    keyed = updates.select(F.hex("key").alias("key_hex"), *[n for n, _ in _LWW_FIELDS])
    if updates.isStreaming:
        return keyed.groupBy("key_hex").applyInPandasWithState(
            _lww,
            outputStructType=LWW_OUTPUT_SCHEMA,
            stateStructType=LWW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from solana_snapshot_etl_tools_spark.operators.decoders import (
        dedup_last_write_wins,
    )

    return dedup_last_write_wins(
        updates.withColumn("pubkey", F.col("key")).drop("key")
    ).select(F.hex("pubkey").alias("key_hex"), *[n for n, _ in _LWW_FIELDS])


def dedup_updates_stream(updates: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming X3: drop re-deliveries of the same account version
    within the watermark horizon — the streaming analog of the batch
    last-write-wins key (pubkey, slot, write_version). State is
    bounded by the watermark (unlike plain dropDuplicates, whose state
    grows forever); exact-once per version within the horizon."""
    from pyspark.sql import functions as F

    ts = F.timestamp_seconds(F.col("slot") * 60).alias("event_ts")
    with_ts = updates.withColumn("event_ts", ts)
    if updates.isStreaming:
        return with_ts.withWatermark(
            "event_ts", watermark_delay
        ).dropDuplicatesWithinWatermark(["key", "slot", "write_version"])
    return with_ts.dropDuplicates(["key", "slot", "write_version"])


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time SESSION windows over a stream — the streaming analog
    of the batch ``sessionize`` query, expressed with the built-in
    ``session_window`` (JVM-side state, no Python): per user, events
    separated by less than ``gap`` merge into one session; a session
    FINALIZES (append-mode emission) once the watermark passes its
    end, so late events inside the horizon still extend their session
    and state is bounded by the watermark.

    Boundary note vs the lag-based batch ``q_sessionize``: the lag
    formulation starts a new session when the gap is STRICTLY greater
    than 30 min, while ``session_window``'s end is exclusive
    (``last_ts + gap``), so an event at EXACTLY the gap starts a new
    session here. Real event streams have microsecond timestamps where
    exact-gap collisions are measure-zero; the test fixtures avoid the
    boundary.

    Returns (user, session_start, session_end, n_events[, sum_value]).
    Works identically on a batch frame (``session_window`` is a batch
    expression too) — the parity test compares the two."""
    from pyspark.sql import functions as F

    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(*aggs)
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


# ship by value (worker-side state function)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
