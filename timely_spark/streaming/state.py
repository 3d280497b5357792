"""State-store provider selection for the stateful streaming queries.

The sizing rule is MEASURED, not argued (SCALE.md, round-10 ×100
streaming-state probe): the default in-heap provider
(HDFSBackedStateStoreProvider) keeps every open key's state object on
the executor heap and OOMed the 8 GiB test JVM at ~9.9 M open keys —
about one million open keys per GiB of heap — while the RocksDB
provider (off-heap block cache + disk) drained the same 10 M-key
backlog cleanly in 35.5 s. Below the threshold the heap provider wins
(no JNI/serialization overhead, measured indistinguishable at probe
sizes); above it, RocksDB is the only provider that survives.

Spark reads ``spark.sql.streaming.stateStore.providerClass`` ONCE at
query start and pins it into the checkpoint (OffsetSeqMetadata), so the
knob must be applied around ``.start()`` — these helpers set it, start
the query, then restore the session value so batch work and other
queries are unaffected. A checkpoint created under one provider must
keep it for the query's lifetime (Spark enforces this on restart).
"""

from __future__ import annotations

from contextlib import contextmanager

HEAP_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.HDFSBackedStateStoreProvider"
)
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

# Measured heap ceiling: ~1e6 open keys per GiB of executor heap (the
# 8 GiB probe JVM died at ~9.9M). 'auto' flips to RocksDB past this.
HEAP_KEYS_MAX = 1_000_000

# Stateful-shuffle sizing rule (r13, measured): every state partition
# is a full state-store instance whose per-batch cost is dominated by
# FIXED work (open, snapshot bookkeeping, delta file write, commit) —
# NOT by its key count, until keys/partition gets large. Draining the
# sf0.1 doc backlog (5k keys) through dropDuplicates at the session's
# 32 shuffle partitions spent 28.6-122 s cumulative in state commits;
# the identical drain at 4 partitions spent 0.4-2.4 s (A/B, two
# windows; wall 9.4-15.7 s -> 2.2-4.2 s). One partition per ~256k
# expected keys keeps per-store state far under the heap ceiling while
# eliminating the fixed-cost multiplication; the count is clamped to
# the session's configured shuffle partitions so a cluster-sized
# deployment (billions of keys -> want >> conf) is never changed.
STATE_KEYS_PER_PARTITION = 262_144
_SHUFFLE_KEY = "spark.sql.shuffle.partitions"


def resolve_state_partitions(spark, expected_keys: int | None) -> int | None:
    """Right-size the stateful operator's shuffle-partition count from
    the expected open-key cardinality (None = leave the session value).
    Returns min(session shuffle partitions, ceil(keys / 256k))."""
    if expected_keys is None:
        return None
    cur = int(spark.conf.get(_SHUFFLE_KEY))
    want = max(1, -(-int(expected_keys) // STATE_KEYS_PER_PARTITION))
    return min(cur, want)


def resolve_provider(
    state_store: str = "auto", expected_keys: int | None = None
) -> str:
    """Map the user-facing knob to a provider class name.

    ``state_store``: ``'heap'`` | ``'rocksdb'`` | ``'auto'``. Auto
    picks RocksDB when ``expected_keys`` exceeds the measured
    HEAP_KEYS_MAX threshold (unknown key counts stay on the heap
    provider — small jobs are the common case and the OOM failure mode
    is loud, not silent)."""
    if state_store == "heap":
        return HEAP_PROVIDER
    if state_store == "rocksdb":
        return ROCKSDB_PROVIDER
    if state_store == "auto":
        if expected_keys is not None and expected_keys > HEAP_KEYS_MAX:
            return ROCKSDB_PROVIDER
        return HEAP_PROVIDER
    raise ValueError(
        f"state_store must be 'heap', 'rocksdb' or 'auto', got {state_store!r}"
    )


@contextmanager
def provider_for_start(spark, state_store: str = "auto",
                       expected_keys: int | None = None):
    """Context manager wrapping a ``.start()`` call: pins the resolved
    provider class — and, when ``expected_keys`` is given, the
    right-sized stateful shuffle-partition count — into the session
    conf (both are captured into the query's checkpoint at start:
    Spark pins ``spark.sql.shuffle.partitions`` in OffsetSeqMetadata
    precisely so state partitioning survives restarts), then restores
    the previous session values so batch work is unaffected."""
    provider = resolve_provider(state_store, expected_keys)
    n_parts = resolve_state_partitions(spark, expected_keys)
    # default=None distinguishes "never set" from "set to the default
    # class" — a bare get() returns the built-in default and restoring
    # it would leave the key explicitly pinned in the session
    prev = spark.conf.get(_PROVIDER_KEY, None)
    prev_parts = spark.conf.get(_SHUFFLE_KEY)
    spark.conf.set(_PROVIDER_KEY, provider)
    if n_parts is not None:
        spark.conf.set(_SHUFFLE_KEY, str(n_parts))
    try:
        yield provider
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
        if n_parts is not None:
            spark.conf.set(_SHUFFLE_KEY, prev_parts)
