"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps all cross-run state in MySQL (the table IS the state —
SURVEY.md §1.2, §3). For per-key derived state that should NOT round-trip
through the store every micro-batch (running EWMA, counters), Structured
Streaming's arbitrary-state API is the Spark-first shape: state lives in the
state store (checkpointed, partitioned by key), updates arrive as Arrow
batches, and executor loss replays only the failed micro-batch.

Scale notes: state is per-key-small (3 scalars here) and partitioned on the
grouping key, so the operator scales with distinct keys, not event volume;
the per-batch work is one shuffle on the key plus an Arrow-batched pandas
step. Keys that go quiet can be expired via a processing-time timeout —
kept NoTimeout here because the FX pair universe is tiny and closed
(110 pairs, ``/root/reference/currency_pairs.csv``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _collect_batch(pdfs, sort_cols=None):
    """Concatenate one key's Arrow chunks into a single frame and sort
    ONCE — applyInPandasWithState may deliver a key's micro-batch as
    multiple chunks, and any per-chunk sort would interleave them and
    corrupt order-sensitive recurrences (ADVICE r8). Returns ``None``
    for an empty iterator (a timed-out key under a future timeout
    policy receives no data). One definition, four operators — the
    chunk-handling rule must change in exactly one place."""
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:
        return None
    batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    return batch.sort_values(sort_cols) if sort_cols else batch


OUT_SCHEMA = (
    "ccy_couple string, n_total long, ewma double, last_rate double"
)
STATE_SCHEMA = "n_total long, ewma double, last_rate double"


def stateful_pair_stats(
    events: DataFrame,
    key_col: str = "ccy_couple",
    order_col: str = "event_time",
    rate_col: str = "rate",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key running stats maintained ACROSS micro-batches: total event
    count, EWMA of the rate (``ewma = α·rate + (1-α)·ewma``), and the last
    rate in event-time order. Emits one updated row per key per batch
    (output mode ``update``).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        n, ewma, last = state.get if state.exists else (0, None, None)
        batch = _collect_batch(pdfs, order_col)
        if batch is not None:
            for rate in batch[rate_col].astype(float):
                ewma = rate if ewma is None else alpha * rate + (1 - alpha) * ewma
                last = rate
                n += 1
        state.update((n, ewma, last))
        yield pd.DataFrame(
            [{key_col: key[0], "n_total": n, "ewma": ewma, "last_rate": last}]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


CUSUM_OUT_SCHEMA = (
    "user_id long, n_total long, cusum double, n_alerts long"
)
CUSUM_STATE_SCHEMA = "n_total long, cum double, low double, n_alerts long"


def stateful_cusum(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 0.0,
) -> DataFrame:
    """Streaming one-sided CUSUM per key — the O(1)-state twin of
    ``ops.windows.keyed_cusum``'s batch closed form. The batch operator
    materializes ``S_i = cum_i − min(0, min_{j≤i} cum_j)`` with two stacked
    windows; the stream needs only the two scalars that formula reads —
    the running sum and its low-water-mark — so state per key is constant
    regardless of how long the key lives (plus counters), checkpointed in
    the state store and updated from Arrow batches.

    Emits one row per key per micro-batch: event count, current chart
    value, and how many processed events were in alarm. Parity with the
    batch operator on identical event order is pinned by test.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        n, cum, low, n_alerts = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        batch = _collect_batch(pdfs, order_col)
        if batch is not None:
            for v in batch[value_col].astype(float):
                cum += v - target - slack
                low = min(low, cum)
                n += 1
                if cum - min(0.0, low) > threshold:
                    n_alerts += 1
        state.update((n, cum, low, n_alerts))
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "n_total": n,
                    "cusum": cum - min(0.0, low),
                    "n_alerts": n_alerts,
                }
            ]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        CUSUM_OUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


KMV_OUT_SCHEMA = "event_type string, n_seen long, est_distinct long"
KMV_STATE_SCHEMA = "n_seen long, mins array<double>"


def stateful_kmv_distinct(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "event_id",
    k: int = 256,
) -> DataFrame:
    """Streaming KMV distinct-count per group — the bounded-state stream
    twin of ``events_kmv_distinct``: keep the k smallest md5-derived hash
    fractions of the ids seen so far (state = one sorted float array of at
    most k entries per group, constant forever), estimate distinct =
    (k−1)/kth_min once the sketch is full, exact count below k.

    Same declared hash as the batch query (first 60 md5 bits / 2^60), so a
    stream restarted from any checkpoint — or the batch operator over the
    same prefix — lands on the IDENTICAL estimate, not just a statistically
    similar one: declared randomness is what makes approximate streaming
    state restart-verifiable. Per micro-batch work: hash the batch, merge
    two sorted k-arrays.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        n, mins = state.get if state.exists else (0, [])
        mins = list(mins)
        for pdf in pdfs:
            n += len(pdf)
            hs = [
                int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                / float(2**60)
                for v in pdf[id_col]
            ]
            mins = sorted(set(mins) | set(hs))[:k]
        state.update((n, mins))
        est = (
            len(mins)
            if len(mins) < k
            else int(round((k - 1) / mins[k - 1]))
        )
        yield pd.DataFrame(
            [
                {
                    group_col: key[0],
                    "n_seen": n,
                    "est_distinct": est,
                }
            ]
        )

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        KMV_OUT_SCHEMA,
        KMV_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


HIST_OUT_SCHEMA = "event_type string, bin int, cnt long"
HIST_STATE_SCHEMA = "counts array<long>"


def stateful_histogram(
    events: DataFrame,
    lo: float,
    width: float,
    n_bins: int = 64,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming fixed-bin histogram per group — the bounded-state stream
    twin of ``events_histogram_quantiles``'s bin counters: state is one
    array of ``n_bins`` longs per group (constant forever), each batch adds
    its values' bin counts (``bin = max(0, min(n_bins-1,
    floor((v - lo)/width)))`` — clamped on BOTH sides, the PSI query's
    edge-bin convention; the batch replay oracle clamps only the top, but
    parity still holds because the batch side sets ``lo`` to the data min,
    making the negative bin unreachable there). Bin edges are DECLARED
    up-front (from historical data or a spec) — the one thing a stream
    cannot learn retroactively; parity with the batch bin counts over the
    same prefix holds whenever ``lo``/``width`` equal the batch min/width.

    Emits the group's full bin vector each micro-batch (one row per
    non-empty bin), so any quantile the batch side derives from cumulative
    counts is derivable from the last emission.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import math

        import pandas as pd

        (counts,) = state.get if state.exists else ([0] * n_bins,)
        counts = list(counts)
        for pdf in pdfs:
            for v in pdf[value_col].astype(float):
                # Clamp BOTH sides (the PSI query's edge-bin convention):
                # edges are declared up-front, so values below `lo` are
                # expected — an unclamped negative index would silently
                # increment the top bins via Python list indexing.
                b = max(
                    0, min(n_bins - 1, int(math.floor((v - lo) / width)))
                )
                counts[b] += 1
        state.update((counts,))
        yield pd.DataFrame(
            [
                {group_col: key[0], "bin": b, "cnt": c}
                for b, c in enumerate(counts)
                if c > 0
            ]
        )

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        HIST_OUT_SCHEMA,
        HIST_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DEBOUNCE_OUT_SCHEMA = "user_id long, event_id long, ts timestamp"
DEBOUNCE_STATE_SCHEMA = "last_us long"


def stateful_debounce(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming burst debounce — the stateful twin of the batch
    ``events_debounced`` rule (``ops/windows.sessionize`` + keep-first):
    an event is EMITTED iff it starts a new burst (no prior state, or its
    timestamp exceeds the previous EVENT's timestamp by more than
    ``gap_seconds``); every event — kept or dropped — advances the
    per-key last-seen clock, because any event extends the burst.

    State is ONE long per key (last event time in epoch micros), so the
    operator scales with distinct keys. Kept-set parity with the batch
    form holds whenever micro-batches respect per-key event-time order
    (the replay premise shared by every *_replay twin); within a batch
    rows are sorted by (ts, id) first — the batch rule's tiebreak.

    Unlike the batch form this cannot emit ``n_collapsed``: a burst's
    size is unknowable at keep-time on a stream (the count closes with
    the burst). The batch query remains the source of burst sizes; the
    stream emits the kept events themselves.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        gap_us = gap_seconds * 1_000_000
        (last_us,) = state.get if state.exists else (None,)
        kept = []
        batch = _collect_batch(pdfs, [ts_col, id_col])
        if batch is None:
            state.update((last_us,))
            yield pd.DataFrame([], columns=[key_col, id_col, ts_col])
            return
        for ts, eid in zip(batch[ts_col], batch[id_col]):
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None or us > last_us + gap_us:
                kept.append(
                    {key_col: key[0], id_col: int(eid), ts_col: ts}
                )
            # Advance monotonically: a late-arriving EARLIER timestamp
            # (out-of-order beyond the replay premise) must not regress
            # the clock and re-open a closed burst.
            last_us = us if last_us is None else max(last_us, us)
        state.update((last_us,))
        yield pd.DataFrame(
            kept, columns=[key_col, id_col, ts_col]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        DEBOUNCE_OUT_SCHEMA,
        DEBOUNCE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


TOPK_STATE_SCHEMA = "ids array<long>, vals array<double>"


def stateful_topk(
    events: DataFrame,
    k: int = 5,
    group_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-group top-k leaderboard — the INSERT-ONLY stream
    twin of ``ops/ivm.topk_retraction``'s maintained view (a plain
    stream cannot retract; deletes arrive only via a CDC change log,
    which is the batch operator's tick model). State per group is two
    k-bounded arrays (ids + values) — O(k) forever; each micro-batch
    merges its rows into the buffer by ``(value DESC, id ASC)`` and
    emits the current top-k with ranks. Without retraction the top-k
    fold IS monotone, so no soundness bound is needed: final emission
    over any prefix equals the batch rank closed form — pinned across
    real micro-batches by tests/test_streaming_multimodal.py."""

    # applyInPandasWithState matches pandas column labels to the output
    # schema BY NAME, so the schema is built from the parameterized
    # column names — and the group column's TYPE from the input schema
    # (an int-typed group key would otherwise mismatch at runtime). The
    # id/value columns stay long/double: the update fn itself casts to
    # int()/float() (the state arrays are long/double by declaration).
    # Identifiers are backtick-quoted in the DDL string so a group/id/
    # value column whose name needs quoting (reserved word, dots,
    # spaces) still parses at runtime.
    group_type = events.schema[group_col].dataType.simpleString()
    out_schema = (
        f"`{group_col}` {group_type}, rk int, `{id_col}` long, "
        f"`{value_col}` double"
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        ids, vals = state.get if state.exists else ([], [])
        pairs = [(float(v), int(i)) for v, i in zip(vals, ids)]
        batch = _collect_batch(pdfs)
        if batch is not None:
            pairs += [
                (float(v), int(i))
                for v, i in zip(batch[value_col], batch[id_col])
            ]
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        state.update(
            ([i for _, i in pairs], [v for v, _ in pairs])
        )
        yield pd.DataFrame(
            [
                {
                    group_col: key[0],
                    "rk": r + 1,
                    id_col: i,
                    value_col: v,
                }
                for r, (v, i) in enumerate(pairs)
            ],
            columns=[group_col, "rk", id_col, value_col],
        )

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        out_schema,
        TOPK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
