"""Event-stream batch operators over the `events` table
(event_id, ts, user_id, event_type, value, props).

The engine is a batch pipeline (SURVEY §3.8) — "windows" here are the
batch equivalent: tumbling time buckets computed vectorized per batch,
aggregated with one hash-partitioned groupby. No watermarks/late-data
semantics exist or are needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

MICROS_PER_HOUR = 3_600_000_000


def windowed_event_counts(sf_dir: str, hours: int = 1) -> "ray.data.Dataset":
    """Tumbling-window aggregate: (window_start, event_type) ->
    n_events, sum_value (rounded 4dp for stable cross-engine compare)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    bucket_us = hours * MICROS_PER_HOUR

    def add_window(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // bucket_us) * bucket_us
        return pa.table({
            "window_us": pa.array(win, pa.int64()),
            "event_type": b.column("event_type"),
            "value": b.column("value"),
        })

    from nise_ray.ops.groupapply import hash_group_apply, segments

    windowed = ds.map_batches(add_window, batch_format="pyarrow",
                              zero_copy_batch=True)

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "window_start": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        win = batch.column("window_us").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        # windows are multiples of bucket_us -> compact window index, then
        # 2^32 headroom for type codes (win * 64 + codes silently collides
        # beyond 64 distinct event types)
        combo = (win // np.int64(bucket_us)) * np.int64(1 << 32) + codes
        order = np.argsort(combo, kind="stable")
        starts, counts = segments(combo[order])
        sums = np.add.reduceat(val[order], starts)
        first = order[starts]
        etypes = et.take(pa.array(first))
        return pa.table({
            "window_start": pa.array(win[first], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(etypes.to_pylist(), pa.string()),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(np.round(sums, 4), pa.float64()),
        })

    return hash_group_apply(windowed, ["window_us"], agg, 0, sort=True)


def user_event_stats(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, n_events, total_value) per user."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "total_value": pa.array([], pa.float64()),
            })
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        starts, counts = segments(uid)
        sums = np.add.reduceat(val, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "total_value": pa.array(np.round(sums, 4), pa.float64()),
        })

    return hash_group_apply(ds, ["user_id"], agg, 0, sort=True)


def top_docs_by_len(sf_dir: str, k: int = 20) -> pa.Table:
    """Canonical sort + limit: the k longest documents (ties broken by
    doc_id so the row set is deterministic across engines)."""
    from nise_ray.util import collect_table
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    top = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)
    return collect_table(top)


def sliding_window_counts(sf_dir: str, window_hours: int = 1,
                          hop_minutes: int = 30) -> "ray.data.Dataset":
    """HOPPING (sliding) window aggregate: windows of `window_hours`
    starting every `hop_minutes`; each event lands in
    window_hours*60/hop_minutes windows. Batch-native flat map (one
    np.repeat per batch, no per-row Python) + one hash exchange on the
    window start. Returns (window_start, n_events, sum_value)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])
    win_us = window_hours * MICROS_PER_HOUR
    hop_us = hop_minutes * 60_000_000
    # ceil: when hop doesn't divide the window the earliest covering
    # window needs one extra hop back; the `keep` filter below discards
    # any over-generated window, so ceil is correct for every hop/window
    # combination (including hop > window, where per_event == 1).
    per_event = -(-win_us // hop_us)  # windows covering each event

    def explode(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = b.column("value").to_numpy(zero_copy_only=False)
        # last hop-aligned start <= ts, then walk back per_event hops
        last = (ts // hop_us) * hop_us
        starts = (last[:, None]
                  - np.arange(per_event, dtype=np.int64)[None, :] * hop_us)
        keep = starts + win_us > ts[:, None]  # event inside [start, start+win)
        rep = np.repeat(np.arange(len(ts)), per_event)[keep.ravel()]
        return pa.table({
            "window_us": pa.array(starts.ravel()[keep.ravel()], pa.int64()),
            "value": pa.array(val[rep], pa.float64()),
        })

    from nise_ray.ops.groupapply import hash_group_apply, segments

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "window_start": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            })
        win = batch.column("window_us").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        starts, counts = segments(win)
        return pa.table({
            "window_start": pa.array(win[starts], pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(np.round(np.add.reduceat(val, starts), 4),
                                  pa.float64()),
        })

    return hash_group_apply(exploded, ["window_us"], agg, 0, sort=True)
