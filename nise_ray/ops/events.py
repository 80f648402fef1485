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

def asof_join_events(sf_dir: str, left_type: str = "click",
                     right_type: str = "view") -> "ray.data.Dataset":
    """AS-OF JOIN (inner): for every `left_type` event, the most recent
    `right_type` event by the SAME user with right.ts <= left.ts —
    the canonical point-in-time lookup (feature value as of an event).

    Plan: one pruned read filtered to the two types, ONE hash exchange on
    user_id (both sides share it — the per-user merge never leaves the
    block), then a fully vectorized per-block sweep: sort by
    (user_id, ts, side) with rights before lefts at equal ts, take a
    running maximum over right-row positions, and reject carries that
    cross a user boundary. No per-user Python loop; ties among rights at
    identical (user, ts) resolve to the highest event_id (deterministic).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])

    def keep_types(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.is_in(b.column("event_type"),
                                 value_set=pa.array([left_type, right_type])))

    from nise_ray.ops.groupapply import hash_group_apply, segments

    filtered = ds.map_batches(keep_types, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
            "right_ts": pa.array([], pa.timestamp("us")),
            "right_value": pa.array([], pa.float64()),
        })
        if batch.num_rows == 0:
            return empty
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        side = (et == left_type).astype(np.int8)  # right=0 first at tie
        order = np.lexsort((eid, side, ts, uid))
        uid, ts, eid, val, side = (uid[order], ts[order], eid[order],
                                   val[order], side[order])
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(side == 0, pos, -1))
        starts, counts = segments(uid)
        seg_start = np.repeat(starts, counts)
        lefts = np.flatnonzero((side == 1) & (last_right >= seg_start))
        if len(lefts) == 0:
            return empty
        m = last_right[lefts]
        return pa.table({
            "event_id": pa.array(eid[lefts], pa.int64()),
            "user_id": pa.array(uid[lefts], pa.int64()),
            "ts": pa.array(ts[lefts], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val[lefts], pa.float64()),
            "right_ts": pa.array(ts[m], pa.int64()).cast(pa.timestamp("us")),
            "right_value": pa.array(val[m], pa.float64()),
        })

    return hash_group_apply(filtered, ["user_id"], merge, 0, sort=True)


def lang_length_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-language exact length quantiles over documents:
    (lang, n_docs, p50_chars, p90_chars) with DuckDB quantile_disc
    semantics — sorted[ceil(q*n) - 1]. One hash exchange on lang; each
    language's values sort inside its own block (bounded: #langs groups,
    values are int64 — a language's value VECTOR fits a block by the same
    argument as any groupby state; for heavy-hitter languages at 100 TB
    swap in a t-digest/KLL sketch combiner)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "p50_chars": pa.array([], pa.int64()),
                "p90_chars": pa.array([], pa.int64()),
            })
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        sc, sv = codes[order], vals[order]
        starts, counts = segments(sc)

        def q_disc(q: float) -> np.ndarray:
            idx = np.ceil(np.round(q * counts, 9)).astype(np.int64) - 1
            return sv[starts + idx]

        langs = lang.dictionary.take(pa.array(sc[starts]))
        return pa.table({
            "lang": langs.cast(pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
            "p50_chars": pa.array(q_disc(0.5), pa.int64()),
            "p90_chars": pa.array(q_disc(0.9), pa.int64()),
        })

    return hash_group_apply(ds, ["lang"], agg, 0, sort=False)


def lang_length_quantiles_cont(sf_dir: str) -> "ray.data.Dataset":
    """Per-language INTERPOLATED quantiles (percentile_cont / DuckDB
    quantile_cont semantics — linear interpolation at h = q*(n-1)):
    (lang, n_docs, p50_chars, p90_chars) as rounded doubles. Same
    one-exchange shape as the discrete variant; the interpolation is a
    closed-form vectorized gather over the per-group sorted segments."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "p50_chars": pa.array([], pa.float64()),
                "p90_chars": pa.array([], pa.float64()),
            })
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, codes))
        sc, sv = codes[order], vals[order]
        starts, counts = segments(sc)

        def q_cont(q: float) -> np.ndarray:
            h = q * (counts - 1)
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            hi = np.minimum(lo + 1, counts - 1)
            v = sv[starts + lo] + (sv[starts + hi] - sv[starts + lo]) * frac
            return np.round(v, 4)

        langs = lang.dictionary.take(pa.array(sc[starts]))
        return pa.table({
            "lang": langs.cast(pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
            "p50_chars": pa.array(q_cont(0.5), pa.float64()),
            "p90_chars": pa.array(q_cont(0.9), pa.float64()),
        })

    return hash_group_apply(ds, ["lang"], agg, 0, sort=False)


def lang_length_quantiles_sketch(sf_dir: str,
                                 alpha: float = 0.01) -> "ray.data.Dataset":
    """SKETCH path for per-group quantiles (the 100-TB configuration the
    exact path's docstring promises): DDSketch-style log-binned histogram
    (Masson et al., VLDB'19) with relative-error guarantee `alpha` on the
    quantile VALUE.

    Why this shape scales where the exact path cannot: the exact operator
    ships every group member's value into one block and sorts it — a
    heavy-hitter language at 10^12 docs puts that language's whole value
    vector in one partition. Here each batch emits SPARSE (lang, bin, n)
    histogram partials — bounded by #langs x #bins (~2k bins for 1%
    relative error over int64 lengths) REGARDLESS of corpus size — and
    the exchange merges them with one reduceat. Log bins are trivially
    mergeable (pure count addition), deterministic, and alpha-accurate:
    bin(x) = ceil(log_gamma(x)), gamma = (1+alpha)/(1-alpha), estimate =
    2*gamma^b/(gamma+1) (the bin's relative midpoint).

    Output (lang, n_docs, p50_chars, p90_chars): n_docs is EXACT; the
    quantiles are estimates within alpha relative error of the exact
    quantile_disc values (asserted in tests/test_events_ops.py). The
    exact operator stays the oracled default."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = np.log(gamma)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    _empty = pa.table({"lang": pa.array([], pa.string()),
                       "bin": pa.array([], pa.int64()),
                       "n": pa.array([], pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        # bin 0 holds values < 1 (exact zero lengths); bins 1.. are the
        # log-gamma buckets, shifted by +1 to keep 0 reserved
        bins = np.where(vals < 1.0, 0,
                        np.ceil(np.log(np.maximum(vals, 1.0)) / log_gamma
                                ).astype(np.int64) + 1)
        n_bins = int(bins.max()) + 1
        combo = codes * np.int64(n_bins) + bins
        uniq, counts = np.unique(combo, return_counts=True)
        return pa.table({
            "lang": lang.dictionary.take(
                pa.array(uniq // n_bins)).cast(pa.string()),
            "bin": pa.array(uniq % n_bins, pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)

    def finish(batch: pa.Table) -> pa.Table:
        out_schema = pa.table({"lang": pa.array([], pa.string()),
                               "n_docs": pa.array([], pa.int64()),
                               "p50_chars": pa.array([], pa.float64()),
                               "p90_chars": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return out_schema
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bins = batch.column("bin").to_numpy(zero_copy_only=False)
        ns = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((bins, codes))
        sc, sb, sn = codes[order], bins[order], ns[order]
        g_starts, g_counts = segments(sc)
        # merge duplicate (lang, bin) partials then walk the cumulative
        # histogram per group — all lengths are #distinct-bins sized
        langs_out, nd_out, p50_out, p90_out = [], [], [], []
        for s, c in zip(g_starts, g_counts):
            b_seg, n_seg = sb[s:s + c], sn[s:s + c]
            bs, bc = segments(b_seg)
            ub = b_seg[bs]
            un = np.add.reduceat(n_seg, bs)
            cum = np.cumsum(un)
            n_total = int(cum[-1])

            def est(q: float) -> float:
                rank = int(np.ceil(np.round(q * n_total, 9))) - 1
                b = int(ub[np.searchsorted(cum, rank + 1)])
                return 0.0 if b == 0 else \
                    2.0 * gamma ** (b - 1) / (gamma + 1.0)

            langs_out.append(sc[s])
            nd_out.append(n_total)
            p50_out.append(est(0.5))
            p90_out.append(est(0.9))
        return pa.table({
            "lang": lang.dictionary.take(
                pa.array(langs_out, pa.int64())).cast(pa.string()),
            "n_docs": pa.array(nd_out, pa.int64()),
            "p50_chars": pa.array(p50_out, pa.float64()),
            "p90_chars": pa.array(p90_out, pa.float64()),
        })

    return hash_group_apply(partial, ["lang"], finish, 0, sort=False)


def user_prior_event_counts(sf_dir: str,
                            window_minutes: int = 60) -> "ray.data.Dataset":
    """RANGE JOIN (self): for every event, the number of earlier events by
    the same user with ts in [ts - window, ts). Integer-exact contract
    (event_id, n_prior).

    Plan: one hash exchange on user_id, then a per-block vectorized
    range count — rows sorted by (user_id, ts, event_id), each user
    segment's timestamps offset into a disjoint key range
    (seg_id << 45 | ts - t0, a year of microseconds fits 45 bits) so ONE
    np.searchsorted over the whole block answers every row's window
    lower bound; n_prior = row_position - lower_bound. No per-user
    Python loop, no O(n^2) pairs."""
    win_us = window_minutes * 60_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def count_prior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "n_prior": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        starts, counts = segments(uid)
        assert len(starts) < (1 << 18), "too many user segments per block"
        t0 = ts.min()
        span = np.int64(1) << np.int64(45)
        assert (ts.max() - t0) < span, "ts span exceeds 45-bit key range"
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        keys = seg_id * span + (ts - t0)
        targets = seg_id * span + np.maximum(ts - t0 - win_us, 0)
        lo = np.searchsorted(keys, targets, side="left")
        pos = np.arange(len(keys), dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "n_prior": pa.array(pos - lo, pa.int64()),
        })

    return hash_group_apply(ds, ["user_id"], count_prior, 0, sort=False)


def user_running_stats(sf_dir: str) -> "ray.data.Dataset":
    """WINDOW FUNCTIONS per user ordered by (ts, event_id):
    row_number and running max(value) — both comparison-only, so the
    DuckDB hash comparison is bit-exact (no float accumulation).
    One hash exchange on user_id; per block: lexsort + vectorized
    per-segment cumulative max (np.maximum.accumulate with segment
    resets via a two-pass subtract-free trick)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "row_num": pa.array([], pa.int64()),
                             "running_max": pa.array([], pa.float64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        starts, counts = segments(uid)
        pos = np.arange(len(order), dtype=np.int64)
        row_num = pos - np.repeat(starts, counts) + 1
        # segmented running max by logarithmic doubling: after pass s,
        # rm[i] = max(val[i-2s+1 .. i]) clipped to the segment — log2(max
        # segment length) fully vectorized passes, no per-segment loop
        rm = val.copy()
        idx_in_seg = row_num - 1
        s = 1
        max_len = int(counts.max())
        while s < max_len:
            ci = np.flatnonzero(idx_in_seg >= s)
            rm[ci] = np.maximum(rm[ci], rm[ci - s])
            s <<= 1
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "row_num": pa.array(row_num, pa.int64()),
            "running_max": pa.array(rm, pa.float64()),
        })

    return hash_group_apply(ds, ["user_id"], stats, 0, sort=False)


def event_type_user_counts(sf_dir: str) -> "ray.data.Dataset":
    """Grouped COUNT DISTINCT: (event_type, n_users, n_events) — exact
    distinct-user count per event type. Per-batch combiner dedups to
    (event_type, user_id, cnt) triples (distinct pairs + partial counts)
    so the exchange carries at most |distinct pairs| rows, not |events|;
    one hash exchange on event_type, then a per-segment unique count +
    count rollup. At 100 TB the pair space is bounded by
    |event types| x |users| — for a truly unbounded key space swap the
    combiner for an HLL sketch (see metrics.shingle_stats)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "user_id": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        et = b.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, codes))
        sc, su = codes[order], uid[order]
        pair_change = np.empty(len(order), dtype=bool)
        pair_change[0] = True
        pair_change[1:] = (sc[1:] != sc[:-1]) | (su[1:] != su[:-1])
        starts = np.flatnonzero(pair_change)
        cnt = np.diff(np.append(starts, len(order)))
        return pa.table({
            "event_type": et.dictionary.take(pa.array(sc[starts])).cast(pa.string()),
            "user_id": pa.array(su[starts], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, codes))
        sc, su, scnt = codes[order], uid[order], cnt[order]
        starts, _ = segments(sc)
        n_events = np.add.reduceat(scnt, starts)
        # distinct (type, user) pairs, counted per type segment
        pair_first = np.empty(len(order), dtype=bool)
        pair_first[0] = True
        pair_first[1:] = (sc[1:] != sc[:-1]) | (su[1:] != su[:-1])
        n_users = np.add.reduceat(pair_first.astype(np.int64), starts)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(sc[starts])).cast(pa.string()),
            "n_users": pa.array(n_users, pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
        })

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
    return hash_group_apply(partial, ["event_type"], agg, 0, sort=False)


def top_docs_per_lang(sf_dir: str, n_per_group: int = 3) -> pa.Table:
    """Grouped TOP-N: the `n_per_group` longest documents per language
    with their rank (row_number over n_chars DESC, doc_id ASC). Top-N is
    a monoid, so each batch keeps only its LOCAL top-N per language (a
    combiner — at most n x |langs| rows leave any block), then one
    hash exchange on lang and a per-segment final top-N. Output is
    group-count sized, sorted on the driver."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    def local_topn(b: pa.Table, with_rank: bool = False) -> pa.Table:
        if b.num_rows == 0:
            cols = {"lang": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64())}
            if with_rank:
                cols["rank"] = pa.array([], pa.int64())
            return pa.table(cols)
        lang = b.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nch, codes))
        sc = codes[order]
        starts, counts = segments(sc)
        pos = np.arange(len(order), dtype=np.int64)
        rank = pos - np.repeat(starts, counts) + 1
        keep = rank <= n_per_group
        sel = order[keep]
        cols = {
            "lang": lang.dictionary.take(pa.array(sc[keep])).cast(pa.string()),
            "doc_id": pa.array(did[sel], pa.int64()),
            "n_chars": pa.array(nch[sel], pa.int64()),
        }
        if with_rank:
            cols["rank"] = pa.array(rank[keep], pa.int64())
        return pa.table(cols)

    partial = ds.map_batches(local_topn, batch_format="pyarrow",
                             zero_copy_batch=True)
    final = hash_group_apply(partial, ["lang"],
                             lambda b: local_topn(b, with_rank=True),
                             0, sort=False)
    return collect_table(final).sort_by(
        [("lang", "ascending"), ("rank", "ascending")])

def user_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """SESSIONIZATION (gap-based session windows): per user, events
    ordered by ts are split into sessions wherever the gap to the
    previous event exceeds `gap_minutes`. The batch-engine equivalent of
    a streaming session window — one hash exchange on user_id, then a
    fully vectorized per-block sweep (lexsort + gap mask + cumulative
    session numbering; no per-user Python loop). Returns one row per
    session: (user_id, session_num, session_start, session_end,
    n_events) — comparison/count-only columns so the cross-engine hash
    compare is bit-exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    gap_us = gap_minutes * 60_000_000
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def sessions(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_num": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
            })
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        # a session starts at each user boundary or gap > gap_us
        new_sess = np.empty(len(order), dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        # global session index -> per-user session_num via the index of
        # the user's first session (sessions within a user are contiguous)
        sess_idx = np.cumsum(new_sess) - 1          # 0-based global
        u_starts, u_counts = segments(uid)
        user_base = np.repeat(sess_idx[u_starts], u_counts)
        sess_num = sess_idx - user_base + 1          # 1-based per user
        s_starts = np.flatnonzero(new_sess)
        s_counts = np.diff(np.append(s_starts, len(order)))
        s_end = s_starts + s_counts - 1              # ts-sorted -> last = max
        return pa.table({
            "user_id": pa.array(uid[s_starts], pa.int64()),
            "session_num": pa.array(sess_num[s_starts], pa.int64()),
            "session_start": pa.array(ts[s_starts], pa.int64()).cast(pa.timestamp("us")),
            "session_end": pa.array(ts[s_end], pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(s_counts, pa.int64()),
        })

    return hash_group_apply(ds, ["user_id"], sessions, 0, sort=False)


def event_type_pivot(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT: per-user event counts widened into one column per event
    type (n_click, n_error, n_purchase, n_signup, n_view, n_total).
    Per-batch combiner reduces each block to distinct (user, type)
    partial counts, one hash exchange on user_id, then a vectorized
    scatter into the fixed column set. Integer-only output."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    type_idx = {t: i for i, t in enumerate(types)}

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "tcode": pa.array([], pa.int8()),
                             "cnt": pa.array([], pa.int64())})
        et = b.column("event_type").combine_chunks().dictionary_encode()
        dict_map = np.array([type_idx.get(s, len(types))
                             for s in et.dictionary.to_pylist()], dtype=np.int8)
        codes = dict_map[et.indices.to_numpy(zero_copy_only=False)]
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        combo = uid * np.int64(8) + codes           # <=5 types, 3 bits
        order = np.argsort(combo, kind="stable")
        starts, cnt = segments(combo[order])
        sel = order[starts]
        return pa.table({
            "user_id": pa.array(uid[sel], pa.int64()),
            "tcode": pa.array(codes[sel], pa.int8()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    def pivot(batch: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64())}
        for t in types:
            cols[f"n_{t}"] = pa.array([], pa.int64())
        cols["n_total"] = pa.array([], pa.int64())
        if batch.num_rows == 0:
            return pa.table(cols)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        tcode = batch.column("tcode").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, tcode, cnt = uid[order], tcode[order], cnt[order]
        u_starts, _ = segments(uid)
        row = np.searchsorted(uid[u_starts], uid)    # dense row index
        mat = np.zeros((len(u_starts), len(types) + 1), dtype=np.int64)
        np.add.at(mat, (row, tcode.astype(np.int64)), cnt)
        out = {"user_id": pa.array(uid[u_starts], pa.int64())}
        for i, t in enumerate(types):
            out[f"n_{t}"] = pa.array(mat[:, i], pa.int64())
        # n_total = count(*) including the overflow column (unknown event
        # types) — summing only the named columns would silently diverge
        # from the oracle on any new type in the data
        out["n_total"] = pa.array(mat.sum(axis=1), pa.int64())
        return pa.table(out)

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
    return hash_group_apply(partial, ["user_id"], pivot, 0, sort=False)


def event_interarrival(sf_dir: str) -> "ray.data.Dataset":
    """LAG/LEAD window functions: per user, events ordered by
    (ts, event_id) annotated with the microsecond gap to the PREVIOUS
    event (LAG) and to the NEXT event (LEAD), NULL at the partition
    edges — the inter-arrival analysis a feeds-abuse or session-model
    pipeline runs before featurization. One hash exchange on user_id,
    then a single vectorized lexsort + shifted-difference sweep per
    block (whole users per block, no per-row Python). Output is
    events-sized and streams: (user_id, event_id, ts, gap_prev_us,
    gap_next_us)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    from nise_ray.ops.groupapply import hash_group_apply

    def gaps(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "gap_prev_us": pa.array([], pa.int64()),
                "gap_next_us": pa.array([], pa.int64()),
            })
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        last = np.empty(len(order), dtype=bool)
        last[-1] = True
        last[:-1] = first[1:]
        gap_prev = np.empty(len(order), dtype=np.int64)
        gap_prev[0] = 0
        gap_prev[1:] = ts[1:] - ts[:-1]
        gap_next = np.empty(len(order), dtype=np.int64)
        gap_next[-1] = 0
        gap_next[:-1] = ts[1:] - ts[:-1]
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "gap_prev_us": pa.array(gap_prev, pa.int64(),
                                    mask=first),
            "gap_next_us": pa.array(gap_next, pa.int64(),
                                    mask=last),
        })

    return hash_group_apply(ds, ["user_id"], gaps, 0, sort=False)


def user_value_quartiles(sf_dir: str, n_tiles: int = 4) -> "ray.data.Dataset":
    """NTILE window function: per user, events ranked by (value,
    event_id) are dealt into `n_tiles` buckets whose sizes differ by at
    most one (earlier buckets larger) — ANSI NTILE semantics, the
    per-group binning a feature pipeline uses for quantile bucketing.
    One hash exchange on user_id, then a vectorized per-block sweep:
    lexsort, per-segment rank via repeated starts, and the closed-form
    tile index (no per-user Python loop). Returns (user_id, event_id,
    value, quartile)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "value"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def tiles(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "quartile": pa.array([], pa.int64()),
            })
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, val, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        starts, counts = segments(uid)
        m = np.repeat(counts, counts)                   # partition size
        r = np.arange(len(order), dtype=np.int64) \
            - np.repeat(starts, counts)                 # 0-based rank
        q, rem = m // n_tiles, m % n_tiles
        boundary = rem * (q + 1)       # rows below it sit in big buckets
        big = r < boundary
        tile = np.where(big, r // np.maximum(q + 1, 1) + 1,
                        np.where(q > 0, (r - boundary) // np.maximum(q, 1)
                                 + rem + 1, 1))
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "value": pa.array(val, pa.float64()),
            "quartile": pa.array(tile, pa.int64()),
        })

    return hash_group_apply(ds, ["user_id"], tiles, 0, sort=False)


def funnel_counts(sf_dir: str,
                  steps: "tuple[str, ...]" = ("signup", "view", "click",
                                              "purchase")) -> pa.Table:
    """FUNNEL ANALYSIS (stepwise event-sequence matching): how many users
    complete each prefix of an ordered event-type funnel, with classic
    strict-ordering semantics — step k counts a user iff an event of
    type steps[k] exists STRICTLY AFTER the timestamp at which the user
    completed step k-1 (step k's timestamp = the MIN such event time, so
    the match is the earliest possible completion and deterministic).
    Returns (step, event_type, n_users), one row per funnel step.

    Scale shape: one hash exchange on user_id (complete user histories
    per block), then a fully vectorized per-block sweep — per step a
    masked minimum.reduceat over the user segments, no per-user Python.
    Each block emits |steps| partial counts; the driver sums a
    blocks x |steps| table. The only corpus-sized move is the one
    user_id exchange every other per-user operator already pays."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    i64max = np.iinfo(np.int64).max

    def block_funnel(batch: pa.Table) -> pa.Table:
        out_sch = pa.schema([("step", pa.int64()), ("n", pa.int64())])
        if batch.num_rows == 0:
            return out_sch.empty_table()
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        et = batch.column("event_type").combine_chunks().take(
            pa.array(order)).to_numpy(zero_copy_only=False)
        starts, counts = segments(uid)
        # prev[i] = ts at which row i's user completed the previous step;
        # step 1 has NO lower bound (matching the oracle's unbounded
        # min(ts)) — a sentinel like -1 would wrongly drop pre-epoch ts
        prev = np.zeros(len(uid), dtype=np.int64)
        ns = np.zeros(len(steps), dtype=np.int64)
        for k, etype in enumerate(steps):
            mask = (et == etype) if k == 0 else (et == etype) & (ts > prev)
            cur = np.minimum.reduceat(np.where(mask, ts, i64max), starts)
            reached = cur != i64max
            ns[k] = int(reached.sum())
            if not reached.any():
                break  # downstream steps are empty too
            prev = np.repeat(cur, counts)
        return pa.table({
            "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "n": pa.array(ns, pa.int64()),
        })

    parts = collect_table(hash_group_apply(ds, ["user_id"], block_funnel,
                                           0, sort=False))
    totals = np.zeros(len(steps), dtype=np.int64)
    if parts.num_rows:
        st = parts.column("step").to_numpy(zero_copy_only=False)
        nv = parts.column("n").to_numpy(zero_copy_only=False)
        np.add.at(totals, st - 1, nv)
    return pa.table({
        "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
        "event_type": pa.array(list(steps), pa.string()),
        "n_users": pa.array(totals, pa.int64()),
    })


def user_event_paths(sf_dir: str, sep: str = "->") -> "ray.data.Dataset":
    """ORDERED STRING AGGREGATION (SQL string_agg ... ORDER BY): per
    user, the full event-type path in (ts, event_id) order, e.g.
    'view->click->purchase', plus the event count — the sequence-mining
    preprocessing step (each user's history becomes one trajectory
    string). One hash exchange on user_id, then a fully vectorized
    per-block sweep: lexsort, ListArray re-slicing by user segment, and
    ONE pyarrow binary_join kernel call per block — no per-user Python
    string building."""
    import pyarrow.compute as pc

    from nise_ray.ops.groupapply import hash_group_apply, segments

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def paths(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = batch.column("event_type").combine_chunks().take(
            pa.array(order))
        starts, counts = segments(uid)
        # block-local offsets: len << 2^31, int32 is safe for ListArray
        offsets = np.concatenate(
            [[0], np.cumsum(counts)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), et)
        joined = pc.binary_join(lists, sep)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "path": joined.cast(pa.string()),
        })

    return hash_group_apply(ds, ["user_id"], paths, 0, sort=False)


def user_top_event(sf_dir: str) -> "ray.data.Dataset":
    """GROUPED MODE (per-group most-frequent value with a deterministic
    tie-break): each user's modal event_type, ties resolved to the
    lexicographically smallest type — the categorical-majority profile
    column a feature pipeline derives per entity. Combiner-shaped:
    every block pre-aggregates (user, type) counts (type-vocabulary x
    users rows, not event rows), the user_id exchange merges partials,
    and one lexsort picks each user's winner. Returns
    (user_id, top_event, n)."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def pre_agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        enc = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # lexsort + run detection, NOT a uid*n_types+code packed key —
        # packing overflows int64 silently for snowflake-scale user ids
        # (the repo rule: any packed integer key needs an overflow guard)
        order = np.lexsort((codes, uid))
        su, sc = uid[order], codes[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (su[1:] != su[:-1]) | (sc[1:] != sc[:-1])
        starts_p = np.flatnonzero(first)
        cnt = np.diff(np.append(starts_p, len(order)))
        return pa.table({
            "user_id": pa.array(su[starts_p], pa.int64()),
            "event_type": enc.dictionary.take(
                pa.array(sc[starts_p])).cast(pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    pre = ds.map_batches(pre_agg, batch_format="pyarrow",
                         zero_copy_batch=True)

    def pick_mode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "top_event": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        nv = batch.column("n").to_numpy(zero_copy_only=False)
        # merge partials: sum n per (user, type)
        order = np.lexsort((et, uid))
        uid, et, nv = uid[order], et[order], nv[order]
        first = np.ones(len(uid), dtype=bool)
        first[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts_u = np.flatnonzero(first)
        sums = np.add.reduceat(nv, starts_u)
        guid, get = uid[starts_u], et[starts_u]
        # winner per user: max count, then smallest type (rows are
        # already type-sorted within user, so a stable sort on -n keeps
        # the lexicographic tie-break)
        w = np.lexsort((get, -sums, guid))
        gu, ge, gs = guid[w], get[w], sums[w]
        s2, _ = segments(gu)
        return pa.table({
            "user_id": pa.array(gu[s2], pa.int64()),
            "top_event": pa.array(ge[s2], pa.string()),
            "n": pa.array(gs[s2], pa.int64()),
        })

    return hash_group_apply(pre, ["user_id"], pick_mode, 0, sort=False)


def value_rank_windows(sf_dir: str) -> "ray.data.Dataset":
    """RANK-FAMILY window functions in one pass: rank(), dense_rank(),
    percent_rank() and cume_dist() per user over value — the tie-aware
    quartet (row_number/NTILE/LAG live in the sibling ops). Ties share
    rank and cume_dist exactly as ANSI SQL defines them, which is what
    separates this kernel from user_value_quartiles' tie-broken order.

    One hash exchange on user_id, then a single vectorized sweep per
    block: lexsort by (user, value, event_id), value-run boundaries via
    one shifted compare, rank = run-start position within the user
    segment, cume_dist = run-end position, dense rank = run ordinal
    minus the segment's first run ordinal. percent_rank/cume_dist are
    ratios of exact small integers, so they reproduce bit-identically
    across engines (no rounding needed). Output is events-sized and
    streams: (user_id, event_id, value, rnk, dense_rnk, pct_rank,
    cume_dist)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "value"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def ranks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "rnk": pa.array([], pa.int64()),
                "dense_rnk": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
                "cume_dist": pa.array([], pa.float64()),
            })
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, val, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        n = len(uid)
        seg_starts, seg_counts = segments(uid)
        segstart = np.repeat(seg_starts, seg_counts)
        m = np.repeat(seg_counts, seg_counts)        # user partition size
        pos = np.arange(n, dtype=np.int64) - segstart  # 0-based in user
        # value runs never span users: a uid change forces a new run
        newrun = np.empty(n, dtype=bool)
        newrun[0] = True
        newrun[1:] = (uid[1:] != uid[:-1]) | (val[1:] != val[:-1])
        runidx = np.cumsum(newrun) - 1               # global run ordinal
        run_starts = np.flatnonzero(newrun)
        run_first_pos = pos[run_starts]              # run start, user-rel
        run_last_pos = pos[np.append(run_starts[1:], n) - 1]
        rnk = run_first_pos[runidx] + 1
        cnt_le = run_last_pos[runidx] + 1
        dense = runidx - np.repeat(runidx[seg_starts], seg_counts) + 1
        pct = np.where(m > 1, (rnk - 1) / np.maximum(m - 1, 1), 0.0)
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "value": pa.array(val, pa.float64()),
            "rnk": pa.array(rnk, pa.int64()),
            "dense_rnk": pa.array(dense, pa.int64()),
            "pct_rank": pa.array(pct, pa.float64()),
            "cume_dist": pa.array(cnt_le / m, pa.float64()),
        })

    return hash_group_apply(ds, ["user_id"], ranks, 0, sort=False)


def event_transitions(sf_dir: str) -> pa.Table:
    """First-order MARKOV TRANSITION COUNTS over per-user event
    sequences: for every consecutive event pair (ordered by ts,
    event_id within a user), count (prev_type -> next_type) across the
    corpus — the transition matrix a sequence model or anomaly detector
    estimates before training. Returns (prev_type, next_type, n).

    Scale shape: the one user_id exchange every per-user operator pays,
    then a vectorized per-block sweep (lexsort + shifted compare, the
    same kernel family as event_interarrival's LAG) that emits at most
    |type-vocab|^2 partial rows per block; the driver merges a tiny
    (pairs x blocks) table. No per-row Python anywhere."""
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = batch.column("event_type").combine_chunks() \
            .take(pa.array(order)).dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = et.dictionary
        V = len(vocab)
        if len(uid) < 2 or V == 0:
            return empty
        # row i pairs with its predecessor unless it starts a new user
        same_user = uid[1:] == uid[:-1]
        prev = codes[:-1][same_user]
        nxt = codes[1:][same_user]
        if len(prev) == 0:
            return empty
        key = prev * V + nxt
        u, c = np.unique(key, return_counts=True)
        # join prev/next type strings with \x01 (never in a type name)
        # so the driver merge reuses the single-string-key kernel
        pv = vocab.take(pa.array(u // V)).cast(pa.string())
        nv = vocab.take(pa.array(u % V)).cast(pa.string())
        pair = pc.binary_join_element_wise(pv, nv, "\x01")
        return pa.table({"pair": pair, "n": pa.array(c, pa.int64())})

    partials = collect_table(hash_group_apply(ds, ["user_id"],
                                              pair_partial, 0, sort=False))
    import pyarrow.compute as pc

    from nise_ray.ops.relational import _merge_grouped_partials
    merged = _merge_grouped_partials(partials, "pair", {"n": pa.int64()})
    split = pc.split_pattern(merged.column("pair"), "\x01")
    prev_t = pc.list_element(split, 0)
    next_t = pc.list_element(split, 1)
    out = pa.table({"prev_type": prev_t.combine_chunks(),
                    "next_type": next_t.combine_chunks(),
                    "n": merged.column("n")})
    return out.sort_by([("prev_type", "ascending"),
                        ("next_type", "ascending")])


def event_type_user_counts_approx(sf_dir: str) -> pa.Table:
    """Grouped APPROXIMATE COUNT-DISTINCT: per event_type, the number
    of distinct users estimated with HyperLogLog — the scale path for
    the exact operator (event_type_user_counts), whose one user_id-
    bounded exchange is still corpus-wide. Here NOTHING is exchanged:
    each block builds one 16 KiB register table per event type it saw
    (p=14, ~0.8% relative error), the driver merges them with a
    bytewise max, and the estimate is the standard bias-corrected
    harmonic mean. Per-block cost is |type-vocab| x 16 KiB regardless
    of corpus size — the same registers would merge across 256 nodes
    unchanged. Returns (event_type, n_users_approx) — rows-only at the
    oracle gate (the estimate is seed-dependent, not SQL-expressible);
    the error bound vs the exact oracled operator is asserted in
    tests/test_relational2.py."""
    from nise_ray.hashing import splitmix64
    from nise_ray.metrics import _HLL_M, _HLL_P, _bit_length64, _hll_estimate
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def regs_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "regs": pa.array([], pa.binary())})
        et = b.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        h = splitmix64(uid.astype(np.uint64))
        idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        rest = h << np.uint64(_HLL_P)
        rank = np.minimum(64 - _bit_length64(rest) + 1,
                          64 - _HLL_P + 1).astype(np.uint8)
        V = len(et.dictionary)
        # one flat (type, register) table; np.maximum.at scatters every
        # row in one pass — no per-type Python loop
        regs = np.zeros(V * _HLL_M, dtype=np.uint8)
        np.maximum.at(regs, codes * _HLL_M + idx, rank)
        return pa.table({
            "event_type": et.dictionary.cast(pa.string()),
            "regs": pa.array([regs[v * _HLL_M:(v + 1) * _HLL_M].tobytes()
                              for v in range(V)], pa.binary()),
        })

    partials = collect_table(ds.map_batches(
        regs_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_users_approx": pa.array([], pa.int64())})
    types = np.array(partials.column("event_type").to_pylist(),
                     dtype=object)
    order = np.argsort(types, kind="stable")
    from nise_ray.ops.groupapply import segments
    # dictionary-encode to ints for segments() (object compare is fine
    # for argsort but segments wants a numeric array on some paths)
    uniq, inv = np.unique(types[order], return_inverse=True)
    starts, counts = segments(inv)
    out_types, out_est = [], []
    regs_col = partials.column("regs")
    for s, c, t in zip(starts, counts, uniq):
        merged = np.zeros(_HLL_M, dtype=np.uint8)
        for i in order[s:s + c]:
            np.maximum(merged,
                       np.frombuffer(regs_col[int(i)].as_py(),
                                     dtype=np.uint8), out=merged)
        out_types.append(str(t))
        out_est.append(int(round(_hll_estimate(merged))))
    out = pa.table({"event_type": pa.array(out_types, pa.string()),
                    "n_users_approx": pa.array(out_est, pa.int64())})
    return out.sort_by([("event_type", "ascending")])


def moving_event_stats(sf_dir: str, frame_rows: int = 7) -> "ray.data.Dataset":
    """FRAME-BOUNDED moving window aggregate: per user, events ordered
    by (ts, event_id), SUM/COUNT/AVG of length(props) over ROWS BETWEEN
    `frame_rows-1` PRECEDING AND CURRENT ROW — the bounded-frame window
    primitive (running stats cover only the UNBOUNDED PRECEDING case).
    The metric is an int64 (character length), so the moving sum is
    exact under any accumulation order and the DuckDB hash comparison
    is bit-exact; mov_avg is ONE double division of the exact ints,
    matching CAST(sum AS DOUBLE)/count.

    Plan: one hash exchange on user_id, then a single vectorized sweep
    per block: lexsort, an extended cumulative sum, and a segment-
    clamped lower bound (max(pos-frame+1, seg_start)) — mov_sum is a
    two-element difference of the cumsum, no per-row or per-user loop.
    Output is events-sized and streams."""
    import pyarrow.compute as pc

    w = int(frame_rows)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "props"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def moving(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "mov_sum": pa.array([], pa.int64()),
                             "mov_cnt": pa.array([], pa.int64()),
                             "mov_avg": pa.array([], pa.float64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        n = pc.utf8_length(batch.column("props")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, n = uid[order], eid[order], n[order]
        starts, counts = segments(uid)
        pos = np.arange(len(order), dtype=np.int64)
        seg_start = np.repeat(starts, counts)
        lo = np.maximum(pos - (w - 1), seg_start)
        ext = np.concatenate(([0], np.cumsum(n, dtype=np.int64)))
        mov_sum = ext[pos + 1] - ext[lo]
        mov_cnt = pos + 1 - lo
        mov_avg = mov_sum.astype(np.float64) / mov_cnt
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "event_id": pa.array(eid, pa.int64()),
                         "mov_sum": pa.array(mov_sum, pa.int64()),
                         "mov_cnt": pa.array(mov_cnt, pa.int64()),
                         "mov_avg": pa.array(mov_avg, pa.float64())})

    return hash_group_apply(ds, ["user_id"], moving, 0, sort=False)


def user_first_last_event(sf_dir: str) -> "ray.data.Dataset":
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE window primitives, collapsed
    to one row per user: over the (ts, event_id)-ordered per-user frame
    (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING), the first, last and
    second event types plus the frame count — the entry/exit-event
    summary a journey-analysis pipeline starts from, and the one window
    family (positional frame values) the inventory did not yet cover.

    Plan: one hash exchange on user_id, then pure segment indexing per
    block — first = starts, last = starts+counts-1, nth(2) = starts+1
    masked where the segment is shorter. Output is user-count-sized."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def firstlast(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "first_et": pa.array([], pa.string()),
                             "last_et": pa.array([], pa.string()),
                             "second_et": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        starts, counts = segments(uid)
        take = pa.array(order[starts])
        first_et = et.take(take)
        last_et = et.take(pa.array(order[starts + counts - 1]))
        # nth(2): NULL for single-event users
        second_idx = order[np.minimum(starts + 1, starts + counts - 1)]
        second_et = et.take(pa.array(second_idx))
        if (counts < 2).any():
            mask = pa.array(counts < 2)
            second_et = pc.if_else(
                mask, pa.nulls(len(starts), pa.string()), second_et)
        return pa.table({"user_id": pa.array(uid[starts], pa.int64()),
                         "first_et": first_et,
                         "last_et": last_et,
                         "second_et": second_et,
                         "n_events": pa.array(counts, pa.int64())})

    return hash_group_apply(ds, ["user_id"], firstlast, 0, sort=False)


def lang_mad_chars(sf_dir: str) -> "ray.data.Dataset":
    """Grouped MEDIAN ABSOLUTE DEVIATION: per-language robust spread of
    document length — mad(x) = median(|x - median(x)|) with DuckDB's
    interpolated-median semantics (h = q*(n-1) linear interpolation,
    verified identical to numpy's 'linear' percentile). The robust
    companion to lang_char_moments' stddev: outlier documents move the
    stddev, not the MAD.

    Plan: ONE hash exchange on lang (whole groups per block), then two
    closed-form passes per segment — interpolated median via the shared
    sorted-gather, then a re-sort of |x - med| within each segment and
    the same gather for the deviation median. No per-group Python loop;
    both sorts are whole-block lexsorts. round(,4) on the outputs (the
    subtraction introduces FP, and DuckDB's mad arithmetic matches to
    <1 ulp)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def agg(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "median_chars": pa.array([], pa.float64()),
                             "mad_chars": pa.array([], pa.float64())})
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, codes))
        sc, sv = codes[order], vals[order]
        starts, counts = segments(sc)

        def med_of(sorted_vals: np.ndarray) -> np.ndarray:
            h = 0.5 * (counts - 1)
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            hi = np.minimum(lo + 1, counts - 1)
            return (sorted_vals[starts + lo]
                    + (sorted_vals[starts + hi]
                       - sorted_vals[starts + lo]) * frac)

        med = med_of(sv)
        dev = np.abs(sv - np.repeat(med, counts))
        # re-sort deviations within each segment (codes already grouped)
        dorder = np.lexsort((dev, sc))
        mad = med_of(dev[dorder])
        langs = lang.dictionary.take(pa.array(sc[starts]))
        return pa.table({
            "lang": langs.cast(pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
            "median_chars": pa.array(np.round(med, 4), pa.float64()),
            "mad_chars": pa.array(np.round(mad, 4), pa.float64()),
        })

    return hash_group_apply(ds, ["lang"], agg, 0, sort=False)


def retention_cohorts(sf_dir: str) -> pa.Table:
    """Retention-cohort analysis: users cohorted by their FIRST active
    day; for every (cohort_day, day_offset) the number of cohort users
    active exactly day_offset days later — the standard
    product-analytics retention triangle.

    Scale shape: the per-batch combiner dedups events to distinct
    (user_id, day) pairs (bounded by users x days, not events); ONE
    user_id hash exchange co-locates each user's days; each partition
    derives cohort = min day per user and emits (cohort, offset)
    partial counts (cohort x offset-sized); the driver merge is
    triangle-sized. Returns (cohort_day, day_offset, n_users) sorted."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    day_us = 86_400_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def day_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // day_us
        order = np.lexsort((day, uid))
        su, sd = uid[order], day[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (su[1:] != su[:-1]) | (sd[1:] != sd[:-1])
        return pa.table({"user_id": pa.array(su[first], pa.int64()),
                         "day": pa.array(sd[first], pa.int64())})

    day_pairs.__name__ = "DistinctUserDays"
    pairs = ds.map_batches(day_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def cohort_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        day = batch.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        su, sd = uid[order], day[order]
        # cross-block duplicate (user, day) pairs collapse here
        first = np.ones(len(order), dtype=bool)
        first[1:] = (su[1:] != su[:-1]) | (sd[1:] != sd[:-1])
        su, sd = su[first], sd[first]
        starts, counts = segments(su)
        cohort = np.repeat(sd[starts], counts)
        offset = sd - cohort
        k = cohort * (1 << 20) + offset  # offsets << 2^20 days (~2870 yr)
        order2 = np.argsort(k, kind="stable")
        kstarts, kcounts = segments(k[order2])
        return pa.table({"k": pa.array(k[order2][kstarts], pa.int64()),
                         "n": pa.array(kcounts, pa.int64())})

    cohort_partial.__name__ = "CohortOffsetPartial"
    from nise_ray.util import collect_table
    partials = collect_table(hash_group_apply(pairs, ["user_id"],
                                              cohort_partial, sort=False))
    empty = pa.table({"cohort_day": pa.array([], pa.timestamp("us")),
                      "day_offset": pa.array([], pa.int64()),
                      "n_users": pa.array([], pa.int64())})
    if partials.num_rows == 0:
        return empty
    k = partials.column("k").to_numpy(zero_copy_only=False)
    n = partials.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    starts, _ = segments(k[order])
    ku = k[order][starts]
    counts = np.add.reduceat(n[order], starts)
    cohort = (ku >> 20) * day_us
    offset = ku & ((1 << 20) - 1)
    return pa.table({
        "cohort_day": pa.array(cohort).cast(pa.timestamp("us")),
        "day_offset": pa.array(offset, pa.int64()),
        "n_users": pa.array(counts, pa.int64()),
    })


def ohlc_resample(sf_dir: str, hours: int = 1) -> "ray.data.Dataset":
    """Time-bucket OHLC resample — the financial/telemetry downsample
    primitive the inventory did not yet cover: per tumbling hour bucket,
    open  = first `value` in (ts, event_id) order,
    high  = max, low = min, close = last value, plus count and sum.

    Scale shape (combiner, NOT a row exchange): each input batch is
    collapsed to per-bucket PARTIAL rows (n, sum, min, max, and the
    open/close candidates carrying their (ts, event_id) order keys) via
    one lexsort + segments + reduceat sweep, so only O(#buckets) rows
    per batch reach the merge exchange; the merge re-runs the same sweep
    on partials and resolves open/close by the lexicographically
    smallest/largest carried key. ~8,760 buckets/year means the shuffle
    is trivially small at any corpus size — this is the shape a 100 TB
    telemetry resample needs (contrast windowed_event_counts, which
    exchanges event-sized rows).

    Determinism: (ts, event_id) is a total order (event_id unique), so
    open/close are unique rows; sum is rounded 4dp at the END per the
    repo cross-engine FP contract; min/max/open/close are selected raw
    doubles (bit-identical, unrounded)."""

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_id", "value"])
    bucket_us = hours * MICROS_PER_HOUR
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def partial(b: pa.Table) -> pa.Table:
        empty = {
            "bucket_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
            "low_value": pa.array([], pa.float64()),
            "high_value": pa.array([], pa.float64()),
            "open_ts": pa.array([], pa.int64()),
            "open_eid": pa.array([], pa.int64()),
            "open_value": pa.array([], pa.float64()),
            "close_ts": pa.array([], pa.int64()),
            "close_eid": pa.array([], pa.int64()),
            "close_value": pa.array([], pa.float64()),
        }
        if b.num_rows == 0:
            return pa.table(empty)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        val = b.column("value").to_numpy(zero_copy_only=False)
        bucket = (ts // bucket_us) * bucket_us
        order = np.lexsort((eid, ts, bucket))
        bkt_s, ts_s = bucket[order], ts[order]
        eid_s, val_s = eid[order], val[order]
        starts, counts = segments(bkt_s)
        last = starts + counts - 1
        return pa.table({
            "bucket_us": pa.array(bkt_s[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(np.add.reduceat(val_s, starts),
                                  pa.float64()),
            "low_value": pa.array(np.minimum.reduceat(val_s, starts),
                                  pa.float64()),
            "high_value": pa.array(np.maximum.reduceat(val_s, starts),
                                   pa.float64()),
            "open_ts": pa.array(ts_s[starts], pa.int64()),
            "open_eid": pa.array(eid_s[starts], pa.int64()),
            "open_value": pa.array(val_s[starts], pa.float64()),
            "close_ts": pa.array(ts_s[last], pa.int64()),
            "close_eid": pa.array(eid_s[last], pa.int64()),
            "close_value": pa.array(val_s[last], pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "bucket": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "open_value": pa.array([], pa.float64()),
                "high_value": pa.array([], pa.float64()),
                "low_value": pa.array([], pa.float64()),
                "close_value": pa.array([], pa.float64()),
                "sum_value": pa.array([], pa.float64()),
            })
        col = {n: batch.column(n).to_numpy(zero_copy_only=False)
               for n in batch.column_names}
        bkt = col["bucket_us"]
        order = np.argsort(bkt, kind="stable")
        bkt_s = bkt[order]
        starts, counts = segments(bkt_s)
        n = np.add.reduceat(col["n_events"][order], starts)
        sums = np.add.reduceat(col["sum_value"][order], starts)
        lows = np.minimum.reduceat(col["low_value"][order], starts)
        highs = np.maximum.reduceat(col["high_value"][order], starts)
        # open: partial with lexicographically min (open_ts, open_eid)
        o_pick = np.lexsort((col["open_eid"][order],
                             col["open_ts"][order], bkt_s))
        open_rows = order[o_pick[starts]]
        # close: max (close_ts, close_eid) = last row of each segment
        c_pick = np.lexsort((col["close_eid"][order],
                             col["close_ts"][order], bkt_s))
        close_rows = order[c_pick[starts + counts - 1]]
        return pa.table({
            "bucket": pa.array(bkt_s[starts], pa.int64())
                        .cast(pa.timestamp("us")),
            "n_events": pa.array(n, pa.int64()),
            "open_value": pa.array(col["open_value"][open_rows],
                                   pa.float64()),
            "high_value": pa.array(highs, pa.float64()),
            "low_value": pa.array(lows, pa.float64()),
            "close_value": pa.array(col["close_value"][close_rows],
                                    pa.float64()),
            "sum_value": pa.array(np.round(sums, 4), pa.float64()),
        })

    return hash_group_apply(partials, ["bucket_us"], merge, 0, sort=False)


def daily_type_coverage(sf_dir: str, type_a: str = "click",
                        type_b: str = "error") -> "ray.data.Dataset":
    """FULL OUTER join shape — the one join type the inventory lacked:
    daily counts of two event types aligned on day, with NULL (not 0)
    on days where a side has no rows, exactly matching
    ``a FULL OUTER JOIN b USING (day)``. Returns (day, n_a, n_b).

    Scale shape: ONE scan filtered to both types (predicate pushed to
    the read), per-batch (day, type) combiner, one day-keyed exchange
    of group-count-sized partials, then an in-group co-group pivot —
    the full-outer semantics fall out of the pivot's NULL fill, no
    driver-side alignment. Day count is bounded (~365/yr), so the
    exchange is trivially small at any corpus size."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import hash_group_apply, segments

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"],
        filter=pads.field("event_type").isin([type_a, type_b]))
    day_us = 24 * MICROS_PER_HOUR

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"day_us": pa.array([], pa.int64()),
                             "is_a": pa.array([], pa.bool_()),
                             "n": pa.array([], pa.int64())})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // day_us) * day_us
        is_a = pc.equal(b.column("event_type"), type_a) \
            .to_numpy(zero_copy_only=False)
        combo = day * 2 + is_a          # day is us-scaled, headroom vast
        order = np.argsort(combo, kind="stable")
        starts, counts = segments(combo[order])
        return pa.table({
            "day_us": pa.array(day[order][starts], pa.int64()),
            "is_a": pa.array(is_a[order][starts], pa.bool_()),
            "n": pa.array(counts, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def cogroup(batch: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                          "n_a": pa.array([], pa.int64()),
                          "n_b": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        day = batch.column("day_us").to_numpy(zero_copy_only=False)
        is_a = batch.column("is_a").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        starts, counts = segments(day[order])
        na = np.zeros(len(starts), dtype=np.int64)
        nb = np.zeros(len(starts), dtype=np.int64)
        gid = np.repeat(np.arange(len(starts)), counts)
        a_rows = is_a[order]
        np.add.at(na, gid[a_rows], n[order][a_rows])
        np.add.at(nb, gid[~a_rows], n[order][~a_rows])
        return pa.table({
            "day": pa.array(day[order][starts], pa.int64())
                     .cast(pa.timestamp("us")),
            "n_a": pa.array(na, pa.int64(), mask=na == 0),
            "n_b": pa.array(nb, pa.int64(), mask=nb == 0)})

    return hash_group_apply(partials, ["day_us"], cogroup, 0, sort=False)
