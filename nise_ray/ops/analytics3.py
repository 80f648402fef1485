"""Third analytics batch (round 4, session 6): the two time-dimension
shapes the inventory still lacked —

- ``time_window_stats``: a VALUE-BASED (RANGE) window frame. Every
  prior windowed op here is either row-positional (ROWS frames:
  moving_event_stats), tumbling/sliding bucketed (windowed_events,
  sliding_windows) or unbounded (window_running_stats). A RANGE frame
  bounded by a time INTERVAL — "everything this user did in the hour
  ending at this event" — is the per-entity trailing-context feature
  every behavioral ML pipeline computes, and its peer semantics (rows
  that tie on the ORDER BY key share one frame, including peers that
  sort AFTER the current row) are exactly what a ROWS frame cannot
  express.

- ``daily_counts_filled``: dimension GENERATION + gap fill. Every
  grouped aggregate so far only emits keys that occur in the data; a
  dense calendar (every day between corpus min and max × every event
  type, zero-filled) is the contract a downstream forecaster or
  anomaly detector actually consumes — missing rows, not zeros, are
  what break them. SQL-side this is generate_series + cross join +
  left join; engine-side the aggregate is combiner-shaped and the
  densification happens on the calendar-sized result, never on the
  event stream.

Scale contracts:

- ``time_window_stats`` rides ONE user_id hash exchange; the per-block
  kernel is a lexsort plus two global searchsorteds over a
  (segment, timestamp) encoding that answers every user's frame bounds
  at once (no per-user loop). The frame metric is an exact int64
  (props length) so the trailing sum is accumulation-order-free and
  the DuckDB comparison hashes bit-exact; the avg is one double
  division. The encoding needs seg_count * ts_span to fit int64; the
  kernel checks and falls back to a per-segment searchsorted sweep if
  a block ever exceeds it (cannot happen at sane partition widths —
  the guard is there so the op degrades instead of corrupting).
- ``daily_counts_filled`` is combiner-shaped: per-batch (day, type, n)
  partials (one np.unique per block over day*K+type codes), one
  calendar-×-type-sized hash exchange to merge, then a driver-side
  dense grid fill — the result is bounded by days × types regardless
  of corpus size, so the driver step is O(output), never O(events).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import hash_group_apply, segments

US_PER_DAY = 86_400_000_000


def time_window_stats(sf_dir: str, hours: int = 1) -> "ray.data.Dataset":
    """Per event: COUNT(*) and SUM(length(props)) over the frame

        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL `hours` HOUR PRECEDING AND CURRENT ROW

    with SQL RANGE-frame peer semantics: the frame holds every event of
    the same user with ts in [cur_ts - interval, cur_ts] — rows tying
    on ts share one frame even if they sort after the current row.
    Output: (user_id, event_id, win_cnt, win_sum, win_avg)."""
    import pyarrow.compute as pc

    gap_us = np.int64(hours) * 3_600_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "props"])

    def window(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "win_cnt": pa.array([], pa.int64()),
                             "win_sum": pa.array([], pa.int64()),
                             "win_avg": pa.array([], pa.float64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        m = pc.utf8_length(batch.column("props")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, m = uid[order], ts[order], eid[order], m[order]
        starts, counts = segments(uid)
        seg_of = np.zeros(len(order), dtype=np.int64)
        seg_of[starts[1:]] = 1
        np.cumsum(seg_of, out=seg_of)
        tmin = ts.min()
        rel = ts - tmin
        span = np.int64(rel.max()) + gap_us + 2
        if len(starts) and span < np.iinfo(np.int64).max // max(len(starts), 1):
            # one encoding, two global searchsorteds answer all segments
            enc = seg_of * span + rel
            base = seg_of * span
            hi = np.searchsorted(enc, enc, side="right")
            lo = np.searchsorted(enc, np.maximum(enc - gap_us, base),
                                 side="left")
        else:  # degenerate-width guard: per-segment sweep, same result
            hi = np.empty(len(order), dtype=np.int64)
            lo = np.empty(len(order), dtype=np.int64)
            for s, c in zip(starts, counts):
                seg = rel[s:s + c]
                hi[s:s + c] = s + np.searchsorted(seg, seg, side="right")
                lo[s:s + c] = s + np.searchsorted(
                    seg, np.maximum(seg - gap_us, 0), side="left")
        ext = np.concatenate(([0], np.cumsum(m, dtype=np.int64)))
        win_sum = ext[hi] - ext[lo]
        win_cnt = hi - lo
        win_avg = win_sum.astype(np.float64) / win_cnt
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "event_id": pa.array(eid, pa.int64()),
                         "win_cnt": pa.array(win_cnt, pa.int64()),
                         "win_sum": pa.array(win_sum, pa.int64()),
                         "win_avg": pa.array(win_avg, pa.float64())})

    return hash_group_apply(ds, ["user_id"], window, 0, sort=False)


def daily_counts_filled(sf_dir: str) -> pa.Table:
    """Dense daily event counts: one row for EVERY (day, event_type)
    combination between the corpus's min and max event day — days with
    no events of a type emit n_events = 0 instead of being absent.
    Output: (day timestamp[us] midnight, event_type, n_events),
    calendar-sized."""
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // US_PER_DAY
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        combo = day * k + code
        uniq, n = np.unique(combo, return_counts=True)
        return pa.table({
            "day": pa.array(uniq // k, pa.int64()),
            "event_type": enc.dictionary.take(pa.array(uniq % k)),
            "n": pa.array(n.astype(np.int64), pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        day = batch.column("day").to_numpy(zero_copy_only=False)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        combo = day * k + code
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(combo, kind="stable")
        starts, _ = segments(combo[order])
        sel = order[starts]
        return pa.table({
            "day": pa.array(day[sel], pa.int64()),
            "event_type": enc.dictionary.take(pa.array(code[sel])),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64())})

    sparse = collect_table(hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day", "event_type"], merge, 0, sort=False))

    # densify on the CALENDAR-sized result (days x types), driver-side
    day = sparse.column("day").to_numpy(zero_copy_only=False)
    et = sparse.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    enc = et.dictionary_encode()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = sparse.column("n").to_numpy(zero_copy_only=False)
    types = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    torder = np.argsort(types)
    trank = np.empty(len(types), dtype=np.int64)
    trank[torder] = np.arange(len(types))
    lo_d, hi_d = int(day.min()), int(day.max())
    n_days, k = hi_d - lo_d + 1, len(types)
    grid = np.zeros(n_days * k, dtype=np.int64)
    grid[(day - lo_d) * k + trank[code]] = n
    all_days = np.repeat(np.arange(lo_d, hi_d + 1, dtype=np.int64), k)
    all_types = types[torder][np.tile(np.arange(k), n_days)]
    return pa.table({
        "day": pa.array(all_days * US_PER_DAY, pa.timestamp("us")),
        "event_type": pa.array(all_types, pa.string()),
        "n_events": pa.array(grid, pa.int64())})


def groups_window_stats(sf_dir: str) -> "ray.data.Dataset":
    """GROUPS-frame window aggregate: per user, events ordered by ts,
    COUNT(*) and SUM(length(props)) over

        GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW

    — the current PEER GROUP (all rows tying on ts) plus the previous
    one. GROUPS is the third SQL frame type (ROWS = moving_event_stats,
    RANGE = time_window_stats); the local DuckDB build has no GROUPS
    mode, so the oracle states the identical semantics via dense_rank:
    aggregate over rows with gi in [my_gi - 1, my_gi].
    Output: (user_id, event_id, g_cnt, g_sum, g_avg).

    Scale: ONE user_id exchange; the kernel is a lexsort + peer-group
    run detection + two cumsum gathers — no per-user loop."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "props"])

    def window(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "g_cnt": pa.array([], pa.int64()),
                             "g_sum": pa.array([], pa.int64()),
                             "g_avg": pa.array([], pa.float64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        m = pc.utf8_length(batch.column("props")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, m = uid[order], ts[order], eid[order], m[order]
        n = len(order)
        # peer groups = runs of equal (uid, ts)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (uid[1:] != uid[:-1]) | (ts[1:] != ts[:-1])
        pg_of = np.cumsum(change) - 1            # peer-group id per row
        g_starts = np.flatnonzero(change)        # first row of each group
        g_counts = np.diff(np.append(g_starts, n))
        # per-user first peer group (to clamp the 1-PRECEDING bound)
        u_starts, u_counts = segments(uid)
        pg_first = np.repeat(pg_of[u_starts], u_counts)
        lo_pg = np.maximum(pg_of - 1, pg_first)
        lo = g_starts[lo_pg]
        hi = g_starts[pg_of] + g_counts[pg_of]
        ext = np.concatenate(([0], np.cumsum(m, dtype=np.int64)))
        g_sum = ext[hi] - ext[lo]
        g_cnt = hi - lo
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "event_id": pa.array(eid, pa.int64()),
                         "g_cnt": pa.array(g_cnt, pa.int64()),
                         "g_sum": pa.array(g_sum, pa.int64()),
                         "g_avg": pa.array(g_sum.astype(np.float64)
                                           / g_cnt, pa.float64())})

    return hash_group_apply(ds, ["user_id"], window, 0, sort=False)


def _value_histogram(ds: "ray.data.Dataset", col: str):
    """Exact global value histogram of an int64 column: (values_asc,
    counts) on the driver — combiner-shaped (per-batch np.unique
    partials, ONE value-bounded exchange), shared by global_doc_ranks
    and length_deciles. Driver state is O(distinct values)."""
    from nise_ray.util import collect_table

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = b.column(col).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def hist_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        v = batch.column("v").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        starts, _ = segments(v[order])
        return pa.table({
            "v": pa.array(v[order][starts], pa.int64()),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64())})

    hist = collect_table(hash_group_apply(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["v"], hist_merge, 0, sort=False))
    v = hist.column("v").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    asc = np.argsort(v)
    return v[asc], n[asc]


def length_deciles(sf_dir: str) -> pa.Table:
    """GLOBAL equi-depth boundaries: the nine deciles of document
    length as exact discrete quantiles (DuckDB quantile_disc semantics:
    element at 0-based rank ceil(q*n) - 1 of the sorted values),
    computed from the value histogram — no global sort, no per-group
    value vectors; driver work is O(distinct lengths).
    Output: (decile 1..9, n_chars_q)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["n_chars"])
    v_asc, n_asc = _value_histogram(ds, "n_chars")
    total = int(n_asc.sum())
    qs = np.arange(1, 10, dtype=np.int64)
    if total == 0:
        return pa.table({"decile": pa.array([], pa.int64()),
                         "n_chars_q": pa.array([], pa.int64())})
    ranks = np.ceil(np.round(qs * 0.1 * total, 9)).astype(np.int64)
    cum = np.cumsum(n_asc)
    vals = v_asc[np.searchsorted(cum, ranks, side="left")]
    return pa.table({"decile": pa.array(qs, pa.int64()),
                     "n_chars_q": pa.array(vals, pa.int64())})


def event_type_affinity(sf_dir: str) -> "ray.data.Dataset":
    """MARKET-BASKET co-occurrence over event types: for every
    unordered pair of types (type_a < type_b), how many distinct users
    produced BOTH — the support counts an association-rule or
    recommendation pass starts from. Output: (type_a, type_b, n_users).

    Scale shape: per-batch distinct (user, type) partials cut the
    stream to at most |users|x|types| rows before ONE user_id exchange;
    each partition re-distincts its complete user groups and explodes
    per-user type pairs (bounded by C(|types|,2) per user — the type
    vocabulary is small by definition for this op); per-block pair
    counts then ride a tiny (type,type)-keyed combiner exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def distinct_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = max(len(enc.dictionary), 1)
        uniq = np.unique(uid * k + code)
        return pa.table({
            "user_id": pa.array(uniq // k, pa.int64()),
            "event_type": enc.dictionary.take(pa.array(uniq % k))
            .cast(pa.string())})

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # type codes sorted by their STRING so pair order is (a < b)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        rank_of = np.empty(len(vocab), dtype=np.int64)
        rank_of[np.argsort(vocab)] = np.arange(len(vocab))
        k = max(len(vocab), 1)
        uniq = np.unique(uid * k + code)          # distinct across batches
        u, c = uniq // k, rank_of[uniq % k]
        order = np.lexsort((c, u))
        u, c = u[order], c[order]
        starts, counts = segments(u)
        # explode within-user pairs: for each user with m types, all
        # C(m,2) (c_i, c_j) i<j — vectorized over all users at once
        m = counts
        npairs = m * (m - 1) // 2
        if npairs.sum() == 0:
            return empty
        # row index arithmetic: for each user segment, pair p -> (i, j)
        seg_id = np.repeat(np.arange(len(starts)), npairs)
        p = np.arange(int(npairs.sum()), dtype=np.int64) \
            - np.repeat(np.concatenate(([0], np.cumsum(npairs)[:-1])),
                        npairs)
        mm = m[seg_id].astype(np.float64)
        # i = smallest i with p < i*m - i(i+1)/2 boundary; closed form
        i = np.floor((2 * mm - 1 - np.sqrt((2 * mm - 1) ** 2 - 8 * p))
                     / 2).astype(np.int64)
        off = i * (2 * m[seg_id] - i - 1) // 2
        j = (p - off) + i + 1
        gi = starts[seg_id]
        ca, cb = c[gi + i], c[gi + j]
        srt = np.argsort(vocab)
        combo = ca * k + cb
        uq, cnt = np.unique(combo, return_counts=True)
        return pa.table({
            "type_a": pa.array(vocab[srt][uq // k], pa.string()),
            "type_b": pa.array(vocab[srt][uq % k], pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(
            batch.column("type_a").cast(pa.string()),
            batch.column("type_b").cast(pa.string()), "\x1f")
        enc = key.combine_chunks().dictionary_encode() \
            if isinstance(key, pa.ChunkedArray) else key.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        starts, _ = segments(code[order])
        sel = order[starts]
        return pa.table({
            "type_a": batch.column("type_a").take(pa.array(sel)),
            "type_b": batch.column("type_b").take(pa.array(sel)),
            "n_users": pa.array(np.add.reduceat(n[order], starts),
                                pa.int64())})

    pre = ds.map_batches(distinct_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    pairs = hash_group_apply(pre, ["user_id"], pair_partial, 0, sort=False)
    return hash_group_apply(pairs, ["type_a", "type_b"], merge, 0,
                            sort=False)


def global_doc_ranks(sf_dir: str) -> "ray.data.Dataset":
    """GLOBAL row_number() OVER (ORDER BY n_chars DESC, doc_id) for
    every document — a total ordering of the corpus WITHOUT a global
    sort: (doc_id, n_chars, global_rank).

    Plan: (1) a combiner-shaped histogram of n_chars (per-batch value
    counts -> one value-bounded exchange -> driver prefix sums in DESC
    value order = each value's base rank, broadcast via ray.put);
    (2) ONE hash exchange on n_chars; each partition holds complete
    value groups, sorts each by doc_id (one lexsort over the block) and
    adds the broadcast base — rank = base[value] + within-value
    position + 1. Nothing corpus-sized on the driver; the histogram is
    bounded by distinct document lengths. Known skew caveat: one
    dominant length lands its group in one partition (same contract as
    every keyed group op here; the bases make a salted two-phase split
    possible without changing ranks, not needed at current tiers)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    v_asc, n_asc = _value_histogram(ds, "n_chars")
    # base rank of value x (DESC order) = count of rows with value > x
    above = np.concatenate((np.cumsum(n_asc[::-1])[::-1][1:], [0]))
    base_ref = ray.put((v_asc, above))

    # task-path rank map (hash-shuffle DAGs must not add actor pools);
    # the broadcast rides base_ref — a plain closure would pickle the
    # arrays into every task
    def rank_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "global_rank": pa.array([], pa.int64())})
        v_asc, above = ray.get(base_ref)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, nc))
        nc, doc = nc[order], doc[order]
        starts, counts = segments(nc)
        pos = np.arange(len(order), dtype=np.int64) \
            - np.repeat(starts, counts)
        base = above[np.searchsorted(v_asc, nc)]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "n_chars": pa.array(nc, pa.int64()),
            "global_rank": pa.array(base + pos + 1, pa.int64())})

    rank_batch.__name__ = "GlobalRank"
    return hash_group_apply(ds, ["n_chars"], rank_batch, 0, sort=False)


def user_decay_scores(sf_dir: str, half_life_days: int = 7,
                      window_days: int = 28) -> "ray.data.Dataset":
    """TIME-DECAYED engagement score per user over a TRAILING WINDOW:
    sum of event values weighted by 0.5^k, k = age_days // half_life,
    over events at most window_days old (age relative to the corpus
    max day) — the recency-weighted feature a ranking/churn model
    consumes. Output: (user_id, decay_score).

    Cross-engine FP contract (no rounding needed): values are cents
    (round(value*100) — exact small integers), each term is
    cents * 2^(K - k) with K = (window_days-1)//half_life, i.e. an
    INTEGER-valued double, so partial sums are exact and
    accumulation-order-free (< 2^53 headroom: K <= 3 here leaves room
    for ~10^11 max-value events per user); the final
    / (100 * 2^K) is ONE division of identical exact operands in both
    engines — bit-exact by construction. A first attempt weighted by
    0.5^k directly and healed with round(4): the terms are multiples
    of 0.01 * 2^-k, so sums land EXACTLY on 4-decimal halfway points
    and the two engines' summation orders round them apart (16/150
    users at sf0.01). The window is what bounds K — an unbounded decay
    over a years-long corpus would need 2^K factors past the 2^53
    integer range.

    Scale shape: a scalar max-ts combiner pass, then per-block partial
    (user, sum) combiners -> ONE user-bounded hash exchange -> merge.
    Nothing event-sized leaves the blocks after the first map."""
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def max_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(ts.max())], pa.int64())})

    mt = collect_table(ds.map_batches(max_partial, batch_format="pyarrow",
                                      zero_copy_batch=True))
    max_day = int(mt.column("m").to_numpy().max()) // US_PER_DAY
    hl = int(half_life_days)
    win = int(window_days)
    kmax = (win - 1) // hl
    denom = 100.0 * float(np.ldexp(1.0, kmax))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        age = max_day - ts // US_PER_DAY
        m = age < win
        if not m.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        uid, age, v = uid[m], age[m], v[m]
        cents = np.rint(v * 100.0)
        term = cents * np.ldexp(1.0, (kmax - age // hl).astype(np.int64))
        order = np.argsort(uid, kind="stable")
        starts, _ = segments(uid[order])
        return pa.table({
            "user_id": pa.array(uid[order][starts], pa.int64()),
            "s": pa.array(np.add.reduceat(term[order], starts),
                          pa.float64())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "decay_score": pa.array([], pa.float64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        starts, _ = segments(uid[order])
        return pa.table({
            "user_id": pa.array(uid[order][starts], pa.int64()),
            "decay_score": pa.array(
                np.add.reduceat(s[order], starts) / denom,
                pa.float64())})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return hash_group_apply(pre, ["user_id"], merge, 0, sort=False)


def source_lang_kl(sf_dir: str, round_to: int = 4) -> pa.Table:
    """Per-source language-mix drift: KL(source || corpus) over the
    language distribution — sum_l p_l * ln(p_l / q_l) with p = the
    source's lang shares and q = the corpus's, summed over the
    source's OWN languages only (p_l > 0; q_l > 0 whenever p_l > 0 by
    construction). The mix-shift monitor a multi-source ingestion
    pipeline alarms on. Output: (source, n_docs, kl).

    Scale shape: ONE (source x lang)-bounded combiner exchange; the KL
    arithmetic runs on the collected group-count-sized table (sources x
    langs), never on the corpus. Per-term op order matches the SQL
    exactly; the per-source sum is rounded (summation-order heal)."""
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(b.column("source"),
                                          b.column("lang"), "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(code, return_counts=True)
        import pyarrow.compute as pc2
        parts = pc2.split_pattern(enc.dictionary.take(pa.array(uniq)),
                                  pattern="\x1f")
        flat = parts.flatten()
        return pa.table({
            "source": flat.take(pa.array(np.arange(0, 2 * len(uniq), 2))),
            "lang": flat.take(pa.array(np.arange(1, 2 * len(uniq), 2))),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import pyarrow.compute as pc
        key = pc.binary_join_element_wise(
            batch.column("source").cast(pa.string()),
            batch.column("lang").cast(pa.string()), "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        starts, _ = segments(code[order])
        sel = order[starts]
        return pa.table({
            "source": batch.column("source").take(pa.array(sel)),
            "lang": batch.column("lang").take(pa.array(sel)),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64())})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    t = collect_table(hash_group_apply(pre, ["source", "lang"], merge, 0,
                                       sort=False))
    src = np.asarray(t.column("source").to_pylist(), dtype=object)
    lng = np.asarray(t.column("lang").to_pylist(), dtype=object)
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    total = n.sum()
    # corpus lang shares q_l
    lorder = np.argsort(lng, kind="stable")
    lstarts, _ = segments(lng[lorder])
    lkeys = lng[lorder][lstarts]
    lsum = np.add.reduceat(n[lorder], lstarts)
    q = lsum / total
    qv = q[np.searchsorted(lkeys, lng)]
    # per-source totals and shares p_l
    sorder = np.argsort(src, kind="stable")
    sstarts, scounts = segments(src[sorder])
    stot = np.add.reduceat(n[sorder], sstarts)
    p = n[sorder] / np.repeat(stot, scounts)
    terms = p * np.log(p / qv[sorder])
    kl = np.round(np.add.reduceat(terms, sstarts), round_to)
    return pa.table({
        "source": pa.array(src[sorder][sstarts], pa.string()),
        "n_docs": pa.array(stot.astype(np.int64), pa.int64()),
        "kl": pa.array(kl, pa.float64())})
