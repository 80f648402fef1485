"""Line-level dedup surfaces (C4 / RefinedWeb-style) plus a rolling
distinct-users window — round-4 additions.

The documents table is single-line word soup (space-separated tokens, no
newlines — verified at every sf), so a literal line split would be
vacuous. Instead both engines (Ray and the DuckDB oracle) agree on a
DETERMINISTIC RE-WRAP: split ``text`` on single spaces and group every
``TOKENS_PER_LINE`` consecutive tokens into one "line" (the final line
keeps the remainder). Because the source text is exactly single-space
separated, each wrapped line is a byte-exact substring of the original
text, and DuckDB reproduces it with
``array_to_string(string_split(text,' ')[i*10+1 : i*10+10], ' ')`` —
the contract both sides are pinned to.

Scale contracts:

- the explode is one Arrow kernel chain per batch (split_pattern →
  ListArray regroup by offset arithmetic → binary_join); no Python loop
  over rows; line identity for SEMANTICS is the line string (hash only
  routes the exchange, so a 64-bit collision cannot change results);
- ``duplicate_lines_docs`` is the TWO-LEVEL distinct of
  ``_dup_line_census``: stage A keys on (line_hash, doc_id) so a
  boilerplate line in every document spreads uniformly instead of
  hot-spotting one partition, stage B merges partition-count-bounded
  partials; output is repetition-bounded, not corpus-bounded;
- ``line_dedup_docs`` marks occurrences against the census via a
  broadcast-gated string-confirmed probe (per-batch pre-fold, ONE
  doc-keyed exchange of partials) with a no-broadcast line-keyed
  exchange fallback past the gate;
- ``rolling_active_users`` turns the O(days x events) window into a
  per-user interval-coverage sweep: distinct (user, day) partials per
  batch, one user-keyed exchange emitting +-1 coverage deltas, a
  day-keyed delta reduction, and an O(#days) driver cumsum — the only
  driver-side structure is calendar-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import (default_concurrency,
                                     hash_group_apply, segments)

TOKENS_PER_LINE = 10
DAY_US = 86_400_000_000


def _explode_lines(b: pa.Table, tokens_per_line: int = TOKENS_PER_LINE,
                   hasher=None) -> pa.Table:
    """(doc_id, text) batch -> (doc_id, line, line_hash) with one row per
    wrapped line. Pure Arrow/numpy: the wrapped lines tile the flat token
    array exactly (within a doc, line i+1 starts where line i's 10-token
    window ends), so ONE ListArray re-offset + binary_join builds every
    line string with no per-row Python."""
    import pyarrow.compute as pc

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "line": pa.array([], pa.string()),
                      "line_hash": pa.array([], pa.uint64())})
    if b.num_rows == 0:
        return empty
    txt = b.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.split_pattern(txt, pattern=" ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    tok_off = np.asarray(lists.offsets, dtype=np.int64) - lists.offset
    cnt = np.diff(tok_off)
    # string_split('', ' ') = [''] in both engines, so cnt >= 1 always;
    # ceil-divide gives the oracle's floor((len-1)/10)+1 line count.
    n_lines = (cnt + tokens_per_line - 1) // tokens_per_line
    total = int(n_lines.sum())
    if total == 0:
        return empty
    n = b.num_rows
    row = np.repeat(np.arange(n, dtype=np.int64), n_lines)
    first = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_lines, out=first[1:])
    intra = np.arange(total, dtype=np.int64) - first[:-1][row]
    line_start = tok_off[:-1][row] + intra * tokens_per_line
    # lines tile the token space: offsets = every line start + global end
    line_offsets = np.append(line_start, tok_off[-1]).astype(np.int32)
    grouped = pa.ListArray.from_arrays(pa.array(line_offsets), flat)
    lines = pc.binary_join(grouped, " ")
    doc = b.column("doc_id").to_numpy(zero_copy_only=False)[row]
    if hasher is None:
        from nise_ray.ops.normalize import TokenHasher
        hasher = TokenHasher()
    enc = lines.dictionary_encode()
    vocab_h = hasher.hash_vocab(enc.dictionary.to_pylist())
    lh = vocab_h[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    return pa.table({"doc_id": pa.array(doc, pa.int64()),
                     "line": lines,
                     "line_hash": pa.array(lh, pa.uint64())})


class _LineExploder:
    """Actor-pool wrapper so the blake2b line-hash cache persists across
    batches (stateful-stage pattern; repeated boilerplate lines hash once
    per actor, not once per occurrence)."""

    def __init__(self, tokens_per_line: int = TOKENS_PER_LINE) -> None:
        from nise_ray.ops.normalize import TokenHasher
        self._hasher = TokenHasher()
        self._tpl = tokens_per_line

    def __call__(self, b: pa.Table) -> pa.Table:
        return _explode_lines(b, self._tpl, self._hasher)


def _line_groups(b: pa.Table):
    """Within a line_hash-partitioned block: order rows so equal LINE
    STRINGS (not just equal hashes) are contiguous, and return
    (order, seg_starts, seg_counts, n_docs_per_seg, doc, lines).

    Grouping semantics use the actual string via an in-block dictionary
    encode — two different lines colliding on the 64-bit hash land in the
    same partition but form separate segments, so results are exact."""
    lines = b.column("line")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    enc = lines.dictionary_encode()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lh = b.column("line_hash").to_numpy(zero_copy_only=False)
    doc = b.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, code, lh))
    lh_s, code_s, doc_s = lh[order], code[order], doc[order]
    # segment = one distinct line string
    chg = np.empty(len(order), dtype=bool)
    chg[0] = True
    chg[1:] = (lh_s[1:] != lh_s[:-1]) | (code_s[1:] != code_s[:-1])
    starts = np.flatnonzero(chg)
    counts = np.diff(np.append(starts, len(order)))
    # distinct docs per segment: doc is sorted within each segment
    doc_chg = np.empty(len(order), dtype=bool)
    doc_chg[0] = True
    doc_chg[1:] = chg[1:] | (doc_s[1:] != doc_s[:-1])
    n_docs = np.add.reduceat(doc_chg.astype(np.int64), starts)
    return order, starts, counts, n_docs, doc_s, lines


def _explode_docs(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_LineExploder, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def _dup_line_census(exploded: "ray.data.Dataset",
                     min_docs: int) -> "ray.data.Dataset":
    """(line, line_hash, n_docs, n_occurrences) for lines in >= min_docs
    distinct docs, as a TWO-LEVEL distinct aggregation so a boilerplate
    line present in every document (the license-header case) cannot
    hot-spot one partition:

    - stage A keys the exchange on (line_hash, doc_id) — occurrences of
      a hot line spread uniformly across partitions, and because a
      (line, doc) pair hashes to exactly one partition, the per-partition
      distinct-doc counts are exact global partials;
    - stage B merges partials keyed on line_hash alone — per line it sees
      at most one row PER STAGE-A PARTITION, so its worst-case group is
      partition-count-sized, never corpus-sized."""
    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"line": pa.array([], pa.string()),
                          "line_hash": pa.array([], pa.uint64()),
                          "n_docs_p": pa.array([], pa.int64()),
                          "n_occ_p": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        order, starts, counts, n_docs, _doc, lines = _line_groups(b)
        first_idx = pa.array(order[starts], pa.int64())
        lh = b.column("line_hash").to_numpy(zero_copy_only=False)
        return pa.table({
            "line": lines.take(first_idx),
            "line_hash": pa.array(lh[order[starts]], pa.uint64()),
            "n_docs_p": pa.array(n_docs, pa.int64()),
            "n_occ_p": pa.array(counts, pa.int64())})

    partials = hash_group_apply(exploded, ["line_hash", "doc_id"], partial)

    def merge(b: pa.Table) -> pa.Table:
        empty = pa.table({"line": pa.array([], pa.string()),
                          "line_hash": pa.array([], pa.uint64()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_occurrences": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        lines = b.column("line")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        code = lines.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lh = b.column("line_hash").to_numpy(zero_copy_only=False)
        ndp = b.column("n_docs_p").to_numpy(zero_copy_only=False)
        nop = b.column("n_occ_p").to_numpy(zero_copy_only=False)
        order = np.lexsort((code, lh))
        lh_s, code_s = lh[order], code[order]
        chg = np.empty(len(order), dtype=bool)
        chg[0] = True
        chg[1:] = (lh_s[1:] != lh_s[:-1]) | (code_s[1:] != code_s[:-1])
        starts = np.flatnonzero(chg)
        n_docs = np.add.reduceat(ndp[order], starts)
        n_occ = np.add.reduceat(nop[order], starts)
        keep = n_docs >= min_docs
        if not keep.any():
            return empty
        first_idx = pa.array(order[starts[keep]], pa.int64())
        return pa.table({
            "line": lines.take(first_idx),
            "line_hash": pa.array(lh[order[starts[keep]]], pa.uint64()),
            "n_docs": pa.array(n_docs[keep], pa.int64()),
            "n_occurrences": pa.array(n_occ[keep], pa.int64())})

    return hash_group_apply(partials, ["line_hash"], merge)


def duplicate_lines_docs(sf_dir: str, min_docs: int = 2) -> "ray.data.Dataset":
    """Lines (10-token deterministic wrap, see module docstring) that
    occur in >= ``min_docs`` DISTINCT documents. Returns
    (line, n_docs, n_occurrences) — the C4-style "repeated line" census
    that seeds line-level dedup.

    Scale shape: stateless explode (actor pool for the hash cache), then
    the skew-proof two-level distinct of ``_dup_line_census`` (stage A
    keyed on (line_hash, doc_id), stage B on partition-count-bounded
    partials); output is repetition-bounded, not corpus-bounded."""
    census = _dup_line_census(_explode_docs(sf_dir), min_docs)
    return census.select_columns(["line", "n_docs", "n_occurrences"])


def line_dedup_docs(sf_dir: str, min_docs: int = 2,
                    dup_broadcast_max: int = 5_000_000,
                    mark_mode: str = "auto") -> "ray.data.Dataset":
    """RefinedWeb-style line-level dedup accounting: a line is DUP if it
    occurs in >= ``min_docs`` distinct documents; every occurrence of a
    dup line is dropped. Returns per-doc
    (doc_id, n_lines, n_kept, kept_chars) where kept_chars sums the
    utf8 length of the surviving lines.

    mark_mode "broadcast" (the default resolution while the dup census —
    repetition-bounded by construction — fits ``dup_broadcast_max``):
    the census ships once via ray.put as (sorted hash array + line
    strings); each explode batch marks its occurrences with a
    searchsorted probe, confirms hits BY STRING (a 64-bit collision
    cannot misclassify), and pre-folds per-doc partial counters, so the
    only corpus-sized exchange is the final doc-keyed partial sum.
    mark_mode "exchange" is the no-broadcast fallback past the gate: a
    line-keyed exchange marks occurrences in-group (its known caveat: a
    single line present in nearly every document concentrates that
    line's occurrences in one partition — prefer raising the gate or
    pre-filtering such boilerplate). Both modes are parity-tested."""
    import pyarrow.compute as pc

    from nise_ray.util import collect_table

    if mark_mode in ("auto", "broadcast"):
        census = _dup_line_census(_explode_docs(sf_dir), min_docs) \
            .materialize()
        if mark_mode == "auto":
            mark_mode = "broadcast" \
                if census.count() <= dup_broadcast_max else "exchange"

    # explode is re-run for the mark pass rather than materializing the
    # corpus-sized line table for two consumers (streaming rule)
    exploded = _explode_docs(sf_dir)

    if mark_mode == "broadcast":
        ct = collect_table(census)
        lh = ct.column("line_hash").to_numpy(zero_copy_only=False)
        order = np.argsort(lh)
        dup_lines = ct.column("line")
        if isinstance(dup_lines, pa.ChunkedArray):
            dup_lines = dup_lines.combine_chunks()
        ref = ray.put((lh[order], dup_lines.take(pa.array(order,
                                                          pa.int64()))))

        def mark_fold(b: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "n_lines": pa.array([], pa.int64()),
                              "n_kept": pa.array([], pa.int64()),
                              "kept_chars": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            keys, key_lines = ray.get(ref)
            lines = b.column("line")
            if isinstance(lines, pa.ChunkedArray):
                lines = lines.combine_chunks()
            hh = b.column("line_hash").to_numpy(zero_copy_only=False)
            doc = b.column("doc_id").to_numpy(zero_copy_only=False)
            if len(keys):
                pos = np.clip(np.searchsorted(keys, hh), 0, len(keys) - 1)
                hit = keys[pos] == hh
                if hit.any():
                    # confirm BY STRING — equal hash, different line is
                    # NOT a dup (exactness survives hash collisions)
                    same = pc.fill_null(pc.equal(
                        lines, key_lines.take(pa.array(pos, pa.int64()))),
                        False).to_numpy(zero_copy_only=False).astype(bool)
                    is_dup = hit & same
                else:
                    is_dup = np.zeros(len(hh), dtype=bool)
            else:
                is_dup = np.zeros(len(hh), dtype=bool)
            kept = (~is_dup).astype(np.int64)
            chars = pc.utf8_length(lines).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            order_d = np.argsort(doc, kind="stable")
            doc_s = doc[order_d]
            starts, counts = segments(doc_s)
            k_s = kept[order_d]
            return pa.table({
                "doc_id": pa.array(doc_s[starts], pa.int64()),
                "n_lines": pa.array(counts, pa.int64()),
                "n_kept": pa.array(np.add.reduceat(k_s, starts),
                                   pa.int64()),
                "kept_chars": pa.array(
                    np.add.reduceat(chars[order_d] * k_s, starts),
                    pa.int64())})

        partials = exploded.map_batches(mark_fold, batch_format="pyarrow",
                                        zero_copy_batch=True)
    elif mark_mode == "exchange":
        def mark(b: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "n_lines": pa.array([], pa.int64()),
                              "n_kept": pa.array([], pa.int64()),
                              "kept_chars": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            order, starts, _counts, n_docs, doc_s, lines = _line_groups(b)
            seg_of = np.zeros(len(order), dtype=np.int64)
            seg_of[starts[1:]] = 1
            np.cumsum(seg_of, out=seg_of)
            kept = ((n_docs < min_docs)[seg_of]).astype(np.int64)
            chars = pc.utf8_length(lines).to_numpy(zero_copy_only=False) \
                .astype(np.int64)[order]
            # pre-fold per doc inside the block before the doc exchange
            order_d = np.argsort(doc_s, kind="stable")
            doc_d = doc_s[order_d]
            d_starts, d_counts = segments(doc_d)
            k_d = kept[order_d]
            return pa.table({
                "doc_id": pa.array(doc_d[d_starts], pa.int64()),
                "n_lines": pa.array(d_counts, pa.int64()),
                "n_kept": pa.array(np.add.reduceat(k_d, d_starts),
                                   pa.int64()),
                "kept_chars": pa.array(
                    np.add.reduceat(chars[order_d] * k_d, d_starts),
                    pa.int64())})

        # NOTE: a near-universal boilerplate line concentrates its
        # occurrences in one partition here (see docstring); this mode
        # exists for dup-set cardinalities past the broadcast gate.
        partials = hash_group_apply(exploded, ["line_hash"], mark)
    else:
        raise ValueError(f"unknown mark_mode {mark_mode!r}")

    def fold(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_lines": pa.array([], pa.int64()),
                          "n_kept": pa.array([], pa.int64()),
                          "kept_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        nl = b.column("n_lines").to_numpy(zero_copy_only=False)
        nk = b.column("n_kept").to_numpy(zero_copy_only=False)
        kc = b.column("kept_chars").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        starts, _counts = segments(doc_s)
        return pa.table({
            "doc_id": pa.array(doc_s[starts], pa.int64()),
            "n_lines": pa.array(np.add.reduceat(nl[order], starts),
                                pa.int64()),
            "n_kept": pa.array(np.add.reduceat(nk[order], starts),
                               pa.int64()),
            "kept_chars": pa.array(np.add.reduceat(kc[order], starts),
                                   pa.int64())})

    return hash_group_apply(partials, ["doc_id"], fold)


def coverage_deltas(user: np.ndarray, day: np.ndarray,
                    window_days: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-user interval-coverage deltas for (user, day) activity rows
    (possibly with cross-batch duplicates): each user's active day d
    covers window-end days [d, d+W-1]; overlapping/adjacent coverage runs
    merge, and each merged run emits (+1 at run start, -1 at first
    uncovered day). Returns (delta_days, delta_values); summing values
    per day and prefix-summing over the calendar yields, for every day e,
    the number of users active at least once in [e-W+1, e]."""
    order = np.lexsort((day, user))
    user, day = user[order], day[order]
    first = np.empty(len(user), dtype=bool)
    first[0] = True
    first[1:] = (user[1:] != user[:-1]) | (day[1:] != day[:-1])
    user, day = user[first], day[first]
    # interval [d, d+W-1]; runs merge while the next active day still
    # touches the running coverage (gap <= W)
    new_run = np.empty(len(user), dtype=bool)
    new_run[0] = True
    new_run[1:] = (user[1:] != user[:-1]) | \
        (day[1:] - day[:-1] > window_days)
    run_start = day[new_run]
    # last day of each run (day is increasing within a run)
    run_last = np.maximum.reduceat(day, np.flatnonzero(new_run))
    run_end = run_last + window_days  # first uncovered day
    d = np.concatenate([run_start, run_end])
    v = np.concatenate([np.ones(len(run_start), dtype=np.int64),
                        -np.ones(len(run_end), dtype=np.int64)])
    return d, v


def rolling_active_users(sf_dir: str, window_days: int = 7) -> pa.Table:
    """Rolling W-day distinct active users per day: for each day present
    in events, the number of distinct user_ids with >= 1 event in
    [day - (W-1), day]. Returns (day timestamp[us], wau int64), sorted.

    Scale shape (the O(days x events) window rewritten as interval
    coverage): per-batch distinct (user, day) combiner -> ONE user-keyed
    exchange where each user's sorted active days become merged coverage
    intervals [d, d+W-1] emitted as +-1 day deltas (a user in a merged
    interval counts exactly once per covered day) -> day-keyed delta
    reduction (calendar-sized) -> O(#days) driver cumsum restricted to
    days actually present. No corpus-sized driver state."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // DAY_US
        user = b.column("user_id").to_numpy(zero_copy_only=False)
        combo = np.stack([user, day])
        uniq = np.unique(combo, axis=1)
        return pa.table({"user_id": pa.array(uniq[0], pa.int64()),
                         "day": pa.array(uniq[1], pa.int64())})

    # pairs feeds TWO consumers (delta exchange + present-day census);
    # an unmaterialized dataset would duplicate the sub-DAG per consumer
    # and can deadlock under hash-shuffle aggregator reservations, so pin
    # the (user, day) distinct partials — combiner-reduced, far smaller
    # than events — in the object store once.
    pairs = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def deltas(b: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        user = b.column("user_id").to_numpy(zero_copy_only=False)
        day = b.column("day").to_numpy(zero_copy_only=False)
        d, v = coverage_deltas(user, day, window_days)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "delta": pa.array(v, pa.int64())})

    delta_ds = hash_group_apply(pairs, ["user_id"], deltas)

    def reduce_day(b: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        day = b.column("day").to_numpy(zero_copy_only=False)
        delta = b.column("delta").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        day_s = day[order]
        starts, _counts = segments(day_s)
        sums = np.add.reduceat(delta[order], starts)
        return pa.table({"day": pa.array(day_s[starts], pa.int64()),
                         "delta": pa.array(sums, pa.int64())})

    reduced = hash_group_apply(delta_ds, ["day"], reduce_day)

    # calendar-sized driver finish: cumsum deltas over the full day range,
    # then keep only days that actually appear in events
    day_rows = pairs.map_batches(
        lambda b: pa.table({"day": pa.array(
            np.unique(b.column("day").to_numpy(zero_copy_only=False)),
            pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not day_rows:
        return pa.table({"day": pa.array([], pa.timestamp("us")),
                         "wau": pa.array([], pa.int64())})
    present = np.unique(np.array([r["day"] for r in day_rows],
                                 dtype=np.int64))
    dt = reduced.take_all()
    dd = np.array([r["day"] for r in dt], dtype=np.int64)
    dv = np.array([r["delta"] for r in dt], dtype=np.int64)
    order = np.argsort(dd, kind="stable")
    dd, dv = dd[order], dv[order]
    # run-end deltas land up to window_days past the last active day, so
    # the calendar must span the DELTA day range, not just present days
    lo, hi = int(dd.min()), int(max(dd.max(), present.max()))
    cal = np.arange(lo, hi + 1, dtype=np.int64)
    net = np.zeros(len(cal), dtype=np.int64)
    np.add.at(net, dd - lo, dv)
    cover = np.cumsum(net)
    wau = cover[present - lo]
    return pa.table({
        "day": pa.array(present * DAY_US, pa.int64()).cast(
            pa.timestamp("us")),
        "wau": pa.array(wau, pa.int64())})
