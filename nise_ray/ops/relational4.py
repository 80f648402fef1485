"""Fourth batch of relational showcase ops (round 4): interval-overlap
self-join (counted by a per-group sweep, never materializing pairs),
MERGE/upsert changeset application (the SCD "apply a delta to a
snapshot" shape — the inverse of analytics.snapshot_diff_docs), and
UNPIVOT/melt (wide metrics table -> long (id, metric, value) form).

Scale contracts match ops/relational.py: the overlap sweep rides ONE
hash exchange on the group key and its per-block kernel is O(n log n)
searchsorted arithmetic (the O(n^2) pair set is counted, not built);
the merge is a single distributed left-outer join plus a streamed
union (no driver materialization of either side); unpivot is a
stateless per-batch map that streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import (hash_group_apply, join_safe_partitions,
                                     segments)

DAY_US = 86_400_000_000


def shipment_overlap_counts(sf_dir: str) -> "ray.data.Dataset":
    """INTERVAL-OVERLAP SELF-JOIN, counted: per supplier, the number of
    unordered lineitem pairs whose transit windows
    ``[l_shipdate, l_shipdate + int(l_quantity) days]`` overlap
    (equivalently ``a JOIN b ON same supplier AND a < b in
    (shipdate, orderkey, linenumber) row-order AND a_end >= b_start``).
    Returns (l_suppkey, n_overlap_pairs), suppliers with >= 1 pair.

    Scale shape: the naive oracle join is O(n^2) per supplier; the
    engine instead counts overlaps with a sweep — sort each supplier
    segment by (start, orderkey, linenumber); a pair (a, b) with
    a <= b in that order overlaps iff end_a >= start_b (start_a <=
    start_b <= end_a needs only the right-hand check once sorted), so
    pairs(b) = (#predecessors of b) - (#ends < start_b), both plain
    searchsorted arithmetic. All segments are swept in ONE vectorized
    pass by encoding (segment_ordinal, day) into a single int64 key —
    shipdates are day-aligned and spans are bounded, so the encoding
    never overflows. One l_suppkey hash exchange of 5 small columns;
    per-block output is group-count-sized."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_orderkey", "l_linenumber",
                 "l_shipdate", "l_quantity"])

    def sweep(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                          "n_overlap_pairs": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        supp = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        lno = b.column("l_linenumber").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ship_us = b.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # day-aligned by data contract (oracle interval arithmetic is in
        # whole days); a misaligned timestamp would silently change pair
        # membership vs SQL, so fail loudly instead.
        if ((ship_us % DAY_US) != 0).any():
            raise ValueError("l_shipdate not day-aligned; the whole-day "
                             "overlap encoding would diverge from the "
                             "SQL oracle")
        day = ship_us // DAY_US
        order = np.lexsort((lno, okey, day, supp))
        supp, day, qty = supp[order], day[order], qty[order]
        end_day = day + qty

        starts, counts = segments(supp)
        n = len(supp)
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        day0 = int(day.min())
        span = int(end_day.max()) - day0 + 2
        enc_start = seg_id * span + (day - day0)
        enc_end = seg_id * span + (end_day - day0)
        # seg_id dominates the encoding, so one global sort of the end
        # keys is per-segment sorted with identical segment offsets.
        enc_end_sorted = np.sort(enc_end, kind="stable")
        ends_lt = np.searchsorted(enc_end_sorted, enc_start, side="left")
        local_idx = np.arange(n, dtype=np.int64) - starts[seg_id]
        # ends in EARLIER segments all encode below this segment's keys
        # and are exactly the starts[seg] prefix of the sorted array.
        pairs = local_idx - (ends_lt - starts[seg_id])
        per_supp = np.add.reduceat(pairs, starts)
        keep = per_supp > 0
        if not keep.any():
            return empty
        return pa.table({
            "l_suppkey": pa.array(supp[starts][keep], pa.int64()),
            "n_overlap_pairs": pa.array(per_supp[keep], pa.int64())})

    return hash_group_apply(ds, ["l_suppkey"], sweep)


# insert ids land far above any real doc_id (2^40 > any sf's id space);
# the oracle uses the same literal.
MERGE_INSERT_OFFSET = 1 << 40


def _derive_changeset(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic synthetic changeset over documents: doc_id%10==0 ->
    update (n_chars+1000), %10==1 -> delete tombstone, %10==2 -> insert
    under a fresh id. Emitted as a real Dataset so the merge below
    exercises the distributed join machinery — nothing downstream may
    exploit how the delta was derived."""
    def make(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "op": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64())})
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        lang = b.column("lang")
        m = did % 10
        u, d, i = m == 0, m == 1, m == 2
        idx = np.concatenate([np.flatnonzero(u), np.flatnonzero(d),
                              np.flatnonzero(i)])
        ops = np.concatenate([np.repeat("U", u.sum()),
                              np.repeat("D", d.sum()),
                              np.repeat("I", i.sum())])
        out_id = did[idx].copy()
        out_ch = nch[idx].copy()
        nu = int(u.sum())
        out_ch[:nu] += 1000
        out_id[len(idx) - int(i.sum()):] += MERGE_INSERT_OFFSET
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "op": pa.array(ops, pa.string()),
                         "lang": lang.take(pa.array(idx)),
                         "n_chars": pa.array(out_ch, pa.int64())})

    return docs.map_batches(make, batch_format="pyarrow",
                            zero_copy_batch=True)


def merge_upsert_docs(sf_dir: str) -> "ray.data.Dataset":
    """MERGE INTO (upsert + delete) applied distributedly: base snapshot
    LEFT OUTER JOIN changeset on doc_id — matched 'U' rows take the
    delta's n_chars, matched 'D' rows are dropped, unmatched rows pass
    through — then the 'I' inserts are unioned in. Returns the merged
    snapshot (doc_id, lang, n_chars).

    Scale shape: ONE distributed hash join keyed on doc_id (both sides
    corpus-sized, neither collected), a streamed filter/coalesce per
    block, and a lazy union with the insert slice — the canonical CDC /
    slowly-changing-dimension apply with no driver materialization.
    Inverse of analytics.snapshot_diff_docs (which re-derives the
    changeset from two snapshots)."""
    import pyarrow.compute as pc

    def docs() -> "ray.data.Dataset":
        return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "lang", "n_chars"])

    # each consumer gets its own read: a Dataset consumed twice
    # duplicates its sub-DAG per consumer, and a duplicated branch that
    # feeds a JoinOperator aggregator pool has deadlocked before
    # (SURVEY 9.6); column-pruned re-reads are cheap.
    base = docs()

    def ud_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("op"), "I"))
        return t.rename_columns(["doc_id", "op", "d_lang", "d_n_chars"])

    ud = _derive_changeset(docs()).map_batches(ud_side,
                                               batch_format="pyarrow")
    np_ = join_safe_partitions(0)
    joined = base.join(ud, join_type="left_outer", num_partitions=np_,
                       on=("doc_id",))

    def apply_ops(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64())})
        op = b.column("op")
        keep = pc.fill_null(pc.not_equal(op, "D"), True)
        b = b.filter(keep)
        op = b.column("op")
        upd = pc.fill_null(pc.equal(op, "U"), False)
        n_chars = pc.if_else(upd, b.column("d_n_chars"),
                             b.column("n_chars"))
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "n_chars": n_chars.cast(pa.int64())})

    merged = joined.map_batches(apply_ops, batch_format="pyarrow")

    def insert_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("op"), "I"))
        return t.select(["doc_id", "lang", "n_chars"])

    inserts = _derive_changeset(docs()).map_batches(
        insert_side, batch_format="pyarrow")
    return merged.union(inserts)


def unpivot_quality_metrics(sf_dir: str) -> "ray.data.Dataset":
    """UNPIVOT / melt: the wide per-document quality table
    (doc_id, n_chars_c, n_lines, alpha_ratio) unfolded to long form
    (doc_id, metric, value DOUBLE) — 3 rows per document. The int
    metrics cast exactly to double (values << 2^53).

    Scale shape: stateless per-batch reshape (concat of three column
    slices + a dictionary-repeated metric column); streams, no
    exchange."""
    from nise_ray.ops.textstats import quality_scores

    wide = quality_scores(sf_dir)
    metrics = ["n_chars_c", "n_lines", "alpha_ratio"]

    def melt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "metric": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        n = b.num_rows
        did = b.column("doc_id")
        parts = []
        for m in metrics:
            parts.append(pa.table({
                "doc_id": did,
                "metric": pa.array(np.repeat(m, n), pa.string()),
                "value": b.column(m).cast(pa.float64())}))
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow",
                            zero_copy_batch=True)


def user_activity_streaks(sf_dir: str) -> "ray.data.Dataset":
    """GAPS-AND-ISLANDS: per user, activity-day streaks — n_active_days
    (distinct days with >= 1 event), longest_streak (longest run of
    CONSECUTIVE active days) and n_streaks (number of runs). The classic
    SQL islands pattern (day - row_number() island key); the engine
    finds the same islands with a sorted diff sweep.

    Scale shape: per-batch distinct-(user, day) combiner shrinks the
    exchange to active-user-days (<< events); ONE user_id hash
    exchange; in-group global dedupe + one vectorized break/cumsum/
    reduceat sweep; output is user-count-sized."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def distinct_days(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        day = b.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // DAY_US
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.empty(len(uid), dtype=bool)
        keep[0] = True
        np.logical_or(uid[1:] != uid[:-1], day[1:] != day[:-1],
                      out=keep[1:])
        return pa.table({"user_id": pa.array(uid[keep], pa.int64()),
                         "day": pa.array(day[keep], pa.int64())})

    partials = ds.map_batches(distinct_days, batch_format="pyarrow",
                              zero_copy_batch=True)

    def streaks(b: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_active_days": pa.array([], pa.int64()),
                          "longest_streak": pa.array([], pa.int64()),
                          "n_streaks": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        day = b.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.empty(len(uid), dtype=bool)     # cross-batch dupes
        keep[0] = True
        np.logical_or(uid[1:] != uid[:-1], day[1:] != day[:-1],
                      out=keep[1:])
        uid, day = uid[keep], day[keep]
        n = len(uid)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.logical_or(uid[1:] != uid[:-1], np.diff(day) != 1,
                      out=new_run[1:])
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, n))
        run_user = uid[run_starts]
        starts, counts = segments(run_user)
        return pa.table({
            "user_id": pa.array(run_user[starts], pa.int64()),
            "n_active_days": pa.array(np.add.reduceat(run_len, starts),
                                      pa.int64()),
            "longest_streak": pa.array(
                np.maximum.reduceat(run_len, starts), pa.int64()),
            "n_streaks": pa.array(counts, pa.int64())})

    return hash_group_apply(partials, ["user_id"], streaks)


# one int64 bitmask bit per source; >63 sources needs mask chunking
# (document the limit loudly rather than silently corrupting bit 63's
# sign)
_MAX_MASK_SOURCES = 63


def source_vocab_jaccard(sf_dir: str) -> pa.Table:
    """Pairwise VOCABULARY overlap between sources: for every source
    pair with >= 1 shared token, (source_a, source_b, n_shared,
    jaccard) where jaccard = |Va ∩ Vb| / |Va ∪ Vb| over distinct token
    vocabularies (tokens = the corpus-wide [A-Za-z0-9_]+ convention).

    Scale shape: per-batch (token, source-bitmask) combiner — the
    exchange moves vocabulary-sized 2-column rows, never token
    instances; ONE token hash exchange; in-group OR-reduce, then each
    block folds its tokens into a K x K intersection matrix with one
    bits-matrix matmul (B^T B), so only block-count x K^2 tiny partials
    reach the driver. Union sizes come from the matrix diagonal —
    |Va ∪ Vb| = |Va| + |Vb| - |Va ∩ Vb|. K <= 63 sources per int64
    mask (assert; chunk masks beyond that)."""
    import pyarrow.compute as pc

    from nise_ray.ops.textstats import _doc_token_stream
    from nise_ray.util import collect_table

    src_ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["source"])

    def src_partial(b: pa.Table) -> pa.Table:
        return pa.table({"source": pc.unique(b.column("source")
                                             .combine_chunks())})

    srcs = np.unique(np.asarray(
        collect_table(src_ds.map_batches(src_partial,
                                         batch_format="pyarrow"))
        .column("source").to_pylist(), dtype=object))
    k = len(srcs)
    if k == 0:
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "n_shared": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    if k > _MAX_MASK_SOURCES:
        raise ValueError(f"{k} sources exceed the {_MAX_MASK_SOURCES}-bit "
                         "int64 mask; chunk the mask dimension")

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string()),
                          "mask": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        row, codes, vocab = _doc_token_stream(b)
        if len(codes) == 0:
            return empty
        src = np.asarray(b.column("source").to_pylist(), dtype=object)
        bit = np.searchsorted(srcs, src)[row]
        key = np.unique(codes * 64 + bit)
        code_u, bit_u = key >> 6, key & 63
        starts, _ = segments(code_u)
        masks = np.bitwise_or.reduceat(
            np.int64(1) << bit_u.astype(np.int64), starts)
        return pa.table({"token": pa.array(vocab[code_u[starts]],
                                           pa.string()),
                         "mask": pa.array(masks, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def fold(batch: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        tok = np.asarray(batch.column("token").to_pylist(), dtype=object)
        masks = batch.column("mask").to_numpy(zero_copy_only=False)
        starts, _ = segments(tok)      # block arrives token-sorted
        m = np.bitwise_or.reduceat(masks, starts)
        bits = ((m[:, None] >> np.arange(k, dtype=np.int64)) & 1) \
            .astype(np.int64)
        mat = bits.T @ bits            # K x K intersections; diag = |V|
        iu, ju = np.triu_indices(k)
        return pa.table({"i": pa.array(iu.astype(np.int64), pa.int64()),
                         "j": pa.array(ju.astype(np.int64), pa.int64()),
                         "n": pa.array(mat[iu, ju], pa.int64())})

    folded = collect_table(hash_group_apply(partials, ["token"], fold))
    mat = np.zeros((k, k), dtype=np.int64)
    if folded.num_rows:
        i = folded.column("i").to_numpy(zero_copy_only=False)
        j = folded.column("j").to_numpy(zero_copy_only=False)
        n = folded.column("n").to_numpy(zero_copy_only=False)
        np.add.at(mat, (i, j), n)
    sizes = np.diag(mat)
    iu, ju = np.triu_indices(k, 1)
    shared = mat[iu, ju]
    hit = shared > 0
    iu, ju, shared = iu[hit], ju[hit], shared[hit]
    union = sizes[iu] + sizes[ju] - shared
    return pa.table({
        "source_a": pa.array(srcs[iu], pa.string()),
        "source_b": pa.array(srcs[ju], pa.string()),
        "n_shared": pa.array(shared, pa.int64()),
        "jaccard": pa.array(shared.astype(np.float64) / union,
                            pa.float64())})


def data_quality_report(sf_dir: str) -> pa.Table:
    """DATA-VALIDATION AUDIT: one row per integrity rule with its
    violation count over the orders/lineitem/customer tables —

      orphan_lineitems      lineitem rows whose l_orderkey has no order
      childless_orders      orders with zero lineitems
      shipped_before_order  lineitems with l_shipdate < o_orderdate
      negative_acctbal      customers with c_acctbal < 0
      high_tax              lineitems with l_tax > 0.06
      duplicate_orderkeys   order rows beyond the first per o_orderkey

    The referential rules (orphans / childless / shipped-before / dup
    keys) all ride ONE tagged-union orderkey exchange (order rows carry
    o_orderdate, lineitem rows carry l_shipdate): each partition sees
    complete key groups and emits six scalar partials, so the driver
    merge is partition-count-sized. The scan rules are per-block
    combiner counts with no exchange. Mixed zero and non-zero counts by
    construction, so the oracle comparison is discriminative."""
    from nise_ray.util import collect_table

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate",
                                        "l_tax"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_acctbal"])

    # --- scan rules: per-block combiner counts, no exchange ----------
    def scan_tax(b: pa.Table) -> pa.Table:
        t = b.column("l_tax").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((t > 0.06).sum())],
                                       pa.int64())})

    def scan_bal(b: pa.Table) -> pa.Table:
        a = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((a < 0).sum())], pa.int64())})

    n_tax = int(collect_table(
        li.map_batches(scan_tax, batch_format="pyarrow",
                       zero_copy_batch=True)).column("n").to_numpy().sum())
    n_bal = int(collect_table(
        cust.map_batches(scan_bal, batch_format="pyarrow",
                         zero_copy_batch=True)).column("n").to_numpy().sum())

    # --- referential rules: one tagged orderkey co-group exchange ----
    def tag_li(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": b.column("l_orderkey"),
            "kind": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            "ts": b.column("l_shipdate").cast(pa.int64()),
        })

    def tag_o(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": b.column("o_orderkey"),
            "kind": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "ts": b.column("o_orderdate").cast(pa.int64()),
        })

    tag_li.__name__, tag_o.__name__ = "TagLineitemDQ", "TagOrdersDQ"
    both = li.map_batches(tag_li, batch_format="pyarrow",
                          zero_copy_batch=True).union(
        orders.map_batches(tag_o, batch_format="pyarrow",
                           zero_copy_batch=True))

    def audit(b: pa.Table) -> pa.Table:
        cols = ["orphan", "childless", "early_ship", "dup_keys"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in cols})
        okey = b.column("okey").to_numpy(zero_copy_only=False)
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, okey))       # orders first per key
        okey, kind, ts = okey[order], kind[order], ts[order]
        starts, counts = segments(okey)
        gid = np.repeat(np.arange(len(starts)), counts)
        is_o = kind == 0
        n_o = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_o, gid[is_o], 1)
        n_l = counts - n_o
        orphan = int(n_l[n_o == 0].sum())
        childless = int(n_o[n_l == 0].sum())   # row semantics, like SQL
        dup = int(np.maximum(n_o - 1, 0).sum())
        # per-key order date = first row of the group when it IS an
        # order (kind sorts orders first); keys with n_o == 0 excluded
        odate = ts[starts]
        valid = (n_o > 0)[gid] & ~is_o
        early = int((valid & (ts < odate[gid])).sum())
        return pa.table({"orphan": pa.array([orphan], pa.int64()),
                         "childless": pa.array([childless], pa.int64()),
                         "early_ship": pa.array([early], pa.int64()),
                         "dup_keys": pa.array([dup], pa.int64())})

    audit.__name__ = "OrderKeyAudit"
    parts = collect_table(hash_group_apply(both, ["okey"], audit, 0,
                                           sort=False))
    tot = {c: int(parts.column(c).to_numpy().sum())
           for c in parts.column_names}
    rules = ["orphan_lineitems", "childless_orders",
             "shipped_before_order", "negative_acctbal", "high_tax",
             "duplicate_orderkeys"]
    vals = [tot["orphan"], tot["childless"], tot["early_ship"],
            n_bal, n_tax, tot["dup_keys"]]
    return pa.table({"rule": pa.array(rules, pa.string()),
                     "n_violations": pa.array(vals, pa.int64())})


def denormalized_orders(sf_dir: str, broadcast_max: int = 1_000_000,
                        mode: str = "auto") -> "ray.data.Dataset":
    """ROW-PRESERVING star-schema denormalization — the wide-table
    export a BI/feature store consumes: every order joined to its
    customer, nation and region attributes with NO aggregation:
    (o_orderkey, o_totalprice, c_name, c_mktsegment, n_name, r_name).

    Scale shape: nation x region (25 x 5) resolve driver-side into one
    nationkey-indexed map; the customer attach is broadcast-gated —
    under the gate a (sorted custkey, attrs) table rides ONE ray.put
    and the whole export is a zero-exchange task-path map over orders;
    past the gate (customer is corpus-scale at 100 TB) it degrades to
    ONE distributed hash join, with the dimension maps still broadcast.
    mode: auto | broadcast | join (parity-tested)."""
    from nise_ray.util import collect_table

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name",
                                          "c_mktsegment", "c_nationkey"])

    nat = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet"))
    reg = collect_table(ray.data.read_parquet(
        f"{sf_dir}/region.parquet"))
    rkeys = reg.column("r_regionkey").to_numpy(zero_copy_only=False)
    rnames = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    rpos = np.argsort(rkeys)
    nkeys = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    norder = np.argsort(nkeys)
    nkeys = nkeys[norder]
    nnames = np.asarray(nat.column("n_name").to_pylist(),
                        dtype=object)[norder]
    nregion = nat.column("n_regionkey").to_numpy(
        zero_copy_only=False)[norder]
    nrnames = rnames[rpos][np.searchsorted(rkeys[rpos], nregion)]
    dim_ref = ray.put((nkeys, nnames, nrnames))

    use_broadcast = mode == "broadcast" or (
        mode == "auto" and cust.count() <= broadcast_max)

    if use_broadcast:
        t = collect_table(cust)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        corder = np.argsort(ck)
        cust_ref = ray.put((
            ck[corder],
            t.column("c_name").take(pa.array(corder)),
            t.column("c_mktsegment").take(pa.array(corder)),
            t.column("c_nationkey").to_numpy(
                zero_copy_only=False)[corder]))

        def widen(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                    "c_name": pa.array([], pa.string()),
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_name": pa.array([], pa.string()),
                    "r_name": pa.array([], pa.string())})
            ck, cn, cs, cnat = ray.get(cust_ref)
            nk, nn, nr = ray.get(dim_ref)
            if len(ck) == 0:            # empty dimension: inner join -> 0
                return widen(b.slice(0, 0))
            key = b.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ck, key), 0, len(ck) - 1)
            found = np.flatnonzero(ck[pos] == key)
            b = b.take(pa.array(found))
            pos = pos[found]
            npos = np.searchsorted(nk, cnat[pos])
            return pa.table({
                "o_orderkey": b.column("o_orderkey"),
                "o_totalprice": b.column("o_totalprice"),
                "c_name": cn.take(pa.array(pos)),
                "c_mktsegment": cs.take(pa.array(pos)),
                "n_name": pa.array(nn[npos], pa.string()),
                "r_name": pa.array(nr[npos], pa.string())})

        widen.__name__ = "DenormalizeOrders"
        return orders.map_batches(widen, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # distributed path: ONE hash join on custkey, dims still broadcast
    from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
    _hash_shuffle_on(orders, cust)
    joined = orders.join(cust, join_type="inner",
                         on=("o_custkey",), right_on=("c_custkey",),
                         num_partitions=_join_partitions())

    def attach_dims(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "c_name": pa.array([], pa.string()),
                "c_mktsegment": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "r_name": pa.array([], pa.string())})
        nk, nn, nr = ray.get(dim_ref)
        npos = np.searchsorted(
            nk, b.column("c_nationkey").to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_totalprice": b.column("o_totalprice"),
            "c_name": b.column("c_name"),
            "c_mktsegment": b.column("c_mktsegment"),
            "n_name": pa.array(nn[npos], pa.string()),
            "r_name": pa.array(nr[npos], pa.string())})

    attach_dims.__name__ = "AttachDims"
    return joined.map_batches(attach_dims, batch_format="pyarrow",
                              zero_copy_batch=True)
