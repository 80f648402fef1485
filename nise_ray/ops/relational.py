"""Relational showcase ops over the TPC-H-ish tables.

`pricing_summary` is the canonical partial-aggregation pattern: each batch
pre-aggregates into (group -> sums) — six groups, so the "shuffle" is a
driver-side merge of tiny partials instead of an all-to-all exchange.
This is the combiner strategy the dedup pipeline uses everywhere, shown
on a plain relational aggregate with a DuckDB oracle.

`segment_revenue` / `top_unshipped_orders` exercise the distributed
`ds.join` primitive end-to-end with DuckDB oracles — the same hash join
the dedup engine's verify_mode="join" (10^12-file configuration) and
large-label attach depend on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from nise_ray.util import collect_table

_FLAGS = {"A": 0, "N": 1, "R": 2}
_STATUS = {"F": 0, "O": 1}
_CUTOFF_US = np.datetime64("1998-09-02", "us").astype(np.int64)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style: per (l_returnflag, l_linestatus) over rows with
    l_shipdate <= 1998-09-02: sum_qty, sum_base_price, sum_disc_price,
    avg_qty, n_rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ts <= _CUTOFF_US
        if not keep.any():
            return pa.table({"key": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.float64()),
                             "sum_base": pa.array([], pa.float64()),
                             "sum_disc": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        b = b.filter(pa.array(keep))
        flags = b.column("l_returnflag").to_pylist()
        status = b.column("l_linestatus").to_pylist()
        key = np.array([_FLAGS[f] * 2 + _STATUS[s]
                        for f, s in zip(flags, status)], dtype=np.int64)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        from nise_ray.ops.groupapply import segments
        starts, counts = segments(key[order])
        return pa.table({
            "key": pa.array(key[order][starts], pa.int64()),
            "sum_qty": pa.array(np.add.reduceat(qty[order], starts), pa.float64()),
            "sum_base": pa.array(np.add.reduceat(price[order], starts), pa.float64()),
            "sum_disc": pa.array(
                np.add.reduceat((price * (1.0 - disc))[order], starts), pa.float64()),
            "n": pa.array(counts, pa.int64()),
        })

    partials = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                            zero_copy_batch=True))
    key = partials.column("key").to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    from nise_ray.ops.groupapply import segments
    starts, _ = segments(key[order])
    agg = {}
    for col in ["sum_qty", "sum_base", "sum_disc", "n"]:
        agg[col] = np.add.reduceat(
            partials.column(col).to_numpy(zero_copy_only=False)[order], starts)
    keys = key[order][starts]
    inv_f = {v: k for k, v in _FLAGS.items()}
    inv_s = {v: k for k, v in _STATUS.items()}
    return pa.table({
        "l_returnflag": pa.array([inv_f[k // 2] for k in keys], pa.string()),
        "l_linestatus": pa.array([inv_s[k % 2] for k in keys], pa.string()),
        "sum_qty": pa.array(np.round(agg["sum_qty"], 2), pa.float64()),
        "sum_base_price": pa.array(np.round(agg["sum_base"], 2), pa.float64()),
        "sum_disc_price": pa.array(np.round(agg["sum_disc"], 2), pa.float64()),
        "avg_qty": pa.array(np.round(agg["sum_qty"] / agg["n"], 4), pa.float64()),
        "n_rows": pa.array(agg["n"], pa.int64()),
    })


def _hash_shuffle_on(*datasets) -> None:
    from nise_ray.ops.groupapply import use_hash_shuffle
    use_hash_shuffle()
    for ds in datasets:
        use_hash_shuffle(ds)


def _join_partitions() -> int:
    """Join partition count derived from the cluster — a fixed count wider
    than the CPU budget deadlocks chained join fleets on small clusters
    (each join's aggregator pool reserves slots concurrently)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(64, cpus))


def _broadcast_side(ds: "ray.data.Dataset", key_col: str, val_col: str,
                    max_rows: int):
    """Scale gate for the broadcast-hash-join path: if the dimension side
    is small enough, collect it ONCE to (sorted keys, values) and ray.put
    the pair — every map task then joins by searchsorted with an equality
    check, no shuffle. Returns None above the gate (caller falls back to
    the distributed hash join). ds.count() on a raw parquet read is
    metadata-only."""
    if ds.count() > max_rows:
        return None
    t = collect_table(ds)
    if t.num_rows == 0:
        # empty dimension side: explicit empty broadcast (collect_table
        # returns a column-less table here, so .column() would raise)
        return ray.put((np.empty(0, dtype=np.int64),
                        pa.array([], pa.string())))
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    keys = keys[order]
    # a duplicate dimension key would silently drop join multiplicity
    # (searchsorted finds one match); real inner-join fan-out needs the
    # distributed path, so fail loudly instead
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise AssertionError(
            f"_broadcast_side: duplicate {key_col} values in broadcast "
            f"dimension table — use the distributed join path")
    vals = t.column(val_col).take(pa.array(order))
    return ray.put((keys, vals))


def _sorted_lookup(sorted_keys: np.ndarray, vals: np.ndarray
                   ) -> "tuple[np.ndarray, np.ndarray]":
    """(positions, membership mask) of `vals` in a SORTED key array —
    the one broadcast-lookup idiom (searchsorted + clip + equality)
    shared by every broadcast-join stage; empty key set -> all-miss."""
    if len(sorted_keys) == 0:
        return (np.zeros(len(vals), dtype=np.int64),
                np.zeros(len(vals), dtype=bool))
    pos = np.clip(np.searchsorted(sorted_keys, vals), 0,
                  len(sorted_keys) - 1)
    return pos, sorted_keys[pos] == vals


def _anchor_sentinel(ds: "ray.data.Dataset",
                     row: "dict[str, tuple[pa.DataType, object]]"
                     ) -> "ray.data.Dataset":
    """Union ONE impossible-key row into a join side. A filtered parquet
    read whose predicate prunes EVERY fragment yields a dataset with no
    blocks at all, and the hash-join aggregator infers each side's
    schema from blocks it actually receives — so a fully-empty side
    fails with 'No match for key field reference' (a ZERO-row anchor
    does not help: the shuffle forwards no block for it). The sentinel
    uses a negative key no real row carries, so an inner join emits
    nothing for it; cost is one row at any scale."""
    t = pa.table({c: pa.array([v], typ) for c, (typ, v) in row.items()})
    return ds.union(ray.data.from_arrow(t))


def _merge_grouped_partials(partials: pa.Table, key_col: str,
                            sum_cols: dict[str, "pa.DataType"],
                            round_cols: dict[str, int] | None = None
                            ) -> pa.Table:
    """Driver-side merge of group-count-sized partial aggregates, fully
    Arrow/numpy (segments + add.reduceat) — replaces the former pandas
    groupby detour (repo rule: no pandas on any path). Keys come out in
    lexicographic order."""
    from nise_ray.ops.groupapply import segments
    round_cols = round_cols or {}
    if partials.num_rows == 0:
        return pa.table({key_col: pa.array([], pa.string()),
                         **{c: pa.array([], t) for c, t in sum_cols.items()}})
    enc = partials.column(key_col).combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    vocab_order = np.argsort(vocab)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[vocab_order] = np.arange(len(vocab))
    order = np.argsort(rank[codes], kind="stable")
    starts, _ = segments(rank[codes][order])
    out: dict[str, pa.Array] = {
        key_col: pa.array(vocab[vocab_order], pa.string())}
    for col, typ in sum_cols.items():
        v = partials.column(col).to_numpy(zero_copy_only=False)
        s = np.add.reduceat(v[order], starts)
        if col in round_cols:
            s = np.round(s, round_cols[col])
        out[col] = pa.array(s, typ)
    return pa.table(out)


def segment_revenue(sf_dir: str, broadcast_max: int = 5_000_000) -> pa.Table:
    """orders ⋈ customer, then revenue per market segment:
    (c_mktsegment, n_orders, total_price). Scale-adaptive join: when the
    customer side fits the broadcast gate it is ray.put once and the join
    is a vectorized per-batch lookup over streaming orders (NO exchange);
    beyond the gate it falls back to the distributed hash join (the
    10^12-row configuration, kept oracled via the forced-gate test). The
    5-group aggregate is a per-batch combiner + tiny driver merge either
    way."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    ref = _broadcast_side(cust, "c_custkey", "c_mktsegment", broadcast_max)
    if ref is not None:
        class AttachSegment:
            def __init__(self) -> None:
                self.keys, self.vals = ray.get(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(self.keys, ck), 0,
                              max(len(self.keys) - 1, 0))
                hit = (self.keys[pos] == ck) if len(self.keys) else \
                    np.zeros(len(ck), dtype=bool)  # inner-join semantics
                return pa.table({
                    "c_mktsegment": self.vals.take(pa.array(pos[hit])),
                    "o_totalprice": b.column("o_totalprice").filter(
                        pa.array(hit)),
                })

        from nise_ray.ops.groupapply import default_concurrency
        joined = orders.map_batches(AttachSegment, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    concurrency=default_concurrency())
    else:
        _hash_shuffle_on(orders, cust)
        joined = orders.join(cust, join_type="inner",
                             num_partitions=_join_partitions(),
                             on=("o_custkey",), right_on=("c_custkey",))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64()),
                             "total_price": pa.array([], pa.float64())})
        seg = b.column("c_mktsegment").combine_chunks().dictionary_encode()
        codes = seg.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        from nise_ray.ops.groupapply import segments
        starts, counts = segments(codes[order])
        firsts = order[starts]
        return pa.table({
            "c_mktsegment": pa.array(
                [seg[i].as_py() for i in firsts], pa.string()),
            "n_orders": pa.array(counts, pa.int64()),
            "total_price": pa.array(np.add.reduceat(price[order], starts),
                                    pa.float64()),
        })

    partials = collect_table(joined.map_batches(partial, batch_format="pyarrow",
                                                zero_copy_batch=True))
    return _merge_grouped_partials(
        partials, "c_mktsegment",
        {"n_orders": pa.int64(), "total_price": pa.float64()},
        round_cols={"total_price": 2})


_Q3_CUTOFF_US = np.datetime64("1995-03-15", "us").astype(np.int64)


def top_unshipped_orders(sf_dir: str, segment: str = "BUILDING",
                         k: int = 10,
                         broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q3-style three-table pipeline: customer (filtered to one
    segment) ⋈ orders (filtered o_orderdate < cutoff) ⋈ lineitem
    (filtered l_shipdate > cutoff), revenue per order, top-k by revenue.
    Scale-adaptive: each dimension side below the broadcast gate (checked
    on metadata row counts, no execution barrier) becomes a ray.put
    lookup inside map_batches (semi-join membership filter for customer,
    orderkey→orderdate attach for orders); above the gate that step is a
    distributed hash join. The per-order aggregate is one hash exchange;
    top-k is per-block pre-top-k + driver merge (no global sort)."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def f_cust(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("c_mktsegment"), segment)) \
                .select(["c_custkey"])

    def f_orders(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ts < _Q3_CUTOFF_US))

    def f_li(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ts > _Q3_CUTOFF_US))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "rev": pa.array(price * (1.0 - disc), pa.float64()),
        })

    cust_f = cust.map_batches(f_cust, batch_format="pyarrow", zero_copy_batch=True)
    orders_f = orders.map_batches(f_orders, batch_format="pyarrow",
                                  zero_copy_batch=True)
    li_f = li.map_batches(f_li, batch_format="pyarrow", zero_copy_batch=True)

    from nise_ray.ops.groupapply import default_concurrency

    # join 1: orders ⋉ customer-in-segment (membership only)
    if cust.count() <= broadcast_max:
        ck = collect_table(cust_f).column("c_custkey") \
            .to_numpy(zero_copy_only=False)
        ck_ref = ray.put(np.sort(ck))

        class SemiJoinCust:
            def __init__(self) -> None:
                self.keys = ray.get(ck_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ok = b.column("o_custkey").to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(self.keys, ok), 0,
                              max(len(self.keys) - 1, 0))
                hit = (self.keys[pos] == ok) if len(self.keys) else \
                    np.zeros(len(ok), dtype=bool)
                return b.filter(pa.array(hit)) \
                        .select(["o_orderkey", "o_orderdate"])

        j1 = orders_f.map_batches(SemiJoinCust, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  concurrency=default_concurrency())
    else:
        _hash_shuffle_on(cust_f, orders_f)
        j1 = orders_f.join(cust_f, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("o_custkey",), right_on=("c_custkey",))

    # join 2: lineitem ⋈ surviving orders (attach o_orderdate)
    if orders.count() <= broadcast_max:
        ot = collect_table(j1.select_columns(["o_orderkey", "o_orderdate"]))
        okeys = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        oorder = np.argsort(okeys)
        od_ref = ray.put((okeys[oorder],
                          ot.column("o_orderdate").take(pa.array(oorder))))

        class AttachOrderdate:
            def __init__(self) -> None:
                self.keys, self.dates = ray.get(od_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(self.keys, lk), 0,
                              max(len(self.keys) - 1, 0))
                hit = (self.keys[pos] == lk) if len(self.keys) else \
                    np.zeros(len(lk), dtype=bool)
                return pa.table({
                    "l_orderkey": b.column("l_orderkey").filter(pa.array(hit)),
                    "rev": b.column("rev").filter(pa.array(hit)),
                    "o_orderdate": self.dates.take(pa.array(pos[hit])),
                })

        j2 = li_f.map_batches(AttachOrderdate, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=default_concurrency())
    else:
        _hash_shuffle_on(li_f)
        j2 = li_f.join(j1.select_columns(["o_orderkey", "o_orderdate"]),
                       join_type="inner", num_partitions=_join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    from nise_ray.ops.groupapply import hash_group_apply, segments

    def per_order(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64()),
                             "o_orderdate": pa.array([], pa.timestamp("us"))})
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        sums = np.add.reduceat(rev, starts)
        out = pa.table({
            "l_orderkey": pa.array(keys[starts], pa.int64()),
            "revenue": pa.array(np.round(sums, 2), pa.float64()),
            "o_orderdate": b.column("o_orderdate").take(pa.array(starts)),
        })
        # per-block pre-top-k: only k candidate rows leave each partition
        if out.num_rows > k:
            r = out.column("revenue").to_numpy(zero_copy_only=False)
            kk = out.column("l_orderkey").to_numpy(zero_copy_only=False)
            keep = np.lexsort((kk, -r))[:k]
            out = out.take(pa.array(np.sort(keep)))
        return out

    agg = hash_group_apply(j2, ["l_orderkey"], per_order)
    t = collect_table(agg)
    if t.num_rows == 0:
        return t
    r = t.column("revenue").to_numpy(zero_copy_only=False)
    kk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    keep = np.lexsort((kk, -r))[:k]
    return t.take(pa.array(keep))


def nation_revenue(sf_dir: str) -> pa.Table:
    """Revenue per nation: the BROADCAST-small-side join pattern. The
    25-row nation table is ray.put ONCE and looked up vectorized inside
    map_batches over customer (no shuffle for the dimension join); only
    the orders ⋈ customer join is a distributed exchange. Returns
    (n_name, n_orders, total_price)."""
    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    nk = nation_t.column("n_nationkey").to_numpy(zero_copy_only=False)
    order_nk = np.argsort(nk)
    nation_ref = ray.put((nk[order_nk],
                          np.array(nation_t.column("n_name").to_pylist(),
                                   dtype=object)[order_nk]))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    class AttachNation:
        def __init__(self) -> None:
            self.keys, self.names = ray.get(nation_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            cnk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, cnk), 0,
                          len(self.keys) - 1)
            if not (self.keys[pos] == cnk).all():
                raise AssertionError("c_nationkey missing from nation table")
            return pa.table({
                "c_custkey": b.column("c_custkey"),
                "n_name": pa.array(self.names[pos], pa.string()),
            })

    from nise_ray.ops.groupapply import default_concurrency
    cust_n = cust.map_batches(AttachNation, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=default_concurrency())
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    _hash_shuffle_on(cust_n, orders)
    joined = orders.join(cust_n, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64()),
                             "total_price": pa.array([], pa.float64())})
        names = b.column("n_name").combine_chunks().dictionary_encode()
        codes = names.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        from nise_ray.ops.groupapply import segments
        starts, counts = segments(codes[order])
        firsts = order[starts]
        return pa.table({
            "n_name": pa.array([names[i].as_py() for i in firsts], pa.string()),
            "n_orders": pa.array(counts, pa.int64()),
            "total_price": pa.array(np.add.reduceat(price[order], starts),
                                    pa.float64()),
        })

    partials = collect_table(joined.map_batches(partial, batch_format="pyarrow",
                                                zero_copy_batch=True))
    return _merge_grouped_partials(
        partials, "n_name",
        {"n_orders": pa.int64(), "total_price": pa.float64()},
        round_cols={"total_price": 2})


def customers_without_orders(sf_dir: str,
                             min_price: float = 350_000.0,
                             broadcast_max: int = 5_000_000) -> pa.Table:
    """Distributed ANTI JOIN: customers with no order above `min_price`,
    rolled up to (c_nationkey, n_customers). The order side is filtered
    AT THE READ (predicate pushdown — only qualifying row groups leave
    storage) and shrunk to its DISTINCT custkeys with a per-batch
    combiner + one hash exchange (|customers|-bounded, never
    |orders|-sized). When the distinct set fits the `broadcast_max` gate
    it is broadcast once via ray.put into a vectorized NOT-IN filter over
    customer batches (np.searchsorted on the sorted key set); above the
    gate the same filter runs as Ray Data's distributed `left_anti` hash
    join on the custkey exchange (parity-tested against the broadcast
    path in tests/test_relational_joins.py)."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > min_price)

    def local_distinct(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(np.unique(ck), pa.int64())})

    distinct = hash_group_apply(orders.map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], local_distinct, 0, sort=False)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    # the distinct key set is bounded by |customer| (metadata-only count)
    if cust.count() <= broadcast_max:
        dt = collect_table(distinct)
        # no order clears min_price -> column-less empty collect
        keys = np.unique(dt.column("o_custkey").to_numpy(
            zero_copy_only=False)) if dt.num_rows else \
            np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)

        class AntiFilter:
            def __init__(self) -> None:
                self.keys = ray.get(keys_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.keys, ck)
                pos = np.clip(pos, 0, max(len(self.keys) - 1, 0))
                has = (self.keys[pos] == ck) if len(self.keys) else \
                    np.zeros(len(ck), dtype=bool)
                return b.filter(pa.array(~has))

        lonely = cust.map_batches(AntiFilter, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  concurrency=default_concurrency())
    else:
        # a min_price that prunes every fragment leaves distinct with ZERO
        # blocks and the join aggregator cannot infer its schema; the -1
        # sentinel matches no real c_custkey, so left_anti keeps all rows
        distinct = _anchor_sentinel(distinct, {"o_custkey": (pa.int64(), -1)})
        _hash_shuffle_on(cust, distinct)
        lonely = cust.join(distinct, join_type="left_anti",
                           num_partitions=_join_partitions(),
                           on=("c_custkey",), right_on=("o_custkey",))

    def partial_rollup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "n_customers": pa.array([], pa.int64())})
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        order = np.argsort(nk, kind="stable")
        starts, counts = segments(nk[order])
        return pa.table({"c_nationkey": pa.array(nk[order][starts], pa.int64()),
                         "n_customers": pa.array(counts, pa.int64())})

    def merge_rollup(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "n_customers": pa.array([], pa.int64())})
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        n = b.column("n_customers").to_numpy(zero_copy_only=False)
        order = np.argsort(nk, kind="stable")
        starts, _ = segments(nk[order])
        return pa.table({"c_nationkey": pa.array(nk[order][starts], pa.int64()),
                         "n_customers": pa.array(
                             np.add.reduceat(n[order], starts), pa.int64())})

    out = hash_group_apply(lonely.map_batches(
        partial_rollup, batch_format="pyarrow", zero_copy_batch=True),
        ["c_nationkey"], merge_rollup, 0, sort=False)
    t = collect_table(out)
    if t.num_columns == 0:  # no lonely customers at all
        t = pa.table({"c_nationkey": pa.array([], pa.int64()),
                      "n_customers": pa.array([], pa.int64())})
    return t.sort_by([("c_nationkey", "ascending")])


def local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                           date_lo: str = "1996-01-01",
                           date_hi: str = "1997-01-01",
                           broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q5-shaped MULTI-JOIN CHAIN: revenue per nation from
    lineitems whose customer and supplier sit in the SAME nation of one
    region, over an order-date window. Six tables compose as two
    distributed hash exchanges plus broadcasts, never a third:

    - nation ⋈ region resolve on the driver (both tiny) into a
      region-nation key set + name map, ray.put ONCE;
    - customer is filtered to the region and projected to
      (c_custkey, c_nationkey) inside map_batches (no exchange);
    - orders has the date window pushed INTO the parquet read, then one
      distributed join on custkey → (o_orderkey, c_nationkey);
    - supplier joins lineitem through the scale-gated broadcast
      (suppkey → s_nationkey, region rows only) or, above the gate,
      Ray Data's distributed hash join on l_suppkey;
    - the second distributed exchange joins on orderkey, the same-nation
      predicate filters vectorized, and revenue partial-aggregates per
      nation inside each block — only |nations-in-region| rows reach the
      driver merge.

    Returns (n_name, revenue) sorted by revenue DESC."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import segments

    nation_t = collect_table(ray.data.read_parquet(f"{sf_dir}/nation.parquet"))
    region_t = collect_table(ray.data.read_parquet(f"{sf_dir}/region.parquet"))
    rkeys = region_t.filter(pc.equal(region_t.column("r_name"), region)) \
        .column("r_regionkey").to_numpy(zero_copy_only=False)
    in_region = nation_t.filter(
        pc.is_in(nation_t.column("n_regionkey"),
                 value_set=pa.array(rkeys, pa.int64())))
    nat_keys = in_region.column("n_nationkey").to_numpy(zero_copy_only=False)
    if len(nat_keys) == 0:
        # unknown region: the inner joins are vacuously empty, and a
        # fully-empty map stage would feed the hash join a schema-less
        # right side — short-circuit with the typed empty result
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    order = np.argsort(nat_keys)
    nat_ref = ray.put((nat_keys[order],
                       np.array(in_region.column("n_name").to_pylist(),
                                dtype=object)[order]))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    # All three lookup stages below are task-path closures over ray.put
    # refs, NOT actor pools: their only state is a zero-copy plasma read,
    # and a plan chaining two JoinOperators (8 aggregator actors at
    # num_partitions=4) plus three reserved actor pools deadlocks a
    # 4-CPU cluster — task pools yield CPUs to the join aggregators.
    def region_cust(b: pa.Table) -> pa.Table:
        """Keep only customers whose nation is in the region (25-row
        broadcast membership test — never a shuffle). c_nationkey is
        normalized to int64 (parquet stores int32) so the sentinel
        union below is schema-uniform."""
        keys, _ = ray.get(nat_ref)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, nk), 0, len(keys) - 1)
        keep = keys[pos] == nk
        return pa.table({
            "c_custkey": b.column("c_custkey").filter(pa.array(keep)),
            "c_nationkey": pa.array(nk[keep].astype(np.int64), pa.int64()),
        })

    region_cust.__name__ = "RegionCust"
    cust_r = cust.map_batches(region_cust, batch_format="pyarrow",
                              zero_copy_batch=True)
    # the customer sentinel pairs with the orders sentinel below so ONE
    # row survives the first join even when the date window is empty —
    # otherwise the second join's right side receives no block and the
    # aggregator cannot infer its schema; the -1 orderkey then matches
    # no lineitem, so the final output is unaffected
    cust_r = _anchor_sentinel(cust_r, {"c_custkey": (pa.int64(), -1),
                                       "c_nationkey": (pa.int64(), -1)})

    lo = np.datetime64(date_lo, "us").astype("datetime64[us]").item()
    hi = np.datetime64(date_hi, "us").astype("datetime64[us]").item()
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo)
               & (pads.field("o_orderdate") < hi))
    orders = _anchor_sentinel(orders, {"o_orderkey": (pa.int64(), -1),
                                       "o_custkey": (pa.int64(), -1)})
    _hash_shuffle_on(orders, cust_r)
    ordcust = orders.join(cust_r, join_type="inner",
                          num_partitions=_join_partitions(),
                          on=("o_custkey",), right_on=("c_custkey",))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_nationkey"])

    if supp.count() <= broadcast_max:
        st = collect_table(supp)
        sk = st.column("s_suppkey").to_numpy(zero_copy_only=False)
        sn = st.column("s_nationkey").to_numpy(zero_copy_only=False)
        so = np.argsort(sk)
        supp_ref = ray.put((sk[so], sn[so]))

        def attach_supplier_nation(b: pa.Table) -> pa.Table:
            """suppkey → s_nationkey lookup, dropping non-region
            suppliers; revenue computed in the same pass."""
            sk, sn = ray.get(supp_ref)
            region_keys, _ = ray.get(nat_ref)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
            if len(sk) == 0:
                return pa.table({
                    "l_orderkey": pa.array([], pa.int64()),
                    "s_nationkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.float64())})
            pos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
            if not (sk[pos] == lsk).all():
                raise AssertionError("l_suppkey missing from supplier table")
            nat = sn[pos]
            if len(region_keys):
                rpos = np.clip(np.searchsorted(region_keys, nat),
                               0, len(region_keys) - 1)
                keep = region_keys[rpos] == nat
            else:
                keep = np.zeros(len(nat), dtype=bool)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": b.column("l_orderkey").take(
                    pa.array(np.flatnonzero(keep))),
                "s_nationkey": pa.array(nat[keep], pa.int64()),
                "rev": pa.array((price * (1.0 - disc))[keep], pa.float64()),
            })

        attach_supplier_nation.__name__ = "AttachSupplierNation"
        li_s = li.map_batches(attach_supplier_nation, batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        # 10^12-row configuration: supplier exceeds the broadcast gate —
        # distributed hash join on suppkey, then the same region filter
        # and revenue projection as a stateless pass
        _hash_shuffle_on(li, supp)
        li_j = li.join(supp, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_suppkey",), right_on=("s_suppkey",))

        def region_revenue(b: pa.Table) -> pa.Table:
            region_keys, _ = ray.get(nat_ref)
            nat = b.column("s_nationkey").to_numpy(zero_copy_only=False)
            if len(region_keys):
                rpos = np.clip(np.searchsorted(region_keys, nat),
                               0, len(region_keys) - 1)
                keep = region_keys[rpos] == nat
            else:
                keep = np.zeros(len(nat), dtype=bool)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": b.column("l_orderkey").take(
                    pa.array(np.flatnonzero(keep))),
                "s_nationkey": pa.array(nat[keep], pa.int64()),
                "rev": pa.array((price * (1.0 - disc))[keep], pa.float64()),
            })

        region_revenue.__name__ = "RegionRevenue"
        li_s = li_j.map_batches(region_revenue, batch_format="pyarrow",
                                zero_copy_batch=True)

    _hash_shuffle_on(li_s, ordcust)
    joined = li_s.join(ordcust, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def nation_partial(b: pa.Table) -> pa.Table:
        """Same-nation filter + per-block revenue partials keyed by
        n_name (names resolved from the 25-row broadcast, so the driver
        merge needs no further lookup)."""
        keys, names = ray.get(nat_ref)
        if b.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
        snat = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        cnat = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = snat == cnat
        if not keep.any():
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
        nat = snat[keep]
        rev = b.column("rev").to_numpy(zero_copy_only=False)[keep]
        order = np.argsort(nat, kind="stable")
        starts, _ = segments(nat[order])
        firsts = nat[order][starts]
        pos = np.searchsorted(keys, firsts)
        return pa.table({
            "n_name": pa.array(names[pos], pa.string()),
            "revenue": pa.array(np.add.reduceat(rev[order], starts),
                                pa.float64()),
        })

    nation_partial.__name__ = "NationPartial"
    partials = collect_table(joined.map_batches(
        nation_partial, batch_format="pyarrow", zero_copy_batch=True))
    out = _merge_grouped_partials(partials, "n_name",
                                  {"revenue": pa.float64()},
                                  round_cols={"revenue": 2})
    return out.sort_by([("revenue", "descending"), ("n_name", "ascending")])


def order_priority_counts(sf_dir: str, date_lo: str = "1996-01-01",
                          date_hi: str = "1996-07-01", flag: str = "R",
                          broadcast_max: int = 5_000_000,
                          semi_mode: str = "auto",
                          bloom_bits: int = 1 << 20) -> pa.Table:
    """TPC-H-Q4-shaped positive SEMI JOIN (EXISTS): count orders per
    o_orderpriority, within an order-date window, that have at least one
    lineitem with l_returnflag = `flag`. The complement of the anti-join
    in customers_without_orders, same scale shape: the EXISTS side is
    shrunk to DISTINCT l_orderkey with a per-batch combiner + one
    orders-bounded hash exchange, then either broadcast into a
    vectorized IN filter (under the gate) or applied as a distributed
    inner join on the already-distinct key set (which preserves
    semi-join semantics — no multiplicity). Both predicates are pushed
    into the parquet reads. Returns (o_orderpriority, n_orders) in
    priority order.

    semi_mode: "auto" resolves to "broadcast" under the gate, "join"
    above it. "bloom" is the THIRD scale shape: a fixed-size Bloom
    bitmap (``bloom_bits``, k=4 double hashing, partial bitmaps OR-merge
    — a constant-size broadcast no matter how many distinct keys) first
    prefilters the probe side with zero false negatives, then the
    distributed confirm join runs only on the survivors — at 10^12 rows
    this cuts the join's shuffle volume to the match rate plus the
    bitmap's false-positive rate while broadcasting ~KB, not the key
    set. Parity-tested against both exact modes, including a
    deliberately undersized bitmap (false positives confirmed away)."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"],
                               filter=pads.field("l_returnflag") == flag)

    def local_distinct(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": pa.array(np.unique(ok), pa.int64())})

    distinct = hash_group_apply(li.map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], local_distinct, 0, sort=False)

    lo = np.datetime64(date_lo, "us").astype("datetime64[us]").item()
    hi = np.datetime64(date_hi, "us").astype("datetime64[us]").item()
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo)
               & (pads.field("o_orderdate") < hi))


    # Gate on the UNFILTERED row count: parquet metadata answers it
    # without a scan (a .count() on the filtered `orders` read would
    # execute the whole filtered scan just to pick the path), and it is
    # a valid upper bound on the distinct key set either way.
    n_orders_meta = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]).count()
    if semi_mode == "auto":
        semi_mode = ("broadcast" if n_orders_meta <= broadcast_max
                     else "join")
    if semi_mode not in ("broadcast", "join", "bloom"):
        raise ValueError(f"unknown semi_mode {semi_mode!r}")

    if semi_mode == "bloom":
        # fixed-size Bloom prefilter: partial bitmaps over the distinct
        # key Dataset, OR-merged on the driver (mergeable, constant
        # size), broadcast once; k=4 double hashing over splitmix64
        from nise_ray.hashing import splitmix64
        nbits = np.uint64(bloom_bits)
        nwords = bloom_bits // 64

        def _bloom_idx(keys: np.ndarray, j: int) -> np.ndarray:
            h1 = splitmix64(keys)
            h2 = splitmix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) \
                | np.uint64(1)
            return (h1 + np.uint64(j) * h2) % nbits

        def bloom_partial(b: pa.Table) -> pa.Table:
            arr = np.zeros(nwords, np.uint64)
            if b.num_rows:
                keys = b.column("l_orderkey") \
                    .to_numpy(zero_copy_only=False).astype(np.uint64)
                for j in range(4):
                    idx = _bloom_idx(keys, j)
                    np.bitwise_or.at(
                        arr, (idx >> np.uint64(6)).astype(np.int64),
                        np.uint64(1) << (idx & np.uint64(63)))
            return pa.table({"bm": pa.array([arr.tobytes()], pa.binary())})

        parts = collect_table(distinct.map_batches(
            bloom_partial, batch_format="pyarrow", zero_copy_batch=True))
        bitmap = np.zeros(nwords, np.uint64)
        for r in range(parts.num_rows):
            bitmap |= np.frombuffer(parts.column("bm")[r].as_py(),
                                    np.uint64)
        bm_ref = ray.put(bitmap)

        class BloomPrefilter:
            def __init__(self) -> None:
                self.bm = ray.get(bm_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return b
                ok = b.column("o_orderkey") \
                    .to_numpy(zero_copy_only=False).astype(np.uint64)
                hit = np.ones(len(ok), dtype=bool)
                for j in range(4):
                    idx = _bloom_idx(ok, j)
                    word = self.bm[(idx >> np.uint64(6)).astype(np.int64)]
                    hit &= ((word >> (idx & np.uint64(63)))
                            & np.uint64(1)).astype(bool)
                return b.filter(pa.array(hit))

        orders = orders.map_batches(BloomPrefilter, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    concurrency=default_concurrency())
        semi_mode = "join"  # exact confirm join on the survivors

    if semi_mode == "broadcast":
        dt = collect_table(distinct)
        # a fully-empty EXISTS side collects as a column-less table
        keys = np.unique(dt.column("l_orderkey").to_numpy(
            zero_copy_only=False)) if dt.num_rows else \
            np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)

        class SemiFilter:
            def __init__(self) -> None:
                self.keys = ray.get(keys_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
                if len(self.keys) == 0:
                    return b.slice(0, 0)
                pos = np.clip(np.searchsorted(self.keys, ok), 0,
                              len(self.keys) - 1)
                return b.filter(pa.array(self.keys[pos] == ok))

        matched = orders.map_batches(SemiFilter, batch_format="pyarrow",
                                     zero_copy_batch=True,
                                     concurrency=default_concurrency())
    else:
        # distinct sentinel -2 and orders sentinel -1 cannot match each
        # other or any real key, so the inner join stays exact
        orders_j = _anchor_sentinel(orders, {
            "o_orderkey": (pa.int64(), -1),
            "o_orderpriority": (pa.string(), "")})
        dist_j = _anchor_sentinel(distinct, {"l_orderkey": (pa.int64(), -2)})
        _hash_shuffle_on(orders_j, dist_j)
        matched = orders_j.join(dist_j, join_type="inner",
                                num_partitions=_join_partitions(),
                                on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64())})
        pr = b.column("o_orderpriority").combine_chunks().dictionary_encode()
        codes = pr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, counts = segments(codes[order])
        return pa.table({
            "o_orderpriority": pr.dictionary.take(
                pa.array(codes[order][starts])).cast(pa.string()),
            "n_orders": pa.array(counts, pa.int64()),
        })

    partials = collect_table(matched.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True))
    return _merge_grouped_partials(partials, "o_orderpriority",
                                   {"n_orders": pa.int64()})


def promo_revenue_share(sf_dir: str, date_lo: str = "1996-01-01",
                        date_hi: str = "1996-04-01",
                        broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q14-shaped dimension join + conditional aggregate: the share
    of lineitem revenue in a ship-date window that comes from PROMO-type
    parts. part is a dimension table (fact/dimension ratio stays ~30:1 at
    every scale), so under the gate it broadcasts as a sorted
    partkey→is-promo bitmap into a task-path lookup — the revenue
    partials then reduce to TWO numbers per block, no exchange at all;
    above the gate it is a distributed hash join on partkey followed by
    the same partials. Returns one row:
    (promo_revenue, total_revenue, promo_share_pct)."""
    import pyarrow.dataset as pads

    lo = np.datetime64(date_lo, "us").astype("datetime64[us]").item()
    hi = np.datetime64(date_hi, "us").astype("datetime64[us]").item()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi))

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"])

    def partials_from(promo_col: str):
        def partial(b: pa.Table) -> pa.Table:
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            rev = price * (1.0 - disc)
            promo = b.column(promo_col).to_numpy(zero_copy_only=False)
            return pa.table({
                "promo_rev": pa.array([float(rev[promo].sum())], pa.float64()),
                "total_rev": pa.array([float(rev.sum())], pa.float64()),
            })
        return partial

    if part.count() <= broadcast_max:
        pt = collect_table(part)
        pk = pt.column("p_partkey").to_numpy(zero_copy_only=False)
        is_promo = pc.equal(pt.column("p_type"), "PROMO") \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        ref = ray.put((pk[order], is_promo[order]))

        def attach_promo(b: pa.Table) -> pa.Table:
            keys, promo = ray.get(ref)
            lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return pa.table({"promo_rev": pa.array([0.0], pa.float64()),
                                 "total_rev": pa.array([0.0], pa.float64())})
            pos = np.clip(np.searchsorted(keys, lpk), 0, len(keys) - 1)
            if not (keys[pos] == lpk).all():
                raise AssertionError("l_partkey missing from part table")
            return pa.table({"is_promo": pa.array(promo[pos], pa.bool_()),
                             "l_extendedprice": b.column("l_extendedprice"),
                             "l_discount": b.column("l_discount")})

        attach_promo.__name__ = "AttachPromo"
        joined = li.map_batches(attach_promo, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        # dimension side above the gate: distributed hash join on partkey
        def promo_flag(b: pa.Table) -> pa.Table:
            return pa.table({
                "p_partkey": b.column("p_partkey"),
                "is_promo": pc.equal(b.column("p_type"), "PROMO")})

        part_f = part.map_batches(promo_flag, batch_format="pyarrow",
                                  zero_copy_batch=True)
        li_j = _anchor_sentinel(li, {"l_partkey": (pa.int64(), -1),
                                     "l_extendedprice": (pa.float64(), 0.0),
                                     "l_discount": (pa.float64(), 0.0)})
        _hash_shuffle_on(li_j, part_f)
        joined = li_j.join(part_f, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("l_partkey",), right_on=("p_partkey",))

    partials = collect_table(joined.map_batches(
        partials_from("is_promo"), batch_format="pyarrow",
        zero_copy_batch=True))
    promo = float(np.sum(partials.column("promo_rev").to_numpy(
        zero_copy_only=False))) if partials.num_rows else 0.0
    total = float(np.sum(partials.column("total_rev").to_numpy(
        zero_copy_only=False))) if partials.num_rows else 0.0
    share = round(100.0 * promo / total, 4) if total else 0.0
    return pa.table({
        "promo_revenue": pa.array([round(promo, 2)], pa.float64()),
        "total_revenue": pa.array([round(total, 2)], pa.float64()),
        "promo_share_pct": pa.array([share], pa.float64()),
    })


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#4",
                           factor: float = 0.2,
                           broadcast_max: int = 5_000_000) -> pa.Table:
    """Per-group SCALAR-SUBQUERY pattern (TPC-H Q17 shape): revenue from
    lineitems of one brand's parts whose quantity falls below
    `factor` x that part's average quantity. The correlated subquery
    becomes two passes:

      pass 1  per-part (n, sum_qty) combiner over the brand's lineitems
              -> selected-parts-sized threshold map thr = factor * avg
      pass 2  re-scan, keep l_quantity < thr[l_partkey], sum revenue

    Under `broadcast_max` the brand's partkey set and the threshold map
    travel by ray.put (each is |part|/n_brands-sized — statistics, not
    corpus); above it both attaches run as distributed hash joins with
    anchor sentinels (the 10^12-row configuration). Threshold floats are
    reproducible: per-part quantity sums are exact integers in double,
    so factor * (s/n) is bit-identical to SQL's 0.2 * avg()."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import hash_group_apply, segments

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_partkey"],
                                  filter=pads.field("p_brand") == brand)

    def qty_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        starts, counts = segments(pk[order])
        return pa.table({
            "l_partkey": pa.array(pk[order][starts], pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "s": pa.array(np.add.reduceat(q[order], starts), pa.float64()),
        })

    def qty_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "thr": pa.array([], pa.float64())})
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        starts, _ = segments(pk[order])
        ns = np.add.reduceat(n[order], starts).astype(np.float64)
        ss = np.add.reduceat(s[order], starts)
        return pa.table({
            "l_partkey": pa.array(pk[order][starts], pa.int64()),
            "thr": pa.array(factor * (ss / ns), pa.float64()),
        })

    # metadata-only gate: the selected set is bounded by |part|
    n_part_meta = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                        columns=["p_partkey"]).count()
    broadcast = n_part_meta <= broadcast_max

    li1 = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_partkey", "l_quantity"])
    li2 = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    if broadcast:
        pt = collect_table(parts)
        keys = np.sort(pt.column("p_partkey").to_numpy(
            zero_copy_only=False)) if pt.num_rows else \
            np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)

        def member_filter(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            _, hit = _sorted_lookup(ks, pk)
            return b.filter(pa.array(hit))

        partials = collect_table(
            li1.map_batches(member_filter, batch_format="pyarrow",
                            zero_copy_batch=True)
               .map_batches(qty_partial, batch_format="pyarrow",
                            zero_copy_batch=True))
        thr_t = qty_merge(partials)
        tk = thr_t.column("l_partkey").to_numpy(zero_copy_only=False)
        tv = thr_t.column("thr").to_numpy(zero_copy_only=False)
        thr_ref = ray.put((tk, tv))

        def pass2(b: pa.Table) -> pa.Table:
            ks, thr = ray.get(thr_ref)
            if len(ks) == 0:
                return pa.table({"rev": pa.array([0.0], pa.float64())})
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            q = b.column("l_quantity").to_numpy(zero_copy_only=False)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            pos, hit = _sorted_lookup(ks, pk)
            keep = hit & (q < thr[pos])
            return pa.table({"rev": pa.array([float(price[keep].sum())],
                                             pa.float64())})

        rev_parts = collect_table(li2.map_batches(
            pass2, batch_format="pyarrow", zero_copy_batch=True))
    else:
        parts_j = _anchor_sentinel(parts, {"p_partkey": (pa.int64(), -1)})
        _hash_shuffle_on(li1, parts_j)
        joined1 = li1.join(parts_j, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("l_partkey",), right_on=("p_partkey",))
        partials1 = joined1.map_batches(qty_partial, batch_format="pyarrow",
                                        zero_copy_batch=True)
        thr_ds = hash_group_apply(partials1, ["l_partkey"], qty_merge, 0,
                                  sort=False)
        # rename so the join output keeps both the threshold and the
        # lineitem's own l_partkey distinct
        thr_ds = thr_ds.map_batches(
            lambda b: b.rename_columns(["thr_partkey", "thr"]),
            batch_format="pyarrow", zero_copy_batch=True)
        thr_ds = _anchor_sentinel(thr_ds, {"thr_partkey": (pa.int64(), -1),
                                           "thr": (pa.float64(), 0.0)})
        _hash_shuffle_on(li2, thr_ds)
        joined2 = li2.join(thr_ds, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("l_partkey",), right_on=("thr_partkey",))

        def pass2_joined(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"rev": pa.array([0.0], pa.float64())})
            q = b.column("l_quantity").to_numpy(zero_copy_only=False)
            thr = b.column("thr").to_numpy(zero_copy_only=False)
            price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            keep = q < thr
            return pa.table({"rev": pa.array([float(price[keep].sum())],
                                             pa.float64())})

        rev_parts = collect_table(joined2.map_batches(
            pass2_joined, batch_format="pyarrow", zero_copy_batch=True))

    total = float(np.sum(rev_parts.column("rev").to_numpy(
        zero_copy_only=False))) if rev_parts.num_rows else 0.0
    return pa.table({"avg_yearly": pa.array([round(total / 7.0, 2)],
                                            pa.float64())})


def large_volume_customers(sf_dir: str, min_qty: float = 200.0,
                           k: int = 100,
                           broadcast_max: int = 5_000_000) -> pa.Table:
    """HAVING + join-back pattern (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds `min_qty`, joined back to orders and
    customer for the top-k by order value. The HAVING filter runs where
    it belongs — per-orderkey combiner partials, ONE hash exchange,
    threshold applied inside the merge — so only the qualifying (tiny by
    construction) order set flows into the join-back. Under
    `broadcast_max` the hot set travels by ray.put and customer names
    attach via a second result-sized broadcast; above it both attaches
    are distributed hash joins with anchor sentinels. Returns (c_name,
    c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty) sorted
    by o_totalprice DESC, o_orderkey, limit k."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        starts, _ = segments(ok[order])
        return pa.table({
            "l_orderkey": pa.array(ok[order][starts], pa.int64()),
            "s": pa.array(np.add.reduceat(q[order], starts), pa.float64()),
        })

    def qty_merge_having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "total_qty": pa.array([], pa.float64())})
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        starts, _ = segments(ok[order])
        keys = ok[order][starts]
        sums = np.add.reduceat(s[order], starts)
        keep = sums > min_qty           # HAVING, applied in the merge
        return pa.table({
            "l_orderkey": pa.array(keys[keep], pa.int64()),
            "total_qty": pa.array(sums[keep], pa.float64()),
        })

    hot = hash_group_apply(li.map_batches(qty_partial,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True),
                           ["l_orderkey"], qty_merge_having, 0, sort=False)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])

    if orders.count() <= broadcast_max:
        ht = collect_table(hot)
        if ht.num_rows == 0:
            keys = np.empty(0, dtype=np.int64)
            qty = np.empty(0, dtype=np.float64)
        else:
            keys = ht.column("l_orderkey").to_numpy(zero_copy_only=False)
            qty = ht.column("total_qty").to_numpy(zero_copy_only=False)
            order = np.argsort(keys)
            keys, qty = keys[order], qty[order]
        hot_ref = ray.put((keys, qty))

        def attach_qty(b: pa.Table) -> pa.Table:
            ks, qv = ray.get(hot_ref)
            ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
            pos, hit = _sorted_lookup(ks, ok)
            out = b.filter(pa.array(hit))
            return out.append_column(
                "total_qty",
                pa.array(qv[pos[hit]] if len(ks) else
                         np.empty(0, np.float64), pa.float64()))

        matched = collect_table(orders.map_batches(
            attach_qty, batch_format="pyarrow", zero_copy_batch=True))
        # result-sized custkey set -> second broadcast for c_name
        cks = np.unique(matched.column("o_custkey").to_numpy(
            zero_copy_only=False)) if matched.num_rows else \
            np.empty(0, dtype=np.int64)
        cks_ref = ray.put(cks)

        def name_filter(b: pa.Table) -> pa.Table:
            ks = ray.get(cks_ref)
            ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
            _, hit = _sorted_lookup(ks, ck)
            return b.filter(pa.array(hit))

        names = collect_table(cust.map_batches(
            name_filter, batch_format="pyarrow", zero_copy_batch=True))
        if matched.num_rows == 0:
            final = pa.table({
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_totalprice": pa.array([], pa.float64()),
                "total_qty": pa.array([], pa.float64()),
            })
            return final
        if names.num_rows == 0:
            # matched orders exist but no custkey resolved — corrupt or
            # truncated dimension table; fail with the data-integrity
            # error, not an IndexError on the empty key array
            raise AssertionError("o_custkey missing from customer table")
        nk = names.column("c_custkey").to_numpy(zero_copy_only=False)
        order = np.argsort(nk)
        nk = nk[order]
        nv = names.column("c_name").take(pa.array(order))
        mck = matched.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(nk, mck), 0, len(nk) - 1)
        if not (nk[pos] == mck).all():
            raise AssertionError("o_custkey missing from customer table")
        final = pa.table({
            "c_name": nv.take(pa.array(pos)),
            "c_custkey": pa.array(mck, pa.int64()),
            "o_orderkey": matched.column("o_orderkey"),
            "o_orderdate": matched.column("o_orderdate"),
            "o_totalprice": matched.column("o_totalprice"),
            "total_qty": matched.column("total_qty"),
        })
    else:
        hot_j = _anchor_sentinel(hot, {"l_orderkey": (pa.int64(), -1),
                                       "total_qty": (pa.float64(), 0.0)})
        orders_j = _anchor_sentinel(orders, {
            "o_orderkey": (pa.int64(), -2),
            "o_custkey": (pa.int64(), -2),
            "o_orderdate": (pa.timestamp("us"), 0),
            "o_totalprice": (pa.float64(), 0.0)})
        _hash_shuffle_on(orders_j, hot_j)
        m1 = orders_j.join(hot_j, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("o_orderkey",), right_on=("l_orderkey",))
        # m1 is hot-set-sized; sentinels died at join 1 (-1 vs -2), so
        # anchor again for join 2's schema inference (paired sentinels
        # that also die: no real c_custkey is negative)
        m1_j = _anchor_sentinel(m1, {
            "o_orderkey": (pa.int64(), -3),
            "o_custkey": (pa.int64(), -3),
            "o_orderdate": (pa.timestamp("us"), 0),
            "o_totalprice": (pa.float64(), 0.0),
            "total_qty": (pa.float64(), 0.0)})
        cust_j = _anchor_sentinel(cust, {"c_custkey": (pa.int64(), -4),
                                         "c_name": (pa.string(), "")})
        _hash_shuffle_on(m1_j, cust_j)
        m2 = m1_j.join(cust_j, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("o_custkey",), right_on=("c_custkey",))
        mt = collect_table(m2)
        if mt.num_rows == 0:
            return pa.table({
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_totalprice": pa.array([], pa.float64()),
                "total_qty": pa.array([], pa.float64()),
            })
        final = pa.table({
            "c_name": mt.column("c_name"),
            "c_custkey": mt.column("o_custkey"),
            "o_orderkey": mt.column("o_orderkey"),
            "o_orderdate": mt.column("o_orderdate"),
            "o_totalprice": mt.column("o_totalprice"),
            "total_qty": mt.column("total_qty"),
        })

    # result-sized driver sort + limit
    price = final.column("o_totalprice").to_numpy(zero_copy_only=False)
    okey = final.column("o_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((okey, -price))[:k]
    return final.take(pa.array(order))
