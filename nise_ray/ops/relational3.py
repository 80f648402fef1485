"""Third batch of relational showcase ops (round 4): single-scan
predicate aggregate (TPC-H Q6 shape), late-shipment CASE aggregation
(Q12 shape), market-share conditional ratio (Q8 shape), product-profit
rollup (Q9 shape), and the waiting-suppliers multi-EXISTS self-join
(Q21 shape — the hardest semi/anti-join composition in the TPC-H set).

The source tables lack l_commitdate / l_receiptdate and partsupp, so
the Q12/Q21 lateness predicate is adapted to
``l_shipdate > o_orderdate + 90 days`` (ship lag instead of receipt
lag) and Q9's supply cost to ``0.1 * p_retailprice * l_quantity`` —
the join/aggregation SHAPES are unchanged and each op is verified
bit-exact against the equivalent DuckDB SQL by the oracle gate.

Same scale contracts as ops/relational.py: dimension sides broadcast
under an explicit gate with a distributed hash-join fallback, fact
scans push predicates into the parquet read, aggregates are per-block
combiners whose partials are group-count-sized, and per-key group
logic rides ONE hash exchange (tagged-union co-group, not a join
followed by a second repartition)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table
from nise_ray.ops.relational import (_anchor_sentinel, _hash_shuffle_on,
                                     _join_partitions, _sorted_lookup)

_DAY_US = 86_400_000_000  # one day in microseconds (timestamp[us])


def forecast_revenue_change(sf_dir: str, date_lo: str = "1996-01-01",
                            date_hi: str = "1997-01-01",
                            discount: float = 0.05, delta: float = 0.01,
                            max_qty: float = 24.0) -> pa.Table:
    """TPC-H-Q6-shaped single-scan predicate aggregate: revenue that
    would be recovered by eliminating small discounts — sum of
    l_extendedprice * l_discount over a ship-date year, a discount
    band, and a quantity cap.

    Scale shape: ALL three predicates push into the parquet read
    (row-group pruning on shipdate; discount/quantity prune at the
    fragment filter), each block folds to ONE (sum, count) pair, and
    the driver merge is block-count-sized. Zero exchanges. Returns one
    row (revenue, n_lineitems)."""
    import pyarrow.dataset as pads

    lo = np.datetime64(date_lo, "us").item()
    hi = np.datetime64(date_hi, "us").item()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi)
               & (pads.field("l_discount") >= discount - delta)
               & (pads.field("l_discount") <= discount + delta)
               & (pads.field("l_quantity") < max_qty))

    def q6_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"rev": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({"rev": pa.array([float((price * disc).sum())]),
                         "n": pa.array([b.num_rows], pa.int64())})

    q6_partial.__name__ = "Q6Partial"
    partials = collect_table(li.map_batches(
        q6_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"revenue": pa.array([0.0], pa.float64()),
                         "n_lineitems": pa.array([0], pa.int64())})
    rev = partials.column("rev").to_numpy(zero_copy_only=False)
    n = partials.column("n").to_numpy(zero_copy_only=False)
    return pa.table({"revenue": pa.array([round(float(rev.sum()), 2)]),
                     "n_lineitems": pa.array([int(n.sum())], pa.int64())})


def priority_shipment_counts(sf_dir: str, date_lo: str = "1996-01-01",
                             date_hi: str = "1998-01-01",
                             late_days: int = 90) -> pa.Table:
    """TPC-H-Q12-shaped CASE aggregation over a fact-fact join: for
    each l_returnflag (standing in for l_shipmode, which the table
    lacks), how many LATE shipments (l_shipdate > o_orderdate +
    late_days) belong to high-priority orders (1-URGENT / 2-HIGH)
    versus low-priority ones.

    Scale shape: the ship-date window pushes into the lineitem read;
    orders carries only (o_orderkey, o_orderdate, o_orderpriority);
    ONE orderkey hash exchange joins them; the lateness + priority
    CASE folds per block to at most |returnflags| x 2 partial rows.
    Returns (return_flag, high_line_count, low_line_count) sorted."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import segments

    lo = np.datetime64(date_lo, "us").item()
    hi = np.datetime64(date_hi, "us").item()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi))
    li = _anchor_sentinel(li, {"l_orderkey": (pa.int64(), -1),
                               "l_returnflag": (pa.string(), ""),
                               "l_shipdate": (pa.timestamp("us"), 0)})
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    _hash_shuffle_on(li, orders)
    joined = li.join(orders, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def case_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"flag": pa.array([], pa.string()),
                          "high": pa.array([], pa.int64()),
                          "low": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ship = b.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        odate = b.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        late = ship > odate + late_days * _DAY_US
        if not late.any():
            return empty
        prio = b.column("o_orderpriority").combine_chunks() \
            .dictionary_encode()
        codes = prio.indices.to_numpy(zero_copy_only=False)[late]
        vocab = prio.dictionary.to_pylist()
        is_high_code = np.array([v in ("1-URGENT", "2-HIGH")
                                 for v in vocab], dtype=bool)
        high = is_high_code[codes]
        fenc = b.column("l_returnflag").combine_chunks().dictionary_encode()
        fcodes = fenc.indices.to_numpy(zero_copy_only=False)[late] \
            .astype(np.int64)
        fvocab = np.asarray(fenc.dictionary.to_pylist(), dtype=object)
        order = np.argsort(fcodes, kind="stable")
        starts, _ = segments(fcodes[order])
        hi_n = np.add.reduceat(high[order].astype(np.int64), starts)
        lo_n = np.add.reduceat((~high[order]).astype(np.int64), starts)
        return pa.table({
            "flag": pa.array(fvocab[fcodes[order][starts]], pa.string()),
            "high": pa.array(hi_n, pa.int64()),
            "low": pa.array(lo_n, pa.int64()),
        })

    case_partial.__name__ = "LatePriorityPartial"
    partials = collect_table(joined.map_batches(
        case_partial, batch_format="pyarrow", zero_copy_batch=True))
    out_schema = {"return_flag": pa.array([], pa.string()),
                  "high_line_count": pa.array([], pa.int64()),
                  "low_line_count": pa.array([], pa.int64())}
    if partials.num_rows == 0:
        return pa.table(out_schema)
    enc = partials.column("flag").combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    hi_v = partials.column("high").to_numpy(zero_copy_only=False)
    lo_v = partials.column("low").to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    starts, _ = segments(codes[order])
    flags = vocab[codes[order][starts]]
    hi_m = np.add.reduceat(hi_v[order], starts)
    lo_m = np.add.reduceat(lo_v[order], starts)
    fo = np.argsort(flags.astype(str), kind="stable")
    return pa.table({"return_flag": pa.array(flags[fo], pa.string()),
                     "high_line_count": pa.array(hi_m[fo], pa.int64()),
                     "low_line_count": pa.array(lo_m[fo], pa.int64())})


def market_share(sf_dir: str, region: str = "AMERICA",
                 target_nation: str = "NATION_5", p_type: str = "PROMO",
                 date_lo: str = "1996-01-01", date_hi: str = "1998-01-01",
                 broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q8-shaped market-share query: within orders placed by
    customers of one REGION for parts of one type, the fraction of
    revenue supplied by one target NATION, per order year — the
    classic conditional-ratio aggregate over a 6-table join.

    Scale shape: nation/region resolve on the driver (tens of rows);
    customers filter to the region by a broadcast nation->region map
    (no exchange); part filters to the type and broadcasts its keyset
    under a gate (distributed partkey join above it); supplier nation
    attaches the same way; the only exchanges are orders x customer
    and lineitem x ordcust on their natural keys. The share folds per
    block to (year, target_rev, total_rev) partials. Returns
    (o_year, mkt_share, total_revenue) sorted by year."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import segments

    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet"))
    region_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/region.parquet"))
    rnames = np.asarray(region_t.column("r_name").to_pylist(), dtype=object)
    rkeys = region_t.column("r_regionkey").to_numpy(zero_copy_only=False)
    rk = rkeys[rnames == region]
    nnames = np.asarray(nation_t.column("n_name").to_pylist(), dtype=object)
    nkeys = nation_t.column("n_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    nregion = nation_t.column("n_regionkey").to_numpy(zero_copy_only=False)
    tk = nkeys[nnames == target_nation]
    empty = pa.table({"o_year": pa.array([], pa.int64()),
                      "mkt_share": pa.array([], pa.float64()),
                      "total_revenue": pa.array([], pa.float64())})
    if len(rk) != 1 or len(tk) != 1:
        return empty
    region_nations = np.sort(nkeys[nregion == int(rk[0])])
    target_key = int(tk[0])

    # part -> keyset of the target type; broadcast-gated with a
    # distributed partkey semi-join fallback (same shape as
    # product_profit's)
    # materialized once: .count() on a filtered read is a full scan, so
    # gate-count + consume would otherwise read the dimension twice
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"],
                                 filter=pads.field("p_type") == p_type) \
        .materialize()
    n_parts = part.count()
    pkeys_ref = None
    if n_parts <= broadcast_max:
        pt = collect_table(part)
        pkeys = (np.sort(pt.column("p_partkey").to_numpy(
            zero_copy_only=False)) if pt.num_rows
            else np.empty(0, dtype=np.int64))
        pkeys_ref = ray.put(pkeys)

    # supplier -> nationkey broadcast map (dimension-sized)
    st = collect_table(ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]))
    if st.num_rows == 0:
        # the 6-table inner join has no rows without suppliers; keeping
        # supplier-less lineitems would silently inflate total_revenue
        return empty
    sk = st.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = st.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    if len(sk) > 1 and (sk[1:] == sk[:-1]).any():
        raise AssertionError("market_share: duplicate s_suppkey")
    supp_ref = ray.put((sk, sn))

    # customers of the region: broadcast membership on 25 nation keys
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    rn_ref = ray.put(region_nations)

    def region_cust(b: pa.Table) -> pa.Table:
        rn = ray.get(rn_ref)
        nk = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, hit = _sorted_lookup(rn, nk)
        return pa.table({"c_custkey":
                         b.column("c_custkey").filter(pa.array(hit))})

    region_cust.__name__ = "RegionCust"
    cust_f = cust.map_batches(region_cust, batch_format="pyarrow",
                              zero_copy_batch=True)
    cust_f = _anchor_sentinel(cust_f, {"c_custkey": (pa.int64(), -1)})

    lo = np.datetime64(date_lo, "us").item()
    hi = np.datetime64(date_hi, "us").item()
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
               & (pads.field("o_orderdate") < hi))
    orders = _anchor_sentinel(orders, {
        "o_orderkey": (pa.int64(), -1), "o_custkey": (pa.int64(), -1),
        "o_orderdate": (pa.timestamp("us"), 0)})
    _hash_shuffle_on(orders, cust_f)
    ordcust = orders.join(cust_f, join_type="inner",
                          num_partitions=_join_partitions(),
                          on=("o_custkey",), right_on=("c_custkey",))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def type_filter(b: pa.Table) -> pa.Table:
        pk = ray.get(pkeys_ref)
        sk, sn = ray.get(supp_ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        _, hit = _sorted_lookup(pk, lpk)
        if not hit.any():
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "is_target": pa.array([], pa.bool_()),
                             "rev": pa.array([], pa.float64())})
        lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)[hit]
        pos, shit = _sorted_lookup(sk, lsk)
        if len(sk) and not shit.all():
            raise AssertionError("l_suppkey missing from supplier table")
        snat = sn[pos]  # supplier table is non-empty (early return)
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[hit]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[hit]
        return pa.table({
            "l_orderkey": b.column("l_orderkey").filter(pa.array(hit)),
            "is_target": pa.array(snat == target_key, pa.bool_()),
            "rev": pa.array(price * (1.0 - disc), pa.float64()),
        })

    type_filter.__name__ = "TypePartSupplier"

    def type_project(b: pa.Table) -> pa.Table:
        """Join-fallback tail: part membership already applied by the
        distributed partkey join; attach supplier nation + revenue."""
        sk, sn = ray.get(supp_ref)
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "is_target": pa.array([], pa.bool_()),
                             "rev": pa.array([], pa.float64())})
        lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos, shit = _sorted_lookup(sk, lsk)
        # the join sentinel (suppkey -1) legitimately misses the
        # supplier map; real rows must all hit
        real = b.column("l_partkey").to_numpy(zero_copy_only=False) >= 0
        if len(sk) and not shit[real].all():
            raise AssertionError("l_suppkey missing from supplier table")
        snat = np.where(shit, sn[pos], -1)  # -1 = join sentinel rows
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "is_target": pa.array(snat == target_key, pa.bool_()),
            "rev": pa.array(np.where(real, price * (1.0 - disc), 0.0),
                            pa.float64()),
        })

    type_project.__name__ = "TypeSupplierProject"
    if pkeys_ref is not None:
        li_f = li.map_batches(type_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        part_k = part.map_batches(
            lambda b: b.select(["p_partkey"]), batch_format="pyarrow",
            zero_copy_batch=True)
        part_k = _anchor_sentinel(part_k, {"p_partkey": (pa.int64(), -1)})
        li_s = _anchor_sentinel(li, {
            "l_orderkey": (pa.int64(), -1), "l_partkey": (pa.int64(), -1),
            "l_suppkey": (pa.int64(), -1),
            "l_extendedprice": (pa.float64(), 0.0),
            "l_discount": (pa.float64(), 0.0)})
        _hash_shuffle_on(li_s, part_k)
        li_j = li_s.join(part_k, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("l_partkey",), right_on=("p_partkey",))
        li_f = li_j.map_batches(type_project, batch_format="pyarrow",
                                zero_copy_batch=True)
    li_f = _anchor_sentinel(li_f, {"l_orderkey": (pa.int64(), -1),
                                   "is_target": (pa.bool_(), False),
                                   "rev": (pa.float64(), 0.0)})
    _hash_shuffle_on(li_f, ordcust)
    joined = li_f.join(ordcust, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def share_partial(b: pa.Table) -> pa.Table:
        empty_p = pa.table({"year": pa.array([], pa.int64()),
                            "target": pa.array([], pa.float64()),
                            "total": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty_p
        # the paired -1 sentinels survive this join (nothing else
        # filters them) — drop them here
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        real = okey >= 0
        if not real.any():
            return empty_p
        ts = b.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[real]
        year = (ts.astype("datetime64[us]").astype("datetime64[Y]")
                .astype(np.int64) + 1970)
        rev = b.column("rev").to_numpy(zero_copy_only=False)[real]
        tgt = b.column("is_target").to_numpy(zero_copy_only=False)[real]
        order = np.argsort(year, kind="stable")
        starts, _ = segments(year[order])
        return pa.table({
            "year": pa.array(year[order][starts], pa.int64()),
            "target": pa.array(
                np.add.reduceat(np.where(tgt, rev, 0.0)[order], starts)),
            "total": pa.array(np.add.reduceat(rev[order], starts)),
        })

    share_partial.__name__ = "MarketSharePartial"
    partials = collect_table(joined.map_batches(
        share_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return empty
    y = partials.column("year").to_numpy(zero_copy_only=False)
    tg = partials.column("target").to_numpy(zero_copy_only=False)
    tt = partials.column("total").to_numpy(zero_copy_only=False)
    order = np.argsort(y, kind="stable")
    starts, _ = segments(y[order])
    years = y[order][starts]
    tgm = np.add.reduceat(tg[order], starts)
    ttm = np.add.reduceat(tt[order], starts)
    share = np.round(np.divide(tgm, ttm, out=np.zeros_like(tgm),
                               where=ttm != 0.0), 4)
    return pa.table({"o_year": pa.array(years, pa.int64()),
                     "mkt_share": pa.array(share, pa.float64()),
                     "total_revenue": pa.array(np.round(ttm, 2),
                                               pa.float64())})


def product_profit(sf_dir: str, name_token: str = "red",
                   cost_rate: float = 0.1,
                   broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q9-shaped product-profit rollup: for every (supplier
    nation, order year), the profit on parts whose name contains a
    token — amount = l_extendedprice*(1-l_discount) -
    cost_rate*p_retailprice*l_quantity (the source schema has no
    partsupp, so supply cost derives from p_retailprice; the
    join/rollup shape is Q9's).

    Scale shape: part filters on the name token at the read and
    broadcasts (partkey -> retailprice) under a gate (distributed
    partkey join above it); supplier nation attaches from a
    dimension-sized broadcast; ONE orderkey exchange brings in the
    order year; profit folds per block to (nation, year)-sized
    partials. Returns (nation, o_year, sum_profit) sorted."""
    import pyarrow.compute as pc

    from nise_ray.ops.groupapply import segments

    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    nkeys = nation_t.column("n_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    nnames = np.asarray(nation_t.column("n_name").to_pylist(), dtype=object)
    no = np.argsort(nkeys)
    nkeys, nnames = nkeys[no], nnames[no]

    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_name",
                                          "p_retailprice"])

    def name_filter(b: pa.Table) -> pa.Table:
        hit = pc.match_substring(b.column("p_name"), name_token)
        return pa.table({
            "p_partkey": b.column("p_partkey").filter(hit),
            "p_retailprice": b.column("p_retailprice").filter(hit)})

    name_filter.__name__ = "PartNameFilter"
    part_f = part.map_batches(name_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
    empty = pa.table({"nation": pa.array([], pa.string()),
                      "o_year": pa.array([], pa.int64()),
                      "sum_profit": pa.array([], pa.float64())})

    st = collect_table(ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]))
    if st.num_rows == 0:
        # inner-join semantics: no suppliers -> no profit rows (the
        # synthesized nkey=-1 fallback would crash the nation lookup)
        return empty
    sk = st.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = st.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    if len(sk) > 1 and (sk[1:] == sk[:-1]).any():
        raise AssertionError("product_profit: duplicate s_suppkey")
    supp_ref = ray.put((sk, sn))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"])

    # materialized once: the gate .count() would otherwise re-run the
    # whole read + regex filter a second time at consumption
    part_f = part_f.materialize()
    if part_f.count() <= broadcast_max:
        pt = collect_table(part_f)
        if pt.num_rows:
            pk = pt.column("p_partkey").to_numpy(zero_copy_only=False)
            pr = pt.column("p_retailprice").to_numpy(zero_copy_only=False)
            po = np.argsort(pk)
            pk, pr = pk[po], pr[po]
            if len(pk) > 1 and (pk[1:] == pk[:-1]).any():
                raise AssertionError("product_profit: duplicate p_partkey")
        else:
            pk = np.empty(0, dtype=np.int64)
            pr = np.empty(0, dtype=np.float64)
        part_ref = ray.put((pk, pr))

        def attach_part(b: pa.Table) -> pa.Table:
            pk, pr = ray.get(part_ref)
            sk, sn = ray.get(supp_ref)
            lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            pos, hit = _sorted_lookup(pk, lpk)
            if not hit.any():
                return pa.table({"l_orderkey": pa.array([], pa.int64()),
                                 "nkey": pa.array([], pa.int64()),
                                 "amount": pa.array([], pa.float64())})
            price = b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[hit]
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)[hit]
            qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[hit]
            retail = pr[pos[hit]]
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)[hit]
            spos, shit = _sorted_lookup(sk, lsk)
            if len(sk) and not shit.all():
                raise AssertionError("l_suppkey missing from supplier table")
            snat = sn[spos]  # supplier table is non-empty
            amount = price * (1.0 - disc) - cost_rate * retail * qty
            return pa.table({
                "l_orderkey": b.column("l_orderkey").filter(pa.array(hit)),
                "nkey": pa.array(snat, pa.int64()),
                "amount": pa.array(amount, pa.float64()),
            })

        attach_part.__name__ = "AttachPartCost"
        li_f = li.map_batches(attach_part, batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        # part side above the gate: distributed hash join on partkey,
        # then the supplier broadcast attaches nation as before
        part_f = _anchor_sentinel(part_f, {
            "p_partkey": (pa.int64(), -1), "p_retailprice": (pa.float64(),
                                                             0.0)})
        _hash_shuffle_on(li, part_f)
        li_j = li.join(part_f, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_partkey",), right_on=("p_partkey",))

        def profit_project(b: pa.Table) -> pa.Table:
            sk, sn = ray.get(supp_ref)
            if b.num_rows == 0:
                return pa.table({"l_orderkey": pa.array([], pa.int64()),
                                 "nkey": pa.array([], pa.int64()),
                                 "amount": pa.array([], pa.float64())})
            price = b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
            retail = b.column("p_retailprice").to_numpy(
                zero_copy_only=False)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
            spos, shit = _sorted_lookup(sk, lsk)
            if len(sk) and not shit.all():
                raise AssertionError("l_suppkey missing from supplier table")
            snat = sn[spos]  # supplier table is non-empty
            amount = price * (1.0 - disc) - cost_rate * retail * qty
            return pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "nkey": pa.array(snat, pa.int64()),
                "amount": pa.array(amount, pa.float64()),
            })

        profit_project.__name__ = "ProfitProject"
        li_f = li_j.map_batches(profit_project, batch_format="pyarrow",
                                zero_copy_batch=True)

    li_f = _anchor_sentinel(li_f, {"l_orderkey": (pa.int64(), -1),
                                   "nkey": (pa.int64(), -1),
                                   "amount": (pa.float64(), 0.0)})
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])
    _hash_shuffle_on(li_f, orders)
    joined = li_f.join(orders, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def profit_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "profit": pa.array([], pa.float64())})
        ts = b.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        year = (ts.astype("datetime64[us]").astype("datetime64[Y]")
                .astype(np.int64) + 1970)
        nkey = b.column("nkey").to_numpy(zero_copy_only=False)
        amount = b.column("amount").to_numpy(zero_copy_only=False)
        k = nkey * (1 << 32) + year  # nationkeys are tiny; cannot collide
        order = np.argsort(k, kind="stable")
        starts, _ = segments(k[order])
        return pa.table({
            "k": pa.array(k[order][starts], pa.int64()),
            "profit": pa.array(np.add.reduceat(amount[order], starts)),
        })

    profit_partial.__name__ = "ProfitPartial"
    partials = collect_table(joined.map_batches(
        profit_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return empty
    k = partials.column("k").to_numpy(zero_copy_only=False)
    p = partials.column("profit").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    starts, _ = segments(k[order])
    ku = k[order][starts]
    profit = np.round(np.add.reduceat(p[order], starts), 2)
    nk = (ku >> 32).astype(np.int64)
    years = ku & ((1 << 32) - 1)
    pos, hit = _sorted_lookup(nkeys, nk)
    if len(nkeys) and not hit.all():
        raise AssertionError("nationkey missing from nation table")
    names = nnames[pos]
    out = pa.table({"nation": pa.array(names, pa.string()),
                    "o_year": pa.array(years, pa.int64()),
                    "sum_profit": pa.array(profit, pa.float64())})
    return out.sort_by([("nation", "ascending"), ("o_year", "ascending")])


def waiting_suppliers(sf_dir: str, late_days: int = 90, k: int = 10
                      ) -> pa.Table:
    """TPC-H-Q21-shaped waiting-suppliers query: late lineitems
    (l_shipdate > o_orderdate + late_days) on finalized orders
    (o_orderstatus = 'F') in MULTI-supplier orders where the supplier
    was the ONLY late one — EXISTS(another supplier) AND NOT
    EXISTS(another LATE supplier), the canonical semi-join + anti-join
    composition over a self-joined fact table.

    Scale shape: instead of three lineitem self-joins, both streams
    union into a tagged co-group (order rows carry o_orderdate as the
    timestamp with supp = -1) and ride ONE orderkey hash exchange;
    each partition resolves its complete order groups vectorized
    (lexsort + run-length segments — per-order distinct-supplier and
    distinct-late-supplier counts fall out of one pair-change scan,
    no Python loop). Per-partition supplier partials are
    supplier-count-bounded; the driver merge, name attach (filtered
    dimension read on the k winning keys) and top-k are k-sized.
    Returns (s_name, numwait) ordered by numwait DESC, s_name."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import hash_group_apply, segments

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey",
                                        "l_shipdate"])

    def tag_li(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": b.column("l_orderkey"),
            "supp": b.column("l_suppkey").cast(pa.int64()),
            "ts": b.column("l_shipdate").cast(pa.int64()),
        })

    tag_li.__name__ = "TagLineitem"
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        filter=pads.field("o_orderstatus") == "F")

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": b.column("o_orderkey"),
            "supp": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
            "ts": b.column("o_orderdate").cast(pa.int64()),
        })

    tag_orders.__name__ = "TagOrders"
    both = li.map_batches(tag_li, batch_format="pyarrow",
                          zero_copy_batch=True).union(
        orders.map_batches(tag_orders, batch_format="pyarrow",
                           zero_copy_batch=True))

    def order_groups(b: pa.Table) -> pa.Table:
        empty_p = pa.table({"supp": pa.array([], pa.int64()),
                            "numwait": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty_p
        okey = b.column("okey").to_numpy(zero_copy_only=False)
        supp = b.column("supp").to_numpy(zero_copy_only=False)
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((supp, okey))
        okey, supp, ts = okey[order], supp[order], ts[order]
        starts, counts = segments(okey)
        gid = np.repeat(np.arange(len(starts)), counts)
        # per-group order date: the supp=-1 row sorts FIRST within its
        # group; groups whose first row is a lineitem have no 'F' order
        has_order = supp[starts] == -1
        odate = np.where(has_order, ts[starts], np.int64(0))
        is_line = supp != -1
        valid = has_order[gid] & is_line
        late = valid & (ts > odate[gid] + late_days * _DAY_US)
        # distinct suppliers per group: supplier-change points among
        # lineitem rows (rows are (okey, supp)-sorted)
        new_supp = np.empty(len(supp), dtype=bool)
        new_supp[0] = True
        np.not_equal(supp[1:], supp[:-1], out=new_supp[1:])
        new_supp |= np.concatenate(([True], okey[1:] != okey[:-1]))
        first_of_supp = new_supp & is_line
        n_supp = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_supp, gid[first_of_supp], 1)
        # distinct LATE suppliers per group: change points of the late
        # subsequence (still (okey, supp)-sorted after masking)
        lokey, lsupp = okey[late], supp[late]
        if len(lokey):
            lnew = np.empty(len(lokey), dtype=bool)
            lnew[0] = True
            lnew[1:] = (lokey[1:] != lokey[:-1]) | (lsupp[1:] != lsupp[:-1])
        else:
            lnew = np.empty(0, dtype=bool)
        n_late_supp = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_late_supp, gid[late][lnew], 1)
        # qualifying groups: >=2 suppliers, exactly 1 late supplier;
        # count(*) semantics — every late lineitem of the sole late
        # supplier contributes one row, exactly like the SQL's l1 scan
        qual = (n_supp >= 2) & (n_late_supp == 1)
        hits = late & qual[gid]
        if not hits.any():
            return empty_p
        hsupp = supp[hits]
        horder = np.argsort(hsupp, kind="stable")
        hstarts, hcounts = segments(hsupp[horder])
        return pa.table({
            "supp": pa.array(hsupp[horder][hstarts], pa.int64()),
            "numwait": pa.array(hcounts, pa.int64()),
        })

    order_groups.__name__ = "WaitingSupplierGroups"
    partials = collect_table(hash_group_apply(both, ["okey"], order_groups,
                                              sort=False))
    out_schema = {"s_name": pa.array([], pa.string()),
                  "numwait": pa.array([], pa.int64())}
    if partials.num_rows == 0:
        return pa.table(out_schema)
    supp = partials.column("supp").to_numpy(zero_copy_only=False)
    nw = partials.column("numwait").to_numpy(zero_copy_only=False)
    order = np.argsort(supp, kind="stable")
    starts, _ = segments(supp[order])
    skeys = supp[order][starts]
    waits = np.add.reduceat(nw[order], starts)
    # top-k needs names only for candidate keys; attach from a
    # key-filtered dimension read, then tie-break on name
    st = collect_table(ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(pa.array(skeys, pa.int64()))))
    dk = st.column("s_suppkey").to_numpy(zero_copy_only=False)
    dn = np.asarray(st.column("s_name").to_pylist(), dtype=object)
    do = np.argsort(dk)
    pos, hit = _sorted_lookup(dk[do], skeys)
    if not hit.all():
        raise AssertionError("waiting_suppliers: suppkey missing from "
                             "supplier table")
    names = dn[do][pos]
    sel = np.lexsort((names.astype(str), -waits))[:k]
    return pa.table({"s_name": pa.array(names[sel], pa.string()),
                     "numwait": pa.array(waits[sel], pa.int64())})


def min_cost_supplier(sf_dir: str, size: int = 15, k: int = 100,
                      broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q2-shaped groupwise-min join-back (the correlated-scalar-
    subquery decorrelation): for every part of a given p_size, the
    supplier(s) offering the MINIMUM observed l_extendedprice (the
    tables lack partsupp, so lineitem prices stand in for supply cost —
    the shape is unchanged). Ties keep every minimal supplier, exactly
    like Q2. Returns (s_acctbal, s_name, n_name, p_partkey, min_price)
    ordered by s_acctbal DESC, n_name, s_name, p_partkey, LIMIT k.

    Scale shape: the filtered part keyset broadcasts under the gate
    (one ray.put, searchsorted per block); the per-part min AND the
    equal-row filter ride ONE l_partkey hash exchange (no join-back
    shuffle: the group sees its own min); supplier/nation attach by
    broadcast; only the (part x minimal-supplier)-sized result reaches
    the driver for the final k-row sort."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.ops.relational import _broadcast_side, _sorted_lookup

    part_keys_ref = _broadcast_side(
        ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_name"],
                              filter=pads.field("p_size") == size),
        "p_partkey", "p_name", broadcast_max)
    assert part_keys_ref is not None, \
        "part dimension exceeded broadcast_max; add a distributed path"

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    class FilterParts:
        def __init__(self) -> None:
            self.keys, _ = ray.get(part_keys_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            _, hit = _sorted_lookup(self.keys, pk)
            return b.filter(pa.array(hit))

    from nise_ray.ops.groupapply import default_concurrency
    filtered = li.map_batches(FilterParts, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=default_concurrency(0.5))

    def group_min(batch: pa.Table) -> pa.Table:
        empty = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "l_suppkey": pa.array([], pa.int64()),
                          "min_price": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        pr = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        starts, counts = segments(pk)  # sorted by the exchange
        mins = np.minimum.reduceat(pr, starts)
        is_min = pr == np.repeat(mins, counts)
        # distinct (part, supplier) among minimal rows
        ppk, ssk = pk[is_min], sk[is_min]
        mn = np.repeat(mins, counts)[is_min]
        order = np.lexsort((ssk, ppk))
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = (ppk[order][1:] != ppk[order][:-1]) | \
                   (ssk[order][1:] != ssk[order][:-1])
        sel = order[keep]
        return pa.table({"p_partkey": pa.array(ppk[sel], pa.int64()),
                         "l_suppkey": pa.array(ssk[sel], pa.int64()),
                         "min_price": pa.array(mn[sel], pa.float64())})

    mins_ds = hash_group_apply(filtered, ["l_partkey"], group_min,
                               0, sort=True)
    t = collect_table(mins_ds)  # (minimal part,supplier)-sized
    if t.num_rows == 0:
        return pa.table({"s_acctbal": pa.array([], pa.float64()),
                         "s_name": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "p_partkey": pa.array([], pa.int64()),
                         "min_price": pa.array([], pa.float64())})
    supp = collect_table(ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]))
    nat = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    so = np.argsort(sk)
    pos, hit = _sorted_lookup(sk[so], t.column("l_suppkey")
                              .to_numpy(zero_copy_only=False))
    assert hit.all(), "lineitem references unknown supplier"
    sel = pa.array(so[pos])
    s_name = supp.column("s_name").take(sel)
    s_bal = supp.column("s_acctbal").take(sel)
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    no = np.argsort(nk)
    npos, nhit = _sorted_lookup(
        nk[no], supp.column("s_nationkey").take(sel)
        .to_numpy(zero_copy_only=False))
    assert nhit.all(), "supplier references unknown nation"
    n_name = nat.column("n_name").take(pa.array(no[npos]))
    out = pa.table({"s_acctbal": s_bal.cast(pa.float64()),
                    "s_name": s_name,
                    "n_name": n_name,
                    "p_partkey": t.column("p_partkey"),
                    "min_price": t.column("min_price")})
    return out.sort_by([("s_acctbal", "descending"),
                        ("n_name", "ascending"),
                        ("s_name", "ascending"),
                        ("p_partkey", "ascending")]).slice(0, k)


def important_parts(sf_dir: str, frac: float = 0.0005) -> pa.Table:
    """TPC-H-Q11-shaped global-scalar HAVING (the uncorrelated-scalar-
    subquery decorrelation): parts whose total shipped quantity exceeds
    ``frac`` of the corpus-wide total. Quantity sums are integer-valued
    doubles, so partial-sum order cannot move the HAVING boundary (exact
    in both engines — the repo FP contract forbids thresholding on
    noise-bearing doubles). Returns (l_partkey, sum_qty) ordered by
    sum_qty DESC, l_partkey.

    Scale shape: per-block combiner folds each block to its distinct
    partkeys BEFORE the exchange; the merge exchange moves group-count-
    sized partials; the global total is the sum OF THE SAME PARTIALS
    (no second scan); only the HAVING survivors reach the driver."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "qty": pa.array([], pa.float64())})
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        starts, _ = segments(pk[order])
        return pa.table({
            "l_partkey": pa.array(pk[order][starts], pa.int64()),
            "qty": pa.array(np.add.reduceat(q[order], starts),
                            pa.float64())})

    partials = li.map_batches(combine, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.float64())})
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        q = batch.column("qty").to_numpy(zero_copy_only=False)
        starts, _ = segments(pk)
        return pa.table({
            "l_partkey": pa.array(pk[starts], pa.int64()),
            "sum_qty": pa.array(np.add.reduceat(q, starts),
                                pa.float64())})

    per_part = collect_table(hash_group_apply(
        partials, ["l_partkey"], merge, 0, sort=True))
    if per_part.num_rows == 0:
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "sum_qty": pa.array([], pa.float64())})
    qty = per_part.column("sum_qty").to_numpy(zero_copy_only=False)
    total = float(qty.sum())  # exact: integer-valued doubles
    keep = qty > frac * total
    pk = per_part.column("l_partkey").to_numpy(zero_copy_only=False)[keep]
    qv = qty[keep]
    order = np.lexsort((pk, -qv))
    return pa.table({"l_partkey": pa.array(pk[order], pa.int64()),
                     "sum_qty": pa.array(qv[order], pa.float64())})


def dominant_part_suppliers(sf_dir: str, share: float = 0.15,
                            k: int = 20,
                            broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q20-shaped two-level aggregate + semi-join: suppliers who
    shipped MORE THAN ``share`` of some part's total quantity (partsupp
    availability replaced by shipped quantity — the nested-aggregate
    semi-join shape is unchanged), counted per supplier. Returns
    (s_suppkey, s_name, n_dominant_parts) ordered by count DESC,
    s_suppkey, LIMIT k (total order — s_suppkey is unique).

    Scale shape: per-block (partkey, suppkey) combiner, then BOTH
    aggregate levels ride ONE l_partkey exchange (the group holds its
    own part total, so the share comparison is in-group — no join-back);
    the supplier-level count is a second exchange over the dominant
    (part, supplier) survivors (dominance-bounded, fewer than 1/share
    rows per part); names attach by broadcast. Share thresholds
    compare integer-valued-double sums — exact in both engines."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.ops.relational import _broadcast_side, _sorted_lookup

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey",
                                        "l_quantity"])

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64()),
                             "qty": pa.array([], pa.float64())})
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        kpk, ksk = pk[order], sk[order]
        change = np.ones(len(order), dtype=bool)
        change[1:] = (kpk[1:] != kpk[:-1]) | (ksk[1:] != ksk[:-1])
        starts = np.flatnonzero(change)
        return pa.table({
            "l_partkey": pa.array(kpk[starts], pa.int64()),
            "l_suppkey": pa.array(ksk[starts], pa.int64()),
            "qty": pa.array(np.add.reduceat(q[order], starts),
                            pa.float64())})

    partials = li.map_batches(combine, batch_format="pyarrow",
                              zero_copy_batch=True)

    def dominant(batch: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = batch.column("qty").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        kpk, ksk, kq = pk[order], sk[order], q[order]
        # merge duplicate (part, supp) partials, then per-part total
        change = np.ones(len(order), dtype=bool)
        change[1:] = (kpk[1:] != kpk[:-1]) | (ksk[1:] != ksk[:-1])
        ps_starts = np.flatnonzero(change)
        ps_pk = kpk[ps_starts]
        ps_sk = ksk[ps_starts]
        ps_q = np.add.reduceat(kq, ps_starts)
        p_starts, p_counts = segments(ps_pk)
        totals = np.repeat(np.add.reduceat(ps_q, p_starts), p_counts)
        win = ps_q > share * totals
        return pa.table({"l_suppkey": pa.array(ps_sk[win], pa.int64())})

    winners = hash_group_apply(partials, ["l_partkey"], dominant,
                               0, sort=False)

    def count_per_supp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "n_dominant_parts": pa.array([], pa.int64())})
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        starts, counts = segments(sk[order])
        return pa.table({
            "s_suppkey": pa.array(sk[order][starts], pa.int64()),
            "n_dominant_parts": pa.array(counts, pa.int64())})

    counts_t = collect_table(hash_group_apply(
        winners, ["l_suppkey"], count_per_supp, 0, sort=False))
    if counts_t.num_rows == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "n_dominant_parts": pa.array([], pa.int64())})
    name_ref = _broadcast_side(
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", broadcast_max)
    assert name_ref is not None
    keys, names = ray.get(name_ref)
    sk = counts_t.column("s_suppkey").to_numpy(zero_copy_only=False)
    pos, hit = _sorted_lookup(keys, sk)
    assert hit.all(), "dominant supplier missing from supplier table"
    out = pa.table({
        "s_suppkey": counts_t.column("s_suppkey"),
        "s_name": names.take(pa.array(pos)),
        "n_dominant_parts": counts_t.column("n_dominant_parts")})
    return out.sort_by([("n_dominant_parts", "descending"),
                        ("s_suppkey", "ascending")]).slice(0, k)
