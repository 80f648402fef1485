"""Second batch of relational showcase ops (round 4): nation-pair
conditional join (TPC-H Q7 shape), left-outer two-level aggregation
(Q13 shape), and a disjunctive-predicate dimension join (Q19 shape).

Same scale contracts as ops/relational.py: dimension sides broadcast
under an explicit gate with a distributed hash-join fallback, fact
scans push predicates into the parquet read, aggregates are per-block
combiners whose partials are group-count-sized, and empty filtered
sides get anchor sentinels so the hash-join aggregator can always
infer a schema (see relational._anchor_sentinel)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table
from nise_ray.ops.relational import (_anchor_sentinel, _hash_shuffle_on,
                                     _join_partitions, _sorted_lookup)


def volume_shipping(sf_dir: str, nation_a: str = "NATION_3",
                    nation_b: str = "NATION_7",
                    date_lo: str = "1996-01-01", date_hi: str = "1998-01-01",
                    broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q7-shaped NATION-PAIR conditional join: lineitem revenue
    shipped between two specific nations (either direction), split by
    (supplier nation, customer nation, ship year). The disjunctive
    nation-pair predicate ((a,b) OR (b,a)) cannot be pushed into either
    single-table scan — it only resolves after both sides' nation keys
    meet, which is what makes this join shape distinct from the Q5
    chain (local_supplier_revenue, same-nation equality).

    Plan: nation resolves on the driver (2 keys); customer is filtered
    to the two nations by a broadcast membership map (no exchange);
    orders ⋈ customer is the first distributed exchange; lineitem has
    the ship-date window pushed into the read and the supplier nation
    attached via the scale-gated broadcast (distributed hash join above
    the gate); the second exchange joins on orderkey, the pair
    predicate filters vectorized, and revenue partial-aggregates per
    (supp_nation, cust_nation, year) inside each block — at most
    2 x n_years rows per block reach the driver merge. Returns
    (supp_nation, cust_nation, l_year, revenue) sorted."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import segments

    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    names = np.array(nation_t.column("n_name").to_pylist(), dtype=object)
    keys = nation_t.column("n_nationkey").to_numpy(zero_copy_only=False)
    ka = keys[names == nation_a]
    kb = keys[names == nation_b]
    if len(ka) != 1 or len(kb) != 1 or nation_a == nation_b:
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64())})
    ka, kb = int(ka[0]), int(kb[0])

    # customer -> (c_custkey, c_nationkey) restricted to the two nations;
    # 2-key broadcast membership, never a shuffle
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    def pair_cust(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = (nk == ka) | (nk == kb)
        return pa.table({
            "c_custkey": b.column("c_custkey").filter(pa.array(keep)),
            "c_nationkey": pa.array(nk[keep].astype(np.int64), pa.int64()),
        })

    pair_cust.__name__ = "PairNationCust"
    cust_f = cust.map_batches(pair_cust, batch_format="pyarrow",
                              zero_copy_batch=True)
    # paired sentinels keep every join side schema-inferable even when a
    # filter empties it; the fabricated (-1,-1) row dies on the nation-
    # pair predicate (sentinel nationkeys are -1, never in {ka, kb})
    cust_f = _anchor_sentinel(cust_f, {"c_custkey": (pa.int64(), -1),
                                       "c_nationkey": (pa.int64(), -1)})
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    orders = _anchor_sentinel(orders, {"o_orderkey": (pa.int64(), -1),
                                       "o_custkey": (pa.int64(), -1)})
    _hash_shuffle_on(orders, cust_f)
    ordcust = orders.join(cust_f, join_type="inner",
                          num_partitions=_join_partitions(),
                          on=("o_custkey",), right_on=("c_custkey",))

    lo = np.datetime64(date_lo, "us").astype("datetime64[us]").item()
    hi = np.datetime64(date_hi, "us").astype("datetime64[us]").item()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi))
    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_nationkey"])

    def li_project(b: pa.Table, snat: np.ndarray,
                   keep: np.ndarray) -> pa.Table:
        """Common tail of both supplier-attach paths: keep the two
        nations' suppliers, derive ship year + revenue."""
        ts = b.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        year = (ts.astype("datetime64[us]").astype("datetime64[Y]")
                .astype(np.int64) + 1970)
        price = b.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[keep]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "l_orderkey": b.column("l_orderkey").filter(pa.array(keep)),
            "s_nationkey": pa.array(snat[keep], pa.int64()),
            "l_year": pa.array(year, pa.int64()),
            "rev": pa.array(price * (1.0 - disc), pa.float64()),
        })

    if supp.count() <= broadcast_max:
        st = collect_table(supp)
        sk = st.column("s_suppkey").to_numpy(zero_copy_only=False)
        sn = st.column("s_nationkey").to_numpy(zero_copy_only=False)
        so = np.argsort(sk)
        sk = sk[so]
        # duplicate dimension keys would silently drop join multiplicity
        # (searchsorted picks one match) — fail loudly, as _broadcast_side
        if len(sk) > 1 and (sk[1:] == sk[:-1]).any():
            raise AssertionError("volume_shipping: duplicate s_suppkey in "
                                 "broadcast side — use the distributed path")
        supp_ref = ray.put((sk, sn[so].astype(np.int64)))

        def attach_supp(b: pa.Table) -> pa.Table:
            sk, sn = ray.get(supp_ref)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos, hit = _sorted_lookup(sk, lsk)
            if len(sk) and not hit.all():
                raise AssertionError("l_suppkey missing from supplier table")
            snat = sn[pos] if len(sk) else np.full(len(lsk), -1, np.int64)
            keep = (snat == ka) | (snat == kb)
            return li_project(b, snat, keep)

        attach_supp.__name__ = "AttachPairSupplier"
        li_s = li.map_batches(attach_supp, batch_format="pyarrow",
                              zero_copy_batch=True)
    else:
        # supplier above the gate: distributed hash join on suppkey.
        # The ship-date window is pushed into the read, so an empty
        # window leaves li with ZERO blocks and the join aggregator
        # cannot infer its schema — sentinel it (suppkey -1 matches no
        # supplier, so the row dies at this join and the join-2 anchor
        # below re-covers emptiness).
        li = _anchor_sentinel(li, {
            "l_orderkey": (pa.int64(), -1),
            "l_suppkey": (pa.int64(), -1),
            "l_extendedprice": (pa.float64(), 0.0),
            "l_discount": (pa.float64(), 0.0),
            "l_shipdate": (pa.timestamp("us"), 0)})
        _hash_shuffle_on(li, supp)
        li_j = li.join(supp, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_suppkey",), right_on=("s_suppkey",))

        def pair_filter(b: pa.Table) -> pa.Table:
            snat = b.column("s_nationkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep = (snat == ka) | (snat == kb)
            return li_project(b, snat, keep)

        pair_filter.__name__ = "PairSupplierFilter"
        li_s = li_j.map_batches(pair_filter, batch_format="pyarrow",
                                zero_copy_batch=True)

    li_s = _anchor_sentinel(li_s, {"l_orderkey": (pa.int64(), -1),
                                   "s_nationkey": (pa.int64(), -1),
                                   "l_year": (pa.int64(), 0),
                                   "rev": (pa.float64(), 0.0)})
    _hash_shuffle_on(li_s, ordcust)
    joined = li_s.join(ordcust, join_type="inner",
                       num_partitions=_join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        snat = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        cnat = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = ((snat == ka) & (cnat == kb)) | ((snat == kb) & (cnat == ka))
        if not keep.any():
            return empty
        year = b.column("l_year").to_numpy(zero_copy_only=False)[keep]
        rev = b.column("rev").to_numpy(zero_copy_only=False)[keep]
        # composite key: direction bit (supp==ka) + year; years fit well
        # under 2**32 so the packing cannot collide
        k = (snat[keep] == ka).astype(np.int64) * (1 << 32) + year
        order = np.argsort(k, kind="stable")
        starts, _ = segments(k[order])
        return pa.table({
            "k": pa.array(k[order][starts], pa.int64()),
            "revenue": pa.array(np.add.reduceat(rev[order], starts),
                                pa.float64()),
        })

    pair_partial.__name__ = "NationPairPartial"
    partials = collect_table(joined.map_batches(
        pair_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64())})
    k = partials.column("k").to_numpy(zero_copy_only=False)
    r = partials.column("revenue").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    starts, _ = segments(k[order])
    ku = k[order][starts]
    rev = np.round(np.add.reduceat(r[order], starts), 2)
    s_is_a = (ku >> 32).astype(bool)
    years = ku & ((1 << 32) - 1)
    supp_n = np.where(s_is_a, nation_a, nation_b)
    cust_n = np.where(s_is_a, nation_b, nation_a)
    out = pa.table({
        "supp_nation": pa.array(supp_n, pa.string()),
        "cust_nation": pa.array(cust_n, pa.string()),
        "l_year": pa.array(years, pa.int64()),
        "revenue": pa.array(rev, pa.float64()),
    })
    return out.sort_by([("supp_nation", "ascending"),
                        ("cust_nation", "ascending"),
                        ("l_year", "ascending")])


def customer_order_distribution(sf_dir: str,
                                broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q13-shaped LEFT OUTER two-level aggregation: how many
    customers placed exactly k orders, INCLUDING k = 0 — the classic
    distribution query whose zero bucket forces outer-join semantics.

    Scale shape: orders shrink to per-custkey counts with a per-block
    combiner + ONE custkey-bounded hash exchange (never orders-sized
    rows past the combiner); the left-outer join never materializes —
    counts for custkeys absent from customer are dropped by a
    broadcast-gated membership filter (distributed inner join on the
    already-distinct keys above the gate), and the zero bucket is
    |customer| (parquet metadata count) minus the number of matched
    custkeys. The final histogram is max-orders-per-customer-sized.
    Returns (c_count, custdist) sorted by custdist DESC, c_count DESC."""
    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        u, c = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    def count_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        starts, _ = segments(ck[order])
        return pa.table({
            "o_custkey": pa.array(ck[order][starts], pa.int64()),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
        })

    per_cust = hash_group_apply(orders.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], count_merge, 0, sort=False)

    cust_meta = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey"])
    n_customers = cust_meta.count()  # parquet metadata, no scan

    if n_customers <= broadcast_max:
        ckeys = np.sort(collect_table(cust_meta).column("c_custkey")
                        .to_numpy(zero_copy_only=False))
        ck_ref = ray.put(ckeys)

        class InCustomer:
            def __init__(self) -> None:
                self.keys = ray.get(ck_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
                _, hit = _sorted_lookup(self.keys, ck)
                return b.filter(pa.array(hit))

        matched = per_cust.map_batches(InCustomer, batch_format="pyarrow",
                                       zero_copy_batch=True,
                                       concurrency=default_concurrency())
    else:
        per_cust = _anchor_sentinel(per_cust, {"o_custkey": (pa.int64(), -2),
                                               "n": (pa.int64(), 0)})
        cust_j = _anchor_sentinel(cust_meta, {"c_custkey": (pa.int64(), -1)})
        _hash_shuffle_on(per_cust, cust_j)
        matched = per_cust.join(cust_j, join_type="inner",
                                num_partitions=_join_partitions(),
                                on=("o_custkey",), right_on=("c_custkey",))

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "custdist": pa.array([], pa.int64())})
        n = b.column("n").to_numpy(zero_copy_only=False)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"c_count": pa.array(u, pa.int64()),
                         "custdist": pa.array(c, pa.int64())})

    partials = collect_table(matched.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows:
        cc = partials.column("c_count").to_numpy(zero_copy_only=False)
        cd = partials.column("custdist").to_numpy(zero_copy_only=False)
        order = np.argsort(cc, kind="stable")
        starts, _ = segments(cc[order])
        counts = cc[order][starts]
        dist = np.add.reduceat(cd[order], starts)
        n_matched = int(dist.sum())
    else:
        counts = np.empty(0, dtype=np.int64)
        dist = np.empty(0, dtype=np.int64)
        n_matched = 0
    n_zero = n_customers - n_matched
    if n_zero > 0:
        counts = np.append(counts, 0)
        dist = np.append(dist, n_zero)
    order = np.lexsort((-counts, -dist))
    return pa.table({
        "c_count": pa.array(counts[order], pa.int64()),
        "custdist": pa.array(dist[order], pa.int64()),
    })


_Q19_CLAUSES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — OR of conjunctions
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#15", 1, 15, 20.0, 30.0),
)


def disjunctive_filter_revenue(
        sf_dir: str,
        clauses: "tuple[tuple[str, int, int, float, float], ...]"
        = _Q19_CLAUSES,
        broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q19-shaped DISJUNCTIVE residual predicate join: revenue
    from lineitems whose part satisfies any of several
    (brand, size-range, quantity-range) conjunctions. The predicate
    spans both tables (quantity is a fact column, brand/size are
    dimension columns), so it cannot be pushed into either scan — it
    evaluates vectorized AFTER the join attach, which is the shape
    that distinguishes it from the pushed-down-window joins.

    part broadcasts under the gate as three sorted parallel arrays
    (partkey, clause-brand index, size) — the brand strings are mapped
    to clause indices ONCE on the driver so the per-batch predicate is
    pure integer/float compare, no string ops in the hot loop; above
    the gate it is a distributed hash join on partkey followed by the
    same vectorized predicate. Returns one row
    (revenue, n_lineitems)."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_brand", "p_size"])
    clause_brands = pa.array([c[0] for c in clauses], pa.string())

    def brand_to_clause(brand_col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
        """Vectorized brand -> clause-index map (-1 = no clause names
        the brand); pc.index_in, no per-row Python."""
        idx = pc.index_in(brand_col, value_set=clause_brands)
        return pc.fill_null(pc.cast(idx, pa.int64()), -1) \
            .to_numpy(zero_copy_only=False)

    size_lo = np.array([c[1] for c in clauses], dtype=np.int64)
    size_hi = np.array([c[2] for c in clauses], dtype=np.int64)
    qty_lo = np.array([c[3] for c in clauses], dtype=np.float64)
    qty_hi = np.array([c[4] for c in clauses], dtype=np.float64)

    def eval_pred(bidx: np.ndarray, size: np.ndarray,
                  qty: np.ndarray) -> np.ndarray:
        """Vectorized OR-of-conjunctions: bidx = clause index of the
        row's brand (-1 = no clause names it, row cannot match)."""
        hit = bidx >= 0
        ci = np.where(hit, bidx, 0)
        return (hit & (size >= size_lo[ci]) & (size <= size_hi[ci])
                & (qty >= qty_lo[ci]) & (qty <= qty_hi[ci]))

    def rev_partial(keep: np.ndarray, price: np.ndarray,
                    disc: np.ndarray) -> pa.Table:
        rev = (price * (1.0 - disc))[keep]
        return pa.table({
            "revenue": pa.array([float(rev.sum())], pa.float64()),
            "n_lineitems": pa.array([int(keep.sum())], pa.int64()),
        })

    if part.count() <= broadcast_max:
        pt = collect_table(part)
        pk = pt.column("p_partkey").to_numpy(zero_copy_only=False)
        bidx = brand_to_clause(pt.column("p_brand"))
        psize = pt.column("p_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(pk)
        pk = pk[order]
        if len(pk) > 1 and (pk[1:] == pk[:-1]).any():
            raise AssertionError(
                "disjunctive_filter_revenue: duplicate p_partkey in "
                "broadcast side — use the distributed path")
        ref = ray.put((pk, bidx[order], psize[order]))

        def attach_eval(b: pa.Table) -> pa.Table:
            keys, bi, sz = ray.get(ref)
            lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            pos, hit = _sorted_lookup(keys, lpk)
            if len(keys) and not hit.all():
                raise AssertionError("l_partkey missing from part table")
            qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
            keep = eval_pred(bi[pos], sz[pos], qty) if len(keys) else \
                np.zeros(len(lpk), dtype=bool)
            return rev_partial(
                keep, b.column("l_extendedprice").to_numpy(zero_copy_only=False),
                b.column("l_discount").to_numpy(zero_copy_only=False))

        attach_eval.__name__ = "DisjunctivePredicate"
        partials = collect_table(li.map_batches(
            attach_eval, batch_format="pyarrow", zero_copy_batch=True))
    else:
        def part_project(b: pa.Table) -> pa.Table:
            return pa.table({
                "p_partkey": b.column("p_partkey"),
                "bidx": pa.array(brand_to_clause(b.column("p_brand")),
                                 pa.int64()),
                "p_size": b.column("p_size").cast(pa.int64()),
            })

        part_f = part.map_batches(part_project, batch_format="pyarrow",
                                  zero_copy_batch=True)
        _hash_shuffle_on(li, part_f)
        joined = li.join(part_f, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=("l_partkey",), right_on=("p_partkey",))

        def eval_joined(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"revenue": pa.array([0.0], pa.float64()),
                                 "n_lineitems": pa.array([0], pa.int64())})
            keep = eval_pred(
                b.column("bidx").to_numpy(zero_copy_only=False),
                b.column("p_size").to_numpy(zero_copy_only=False),
                b.column("l_quantity").to_numpy(zero_copy_only=False))
            return rev_partial(
                keep, b.column("l_extendedprice").to_numpy(zero_copy_only=False),
                b.column("l_discount").to_numpy(zero_copy_only=False))

        eval_joined.__name__ = "DisjunctivePredicate"
        partials = collect_table(joined.map_batches(
            eval_joined, batch_format="pyarrow", zero_copy_batch=True))

    rev = float(np.sum(partials.column("revenue")
                       .to_numpy(zero_copy_only=False))) \
        if partials.num_rows else 0.0
    n = int(np.sum(partials.column("n_lineitems")
                   .to_numpy(zero_copy_only=False))) \
        if partials.num_rows else 0
    return pa.table({
        "revenue": pa.array([round(rev, 2)], pa.float64()),
        "n_lineitems": pa.array([n], pa.int64()),
    })


def monthly_revenue(sf_dir: str) -> pa.Table:
    """Time-bucketed trend aggregate: orders rolled up to calendar
    months — (month, n_orders, revenue). The date_trunc group key is
    derived vectorized (int64 microseconds -> datetime64[M]) inside a
    per-block combiner; partials are months-count-sized (tens of rows
    per block at any corpus size), so the whole query is ONE streaming
    pass with a driver merge — no exchange at all, the cheapest shape
    a calendar-trend query can have."""
    from nise_ray.ops.groupapply import segments

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64())})
        ts = b.column("o_orderdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        month = ts.astype("datetime64[us]").astype("datetime64[M]") \
            .astype("datetime64[us]").astype(np.int64)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        order = np.argsort(month, kind="stable")
        starts, counts = segments(month[order])
        return pa.table({
            "m": pa.array(month[order][starts], pa.int64()),
            "n_orders": pa.array(counts, pa.int64()),
            "revenue": pa.array(np.add.reduceat(price[order], starts),
                                pa.float64()),
        })

    partials = collect_table(orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"month": pa.array([], pa.timestamp("us")),
                         "n_orders": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64())})
    m = partials.column("m").to_numpy(zero_copy_only=False)
    order = np.argsort(m, kind="stable")
    starts, _ = segments(m[order])
    n = np.add.reduceat(partials.column("n_orders")
                        .to_numpy(zero_copy_only=False)[order], starts)
    rev = np.add.reduceat(partials.column("revenue")
                          .to_numpy(zero_copy_only=False)[order], starts)
    return pa.table({
        "month": pa.array(m[order][starts], pa.int64())
            .cast(pa.timestamp("us")),
        "n_orders": pa.array(n, pa.int64()),
        "revenue": pa.array(np.round(rev, 2), pa.float64()),
    })


def high_value_user_sets(sf_dir: str, op: str = "intersect",
                         type_a: str = "purchase", type_b: str = "error",
                         min_value: float = 180.0) -> "ray.data.Dataset":
    """Distributed SET OPERATION (INTERSECT / EXCEPT) over two derived
    key sets: users with a high-value `type_a` event vs users with a
    high-value `type_b` event. INTERSECT returns users in both sets,
    EXCEPT the users in A but not B — the audience/segment algebra a
    targeting or cohort pipeline runs, and the one relational primitive
    family (set ops) the inventory did not yet cover explicitly.

    Plan: the scan is pushed down to rows matching EITHER predicate
    (two sparse sets, not the events table); each block pre-collapses to
    distinct (user_id, in_a, in_b) membership bits via one lexsort +
    bitwise-or reduceat (the exchange carries at most 2x|A union B| rows,
    never events-sized); ONE hash exchange on user_id ORs the bits and
    applies the set predicate. No driver materialization; output streams
    as a user_id column. At 100 TB this is a combiner-shaped distinct —
    the same shape as event_type_user_counts — so skew is bounded by the
    per-user bit pair, not event multiplicity."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    flt = (((pads.field("event_type") == type_a)
            | (pads.field("event_type") == type_b))
           & (pads.field("value") > min_value))
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"],
                               filter=flt)
    # a predicate that prunes EVERY fragment leaves a block-less dataset
    # (schema None); anchor one impossible-key row (user_id -1, side-b
    # bit only) that the set predicate always drops, so the output keeps
    # its schema even when both sets are empty.
    ds = _anchor_sentinel(ds, {"user_id": (pa.int64(), -1),
                               "event_type": (pa.string(), type_b),
                               "value": (pa.float64(), float("inf"))})
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def membership(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "in_a": pa.array([], pa.uint8()),
                             "in_b": pa.array([], pa.uint8())})
        # the read filter already applied value>min and type in {a,b};
        # re-derive the side bit only.
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        is_a = pc.equal(b.column("event_type"), type_a) \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        su = uid[order]
        bits = np.where(is_a[order], np.uint8(1), np.uint8(2))
        starts, _ = segments(su)
        merged = np.bitwise_or.reduceat(bits, starts)
        return pa.table({"user_id": pa.array(su[starts], pa.int64()),
                         "in_a": pa.array((merged & 1).astype(np.uint8)),
                         "in_b": pa.array(((merged >> 1) & 1)
                                          .astype(np.uint8))})

    pre = ds.map_batches(membership, batch_format="pyarrow",
                         zero_copy_batch=True)

    def setop(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64())})
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        bits = (batch.column("in_a").to_numpy(zero_copy_only=False)
                | (batch.column("in_b").to_numpy(zero_copy_only=False)
                   << 1))
        order = np.argsort(uid, kind="stable")
        su = uid[order]
        starts, _ = segments(su)
        merged = np.bitwise_or.reduceat(bits[order], starts)
        if op == "intersect":
            keep = merged == 3
        else:  # except: in A, not in B
            keep = merged == 1
        return pa.table({"user_id": pa.array(su[starts][keep], pa.int64())})

    return hash_group_apply(pre, ["user_id"], setop, 0, sort=False)


def top_suppliers_by_qty(sf_dir: str, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01") -> pa.Table:
    """TPC-H-Q15-shaped SCALAR-MAX-WITH-TIES selection: suppliers whose
    shipped quantity over a date window equals the global maximum —
    the argmax-over-an-aggregate shape (Q15's top-supplier view), kept
    integer-exact on purpose: Q15 ranks by an FP revenue sum whose
    low-bit accumulation order differs across engines, so equality
    against the max is not a portable contract; quantity is an
    integer-valued column, sums exactly in any order, and makes the tie
    set deterministic (documented deviation from the literal Q15).

    Plan: the date window is pushed into the parquet scan; each block
    emits supplier-count-bounded (l_suppkey, total_qty) partials
    (combiner); the driver merges group-count-sized partials
    Arrow-native and applies the max filter — no corpus-sized driver
    work, one scan, zero exchanges."""
    import pyarrow.dataset as pads
    from datetime import datetime

    lo = datetime.fromisoformat(date_lo)
    hi = datetime.fromisoformat(date_hi)
    flt = ((pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi))
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_quantity"],
                               filter=flt)
    from nise_ray.ops.groupapply import segments

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "total_qty": pa.array([], pa.int64())})
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)  # integer-valued by TPC-H contract
        order = np.argsort(sk, kind="stable")
        starts, _ = segments(sk[order])
        sums = np.add.reduceat(qty[order], starts)
        return pa.table({"l_suppkey": pa.array(sk[order][starts], pa.int64()),
                         "total_qty": pa.array(sums, pa.int64())})

    partials = collect_table(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"l_suppkey": pa.array([], pa.int64()),
                         "total_qty": pa.array([], pa.int64())})
    # int-keyed Arrow/numpy merge (the shared _merge_grouped_partials is
    # string-key-only): one argsort + reduceat over the partials
    sk = partials.column("l_suppkey").to_numpy(zero_copy_only=False)
    tqp = partials.column("total_qty").to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    starts, _ = segments(sk[order])
    tq = np.add.reduceat(tqp[order], starts)
    keep = np.flatnonzero(tq == tq.max())
    return pa.table({"l_suppkey": pa.array(sk[order][starts][keep],
                                           pa.int64()),
                     "total_qty": pa.array(tq[keep], pa.int64())})


def brand_supplier_counts(sf_dir: str, size_lo: int = 1, size_hi: int = 25,
                          broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q16-shaped supplier diversity report: distinct suppliers
    per part brand, for parts in a size window, EXCLUDING flagged
    suppliers (NOT IN subquery — here the negative-balance proxy, the
    synthetic schema has no comment column). Composes three primitives
    in one query: a NOT-IN anti filter, a dimension join, and a grouped
    COUNT DISTINCT.

    Plan, both sides scale-gated: the excluded-supplier set (filter on a
    dimension scan) broadcasts as a sorted key array into a vectorized
    drop filter (distributed LEFT ANTI join above the gate); the
    size-windowed part→brand map broadcasts as a sorted lookup
    (distributed inner join above the gate) — misses are dropped, which
    IS the inner-join/window semantics; then the distinct count is the
    event_type_user_counts combiner shape: per-block distinct
    (brand, suppkey) pairs, ONE brand exchange, per-segment pair count.
    Returns (p_brand, supplier_cnt) sorted by brand."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
        filter=(pads.field("p_size") >= size_lo)
               & (pads.field("p_size") <= size_hi))
    excl = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey"],
                                 filter=pads.field("s_acctbal") < 0.0)
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    n_supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                   columns=["s_suppkey"]).count()
    if n_supp <= broadcast_max:
        et = collect_table(excl)
        ex_keys = (np.unique(et.column("s_suppkey")
                             .to_numpy(zero_copy_only=False))
                   if et.num_rows else np.empty(0, dtype=np.int64))
        ex_ref = ray.put(ex_keys)

        def drop_excluded(b: pa.Table) -> pa.Table:
            ex = ray.get(ex_ref)
            if len(ex) == 0 or b.num_rows == 0:
                return b
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ex, sk), 0, len(ex) - 1)
            return b.filter(pa.array(ex[pos] != sk))

        drop_excluded.__name__ = "DropExcludedSuppliers"
        li = li.map_batches(drop_excluded, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        # fabricated anti-side key -2 matches no real supplier; the li
        # sentinel (-1) survives the anti join and dies at brand attach
        excl_j = _anchor_sentinel(excl, {"s_suppkey": (pa.int64(), -2)})
        li_j = _anchor_sentinel(li, {"l_partkey": (pa.int64(), -1),
                                     "l_suppkey": (pa.int64(), -1)})
        _hash_shuffle_on(li_j, excl_j)
        li = li_j.join(excl_j, join_type="left_anti",
                       num_partitions=_join_partitions(),
                       on=("l_suppkey",), right_on=("s_suppkey",))

    n_parts = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                    columns=["p_partkey"]).count()
    if n_parts <= broadcast_max:
        ptab = collect_table(part)
        if ptab.num_rows:
            pk = ptab.column("p_partkey").to_numpy(zero_copy_only=False)
            order = np.argsort(pk)
            pk = pk[order]
            assert not (len(pk) > 1 and (pk[1:] == pk[:-1]).any()), \
                "duplicate p_partkey in broadcast side"
            brands = np.asarray(ptab.column("p_brand").to_pylist(),
                                dtype=object)[order]
        else:
            pk = np.empty(0, dtype=np.int64)
            brands = np.empty(0, dtype=object)
        pref = ray.put((pk, brands))

        def attach_brand(b: pa.Table) -> pa.Table:
            keys, br = ray.get(pref)
            if b.num_rows == 0 or len(keys) == 0:
                return pa.table({"p_brand": pa.array([], pa.string()),
                                 "l_suppkey": pa.array([], pa.int64())})
            lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys, lpk), 0, len(keys) - 1)
            hit = keys[pos] == lpk  # out-of-window parts drop (inner join)
            return pa.table({
                "p_brand": pa.array(br[pos][hit].astype(object),
                                    pa.string()),
                "l_suppkey": b.column("l_suppkey").filter(pa.array(hit)),
            })

        attach_brand.__name__ = "AttachBrand"
        pairs = li.map_batches(attach_brand, batch_format="pyarrow",
                               zero_copy_batch=True)
    else:
        part_j = _anchor_sentinel(part, {"p_partkey": (pa.int64(), -3),
                                         "p_brand": (pa.string(), "")})
        _hash_shuffle_on(li, part_j)
        pairs = li.join(part_j, join_type="inner",
                        num_partitions=_join_partitions(),
                        on=("l_partkey",), right_on=("p_partkey",))

    def distinct_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "l_suppkey": pa.array([], pa.int64())})
        br = b.column("p_brand").combine_chunks().dictionary_encode()
        codes = br.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, codes))
        sc, ss = codes[order], sk[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (sc[1:] != sc[:-1]) | (ss[1:] != ss[:-1])
        keep = np.flatnonzero(first)
        return pa.table({
            "p_brand": br.dictionary.take(pa.array(sc[keep]))
            .cast(pa.string()),
            "l_suppkey": pa.array(ss[keep], pa.int64()),
        })

    pre = pairs.map_batches(distinct_pairs, batch_format="pyarrow",
                            zero_copy_batch=True)

    def count_distinct(batch: pa.Table) -> pa.Table:
        out = distinct_pairs(batch)
        if out.num_rows == 0:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "supplier_cnt": pa.array([], pa.int64())})
        br = out.column("p_brand").combine_chunks().dictionary_encode()
        codes = br.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, counts = segments(codes[order])
        return pa.table({
            "p_brand": br.dictionary.take(pa.array(codes[order][starts]))
            .cast(pa.string()),
            "supplier_cnt": pa.array(counts, pa.int64()),
        })

    out = collect_table(hash_group_apply(pre, ["p_brand"], count_distinct,
                                         0, sort=False))
    # a fully-empty result collects column-less (empty-block pass-through)
    if out.num_rows == 0 or "p_brand" not in out.schema.names:
        return pa.table({"p_brand": pa.array([], pa.string()),
                         "supplier_cnt": pa.array([], pa.int64())})
    # sentinel brand '' (join path) carries no real pair; drop if present
    keep = np.asarray([x != "" for x in
                       out.column("p_brand").to_pylist()])
    out = out.filter(pa.array(keep))
    return out.sort_by([("p_brand", "ascending")])


def returned_item_report(sf_dir: str, k: int = 20,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01",
                         broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q10-shaped RETURNED-ITEM report: the top-k customers by
    revenue lost to returns in one quarter — lineitem (l_returnflag='R')
    ⋈ orders (one-quarter o_orderdate window) ⋈ customer ⋈ nation,
    grouped per customer, top-k by revenue desc / c_custkey asc.
    Returns (c_custkey, c_name, revenue, c_acctbal, n_name).

    Scale plan: both fact filters are pushed into the parquet read
    (returnflag dictionary page + orderdate row groups never leave
    storage); the orders side below `broadcast_max` becomes a ray.put
    custkey-attach inside map_batches (one pass over lineitem, no
    exchange), above it a distributed hash join on orderkey; revenue
    partial-aggregates per custkey INSIDE each block before the one
    custkey hash exchange; per-block pre-top-k means at most k rows per
    partition reach the driver merge. Customer attributes and the
    25-row nation dimension are attached to the k winner rows only —
    the customer scan is filtered by a k-key broadcast, so no
    customer-sized structure ever reaches the driver."""
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    lo = np.datetime64(date_lo, "us").item()
    hi = np.datetime64(date_hi, "us").item()
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo)
               & (pads.field("o_orderdate") < hi))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R")

    def li_rev(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "rev": pa.array(price * (1.0 - disc), pa.float64())})

    li_f = li.map_batches(li_rev, batch_format="pyarrow",
                          zero_copy_batch=True)

    if orders.count() <= broadcast_max:
        ot = collect_table(orders)
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        oc = ot.column("o_custkey").to_numpy(zero_copy_only=False)
        oo = np.argsort(ok)
        ref = ray.put((ok[oo], oc[oo]))

        class AttachCustkey:
            def __init__(self) -> None:
                self.keys, self.cust = ray.get(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
                pos, hit = _sorted_lookup(self.keys, lk)
                return pa.table({
                    "o_custkey": pa.array(self.cust[pos[hit]], pa.int64()),
                    "rev": b.column("rev").filter(pa.array(hit))})

        joined = li_f.map_batches(AttachCustkey, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  concurrency=default_concurrency())
    else:
        li_f = _anchor_sentinel(li_f, {"l_orderkey": (pa.int64(), -1),
                                       "rev": (pa.float64(), 0.0)})
        orders_j = _anchor_sentinel(orders,
                                    {"o_orderkey": (pa.int64(), -2),
                                     "o_custkey": (pa.int64(), -2)})
        _hash_shuffle_on(li_f, orders_j)
        joined = li_f.join(orders_j, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("l_orderkey",), right_on=("o_orderkey",)) \
            .select_columns(["o_custkey", "rev"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        rv = b.column("rev").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cks, rvs = ck[order], rv[order]
        starts, _ = segments(cks)
        return pa.table({
            "o_custkey": pa.array(cks[starts].astype(np.int64), pa.int64()),
            "rev": pa.array(np.add.reduceat(rvs, starts), pa.float64())})

    def per_cust(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("c_custkey", pa.int64()),
                                ("revenue", pa.float64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        rv = b.column("rev").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cks, rvs = ck[order], rv[order]
        starts, _ = segments(cks)
        keys = cks[starts].astype(np.int64)
        sums = np.round(np.add.reduceat(rvs, starts), 2)
        if len(keys) > k:            # pre-top-k: k rows leave the block
            keep = np.lexsort((keys, -sums))[:k]
            keys, sums = keys[keep], sums[keep]
        return pa.table({"c_custkey": pa.array(keys, pa.int64()),
                         "revenue": pa.array(sums, pa.float64())})

    pre = joined.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    agg = hash_group_apply(pre, ["o_custkey"], per_cust, 0, sort=False)
    t = collect_table(agg)
    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "c_name": pa.array([], pa.string()),
                      "revenue": pa.array([], pa.float64()),
                      "c_acctbal": pa.array([], pa.float64()),
                      "n_name": pa.array([], pa.string())})
    if t.num_rows == 0:
        return empty
    ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
    rv = t.column("revenue").to_numpy(zero_copy_only=False)
    keep = np.lexsort((ck, -rv))[:k]
    win_keys, win_rev = ck[keep], rv[keep]

    # attach customer attrs to the k winners only: k-key broadcast
    # filter over the customer scan, k rows collected
    wref = ray.put(np.sort(win_keys))

    class WinnerFilter:
        def __init__(self) -> None:
            self.keys = ray.get(wref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ckv = b.column("c_custkey").to_numpy(zero_copy_only=False)
            _, hit = _sorted_lookup(self.keys, ckv)
            return b.filter(pa.array(hit))

    cust_rows = collect_table(ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(WinnerFilter, batch_format="pyarrow",
                  zero_copy_batch=True,
                  concurrency=default_concurrency()))
    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    nk = nation_t.column("n_nationkey").to_numpy(zero_copy_only=False)
    nnames = np.array(nation_t.column("n_name").to_pylist(), dtype=object)
    no = np.argsort(nk)
    nk, nnames = nk[no], nnames[no]

    cust_k = cust_rows.column("c_custkey").to_numpy(zero_copy_only=False)
    co = np.argsort(cust_k)
    pos, hit = _sorted_lookup(cust_k[co], win_keys)
    if not hit.all():
        raise AssertionError("winner custkey missing from customer table")
    sel = co[pos]
    cnat = cust_rows.column("c_nationkey").to_numpy(
        zero_copy_only=False)[sel]
    npos, nhit = _sorted_lookup(nk, cnat)
    if not nhit.all():
        raise AssertionError("customer nationkey missing from nation")
    return pa.table({
        "c_custkey": pa.array(win_keys, pa.int64()),
        "c_name": cust_rows.column("c_name").take(pa.array(sel)),
        "revenue": pa.array(win_rev, pa.float64()),
        "c_acctbal": cust_rows.column("c_acctbal").take(pa.array(sel)),
        "n_name": pa.array(list(nnames[npos]), pa.string())})


def global_sales_opportunity(sf_dir: str, n_nations: int = 7,
                             min_price: float = 350_000.0,
                             broadcast_max: int = 5_000_000) -> pa.Table:
    """TPC-H-Q22-shaped opportunity report: customers in a fixed nation
    subset whose account balance is above the average POSITIVE balance
    of that subset and who have placed no LARGE order (none above
    `min_price` — this corpus's every customer has at least one order,
    so the classic NOT EXISTS over raw orders is vacuous), rolled up
    per nation as (n_name, numcust, totacctbal). The classic Q22
    phone-prefix country filter maps to a c_nationkey < n_nations
    subset (the customer table has no phone column).

    Scale plan, three driver-sized scalars and no corpus materialization:
      1. the scalar subquery avg(c_acctbal > 0) is a per-block
         (sum, count) combiner collected as ONE row;
      2. the order side is filtered AT THE READ (o_totalprice
         pushdown) and shrunk to DISTINCT custkeys with the same
         per-batch combiner + one exchange customers_without_orders
         uses, then gate: ray.put NOT-IN broadcast below
         `broadcast_max`, Ray Data left_anti hash join above;
      3. the surviving (nation-filtered, above-average, order-less)
         customers partial-aggregate (count, sum acctbal) per nation
         inside each block — the final exchange is nation-count-sized.
    """
    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        keep = (nk < n_nations) & (bal > 0.0)
        return pa.table({"s": pa.array([bal[keep].sum()], pa.float64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    bp = collect_table(cust.map_batches(bal_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    n_pos = int(np.sum(bp.column("n").to_numpy(zero_copy_only=False)))
    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "numcust": pa.array([], pa.int64()),
                      "totacctbal": pa.array([], pa.float64())})
    if n_pos == 0:
        return empty
    avg_bal = float(np.sum(bp.column("s").to_numpy(
        zero_copy_only=False))) / n_pos

    def rich_filter(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        keep = (nk < n_nations) & (bal > avg_bal)
        return b.filter(pa.array(keep))

    rich = cust.map_batches(rich_filter, batch_format="pyarrow",
                            zero_copy_batch=True)

    import pyarrow.dataset as pads

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"],
                                   filter=pads.field("o_totalprice")
                                   > min_price)

    def local_distinct(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(np.unique(ck), pa.int64())})

    distinct = hash_group_apply(orders.map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], local_distinct, 0, sort=False)

    if cust.count() <= broadcast_max:
        dt = collect_table(distinct)
        keys = np.unique(dt.column("o_custkey").to_numpy(
            zero_copy_only=False)) if dt.num_rows else \
            np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)

        class AntiFilter:
            def __init__(self) -> None:
                self.keys = ray.get(keys_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
                _, has = _sorted_lookup(self.keys, ck)
                return b.filter(pa.array(~has))

        lonely = rich.map_batches(AntiFilter, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  concurrency=default_concurrency())
    else:
        rich = _anchor_sentinel(rich, {"c_custkey": (pa.int64(), -1),
                                       "c_nationkey": (pa.int64(), -1),
                                       "c_acctbal": (pa.float64(), 0.0)})
        distinct = _anchor_sentinel(distinct,
                                    {"o_custkey": (pa.int64(), -2)})
        _hash_shuffle_on(rich, distinct)
        lonely = rich.join(distinct, join_type="left_anti",
                           num_partitions=_join_partitions(),
                           on=("c_custkey",), right_on=("o_custkey",))

    def nation_partial(b: pa.Table) -> pa.Table:
        sch = pa.table({"c_nationkey": pa.array([], pa.int64()),
                        "numcust": pa.array([], pa.int64()),
                        "bal": pa.array([], pa.float64())})
        if b.num_rows == 0 or "c_nationkey" not in b.schema.names:
            return sch
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        real = nk >= 0                       # drop join-path sentinel
        nk, bal = nk[real], bal[real]
        if len(nk) == 0:
            return sch
        order = np.argsort(nk, kind="stable")
        starts, counts = segments(nk[order])
        return pa.table({
            "c_nationkey": pa.array(nk[order][starts].astype(np.int64),
                                    pa.int64()),
            "numcust": pa.array(counts, pa.int64()),
            "bal": pa.array(np.add.reduceat(bal[order], starts),
                            pa.float64())})

    def nation_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "numcust": pa.array([], pa.int64()),
                             "bal": pa.array([], pa.float64())})
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        n = b.column("numcust").to_numpy(zero_copy_only=False)
        s = b.column("bal").to_numpy(zero_copy_only=False)
        order = np.argsort(nk, kind="stable")
        starts, _ = segments(nk[order])
        return pa.table({
            "c_nationkey": pa.array(nk[order][starts], pa.int64()),
            "numcust": pa.array(np.add.reduceat(n[order], starts),
                                pa.int64()),
            "bal": pa.array(np.add.reduceat(s[order], starts),
                            pa.float64())})

    out = hash_group_apply(lonely.map_batches(
        nation_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["c_nationkey"], nation_merge, 0, sort=False)
    t = collect_table(out)
    if t.num_rows == 0 or t.num_columns == 0:
        return empty
    nation_t = collect_table(ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]))
    nk = nation_t.column("n_nationkey").to_numpy(zero_copy_only=False)
    nnames = np.array(nation_t.column("n_name").to_pylist(), dtype=object)
    no = np.argsort(nk)
    nk, nnames = nk[no], nnames[no]
    ck = t.column("c_nationkey").to_numpy(zero_copy_only=False)
    pos, hit = _sorted_lookup(nk, ck)
    if not hit.all():
        raise AssertionError("customer nationkey missing from nation")
    res = pa.table({
        "n_name": pa.array(list(nnames[pos]), pa.string()),
        "numcust": t.column("numcust"),
        "totacctbal": pa.array(
            np.round(t.column("bal").to_numpy(zero_copy_only=False), 2),
            pa.float64())})
    return res.sort_by([("n_name", "ascending")])
