"""Bloom-filter semi-join: the broadcast-prefilter + exact-confirm
pattern for filtering a HUGE probe side by membership in a large key set.

At 100 TB the probe side (lineitem-scale) cannot afford a full exchange
just to drop non-matching rows, and the key set (orders-scale) is too
big to broadcast exactly. A Bloom bitmap is the standard middle path:

  1. BUILD — per-block bitmap partials over the key side (one
     ``m_bits/8``-byte uint8 array each, k Kirsch-Mitzenmacher probes
     per key), OR-merged in a TWO-LEVEL tree (block partials ->
     repartition to a handful of blocks -> per-block OR -> driver ORs
     the handful). The driver never sees more than ``merge_blocks``
     bitmaps at once, and the final bitmap is broadcast ONCE via
     ray.put.
  2. PREFILTER — every probe block tests its keys against the bitmap
     (vectorized bit arithmetic, zero exchange). False positives pass
     (bounded by the classic (1-e^{-kn/m})^k rate), false negatives are
     impossible.
  3. CONFIRM — only the surviving sliver rides the tagged co-group
     exchange with the distinct key set, which removes the false
     positives exactly.

The result is therefore EXACT (the bloom stage only shrinks what the
confirm exchange must move), which is what lets a DuckDB semi-join
oracle hash it bit-for-bit.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

from nise_ray.hashing import splitmix64
from nise_ray.ops.groupapply import hash_group_apply, segments
from nise_ray.util import collect_table

logger = logging.getLogger(__name__)

DEFAULT_M_BITS = 1 << 22  # 512 KiB bitmap; ~0.2% fp at 1M keys, k=4
DEFAULT_K = 4


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m, h1/h2 two splitmix64 passes."""
    u = keys.astype(np.uint64)
    h1 = splitmix64(u)
    h2 = splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits))


def _set_bits(bm: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bm, (flat >> np.uint64(3)).astype(np.int64),
                     (np.uint64(1) << (flat & np.uint64(7))).astype(np.uint8))


def _test_bits(bm: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k probe bits are set (pos is (k, n))."""
    byte = (pos >> np.uint64(3)).astype(np.int64)
    bit = (pos & np.uint64(7)).astype(np.uint8)
    hits = (bm[byte] >> bit) & np.uint8(1)
    return hits.all(axis=0)


def build_bloom(keys_ds: "ray.data.Dataset", col: str,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                merge_blocks: int = 16) -> np.ndarray:
    """OR-reduce per-block bitmap partials into one bitmap (uint8 array
    of m_bits/8 bytes). Two-level: block partials -> ``merge_blocks``
    intermediate ORs -> driver OR of the handful."""

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        if b.num_rows:
            keys = b.column(col).to_numpy(zero_copy_only=False)
            _set_bits(bm, _probe_positions(keys, m_bits, k))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def or_merge(b: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        for buf in b.column("bm"):
            np.bitwise_or(bm, np.frombuffer(buf.as_py(), dtype=np.uint8),
                          out=bm)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    partial.__name__, or_merge.__name__ = "BloomPartial", "BloomOrMerge"
    parts = keys_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    merged = parts.repartition(num_blocks=merge_blocks).map_batches(
        or_merge, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    t = collect_table(merged)
    for buf in t.column("bm"):
        np.bitwise_or(bm, np.frombuffer(buf.as_py(), dtype=np.uint8),
                      out=bm)
    return bm


def urgent_items_by_flag(sf_dir: str, use_bloom: bool = True,
                         m_bits: int = DEFAULT_M_BITS,
                         k: int = DEFAULT_K) -> "ray.data.Dataset":
    """Per-returnflag item count and total quantity over lineitems that
    belong to URGENT-priority orders — a semi-join whose probe side is
    the big table. Output: (l_returnflag, n_items, sum_qty BIGINT;
    quantities are integer-valued so the sum is accumulation-order-free
    and hashes bit-exact vs the DuckDB EXISTS oracle).

    use_bloom=False runs the identical confirm path without the
    prefilter (parity-tested); the bloom only shrinks what the confirm
    exchange moves, never the result.
    """
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pa.compute.equal(b.column("o_orderpriority"), "1-URGENT")
        return pa.table({
            "l_orderkey": b.filter(m).column("o_orderkey").cast(pa.int64())})

    urgent_keys.__name__ = "UrgentKeys"
    keys_ds = orders.map_batches(urgent_keys, batch_format="pyarrow",
                                 zero_copy_batch=True)

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_quantity"])

    if use_bloom:
        bm_ref = ray.put(build_bloom(keys_ds, "l_orderkey", m_bits, k))

        class BloomPrefilter:
            def __init__(self) -> None:
                self.bm = ray.get(bm_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return b
                keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
                keep = _test_bits(self.bm, _probe_positions(keys, m_bits, k))
                return b.filter(pa.array(keep))

        items = items.map_batches(BloomPrefilter, batch_format="pyarrow",
                                  zero_copy_batch=True, concurrency=(1, 8))

    # tagged co-group confirm: survivors (side=1) + distinct urgent keys
    # (side=0) share one orderkey exchange; a group keeps its survivor
    # rows iff it contains a key row — exact, removes bloom fps.
    def tag_items(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "l_returnflag": b.column("l_returnflag"),
            "l_quantity": b.column("l_quantity").cast(pa.float64()),
            "side": pa.array(np.ones(b.num_rows, np.int64), pa.int64())})

    def tag_keys(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "l_returnflag": pa.array([""] * b.num_rows, pa.string()),
            "l_quantity": pa.array(np.zeros(b.num_rows), pa.float64()),
            "side": pa.array(np.zeros(b.num_rows, np.int64), pa.int64())})

    tag_items.__name__, tag_keys.__name__ = "TagItems", "TagKeys"
    both = items.map_batches(tag_items, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        keys_ds.map_batches(tag_keys, batch_format="pyarrow",
                            zero_copy_batch=True))

    def confirm(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_returnflag": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "q": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        side = b.column("side").to_numpy(zero_copy_only=False)
        order = np.argsort(okey, kind="stable")
        starts, counts = segments(okey[order])
        # a group has a key row iff its min side (sorted order within
        # the group is arbitrary) — use minimum.reduceat on side
        has_key = np.minimum.reduceat(side[order], starts) == 0
        keep_mask = np.repeat(has_key, counts) & (side[order] == 1)
        sel = order[keep_mask]
        if len(sel) == 0:
            return empty
        flags = b.column("l_returnflag").take(pa.array(sel))
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[sel]
        enc = flags.combine_chunks().dictionary_encode() \
            if isinstance(flags, pa.ChunkedArray) else flags.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        fo = np.argsort(code, kind="stable")
        fstarts, fcounts = segments(code[fo])
        return pa.table({
            "l_returnflag": enc.dictionary.take(pa.array(code[fo][fstarts])),
            "n": pa.array(fcounts.astype(np.int64), pa.int64()),
            "q": pa.array(np.add.reduceat(qty[fo], fstarts), pa.float64())})

    confirm.__name__ = "SemiConfirm"
    partials = hash_group_apply(both, ["l_orderkey"], confirm, 0, sort=False)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "n_items": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.int64())})
        flags = batch.column("l_returnflag")
        enc = flags.combine_chunks().dictionary_encode() \
            if isinstance(flags, pa.ChunkedArray) else flags.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        q = batch.column("q").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        starts, _ = segments(code[order])
        return pa.table({
            "l_returnflag": enc.dictionary.take(pa.array(code[order][starts])),
            "n_items": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            "sum_qty": pa.array(
                np.add.reduceat(q[order], starts).astype(np.int64),
                pa.int64())})

    merge.__name__ = "FlagMerge"
    return hash_group_apply(partials, ["l_returnflag"], merge, 0, sort=False)
