"""Sequence packing for training-data preparation: assign every
document a (bin_id, start_off) position in a fixed-capacity token
stream — the GPT-style "concatenate everything in a canonical order and
split at context-window boundaries" layout. The core primitive is a
DISTRIBUTED ORDERED PREFIX SCAN (running sum over a global sort order),
which no other operator in the repo needed until now: window ops
partition by a key (user_id, lang) so each group fits one block; the
packing scan is over the WHOLE corpus in doc_id order.

Scale shape (the classic two-phase scan):
  1. token counts per doc (one vectorized Arrow-regex pass, the
     token_stats contract), then ONE range-partitioned sort on doc_id
     (Ray's distributed sort) over (doc_id, n_tokens) rows only —
     16 bytes/doc on the exchange, never the text.
  2. a tag pass stamps each sorted block's rows with the block's first
     doc_id and a within-block exclusive cumsum (vectorized),
  3. block totals are combined DRIVER-side (one tiny row per block),
     exclusive-cumsummed in block order, and broadcast once, and
  4. a stateless map adds the block offset and derives
     bin_id = excl // capacity, start_off = excl % capacity.
Correctness does NOT depend on Ray preserving block boundaries between
passes: every row carries its block tag and local cumsum, and the
block-total rollup groups by the tag VALUE, so re-splitting blocks
between stages cannot change the result. The only materialization is
the tagged (4 × int64)-column dataset, which is consumed twice (rollup
+ final map) — at 10^10 docs that is ~320 GB across the cluster's
object store, the standard cost of a two-pass scan, and 3 orders of
magnitude smaller than the corpus text it indexes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table


def _ntokens_batch(b: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    return pa.table({
        "doc_id": b.column("doc_id").cast(pa.int64()),
        "n_tokens": pc.count_substring_regex(
            b.column("text"), r"[A-Za-z0-9_]+").cast(pa.int64()),
    })


_TAGGED_SCHEMA = pa.schema([("doc_id", pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("blk", pa.int64()),
                            ("loc_excl", pa.int64())])


def packed_docs(sf_dir: str, capacity: int = 2048) -> "ray.data.Dataset":
    """(doc_id, n_tokens, bin_id, start_off): the packed position of
    every document when the corpus is concatenated in doc_id order and
    split into `capacity`-token bins. start_off is the document's first
    token's offset within its bin; a doc may straddle bins (greedy
    split semantics — the oracle is the exclusive running token sum)."""

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    counts = ds.map_batches(_ntokens_batch, batch_format="pyarrow",
                            zero_copy_batch=True)

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _TAGGED_SCHEMA.empty_table()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        excl = np.cumsum(nt) - nt
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "blk": pa.array(np.full(len(ids), ids[0]), pa.int64()),
            "loc_excl": pa.array(excl, pa.int64()),
        })

    # batch_size=None → whole sorted blocks, so blk = the block's first
    # doc_id is unique per block and ascending in global doc order.
    tagged = counts.sort("doc_id").map_batches(
        tag, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()

    def blk_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"blk": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        from nise_ray.ops.groupapply import segments
        blk = b.column("blk").to_numpy(zero_copy_only=False)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(blk, kind="stable")
        sb, snt = blk[order], nt[order]
        starts, _ = segments(sb)
        # integer reduceat, not bincount(weights=) — float64 weights
        # lose exactness past 2^53 total tokens
        tot = np.add.reduceat(snt, starts)
        return pa.table({"blk": pa.array(sb[starts], pa.int64()),
                         "total": pa.array(tot, pa.int64())})

    parts = collect_table(tagged.map_batches(
        blk_partial, batch_format="pyarrow", zero_copy_batch=True))
    if parts.num_rows == 0:
        return tagged.map_batches(
            lambda b: pa.table({"doc_id": pa.array([], pa.int64()),
                                "n_tokens": pa.array([], pa.int64()),
                                "bin_id": pa.array([], pa.int64()),
                                "start_off": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    from nise_ray.ops.groupapply import segments
    blk = parts.column("blk").to_numpy(zero_copy_only=False)
    tot = parts.column("total").to_numpy(zero_copy_only=False)
    order = np.argsort(blk, kind="stable")
    sb, st = blk[order], tot[order]
    starts, _ = segments(sb)
    ub = sb[starts]
    totals = np.add.reduceat(st, starts)
    offsets = np.cumsum(totals) - totals          # exclusive, blk order
    off_ref = ray.put((ub, offsets))

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "bin_id": pa.array([], pa.int64()),
                             "start_off": pa.array([], pa.int64())})
        ubl, offs = ray.get(off_ref)
        bk = b.column("blk").to_numpy(zero_copy_only=False)
        loc = b.column("loc_excl").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ubl, bk)
        excl = offs[pos] + loc
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "bin_id": pa.array(excl // capacity, pa.int64()),
            "start_off": pa.array(excl % capacity, pa.int64()),
        })

    return tagged.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)
