"""Hive-partitioned parquet rewrite + pruned read.

At 100 TB the single biggest read-side lever is never touching the
bytes you don't need: a corpus laid out as ``lang=<v>/...parquet``
lets every downstream per-language job open ONLY its partition's
files (directory pruning — zero I/O for other languages), on top of
the usual column projection and row-group predicate pushdown.

Scale contracts:
- the rewrite is one streaming pass: ``write_parquet(partition_cols)``
  routes rows to partition directories per block, no global shuffle
  (blocks append their slice of each partition; readers don't care
  how many files a partition has);
- the pruned read passes BOTH the partition filter (directory-level,
  skips whole subtrees) and the column projection — the plan a
  downstream per-lang consumer would actually run;
- correctness of the whole round-trip (write → prune → aggregate) is
  oracled against plain SQL over the ORIGINAL table, so a row lost or
  duplicated by the rewrite fails the gate.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray


def write_hive_partitioned(sf_dir: str, out_dir: str) -> str:
    """Rewrite documents as out_dir/lang=<v>/*.parquet (idempotent:
    mode='overwrite' replaces a previous layout)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    ds.write_parquet(out_dir, partition_cols=["lang"], mode="overwrite")
    return out_dir


def hive_pruned_counts(sf_dir: str, lang: str = "en",
                       out_dir: str | None = None) -> pa.Table:
    """Round-trip: hive-partition the corpus by lang, then run a
    per-source doc count + char sum over ONE language partition via a
    directory-pruned, column-projected read. Returns
    (source, n_docs, sum_chars) for the chosen lang."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    if out_dir is None:
        out_dir = os.path.join(
            "/tmp/nise_hive",
            os.path.basename(os.path.normpath(sf_dir)))
    write_hive_partitioned(sf_dir, out_dir)

    # PathPartitionFilter prunes at FILE LISTING time — non-matching
    # lang= directories are never opened (true zero-I/O pruning, one
    # level stronger than a row-group predicate); columns prune pages
    from ray.data.datasource.partitioning import PathPartitionFilter
    prune = PathPartitionFilter.of(
        lambda kv: kv.get("lang") == lang, style="hive")
    ds = ray.data.read_parquet(
        out_dir, columns=["source", "n_chars"],
        partition_filter=prune)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "sum_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        starts, counts = segments(code[order])
        return pa.table({
            "source": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
            "sum_chars": pa.array(np.add.reduceat(nch[order], starts),
                                  pa.int64())})

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = b.column("n_docs").to_numpy(zero_copy_only=False)
        sc = b.column("sum_chars").to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        starts, _counts = segments(code[order])
        return pa.table({
            "source": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n_docs": pa.array(np.add.reduceat(nd[order], starts),
                               pa.int64()),
            "sum_chars": pa.array(np.add.reduceat(sc[order], starts),
                                  pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return collect_table(hash_group_apply(partials, ["source"], merge,
                                          0, sort=False))
