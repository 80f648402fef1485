"""Metrics rollup — global counters, cluster histograms, lineage summaries.

All heavy aggregation stays distributed (groupby / count on Datasets);
only the final tiny tables reach the driver.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from nise_ray.util import collect_table

from nise_ray.checkpoint import RunContext


def cluster_size_topk(assignments: "ray.data.Dataset", k: int = 20) -> pa.Table:
    """The k largest clusters: (cluster_id, size), size desc."""
    counted = assignments.groupby("cluster_id").count()
    top = counted.sort("count()", descending=True).limit(k)
    t = collect_table(top)
    return t.rename_columns(["cluster_id", "size"])


def cluster_histogram(assignments: "ray.data.Dataset") -> pa.Table:
    """Distribution of cluster sizes: (size, n_clusters)."""
    counted = assignments.groupby("cluster_id").count()

    def to_size(b: pa.Table) -> pa.Table:
        return pa.table({"size": b.column("count()")})

    sizes = counted.map_batches(to_size, batch_format="pyarrow")
    hist = sizes.groupby("size").count()
    t = collect_table(hist)
    return t.rename_columns(["size", "n_clusters"]).sort_by("size")


def band_bucket_histogram(signed_ds: "ray.data.Dataset", cfg) -> pa.Table:
    """Skew telemetry (north-rule R13): distribution of LSH band-bucket
    sizes — (bucket_size, n_buckets). Runs the band explode + one hash
    shuffle; vectorized segment counts, no per-group Python."""
    import numpy as np

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.ops.lsh import explode_bands

    exploded = signed_ds.map_batches(
        lambda b: explode_bands(b, cfg),
        batch_format="pyarrow", zero_copy_batch=True).select_columns(["bkey"])

    def count_batch(b: pa.Table) -> pa.Table:
        keys = b.column("bkey").to_numpy(zero_copy_only=False)
        _, counts = segments(keys)
        sizes, n = np.unique(counts, return_counts=True)
        return pa.table({"bucket_size": pa.array(sizes, pa.int64()),
                         "n_buckets": pa.array(n, pa.int64())})

    per_part = hash_group_apply(exploded, ["bkey"], count_batch,
                                cfg.shuffle_partitions)

    def merge(b: pa.Table) -> pa.Table:
        import numpy as np
        sizes = b.column("bucket_size").to_numpy(zero_copy_only=False)
        n = b.column("n_buckets").to_numpy(zero_copy_only=False)
        order = np.argsort(sizes, kind="stable")
        s, idx = np.unique(sizes[order], return_index=True)
        sums = np.add.reduceat(n[order], idx)
        return pa.table({"bucket_size": pa.array(s, pa.int64()),
                         "n_buckets": pa.array(sums, pa.int64())})

    t = collect_table(per_part)
    return merge(t) if t.num_rows else t


def lineage_summary(ctx: RunContext) -> dict:
    """Per-stage rollup of the per-batch lineage manifests."""
    import os
    out: dict[str, dict] = {}
    mdir = os.path.join(ctx.run_dir, "manifests")
    if not os.path.isdir(mdir):
        return out
    for stage in sorted(os.listdir(mdir)):
        recs = ctx.load_manifests(stage)
        if not recs:
            continue
        out[stage] = {
            "n_batches": len(recs),
            "rows_in": sum(r["rows_in"] for r in recs),
            "rows_out": sum(r["rows_out"] for r in recs),
            "wall_s": sum(r["t_end"] - r["t_start"] for r in recs),
            "workers": len({r["pid"] for r in recs}),
        }
    return out


# --------------------------------------------------------------- shingles

_HLL_P = 14                      # 2^14 registers (~0.8% relative error)
_HLL_M = 1 << _HLL_P


def _bit_length64(v):
    """Vectorized bit_length for uint64 (branchless binary reduction)."""
    import numpy as np
    v = v.copy()
    bl = np.zeros(len(v), dtype=np.int64)
    for step in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1) << np.uint64(step)
        bl[m] += step
        v[m] >>= np.uint64(step)
    return bl + (v > 0)


def _hll_registers(hashes) -> "pa.Table":
    """One batch of uint64 hashes -> dense HLL register table (1 row)."""
    import numpy as np
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    if len(hashes):
        idx = (hashes >> np.uint64(64 - _HLL_P)).astype(np.int64)
        rest = hashes << np.uint64(_HLL_P)
        clz = (64 - _bit_length64(rest))  # zeros above highest set bit
        rank = np.minimum(clz + 1, 64 - _HLL_P + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def _hll_estimate(regs) -> float:
    """Standard bias-corrected HLL estimate from merged registers."""
    import numpy as np
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    r = regs.astype(np.float64)
    est = alpha * m * m / np.sum(np.exp2(-r))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # small-range correction
    return float(est)


def shingle_stats(corpus_ds: "ray.data.Dataset", cfg,
                  exact: bool = True) -> dict:
    """Corpus-level shingle statistics (SURVEY 3.5 'distinct shingle
    count'): total shingle instances + distinct shingles.

    Two paths, both returned:
    * `n_distinct_hll` — HyperLogLog (p=14) merged from per-batch register
      tables: NO shuffle at all, constant 16 KiB per batch to the driver —
      the 10^12-file path.
    * `n_distinct_exact` (exact=True) — one hash exchange on the shingle
      hash; partitions hold disjoint key sets so per-partition distinct
      counts sum exactly. Costs a full shuffle of the shingle stream —
      bench/validation use only.
    """
    import numpy as np

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.ops.normalize import (
        TokenHasher,
        normalize_text,
        shingle_hashes,
        tokenize,
    )

    hasher_holder: dict = {}

    def explode(b: pa.Table) -> pa.Table:
        hasher = hasher_holder.setdefault("h", TokenHasher())
        out = []
        for text in b.column("content").to_pylist():
            toks = tokenize(normalize_text(text))
            out.append(shingle_hashes(hasher.hash_tokens(toks), cfg.shingle_w))
        flat = (np.concatenate(out) if out else np.empty(0, dtype=np.uint64))
        return pa.table({"shingle": pa.array(flat, pa.uint64())})

    shingles = corpus_ds.map_batches(explode, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
    n_instances = shingles.count()

    reg_rows = collect_table(shingles.map_batches(
        lambda b: _hll_registers(
            b.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)),
        batch_format="pyarrow", zero_copy_batch=True))
    merged = np.zeros(_HLL_M, dtype=np.uint8)
    for blob in reg_rows.column("regs").to_pylist():
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    stats = {
        "n_shingle_instances": int(n_instances),
        "n_distinct_hll": int(round(_hll_estimate(merged))),
    }

    if exact:
        def distinct_batch(b: pa.Table) -> pa.Table:
            keys = b.column("shingle").to_numpy(zero_copy_only=False)
            starts, _ = segments(np.sort(keys))
            return pa.table({"n": pa.array([len(starts)], pa.int64())})

        per_part = hash_group_apply(shingles, ["shingle"], distinct_batch,
                                    sort=False)
        stats["n_distinct_exact"] = int(sum(
            r["n"] for r in per_part.take_all()))
    return stats
