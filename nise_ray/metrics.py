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
