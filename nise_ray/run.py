"""CLI entry point.

    python -m nise_ray.run --input <corpus parquet dir> --output <dir>
        [--run-dir <dir>] [--resume] [--salt-shards N] [--tau F]
        [--no-simhash] [--substring] [--num-cpus N]

Also the ``ray job submit`` entrypoint on a real cluster:

    ray job submit --working-dir . -- python -m nise_ray.run --input ... --output ...

Owns its Ray session (guarded — under ``ray job submit`` the cluster
connection already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nise_ray.run",
                                description="Ray-Data near-dup detection + clustering")
    p.add_argument("--input", required=True, help="corpus parquet file/dir")
    p.add_argument("--output", required=True, help="output dir (assignments/, edges/)")
    p.add_argument("--run-dir", default=None, help="checkpoint dir (enables resume)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tau", type=float, default=0.7)
    p.add_argument("--salt-shards", type=int, default=1)
    p.add_argument("--bucket-cap", type=int, default=1000)
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--no-exact", action="store_true")
    p.add_argument("--verify-mode", default="auto",
                   choices=["auto", "carry", "broadcast", "join"],
                   help="signature verification strategy; 'join' = fully "
                        "distributed two-sided hash join (the 10^12-file "
                        "configuration)")
    p.add_argument("--substring", action="store_true",
                   help="also run the winnowing substring stage")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False)

    from nise_ray.config import DedupConfig
    from nise_ray.pipeline import dedup_pipeline, substring_pairs

    cfg = DedupConfig(tau=args.tau, salt_shards=args.salt_shards,
                      bucket_cap=args.bucket_cap,
                      simhash_enabled=not args.no_simhash,
                      exact_enabled=not args.no_exact,
                      verify_mode=args.verify_mode)
    result = dedup_pipeline(args.input, cfg, run_dir=args.run_dir,
                            resume=args.resume)
    result.assignments.write_parquet(os.path.join(args.output, "assignments"))
    result.edges.write_parquet(os.path.join(args.output, "edges"))
    if args.substring:
        substring_pairs(args.input, cfg).write_parquet(
            os.path.join(args.output, "substring_pairs"))
    stats_path = os.path.join(args.output, "stats.json")
    os.makedirs(args.output, exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump(result.stats, f, indent=2)
    print(json.dumps(result.stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
