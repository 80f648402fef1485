"""Benchmark harness (driver contract + BASELINE.md protocol).

    python bench.py                 # full bench over $GRAFT_SF_DIR
    python bench.py --scaling       # same headline at 8 and 32 CPUs in
                                    # fresh processes; reports efficiency

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "files_per_s": ..., ...}

The headline pipeline is the full near-dup dedup run over a deterministic
synthetic source-code corpus sized to the tier (generated once, cached in
/tmp — generation time is excluded from timings). Secondary queries run
over the driver's $GRAFT_SF_DIR documents/embeddings tables.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# make `import nise_ray` / `import __ray_entry__` work regardless of CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_FILES = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}
# the scaling protocol needs compute to dominate fixed per-session costs
# (worker spawn, read setup, shuffle-fleet spawn) -> 3x the bench tier
SCALING_MULT = 10
CACHE_ROOT = "/tmp/nise_bench_cache"


def ensure_bench_corpus(sf_name: str, n_files: int | None = None) -> str:
    n_files = n_files or SF_FILES.get(sf_name, 100_000)
    # v3: files capped at 25k rows AND written with 4096-row row groups so
    # the parquet read splits into ~25 MB units at any tier. v2 wrote
    # n_files//48 rows per file in ONE row group — at the 8M tier that is
    # a 477 MB file a single read task must decompress whole (~1 GB heap),
    # which serialized the read and thrashed the object store.
    out_dir = os.path.join(CACHE_ROOT, f"{sf_name}-{n_files}-v3")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    per = min(max(2_000, n_files // 48), 25_000)
    i = 0
    v2_dir = os.path.join(CACHE_ROOT, f"{sf_name}-{n_files}-v2")
    if os.path.exists(os.path.join(v2_dir, "_DONE")):
        # migrate the cached v2 corpus (identical rows, identical order)
        # instead of regenerating — only the file/row-group layout changes
        for f in sorted(glob.glob(os.path.join(v2_dir, "*.parquet"))):
            pf = pq.ParquetFile(f)
            for rb in pf.iter_batches(batch_size=per):
                pq.write_table(pa.Table.from_batches([rb]),
                               os.path.join(out_dir, f"part-{i:05d}.parquet"),
                               row_group_size=4096)
                i += 1
    else:
        from nise_ray.fixtures import gen_bench_corpus
        t = gen_bench_corpus(seed=42, n_files=n_files)
        for s0 in range(0, t.num_rows, per):
            pq.write_table(t.slice(s0, per),
                           os.path.join(out_dir, f"part-{i:05d}.parquet"),
                           row_group_size=4096)
            i += 1
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def tree_cpu_seconds() -> float:
    """Cumulative utime+stime of this process and every live descendant
    (raylet, workers, aggregators) from /proc. Sampling the delta around
    the headline run gives TOTAL CPU-SECONDS OF WORK — a host-stall-free
    measure: if the job burns the same CPU-seconds at 8 and 32 CPUs, the
    engine adds no parallelism overhead and any wall-clock efficiency gap
    is host stall (see the bandwidth microbench), not engine scaling."""
    import os
    info: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
            info[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
        except (OSError, IndexError, ValueError):
            pass
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in info.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += info.get(p, (0, 0))[1]
        stack.extend(children.get(p, []))
    return total / os.sysconf("SC_CLK_TCK")


class CpuTracker:
    """Accurate process-tree CPU accounting: a background thread samples
    every descendant's cumulative utime+stime and keeps the PER-PID MAX,
    so workers that exit mid-run keep their contribution. The end-only
    delta (old tree_cpu_seconds) lost dead workers' time — measured
    193-285 s run-to-run spread at 8 CPUs on a job whose sign operator
    alone reports 350 s remote CPU in ds.stats; the engine_cpu_seconds
    scaling ratio inherited that bias. Accuracy is within one sample
    interval per short-lived process."""

    def __init__(self, interval: float = 0.5) -> None:
        import threading
        self._interval = interval
        self._maxcpu: dict[tuple[int, int], float] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _sample() -> dict[tuple[int, int], float]:
        """(pid, starttime) -> cumulative cpu seconds, for this process
        tree. starttime disambiguates PID reuse."""
        clk = os.sysconf("SC_CLK_TCK")
        info: dict[int, tuple[int, float, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    rest = f.read().rsplit(")", 1)[1].split()
                info[int(d)] = (int(rest[1]),
                                (int(rest[11]) + int(rest[12])) / clk,
                                int(rest[19]))
            except (OSError, IndexError, ValueError):
                pass
        children: dict[int, list[int]] = {}
        for pid, (ppid, _, _) in info.items():
            children.setdefault(ppid, []).append(pid)
        out: dict[tuple[int, int], float] = {}
        stack, seen = [os.getpid()], set()
        while stack:
            p = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            if p in info:
                _, cpu, start = info[p]
                out[(p, start)] = cpu
            stack.extend(children.get(p, []))
        return out

    def _loop(self) -> None:
        while not self._stop.is_set():
            for k, v in self._sample().items():
                if v > self._maxcpu.get(k, 0.0):
                    self._maxcpu[k] = v
            self._stop.wait(self._interval)

    def start(self) -> "CpuTracker":
        self._baseline = self._sample()
        self._thread.start()
        return self

    def stop(self) -> float:
        self._stop.set()
        self._thread.join()
        for k, v in self._sample().items():  # final sample
            if v > self._maxcpu.get(k, 0.0):
                self._maxcpu[k] = v
        return sum(v - self._baseline.get(k, 0.0)
                   for k, v in self._maxcpu.items())


def warm_cluster(num_cpus: int) -> None:
    """Force worker-process spawn + heavy imports BEFORE timing starts —
    a fresh local session otherwise pays a variable worker-startup storm
    inside the first timed stage (a real cluster has a warm pool)."""
    import ray

    @ray.remote
    def _noop() -> int:
        # the full import set a worker touches during the pipeline: ray
        # core is already loaded, but ray.data internals, pandas, pyarrow
        # and the engine package each cost ~0.5-2 CPU-s on first import
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.compute  # noqa: F401
        import ray.data  # noqa: F401

        import nise_ray.pipeline  # noqa: F401
        return 0

    ray.get([_noop.remote() for _ in range(num_cpus * 2)])


def run_bench(sf_dir: str, num_cpus: int, headline_only: bool = False,
              n_files: int | None = None) -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    warm_cluster(num_cpus)

    from nise_ray.config import DedupConfig
    from nise_ray.pipeline import dedup_pipeline, substring_pairs

    def DedupConfig(_D=DedupConfig, **kw):  # noqa: N802 — env-tunable bench config
        kw.setdefault("sig_value_bytes",
                      int(os.environ.get("NISE_SIG_BYTES", "4")))
        return _D(**kw)

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_files = n_files or SF_FILES.get(sf_name, 100_000)
    corpus_dir = ensure_bench_corpus(sf_name, n_files)

    queries: dict[str, float] = {}
    extra: dict = {}

    # --- headline: full dedup pipeline over the bench corpus -------------
    tracker = CpuTracker().start()
    t0 = time.time()
    res = dedup_pipeline(corpus_dir, DedupConfig())
    dt = time.time() - t0
    queries["dedup_corpus"] = round(dt, 3)
    extra["files_per_s"] = round(n_files / dt, 1)
    extra["cpu_seconds"] = round(tracker.stop(), 1)
    extra["cpu_utilization"] = round(extra["cpu_seconds"] / (dt * num_cpus), 3)
    extra["n_edges"] = res.stats["n_edges"]
    extra["n_clusters"] = res.stats.get("n_clusters")
    extra["stage_wall_s"] = res.stats.get("stage_wall_s")

    if not headline_only:
        t0 = time.time()
        substring_pairs(corpus_dir, DedupConfig()).count()
        queries["substring_corpus"] = round(time.time() - t0, 3)

        import __ray_entry__ as entry_mod
        qs = entry_mod.queries()
        for name in ["exact_dedup_docs", "minhash_dedup_docs", "token_stats",
                     "quality_scores", "ann_topk", "ann_topk_lsh",
                     "language_id", "segment_revenue", "top_unshipped_orders",
                     "nation_revenue", "embedding_dup_pairs"]:
            t0 = time.time()
            out = qs[name](sf_dir)
            if hasattr(out, "count"):
                out.count()  # force execution of lazy Datasets
            queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "dedup+training-data ops wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "num_cpus": num_cpus,
        **extra,
    }
    ray.shutdown()
    return result


def _bw_burn(q, n, secs):
    import time as _t

    import numpy as _np
    a = _np.empty(n, dtype=_np.uint8)
    b = _np.empty(n, dtype=_np.uint8)
    t0 = _t.time()
    reps = 0
    while _t.time() - t0 < secs:
        _np.copyto(b, a)
        reps += 1
    q.put(reps * n / (_t.time() - t0))


def measure_copy_bandwidth(procs: int, seconds: float = 1.5) -> float:
    """Aggregate numpy copy bandwidth (GB/s) at `procs` processes — the
    sandbox host's memory subsystem drifts 2-3x run-to-run and COLLAPSES
    at some process counts (see BENCH/README.md); recording it alongside
    every scaling run separates engine scaling from host state."""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=_bw_burn, args=(q, 64 * 1024 * 1024, seconds))
          for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total / 1e9, 2)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_scaling(sf_dir: str, cpus=(8, 32), rounds=3) -> dict:
    """BASELINE.md protocol, variance-hardened: the identical headline job
    at two parallelism levels in FRESH processes, `rounds` times each in
    INTERLEAVED order (lo,hi,hi,lo,lo,hi), with an aggregate-copy-bandwidth
    microbench logged immediately before every run. Efficiency =
    (median T_low / median T_high) / cpus_ratio; per-run times, spread and
    bandwidth state are all reported so a reader can judge host drift."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_files = int(os.environ.get("GRAFT_SCALING_FILES", "0")) or (
        SF_FILES.get(sf_name, 100_000) * SCALING_MULT)
    ensure_bench_corpus(sf_name, n_files)  # generate once, outside timings
    lo, hi = cpus
    order: list[int] = []
    for r in range(rounds):
        order.extend([lo, hi] if r % 2 == 0 else [hi, lo])
    times: dict[int, list[float]] = {lo: [], hi: []}
    tput: dict[int, list[float]] = {lo: [], hi: []}
    bw: dict[int, list[float]] = {lo: [], hi: []}
    cpusec: dict[int, list[float]] = {lo: [], hi: []}
    for c in order:
        bw[c].append(measure_copy_bandwidth(min(c, 32)))
        env = dict(os.environ, RAY_GRAFT_CPUS=str(c), GRAFT_SF_DIR=sf_dir,
                   GRAFT_BENCH_FILES=str(n_files))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, timeout=7200)
        json_lines = [l for l in out.stdout.strip().splitlines()
                      if l.startswith("{")]
        if not json_lines:
            sys.stderr.write(f"--- headline subprocess (cpus={c}) produced "
                             f"no JSON; rc={out.returncode}; stderr tail ---\n"
                             + "\n".join(out.stderr.splitlines()[-40:]) + "\n")
            raise RuntimeError(f"headline run at cpus={c} failed")
        line = json_lines[-1]
        res = json.loads(line)
        times[c].append(res["queries"]["dedup_corpus"])
        tput[c].append(res["files_per_s"])
        cpusec[c].append(res.get("cpu_seconds", 0.0))
        print(json.dumps({"scaling_run": c, "wall_s": times[c][-1],
                          "files_per_s": tput[c][-1],
                          "cpu_seconds": cpusec[c][-1],
                          "copy_bw_GBps": bw[c][-1]}), file=sys.stderr)
    t_lo, t_hi = _median(times[lo]), _median(times[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    eff_best = (min(times[lo]) / min(times[hi])) / (hi / lo)
    # engine-side work scaling, immune to host memory stalls: ratio of
    # total CPU-seconds of work. 1.0 = the engine burns the same compute
    # at 4x parallelism (no parallelism overhead); the gate-equivalent
    # engine efficiency is cpusec_lo / cpusec_hi.
    cs_lo, cs_hi = _median(cpusec[lo]), _median(cpusec[hi])
    eff_cpu = (cs_lo / cs_hi) if cs_hi else None
    return {
        "metric": "scaling efficiency (N->4N CPUs, fresh processes, "
                  f"median of {rounds} interleaved)",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": sf_name,
        "n_files": n_files,
        "efficiency_median": round(eff, 3),
        "efficiency_best_pair": round(eff_best, 3),
        "engine_cpu_seconds_ratio_lo_over_hi": (round(eff_cpu, 3)
                                                if eff_cpu else None),
        "throughput_files_per_s": {str(c): [round(x, 1) for x in tput[c]]
                                   for c in cpus},
        "wall_s": {str(c): times[c] for c in cpus},
        "cpu_seconds": {str(c): cpusec[c] for c in cpus},
        # CPU-boundness per leg: ~1.0 * cpus means the job is compute-
        # bound (the regime where the N->4N ratio measures the engine);
        # far below cpus means a shared non-CPU resource binds (see the
        # 8M-file analysis in BENCH/scaling_evidence.md).
        "avg_busy_cpus": {str(c): [round(cs / w, 2) if w else None
                                   for cs, w in zip(cpusec[c], times[c])]
                          for c in cpus},
        "copy_bw_GBps": {str(c): bw[c] for c in cpus},
        "cpus": list(cpus),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--scaling-rounds", type=int, default=3)
    p.add_argument("--headline-only", action="store_true")
    args = p.parse_args()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if args.scaling:
        print(json.dumps(run_scaling(sf_dir, rounds=args.scaling_rounds)))
    else:
        n_files = os.environ.get("GRAFT_BENCH_FILES")
        print(json.dumps(run_bench(sf_dir, num_cpus,
                                   headline_only=args.headline_only,
                                   n_files=int(n_files) if n_files else None)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
