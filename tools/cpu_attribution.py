"""CPU-seconds attribution for the N-vs-4N scaling protocol.

Round-3 finding to explain: the 32-CPU legs of `bench.py --scaling` burn
~2.4x the CPU-seconds of the 8-CPU legs (engine_cpu_seconds_ratio 0.403)
while wall-clock scales — work is not conserved across parallelism
levels. Two hypotheses:

  (H1) host memory contention: the work is partly memory-bound, and 32
       concurrent workers stall on the same memory controllers; stalled
       cycles are billed as busy CPU, so the SAME logical work costs
       more CPU-seconds at higher parallelism. Engine exonerated.
  (H2) engine overhead that scales with parallelism (aggregator-fleet
       idle spin, per-worker recomputation, object-store copies).

Two experiments:

  --microbench : fixed TOTAL memory-copy work split across 8 vs 32
      processes; reports total CPU-seconds each way. Pure numpy, no Ray
      — any inflation at 32 procs is the host's (H1) signature, an
      engine-free control.
  --breakdown N : run the 1M-file headline dedup at N CPUs while
      sampling every descendant process's cumulative CPU and process
      title (ray:: actor/task names) once per second; reports
      CPU-seconds grouped by role (raylet / IDLE workers / per-operator
      workers / aggregators / driver). Comparing the N=8 and N=32
      breakdowns localizes any (H2) term to a specific role.

    python tools/cpu_attribution.py --microbench
    python tools/cpu_attribution.py --breakdown 8
    python tools/cpu_attribution.py --breakdown 32
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLK = os.sysconf("SC_CLK_TCK")


# ------------------------------------------------------------- microbench

def _copy_worker(q, n_bytes: int, reps: int) -> None:
    import resource

    import numpy as np
    a = np.empty(n_bytes, dtype=np.uint8)
    b = np.empty(n_bytes, dtype=np.uint8)
    t0 = time.time()
    for _ in range(reps):
        np.copyto(b, a)
    ru = resource.getrusage(resource.RUSAGE_SELF)
    q.put((ru.ru_utime + ru.ru_stime, time.time() - t0))


def microbench(total_reps: int = 768, n_bytes: int = 64 * 1024 * 1024,
               procs_list=(8, 32)) -> dict:
    """Fixed total work (total_reps copies of n_bytes) split across P
    processes; total CPU-seconds should be P-invariant on a healthy
    memory subsystem."""
    import multiprocessing as mp
    out = {}
    for procs in procs_list:
        ctx = mp.get_context("fork")
        q = ctx.Queue()
        per = total_reps // procs
        ps = [ctx.Process(target=_copy_worker, args=(q, n_bytes, per))
              for _ in range(procs)]
        t0 = time.time()
        for p in ps:
            p.start()
        res = [q.get() for _ in ps]
        for p in ps:
            p.join()
        wall = time.time() - t0
        cpu = sum(r[0] for r in res)
        out[str(procs)] = {
            "total_cpu_s": round(cpu, 2),
            "wall_s": round(wall, 2),
            "bandwidth_GBps": round(per * procs * n_bytes * 2 / wall / 1e9, 2),
        }
    lo, hi = (str(p) for p in procs_list)
    out["cpu_inflation_hi_over_lo"] = round(
        out[hi]["total_cpu_s"] / out[lo]["total_cpu_s"], 3)
    return out


# ------------------------------------------------------------- breakdown

def _proc_info(pid: int) -> tuple[int, float, str] | None:
    """(ppid, cpu_seconds, title) for one pid, or None if gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            head, rest = f.read().rsplit(")", 1)
        fields = rest.split()
        ppid = int(fields[1])
        cpu = (int(fields[11]) + int(fields[12])) / CLK
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            title = f.read().replace(b"\x00", b" ").decode(
                "utf-8", "replace").strip()
        if not title:
            title = head.split("(", 1)[1]
        return ppid, cpu, title
    except (OSError, IndexError, ValueError):
        return None


_ROLE_PATTERNS = [
    ("aggregator", re.compile(r"ray::.*Aggregat", re.I)),
    ("shuffle_finalize", re.compile(r"ray::.*[Ff]inali[sz]e")),
    ("idle_worker", re.compile(r"ray::IDLE")),
    ("raylet", re.compile(r"raylet")),
    ("gcs", re.compile(r"gcs_server")),
    ("dashboard", re.compile(r"dashboard|agent\.py")),
    ("log_monitor", re.compile(r"log_monitor|monitor\.py")),
    ("runtime_env", re.compile(r"runtime_env")),
]


def _role(title: str, root_pid: int, pid: int) -> str:
    for name, pat in _ROLE_PATTERNS:
        if pat.search(title):
            return name
    m = re.search(r"ray::(\S+)", title)
    if m:
        # strip call-counter suffixes so MapBatches(fn) variants group
        return "task:" + re.sub(r"\[.*", "", m.group(1))[:48]
    if pid == root_pid:
        return "driver"
    return "other_python"


def headline_breakdown(num_cpus: int, n_files: int = 1_000_000) -> dict:
    """Run the headline dedup in a subprocess; sample its process tree
    once per second; report CPU-seconds per role."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus),
               GRAFT_SF_DIR="/root/testdata/sf0.1",
               GRAFT_BENCH_FILES=str(n_files))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    # Per-SAMPLE delta attribution: each poll credits (cpu_now - cpu_last)
    # to the role of the title observed AT THAT SAMPLE. Ray reuses workers
    # across operators (the process retitles per task), so attributing a
    # pid's whole cumulative CPU to any single title would systematically
    # misbucket reused workers; deltas land where the CPU was spent, up to
    # the 1 s sampling granularity. A pid's CPU before its first sample is
    # credited to its first observed title (startup is negligible).
    last: dict[int, float] = {}
    roles: dict[str, float] = {}
    stop = threading.Event()

    def poll() -> None:
        while True:
            done = stop.is_set()   # take one final sample after exit
            info: dict[int, tuple[int, float, str]] = {}
            for d in os.listdir("/proc"):
                if d.isdigit():
                    r = _proc_info(int(d))
                    if r:
                        info[int(d)] = r
            children: dict[int, list[int]] = {}
            for pid, (ppid, _, _) in info.items():
                children.setdefault(ppid, []).append(pid)
            stack, seen = [proc.pid], set()
            while stack:
                p = stack.pop()
                if p in seen or p not in info:
                    continue
                seen.add(p)
                _, cpu, title = info[p]
                delta = cpu - last.get(p, 0.0)
                last[p] = max(cpu, last.get(p, 0.0))
                if delta > 0:
                    role = _role(title, proc.pid, p)
                    roles[role] = roles.get(role, 0.0) + delta
                stack.extend(children.get(p, []))
            if done:
                return
            stop.wait(1.0)

    th = threading.Thread(target=poll, daemon=True)
    t0 = time.time()
    th.start()
    out_text, _ = proc.communicate()
    stop.set()
    th.join(timeout=10)
    wall = time.time() - t0
    lines = [l for l in out_text.strip().splitlines() if l.startswith("{")]
    bench = json.loads(lines[-1]) if lines else {}
    return {
        "num_cpus": num_cpus,
        "wall_s": round(wall, 1),
        "headline_wall_s": bench.get("queries", {}).get("dedup_corpus"),
        "files_per_s": bench.get("files_per_s"),
        "bench_cpu_seconds": bench.get("cpu_seconds"),
        "cpu_seconds_by_role": {k: round(v, 1) for k, v in
                                sorted(roles.items(),
                                       key=lambda kv: -kv[1])},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--microbench", action="store_true")
    ap.add_argument("--breakdown", type=int, default=0)
    ap.add_argument("--files", type=int, default=1_000_000)
    args = ap.parse_args()
    if args.microbench:
        print(json.dumps({"microbench": microbench()}, indent=2))
    if args.breakdown:
        print(json.dumps(headline_breakdown(args.breakdown, args.files),
                         indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
