"""Checkpointing, resume, and per-partition lineage manifests.

Layout under ``run_dir``::

    run.json                      — run_id + full config (reproducibility)
    stage=<name>/ *.parquet       — the stage's output blocks
    stage=<name>/_SUCCESS.json    — completion marker: config hash + counts
    manifests/<stage>/ *.json     — one lineage record per processed batch
                                    (task-side, written atomically via
                                    tmp+rename so retries never corrupt)

Resume contract: a stage whose ``_SUCCESS.json`` exists AND matches the
current config hash is read back from its parquet instead of recomputed;
everything downstream re-derives from checkpoints only (SURVEY §4.3).
Stage outputs are partitioned parquet (one file per block), never one
giant file, so a resumed run re-reads in parallel.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa

from nise_ray.config import DedupConfig


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


class RunContext:
    def __init__(self, run_dir: str, cfg: DedupConfig, resume: bool = False,
                 run_id: str | None = None) -> None:
        self.run_dir = run_dir
        self.cfg = cfg
        self.resume = resume
        os.makedirs(run_dir, exist_ok=True)
        run_meta = os.path.join(run_dir, "run.json")
        if resume and os.path.exists(run_meta):
            with open(run_meta) as f:
                prev = json.load(f)
            if prev["config_hash"] != cfg.config_hash():
                raise ValueError(
                    "resume with a different config: "
                    f"{prev['config_hash']} != {cfg.config_hash()}")
            self.run_id = prev["run_id"]
        else:
            self.run_id = run_id or uuid.uuid4().hex[:12]
            _atomic_write_json(run_meta, {
                "run_id": self.run_id,
                "config_hash": cfg.config_hash(),
                "config": cfg.to_dict(),
                "created_at": time.time(),
            })

    # ----- stage checkpoints ------------------------------------------
    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"stage={stage}")

    def _success_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "_SUCCESS.json")

    def is_complete(self, stage: str) -> bool:
        p = self._success_path(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            meta = json.load(f)
        return meta.get("config_hash") == self.cfg.config_hash()

    def mark_complete(self, stage: str, **meta) -> None:
        os.makedirs(self.stage_dir(stage), exist_ok=True)
        _atomic_write_json(self._success_path(stage), {
            "run_id": self.run_id,
            "stage": stage,
            "config_hash": self.cfg.config_hash(),
            "completed_at": time.time(),
            **meta,
        })

    # ----- lineage manifests ------------------------------------------
    def manifest_dir(self, stage: str) -> str:
        d = os.path.join(self.run_dir, "manifests", stage)
        os.makedirs(d, exist_ok=True)
        return d

    def load_manifests(self, stage: str) -> list[dict]:
        d = os.path.join(self.run_dir, "manifests", stage)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out


class ParamsConfig:
    """Duck-typed config for RunContext when a composition is
    parameterized outside DedupConfig (e.g. the curation pipelines):
    the resume gate hashes the sorted parameter dict, so resuming with
    different parameters fails loudly exactly like a DedupConfig
    mismatch."""

    def __init__(self, **params) -> None:
        self._params = params

    def to_dict(self) -> dict:
        return dict(self._params)

    def config_hash(self) -> str:
        import hashlib

        payload = json.dumps(self._params, sort_keys=True).encode()
        return hashlib.blake2b(payload, digest_size=8).hexdigest()


def lineage_wrap(fn, manifest_dir: str, run_id: str, stage: str):
    """Wrap a map_batches fn so every processed batch emits one lineage
    record (rows in/out, wall time, attempt-safe unique id). Task-side
    side effect, atomic rename — retries produce extra records, never
    corrupt ones (idempotent for resume accounting)."""

    def wrapped(batch: pa.Table) -> pa.Table:
        t0 = time.time()
        out = fn(batch)
        rec_id = uuid.uuid4().hex
        _atomic_write_json(os.path.join(manifest_dir, f"{rec_id}.json"), {
            "run_id": run_id,
            "stage": stage,
            "record_id": rec_id,
            "rows_in": batch.num_rows,
            "rows_out": out.num_rows,
            "t_start": t0,
            "t_end": time.time(),
            "pid": os.getpid(),
        })
        return out

    return wrapped
