"""Training-export sink: WebDataset-style tar shards.

The standard hand-off format from a data pipeline to a pretraining
loader is a directory of tar shards, each holding one member per sample
(key + extension), readable by any WebDataset-compatible loader — plain
``tarfile``, no extra dependency.

Scale contracts:
- the corpus rides exactly ONE shard-keyed hash exchange (inherent to
  producing shard FILES — each output file must see all its rows);
  shard_id = doc_id % n_shards so the assignment is a pure function of
  the data, never of block boundaries or cluster width;
- shards are written IN PARALLEL (one group-apply task per shard) and
  each is built fully deterministically: members in doc_id order,
  zeroed mtime/uid/gid, USTAR format — re-running produces
  byte-identical tars, so the recorded sha256 doubles as a resume and
  integrity token;
- writes are atomic (tmp file + ``os.replace``) with a ``.done.json``
  sidecar per shard; ``resume=True`` skips any shard whose sidecar
  matches the expected doc count, so a failed 100-TB export restarts
  from the unfinished shards only;
- the returned manifest is n_shards rows (tiny); its
  (shard_id, n_docs, text_bytes) columns are oracle-checkable against
  plain SQL over the source table, making the sink's end-to-end
  accounting part of the correctness gate.
"""

from __future__ import annotations

import hashlib
import io as _io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa

import ray

_MANIFEST_SCHEMA = pa.schema([
    ("shard_id", pa.int64()),
    ("n_docs", pa.int64()),
    ("text_bytes", pa.int64()),
    ("sha256", pa.string()),
])


def _shard_tar_bytes(doc_ids: np.ndarray, texts: pa.Array) -> bytes:
    """Deterministic tar bytes for one shard: members `{doc_id:012d}.txt`
    in ascending doc_id order, zeroed metadata, USTAR format."""
    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for i in range(len(doc_ids)):
            payload = texts[i].as_py().encode("utf-8")
            ti = tarfile.TarInfo(name=f"{int(doc_ids[i]):012d}.txt")
            ti.size = len(payload)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.mode = 0o644
            tf.addfile(ti, _io.BytesIO(payload))
    return buf.getvalue()


def export_tar_shards(sf_dir: str, out_dir: str, n_shards: int = 16,
                      resume: bool = False) -> pa.Table:
    """Write `documents` as `out_dir/shard-{id:05d}.tar` WebDataset
    shards; return the manifest table
    (shard_id, n_docs, text_bytes, sha256) sorted by shard_id."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    os.makedirs(out_dir, exist_ok=True)

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_shard(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard_id", pa.array(did % n_shards, pa.int64()))

    def write_shards(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _MANIFEST_SCHEMA.empty_table()
        shard = b.column("shard_id").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        rows = {"shard_id": [], "n_docs": [], "text_bytes": [],
                "sha256": []}
        starts, counts = segments(shard)
        for s, c in zip(starts, counts):
            sid = int(shard[s])
            # members in doc_id order (group arrives sorted by the key
            # only; doc order within the shard is ours to pin)
            sub = np.argsort(did[s:s + c], kind="stable") + s
            sub_ids = did[sub]
            sub_text = text.take(pa.array(sub, pa.int64()))
            path = os.path.join(out_dir, f"shard-{sid:05d}.tar")
            done = path + ".done.json"
            if resume and os.path.exists(done) and os.path.exists(path):
                with open(done) as f:
                    meta = json.load(f)
                if meta.get("n_docs") == int(c):
                    for k in rows:
                        rows[k].append(meta[k])
                    continue
            blob = _shard_tar_bytes(sub_ids, sub_text)
            sha = hashlib.sha256(blob).hexdigest()
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            import pyarrow.compute as pc
            tb = int(pc.sum(pc.binary_length(sub_text)).as_py() or 0)
            meta = {"shard_id": sid, "n_docs": int(c),
                    "text_bytes": tb, "sha256": sha}
            with open(done + ".tmp", "w") as f:
                json.dump(meta, f)
            os.replace(done + ".tmp", done)
            for k in rows:
                rows[k].append(meta[k])
        return pa.table(rows, schema=_MANIFEST_SCHEMA)

    sharded = ds.map_batches(add_shard, batch_format="pyarrow",
                             zero_copy_batch=True)
    manifest = collect_table(
        hash_group_apply(sharded, ["shard_id"], write_shards))
    if manifest.num_rows == 0:
        return _MANIFEST_SCHEMA.empty_table()
    order = np.argsort(
        manifest.column("shard_id").to_numpy(zero_copy_only=False))
    return manifest.take(pa.array(order, pa.int64()))
