"""Stage E'' — substring-level duplication via winnowing fingerprints.

Instead of a monolithic suffix array (which only sees within-partition
repeats), we use winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
algorithm): a rolling polynomial hash over every k-char gram of the
normalized text, then the minimum hash in every w-wide window is selected
as a fingerprint. GUARANTEE: any shared substring of length >= k + w - 1
(= cfg.substring_min_len with the pinned k=64, w=37) produces at least one
shared fingerprint, globally — across partitions, which a per-partition
suffix array cannot promise. Docs sharing a fingerprint are joined by a
``groupby(fingerprint)`` shuffle exactly like the LSH band stage.

Substring edges are reported as their own output (license headers / copied
functions do NOT imply whole-file near-duplication) and are only merged
into clustering when explicitly configured.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, rolling_poly_hash
from nise_ray.ops.lsh import edges_table, empty_edges
from nise_ray.ops.normalize import normalize_text

FP_SCHEMA = pa.schema([
    ("fp", pa.uint64()), ("doc_key", pa.uint64()), ("sha64", pa.uint64()),
])


def winnow_fingerprints(text: str, k: int, w: int) -> np.ndarray:
    """Unique winnowing fingerprints of one normalized document."""
    data = np.frombuffer(text.encode("utf-8", errors="surrogatepass"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=U64)
    h = rolling_poly_hash(data, k)  # one hash per gram position (log2 k passes)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return np.unique(mins)


def explode_fingerprints(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """corpus rows -> (fp, doc_key, sha64) rows (batch-native flat map)."""
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    contents = batch.column("content").to_pylist()
    fps: list[np.ndarray] = []
    doc_keys: list[int] = []
    sha64s: list[int] = []
    for i, text in enumerate(contents):
        f = winnow_fingerprints(normalize_text(text), cfg.winnow_k, cfg.winnow_window)
        if len(f) == 0:
            continue
        blob = repo[i].encode() + b"\x00" + path[i].encode() + b"\x00" + commit[i].encode()
        doc_keys.append(int.from_bytes(hashlib.blake2b(blob, digest_size=8).digest(), "little"))
        raw = text.encode("utf-8", errors="surrogatepass")
        sha64s.append(int.from_bytes(hashlib.sha256(raw).digest()[:8], "little"))
        fps.append(f)
    if not fps:
        return FP_SCHEMA.empty_table()
    counts = [len(f) for f in fps]
    return pa.table({
        "fp": pa.array(np.concatenate(fps), pa.uint64()),
        "doc_key": pa.array(np.repeat(np.array(doc_keys, dtype=U64), counts), pa.uint64()),
        "sha64": pa.array(np.repeat(np.array(sha64s, dtype=U64), counts), pa.uint64()),
    })


def _substring_bucket_pairs(doc_keys: np.ndarray, sha64: np.ndarray, cap: int):
    order = np.lexsort((doc_keys, sha64))
    first = np.ones(len(order), dtype=bool)
    first[1:] = sha64[order][1:] != sha64[order][:-1]
    doc_keys = np.sort(doc_keys[order[first]])
    m = len(doc_keys)
    if m < 2:
        return None
    if m <= cap:
        ii, jj = np.triu_indices(m, k=1)
        return doc_keys[ii], doc_keys[jj]
    # hot fingerprint (ubiquitous boilerplate): star to bucket min
    return np.full(m - 1, doc_keys[0], dtype=U64), doc_keys[1:]


def make_batch_substring_pair_gen(cfg: DedupConfig):
    """Block-level fn for hash_group_apply keyed on fp."""
    from nise_ray.ops.groupapply import segments
    cap = cfg.bucket_cap

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_edges()
        keys = batch.column("fp").to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        multi = counts >= 2
        if not multi.any():
            return empty_edges()
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        us, vs = [], []
        for s, c in zip(starts[multi], counts[multi]):
            pair = _substring_bucket_pairs(doc_keys[s:s + c], sha64[s:s + c], cap)
            if pair is not None:
                us.append(pair[0])
                vs.append(pair[1])
        if not us:
            return empty_edges()
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return edges_table(u, v, np.ones(len(u), dtype=np.float32), "substring")

    return batch_fn


def make_substring_pair_gen(cfg: DedupConfig):
    cap = cfg.bucket_cap

    def pair_gen(group: pa.Table) -> pa.Table:
        doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = group.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        order = np.lexsort((doc_keys, sha64))
        first = np.ones(len(order), dtype=bool)
        first[1:] = sha64[order][1:] != sha64[order][:-1]
        doc_keys = np.sort(doc_keys[order[first]])
        m = len(doc_keys)
        if m < 2:
            return empty_edges()
        if m <= cap:
            ii, jj = np.triu_indices(m, k=1)
            u, v = doc_keys[ii], doc_keys[jj]
        else:
            # hot fingerprint (ubiquitous boilerplate): star to bucket min
            u = np.full(m - 1, doc_keys[0], dtype=U64)
            v = doc_keys[1:]
        return edges_table(u, v, np.ones(len(u), dtype=np.float32), "substring")

    return pair_gen
