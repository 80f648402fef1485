"""Benchmark decontamination over the `documents` table.

Training-data pipelines must remove (or at least flag) corpus documents
that overlap an evaluation benchmark — the standard contract is "shares
at least one w-token n-gram with any eval document" (GPT-3 appendix C /
Llama-style 'dirty' marking). This operator reports every corpus doc
that shares a w-gram with the eval set, with the exact count of DISTINCT
shared grams, so downstream can either drop or quarantine.

Scale shape (the part that must hold at 10^12 corpus files):

- The eval set is SMALL by definition (benchmarks are 10^3–10^5 docs);
  its gram set is built once on the driver with the same batched kernels
  the workers use and broadcast via `ray.put` — read per task, never
  re-shipped per batch.
- The corpus pass is ONE stateless actor-pool `map_batches`: vectorized
  token hashing (dictionary-encoded blake2b, vocabulary cached per actor
  across batches), one poly_fold rolling pass for w-gram hashes, and a
  vectorized `np.isin` membership test against the broadcast hash set.
  No shuffle, no driver collect of corpus data.
- Only rows with a hash hit (bounded by the true contamination rate)
  take the exact string-confirm path, so 64-bit hash collisions cannot
  produce a false positive: the output contract is EXACT and therefore
  fully SQL-expressible (DuckDB oracle in `__ray_entry__.oracle_sql`).
  False negatives are impossible — BOTH the hash prefilter and the
  exact confirm tokenize the RAW (unnormalized) text, matching the
  oracle's contract, so equal raw gram strings hash equal by
  construction (same tokenizer, same per-token blake2b, same fold).
  (A normalized prefilter over a raw confirm path could miss docs whose
  NFC form changes the token stream — see batch_token_hashes.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.normalize import (
    _TOKEN,
    TokenHasher,
    batch_shingle_hashes,
    batch_token_hashes,
)

_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                   "n_shared": pa.array([], pa.int64())})


def _gram_set(text: str, w: int) -> set[str]:
    toks = _TOKEN.findall(text)
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def decontaminate(sf_dir: str, eval_max: int = 20, w: int = 5) -> pa.Table:
    """(doc_id, n_shared) for every corpus doc (doc_id >= eval_max) that
    shares >= 1 distinct w-token gram with the eval set (doc_id < eval_max);
    n_shared = number of the doc's distinct grams present in the eval set."""
    import pyarrow.dataset as pds

    ev = pds.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pds.field("doc_id") < eval_max)
    hasher = TokenHasher()
    flat_h, offs, _ = batch_token_hashes(ev.column("text"), hasher,
                                         normalize=False)
    ev_hashes, _ = batch_shingle_hashes(flat_h, offs, w)
    ev_hashes = np.unique(ev_hashes)
    ev_grams: set[str] = set()
    for t in ev.column("text").to_pylist():
        ev_grams |= _gram_set(t, w)
    if not ev_grams:
        return _EMPTY
    h_ref = ray.put(ev_hashes)
    g_ref = ray.put(ev_grams)

    class Decontam:
        def __init__(self) -> None:
            self.h = ray.get(h_ref)
            self.grams = ray.get(g_ref)
            self.hasher = TokenHasher()

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            keep = ids >= eval_max
            if not keep.all():
                b = b.filter(pa.array(keep))
                ids = ids[keep]
            if b.num_rows == 0:
                return _EMPTY
            fh, offs2, _ = batch_token_hashes(b.column("text"), self.hasher,
                                              normalize=False)
            sh, soffs = batch_shingle_hashes(fh, offs2, w)
            hit = np.isin(sh, self.h)
            if not hit.any():
                return _EMPTY
            row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(soffs))
            cand = np.unique(row[hit])
            texts = b.column("text").take(pa.array(cand)).to_pylist()
            out_ids: list[int] = []
            out_n: list[int] = []
            for i, t in zip(cand, texts):
                n = len(_gram_set(t, w) & self.grams)
                if n:
                    out_ids.append(int(ids[i]))
                    out_n.append(n)
            return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                             "n_shared": pa.array(out_n, pa.int64())})

    from nise_ray.ops.groupapply import default_concurrency
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = collect_table(ds.map_batches(Decontam, batch_format="pyarrow",
                                       zero_copy_batch=True,
                                       concurrency=default_concurrency()))
    # output is contamination-sized (tiny relative to the corpus)
    return out.sort_by([("doc_id", "ascending")])
