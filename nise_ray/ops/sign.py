"""Stage A — ingest + sign: one vectorized pass over zero-copy Arrow batches.

For every corpus row, computes in a single ``map_batches`` stage:
  doc_key, content_sha256 (fixed_size_binary(32) — hex only at the output
  sink, halving exchange width and keeping digest access zero-copy),
  sha64, n_bytes / n_tokens / n_shingles,
  the K-wide MinHash signature (stored as 4K-byte binary), and the 64-bit
  SimHash fingerprint.  The `content` column is DROPPED on output — after
  this stage the pipeline is narrow; `content` is never mutated (the sha256
  invariant is asserted in tests by re-reading the input).

Stateful-stage pattern: pass the class to ``map_batches(Signer, fn_constructor_args=(cfg,),
concurrency=..., batch_format="pyarrow")`` so the permutation seed matrix and
the token-hash cache are built once per actor, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import (
    U64,
    minhash_seeds,
    minhash_signatures,
    oph_signatures,
    simhash_from_shingles,
)
from nise_ray.ops.normalize import (
    TokenHasher,
    batch_shingle_hashes,
    batch_token_hashes,
    normalize_text,
    shingle_hashes,
    tokenize,
)

SIGNED_COLUMNS = [
    "repo", "path", "commit", "lang",
    "doc_key", "content_sha256", "sha64",
    "n_bytes", "n_tokens", "n_shingles",
    "minhash", "simhash",
]

# per-worker-process signer cache for the task-based sign path: Ray reuses
# worker processes across tasks, so seeds + token cache are built once per
# worker — the stateful-stage benefit without pinning CPU slots to a
# fixed actor pool (which starves upstream read tasks on a full cluster)
_SIGNER_CACHE: dict[str, "Signer"] = {}


def make_sign_fn(cfg: DedupConfig):
    key = cfg.config_hash()

    def sign_batch(batch: pa.Table) -> pa.Table:
        signer = _SIGNER_CACHE.get(key)
        if signer is None:
            signer = _SIGNER_CACHE.setdefault(key, Signer(cfg))
        return signer(batch)

    return sign_batch


class Signer:
    """Callable class for ``map_batches`` (actor pool when concurrency set)."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.seeds = minhash_seeds(cfg.minhash_k, cfg.seed)
        self.oph_seed = int(self.seeds[0])
        self.hasher = TokenHasher()
        self.normalize = cfg.custom_normalizer or normalize_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        repo = batch.column("repo").to_pylist()
        path = batch.column("path").to_pylist()
        commit = batch.column("commit").to_pylist()
        lang = batch.column("lang") if "lang" in batch.column_names else pa.nulls(n, pa.string())
        contents = batch.column("content").to_pylist()

        doc_keys = np.empty(n, dtype=U64)
        sha_buf = bytearray(32 * n)  # fixed_size_binary(32) values
        sha64 = np.empty(n, dtype=U64)
        n_bytes = np.empty(n, dtype=np.int64)

        for i in range(n):
            key_blob = (repo[i].encode() + b"\x00" + path[i].encode()
                        + b"\x00" + commit[i].encode())
            doc_keys[i] = int.from_bytes(
                hashlib.blake2b(key_blob, digest_size=8).digest(), "little")
            raw = contents[i].encode("utf-8", errors="surrogatepass")
            dig = hashlib.sha256(raw).digest()
            sha_buf[32 * i:32 * i + 32] = dig
            sha64[i] = int.from_bytes(dig[:8], "little")
            n_bytes[i] = len(raw)

        if self.normalize is normalize_text:
            # batched tokenize/shingle: one Arrow regex pass + one
            # dictionary-encode + one lexsort for the whole batch
            # (bit-identical to the per-row path; parity pinned in tests)
            flat_h, tok_offs, n_tokens_arr = batch_token_hashes(
                batch.column("content"), self.hasher)
            all_shingles, offsets = batch_shingle_hashes(
                flat_h, tok_offs, cfg.shingle_w)
            n_tokens = n_tokens_arr
        else:
            # custom normalizer hook: per-row reference path
            n_tokens = np.empty(n, dtype=np.int64)
            shingle_arrays: list[np.ndarray] = []
            offsets = np.zeros(n + 1, dtype=np.int64)
            for i in range(n):
                toks = tokenize(self.normalize(contents[i]))
                n_tokens[i] = len(toks)
                sh = shingle_hashes(self.hasher.hash_tokens(toks),
                                    cfg.shingle_w)
                shingle_arrays.append(sh)
                offsets[i + 1] = offsets[i] + len(sh)
            all_shingles = (np.concatenate(shingle_arrays) if shingle_arrays
                            else np.empty(0, dtype=U64))
        if cfg.minhash_mode == "oph":
            sigs = oph_signatures(all_shingles, offsets, cfg.minhash_k,
                                  self.oph_seed)  # n x K u32
        else:
            sigs = minhash_signatures(all_shingles, offsets, self.seeds)
        simhash = simhash_from_shingles(all_shingles, offsets)

        if cfg.sig_value_bytes == 2:
            # high 16 bits: >>16 is monotone, so it commutes with the
            # per-slot min — this is exactly 16-bit OPH, not a lossy hack
            sig_bytes = (sigs >> 16).astype("<u2").tobytes()
        else:
            sig_bytes = sigs.astype("<u4").tobytes()
        kb = cfg.sig_value_bytes * cfg.minhash_k
        minhash_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(kb), n, [None, pa.py_buffer(sig_bytes)])

        out = pa.table({
            "repo": batch.column("repo"),
            "path": batch.column("path"),
            "commit": batch.column("commit"),
            "lang": lang,
            "doc_key": pa.array(doc_keys, pa.uint64()),
            "content_sha256": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(32), n, [None, pa.py_buffer(bytes(sha_buf))]),
            "sha64": pa.array(sha64, pa.uint64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_shingles": pa.array(np.diff(offsets), pa.int64()),
            "minhash": minhash_col,
            "simhash": pa.array(simhash, pa.uint64()),
        })
        # passthrough: columns outside the corpus contract ride along on
        # the narrow signed table (they never enter the wide exchanges,
        # whose explodes select specific columns)
        for name in batch.column_names:
            if name not in ("repo", "path", "commit", "lang", "content"):
                out = out.append_column(name, batch.column(name))
        return out
