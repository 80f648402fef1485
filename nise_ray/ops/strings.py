"""Regex string kernels: field extraction + payload scrubbing.

The PII-scrub / field-parse primitive every log- or web-corpus
pipeline needs before training-data export: pull a typed field out of
a semi-structured string column with a capture group, and mask the
raw digits behind a placeholder token. Both kernels run as ONE
stateless zero-copy `map_batches` over Arrow — no exchange, no
per-row Python — using pyarrow.compute's RE2 engine, the same regex
dialect DuckDB's regexp_* functions use, so the oracle comparison is
bit-exact by construction (identical pattern, identical engine
semantics: leftmost, non-overlapping, 'g' replacement).

At 100 TB this is the cheapest stage shape in the engine: embarrassingly
parallel, column-pruned at the read, output row-for-row with the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# RE2 patterns shared verbatim with the oracle SQL (keep in sync with
# __ray_entry__.oracle_sql: scrub_event_props).
_K_FIELD = r'"k": (?P<k>\d+)'
_DIGITS = r"\d+"


def scrub_event_props(sf_dir: str,
                      placeholder: str = "<NUM>") -> "ray.data.Dataset":
    """For every event: extract the integer `k` field from the JSON-ish
    `props` payload via a regex capture group (typed BIGINT, NULL when
    absent), and emit a scrubbed copy of the payload with every digit
    run replaced by `placeholder` — (event_id, k_val, props_masked)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])

    def scrub(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if batch.num_rows == 0:
            k_val = pa.array([], pa.int64())
        else:
            # extract_regex yields a struct of named groups (null struct
            # on non-match); flatten group 'k' and cast — digits-only by
            # the pattern, so the cast cannot fail on matched rows.
            hit = pc.extract_regex(props, _K_FIELD)
            k_val = pc.struct_field(hit, "k").cast(pa.int64())
        masked = pc.replace_substring_regex(props, pattern=_DIGITS,
                                            replacement=placeholder)
        return pa.table({"event_id": batch.column("event_id"),
                         "k_val": k_val,
                         "props_masked": masked})

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True)


def _levenshtein_bytes(a: np.ndarray, b: np.ndarray) -> int:
    """Edit distance over UTF-8 BYTE sequences (DuckDB's levenshtein is
    byte-based: levenshtein('café','cafe') = 2), vectorized row-sweep DP:
    each of the len(a) rows relaxes the whole len(b) frontier with numpy
    kernels; the left-to-right insertion chain resolves in diff space
    (min over k<=j of cand[k] + (j-k) == j + running-min of cand[k]-k)."""
    if len(a) == 0:
        return int(len(b))
    if len(b) == 0:
        return int(len(a))
    ar = np.arange(len(b) + 1, dtype=np.int64)
    prev = ar.copy()
    cur = np.empty(len(b) + 1, dtype=np.int64)
    for ca in a:
        cur[0] = prev[0] + 1
        np.minimum(prev[:-1] + (b != ca), prev[1:] + 1, out=cur[1:])
        np.subtract(cur, ar, out=cur)
        np.minimum.accumulate(cur, out=cur)
        np.add(cur, ar, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_pairs(sf_dir: str, k: int = 30) -> "ray.data.Dataset":
    """EDIT-DISTANCE pair verification: all u<v pairs among the k
    SHORTEST documents (ties by doc_id), scored with byte-exact
    Levenshtein distance — the character-level near-dup verifier that
    complements the token-level Jaccard verify (two docs can share no
    5-gram shingle yet sit 3 edits apart).

    Scale contract: the kernel is built to run over CANDIDATE pairs
    (LSH buckets / simhash blocks), never all-pairs — this query demos
    it on a deterministic k-smallest selection so the DuckDB oracle can
    afford the same cross join. The selection is a distributed
    sort+limit (per-block pre-top-k inside Ray's sort), the k texts ride
    into the pair tasks via ONE ray.put broadcast, and the O(k^2) pair
    table is the DATASET being mapped, so pair scoring parallelizes
    across the cluster. DP cost is O(|a|*|b|) bytes per pair with numpy
    row sweeps — cap |text| upstream (quality filter) before calling
    this at 100 TB."""
    from nise_ray.util import collect_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "n_chars"])
    shortest = collect_table(
        docs.sort(["n_chars", "doc_id"]).limit(k))
    ids = shortest.column("doc_id").to_numpy(zero_copy_only=False)
    texts = [t.encode("utf-8") for t in shortest.column("text").to_pylist()]
    blob_ref = ray.put((ids, texts))

    iu, iv = np.triu_indices(len(ids), k=1)
    pairs = pa.table({"iu": pa.array(iu.astype(np.int64)),
                      "iv": pa.array(iv.astype(np.int64))})

    class PairScorer:
        def __init__(self, ref):
            self.ids, raw = ray.get(ref)
            self.bufs = [np.frombuffer(t, dtype=np.uint8) for t in raw]

        def __call__(self, batch: pa.Table) -> pa.Table:
            bu = batch.column("iu").to_numpy(zero_copy_only=False)
            bv = batch.column("iv").to_numpy(zero_copy_only=False)
            dist = np.fromiter(
                (_levenshtein_bytes(self.bufs[u], self.bufs[v])
                 for u, v in zip(bu, bv)),
                dtype=np.int64, count=len(bu))
            # pair indices follow the length order, not the id order —
            # canonicalize to u < v by doc_id (edge contract)
            idu, idv = self.ids[bu], self.ids[bv]
            return pa.table({"u": pa.array(np.minimum(idu, idv), pa.int64()),
                             "v": pa.array(np.maximum(idu, idv), pa.int64()),
                             "dist": pa.array(dist, pa.int64())})

    from nise_ray.ops.groupapply import default_concurrency
    return ray.data.from_arrow(pairs).map_batches(
        PairScorer, fn_constructor_kwargs={"ref": blob_ref},
        batch_size=64, concurrency=default_concurrency(0.5),
        batch_format="pyarrow")


def user_props_bitmask(sf_dir: str) -> "ray.data.Dataset":
    """Grouped BITWISE aggregates (bit_or / bit_and / bit_xor) over the
    regex-extracted `k` field, per user — the flag-accumulation family
    (capability masks, feature bitsets) completing the aggregate
    inventory; all three are order-independent on exact ints so the
    comparison is bit-exact by construction.

    Plan: each block extracts k once (shared RE2 pattern) and
    pre-reduces to per-user partial masks via three reduceat sweeps; ONE
    user exchange merges partials with the same associative ops. NULL k
    rows are skipped like SQL aggregates (identity elements 0 / ~0 / 0);
    all-NULL users emit NULL masks."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "props"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    _EMPTY = pa.table({"user_id": pa.array([], pa.int64()),
                       "n_k": pa.array([], pa.int64()),
                       "k_or": pa.array([], pa.int64()),
                       "k_and": pa.array([], pa.int64()),
                       "k_xor": pa.array([], pa.int64())})

    def _reduce(uid: np.ndarray, n: np.ndarray, kor: np.ndarray,
                kand: np.ndarray, kxor: np.ndarray) -> pa.Table:
        order = np.argsort(uid, kind="stable")
        starts, _ = segments(uid[order])
        return pa.table({
            "user_id": pa.array(uid[order][starts], pa.int64()),
            "n_k": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            "k_or": pa.array(np.bitwise_or.reduceat(kor[order], starts),
                             pa.int64()),
            "k_and": pa.array(np.bitwise_and.reduceat(kand[order], starts),
                              pa.int64()),
            "k_xor": pa.array(np.bitwise_xor.reduceat(kxor[order], starts),
                              pa.int64()),
        })

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        hit = pc.extract_regex(b.column("props"), _K_FIELD)
        k = pc.struct_field(hit, "k").cast(pa.int64())
        valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = k.fill_null(0).to_numpy(zero_copy_only=False)
        return _reduce(uid, valid.astype(np.int64),
                       np.where(valid, kv, 0),
                       np.where(valid, kv, -1),  # ~0: bit_and identity
                       np.where(valid, kv, 0))

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        out = _reduce(b.column("user_id").to_numpy(zero_copy_only=False),
                      b.column("n_k").to_numpy(zero_copy_only=False),
                      b.column("k_or").to_numpy(zero_copy_only=False),
                      b.column("k_and").to_numpy(zero_copy_only=False),
                      b.column("k_xor").to_numpy(zero_copy_only=False))
        # SQL aggregates over an all-NULL group are NULL
        n = out.column("n_k").to_numpy(zero_copy_only=False)
        if (n == 0).any():
            mask = pa.array(n == 0)
            import pyarrow.compute as _pc
            cols = {"user_id": out.column("user_id"),
                    "n_k": out.column("n_k")}
            for c in ("k_or", "k_and", "k_xor"):
                cols[c] = _pc.if_else(mask, pa.nulls(len(n), pa.int64()),
                                      out.column(c))
            out = pa.table(cols)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_group_apply(partials, ["user_id"], merge, 0, sort=False)


def _longest_repeat_len(data: np.ndarray) -> int:
    """Length of the longest substring occurring >= 2 times in `data`
    (uint8 byte codes), via binary search on length L with a
    position-normalized prefix polynomial hash:

        S[j]     = sum_{k<j} x[k] * Cinv^k            (mod 2^64)
        canon(i) = (S[i+L] - S[i]) * pw[i]            (mod 2^64)

    Equal substrings of length L give equal canon values (the shared
    Cinv^(L-1) factor cancels in the comparison), so has_dup(L) is one
    subtraction + multiply + sort over all positions — each binary-
    search round is fully vectorized. has_dup is monotone in L, so
    log2(n) rounds pin the maximum exactly. 64-bit polynomial equality,
    not literal bytes: a wraparound collision could overstate the
    length — astronomically unlikely and acceptable for a corpus
    quality metric (documented contract)."""
    from nise_ray.hashing import U64, _POLY_C

    n = len(data)
    if n < 2:
        return 0
    with np.errstate(over="ignore"):
        c = _POLY_C
        # modular inverse of the odd constant via Newton iteration
        cinv = c
        for _ in range(5):
            cinv = cinv * (U64(2) - c * cinv)
        pw = np.empty(n + 1, dtype=U64)
        pwinv = np.empty(n + 1, dtype=U64)
        pw[0] = pwinv[0] = U64(1)
        np.multiply.accumulate(np.full(n, c, dtype=U64), out=pw[1:])
        np.multiply.accumulate(np.full(n, cinv, dtype=U64), out=pwinv[1:])
        s = np.empty(n + 1, dtype=U64)
        s[0] = U64(0)
        np.cumsum(data.astype(U64) * pwinv[:n], out=s[1:])

        def has_dup(ln: int) -> bool:
            canon = (s[ln:] - s[:-ln]) * pw[:n - ln + 1]
            canon.sort()
            return bool((canon[1:] == canon[:-1]).any())

        lo, hi = 0, n - 1  # longest possible repeat is n-1 ("aaaa")
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if has_dup(mid):
                lo = mid
            else:
                hi = mid - 1
    return int(lo)


def longest_repeat_docs(sf_dir: str) -> "ray.data.Dataset":
    """Per document: the byte length of the longest substring that
    occurs at least twice WITHIN the document — the exact intra-doc
    repetition measure complementing Gopher's fraction-based repetition
    stats (a doc with one giant duplicated block and a doc with many
    tiny repeats can share dup fractions; only the spectral max tells
    them apart). Output: (doc_id, n_chars, max_repeat_len).

    Rows are independent, so the stage is an embarrassingly parallel
    actor pool; per doc the binary search runs log2(len) fully
    vectorized hash-sort rounds (no Python inner loop). Not
    SQL-expressible — correctness is pinned by a brute-force oracle in
    tests/test_strings_repeat.py."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def per_batch(b: pa.Table) -> pa.Table:
        txt = b.column("text").combine_chunks()
        # one buffer walk: per-row byte views out of the Arrow buffers
        # (StringArray stores int32 offsets, large_string int64; both
        # carry an array-level offset into the shared buffer)
        odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
        bufs = txt.buffers()
        offs = np.frombuffer(bufs[1], dtype=odt)[
            txt.offset:txt.offset + len(txt) + 1].astype(np.int64)
        buf = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, np.uint8)
        out = np.empty(b.num_rows, dtype=np.int64)
        for i in range(b.num_rows):
            out[i] = _longest_repeat_len(buf[offs[i]:offs[i + 1]])
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_chars": b.column("n_chars"),
                         "max_repeat_len": pa.array(out, pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
