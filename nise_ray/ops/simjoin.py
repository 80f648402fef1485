"""Exact set-similarity self-join over the `documents` table — token-set
Jaccard with PREFIX FILTERING (Bayardo/Ma/Srikant "Scaling Up All Pairs
Similarity Search", WWW'07; Xiao et al. PPJoin, WWW'08).

Unlike the MinHash-LSH path (probabilistic candidates, estimated Jaccard),
this operator is EXACT: output pairs are precisely those with
|Tu ∩ Tv| / |Tu ∪ Tv| >= tau over each doc's DISTINCT token set — which
makes it fully SQL-expressible (DuckDB oracle in __ray_entry__) while
still scale-shaped:

  1. df pass: one vocab-sized hash exchange counts document frequency per
     token (the combiner pattern — per-batch partial counts, never token
     instances). The (tok -> df) attach is mode-gated (`df_mode`):
     "broadcast" ray.puts the vocab-sized map once; "join" runs a
     distributed hash join on tok + a doc_id regroup (the 100-TB path,
     same shape as join_verify); "auto" picks by vocab size. Both paths
     are parity-tested to emit identical pairs.
  2. prefix explode: each doc emits only its p = n - ceil(tau*n) + 1
     RAREST tokens (global order = (df, tok) asc). The prefix-filter
     theorem guarantees any pair with J >= tau shares a prefix token, so
     the candidate exchange moves O((1-tau) * corpus tokens) rows instead
     of all of them — and hot tokens (stopwords, boilerplate) have high
     df, so they almost never enter a prefix: the skew that melts a naive
     token-inverted-index join is filtered out by construction.
  3. candidate pairs per token group with the size filter
     (min(nu,nv) >= tau * max(nu,nv)), then one (u, v) distinct exchange.
  4. verify: DISTRIBUTED map_batches over the pair set. The needed-docs
     token-set attach is mode-gated (`verify_mode`, mirroring df_mode):
     "broadcast" ray.puts the needed-endpoint token-set map once (needed
     set is bounded by the PAIR set, not the corpus — but on a dup-heavy
     corpus pair endpoints approach corpus cardinality, hence the gate);
     "join" is the 100-TB path — the distinct-endpoint DATASET semi-joins
     `documents` for token sets, then two hash joins attach each pair's
     endpoint sets and a task-path kernel verifies per batch with NO
     driver/worker-resident map; "auto" gates on the measured distinct
     endpoint count. Both paths are parity-tested to emit identical
     pairs. Either way the per-batch count is fully vectorized (one
     lexsort + adjacent-duplicate count, no per-pair Python).

All tokenize/hash work uses the batched kernels from ops/normalize
(Arrow regex split + dictionary-encoded blake2b with a per-actor vocab
cache) over RAW text — matching the oracle's tokenizer exactly; the
round-3 per-row Python `_TOKEN.findall` + per-token blake2b sites are
gone.

Output is integer-exact: (doc_id_u, doc_id_v, n_inter, n_union) — no
float in the contract, so the DuckDB hash comparison has no rounding
hazard; consumers derive jaccard = n_inter / n_union.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.hashing import U64
from nise_ray.ops.normalize import TokenHasher, batch_token_hashes

_EMPTY_PAIRS = pa.schema([
    ("doc_id_u", pa.int64()), ("doc_id_v", pa.int64()),
    ("n_inter", pa.int64()), ("n_union", pa.int64()),
])


def _row_unique_token_hashes(
    col: "pa.Array | pa.ChunkedArray", hasher: TokenHasher,
) -> tuple[np.ndarray, np.ndarray]:
    """text column -> (flat per-row sorted-unique token hashes, offsets).

    Batched: one Arrow regex split + dictionary-encoded blake2b for the
    whole column, one lexsort for the per-row dedup — no per-row Python.
    Raw-text tokenization (normalize=False): this operator's contract and
    oracle are defined over unnormalized text."""
    flat_h, offs, _ = batch_token_hashes(col, hasher, normalize=False)
    n = len(offs) - 1
    cnt = np.diff(offs)
    row = np.repeat(np.arange(n, dtype=np.int64), cnt)
    if len(flat_h) == 0:
        return flat_h, np.zeros(n + 1, dtype=np.int64)
    order = np.lexsort((flat_h, row))
    f = flat_h[order]
    r = row[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    uf = f[keep]
    ucnt = np.bincount(r[keep], minlength=n).astype(np.int64)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ucnt, out=uoffs[1:])
    return uf, uoffs


def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of [s, s+c) index ranges, vectorized. Zero counts
    are dropped first: a 0 in `counts` makes consecutive reset positions
    collide (the later fancy-index write silently overwrites the earlier
    one, corrupting every range after it) and a trailing 0 writes one
    past the end — e.g. an empty-text row surviving to the token-set
    repack used to corrupt flat_sorted for all docs sorted after it."""
    nz = counts > 0
    starts, counts = starts[nz], counts[nz]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    incr = np.ones(total, dtype=np.int64)
    incr[0] = starts[0]
    reset = np.cumsum(counts)[:-1]
    incr[reset] = starts[1:] - (starts[:-1] + counts[:-1] - 1)
    return np.cumsum(incr)


def all_bucket_size_filtered_pairs(key: np.ndarray, ids: np.ndarray,
                                   size: np.ndarray, tau: float):
    """(u, v) candidate pairs for ALL buckets in a partition at once —
    one lexsort plus index arithmetic, zero per-bucket Python (the same
    rewrite that took the substring partition kernel off the bench
    critical path). Per bucket: all pairs with u < v in doc_id order,
    self-pairs dropped, and the Jaccard size filter
    min(S_u, S_v) >= tau * max(S_u, S_v) applied vectorized.
    Returns (u, v) or None when no bucket yields a pair."""
    from nise_ray.ops.groupapply import segments

    order = np.lexsort((ids, key))
    k_s, id_s, sz_s = key[order], ids[order], size[order]
    starts, counts = segments(k_s)
    big = counts >= 2
    if not big.any():
        return None
    s0, c0 = starts[big], counts[big]
    u_idx = _ranges(s0, c0 - 1)
    i_off = u_idx - np.repeat(s0, c0 - 1)
    vcnt = np.repeat(c0, c0 - 1) - 1 - i_off
    ui = np.repeat(u_idx, vcnt)
    vi = _ranges(u_idx + 1, vcnt)
    u, v, su_, sv_ = id_s[ui], id_s[vi], sz_s[ui], sz_s[vi]
    lo = np.minimum(su_, sv_)
    hi = np.maximum(su_, sv_)
    keep = (u != v) & (lo.astype(np.float64) >= tau * hi)
    if not keep.any():
        return None
    return u[keep], v[keep]


def _get_units(units: str):
    """Pluggable set-unit extractor for the prefix-filtered join family:
    fn(text column, hasher) -> (flat per-row sorted-unique uint64 unit
    hashes, offsets). "token" = distinct word tokens (blake2b, the
    production unit); "sha_ngram_<w>" = distinct w-gram shingles hashed
    with sha256[:8] big-endian — slower, but the hash is computable in
    DuckDB SQL, so every op built on it is externally oracle-able."""
    if units == "token":
        return _row_unique_token_hashes
    if units.startswith("sha_ngram_"):
        w = int(units.rsplit("_", 1)[-1])
        from nise_ray.ops.normalize import batch_sha_ngram_hashes

        def fn(col, hasher):
            return batch_sha_ngram_hashes(col, w)

        return fn
    raise ValueError(f"unknown units {units!r}")


class _DfPartial:
    """Per-batch combiner: (tok, partial document frequency). Actor-pool
    stage so the token-hash vocabulary cache persists across batches."""

    def __init__(self, units: str = "token") -> None:
        self.hasher = TokenHasher()
        self.extract = _get_units(units)

    def __call__(self, b: pa.Table) -> pa.Table:
        uf, _ = self.extract(b.column("text"), self.hasher)
        if len(uf) == 0:
            return pa.table({"tok": pa.array([], pa.uint64()),
                             "df": pa.array([], pa.int64())})
        uniq, counts = np.unique(uf, return_counts=True)
        return pa.table({"tok": pa.array(uniq, pa.uint64()),
                         "df": pa.array(counts, pa.int64())})


_DF_SCHEMA = pa.schema([("tok", pa.uint64()), ("df", pa.int64())])
_UV_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_DOCID_SCHEMA = pa.schema([("doc_id", pa.int64())])


def distinct_uv_batch(batch: pa.Table) -> pa.Table:
    """Block-level (u, v) distinct (typed empty on the shuffle's
    0-column empty partitions) — the shared merge fn for every pair
    exchange in the similarity-join family."""
    if batch.num_rows == 0:
        return _UV_SCHEMA.empty_table()
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    first = np.ones(len(order), dtype=bool)
    first[1:] = (u[order][1:] != u[order][:-1]) | \
                (v[order][1:] != v[order][:-1])
    return batch.take(pa.array(order[first]))


def _df_merge_batch(batch: pa.Table) -> pa.Table:
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        # typed empty, NEVER the incoming batch: the hash shuffle hands
        # empty partitions to the block fn as ZERO-COLUMN tables, and a
        # passed-through 0-column block poisons any downstream join
        # (acero: "No match for FieldRef" on the key) and union schema
        return _DF_SCHEMA.empty_table()
    tok = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    df = batch.column("df").to_numpy(zero_copy_only=False)
    starts, _ = segments(tok)
    return pa.table({
        "tok": pa.array(tok[starts], pa.uint64()),
        "df": pa.array(np.add.reduceat(df, starts), pa.int64()),
    })


def _prefix_lengths(cnt: np.ndarray, tau: float) -> np.ndarray:
    """Bayardo'07 Jaccard prefix length p = n - ceil(tau*n) + 1 (0 when
    the row has no tokens)."""
    p = cnt - np.ceil(np.round(tau * cnt, 9)).astype(np.int64) + 1
    return np.where(cnt > 0, p, 0)


def _prefix_select(uf: np.ndarray, dfv: np.ndarray, row: np.ndarray,
                   uoffs: np.ndarray, cnt: np.ndarray, tau: float,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row prefix selection, one batch-wide lexsort: keep each row's
    first p_row entries in (df asc, tok asc) order. Returns (flat indices
    into uf's row-sorted order, row index per kept entry)."""
    p = _prefix_lengths(cnt, tau)
    order = np.lexsort((uf, dfv, row))  # row-major; within row (df, tok)
    intra = np.arange(len(uf), dtype=np.int64) - np.repeat(uoffs[:-1], cnt)
    keep = intra < np.repeat(p, cnt)
    return order[keep], row[keep]  # row[order] == row (row already sorted)


class _PrefixExplodeBroadcast:
    """Prefix explode with the broadcast (tok -> df) map."""

    def __init__(self, df_ref, tau: float, units: str = "token") -> None:
        self.toks, self.dfs = ray.get(df_ref)
        self.tau = tau
        self.hasher = TokenHasher()
        self.extract = _get_units(units)

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        uf, uoffs = self.extract(b.column("text"), self.hasher)
        if len(uf) == 0:
            return pa.table({"tok": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        n = len(uoffs) - 1
        cnt = np.diff(uoffs)
        row = np.repeat(np.arange(n, dtype=np.int64), cnt)
        pos = np.searchsorted(self.toks, uf)
        dfv = self.dfs[pos]  # every token exists in the global map
        sel, rk = _prefix_select(uf, dfv, row, uoffs, cnt, self.tau)
        return pa.table({
            "tok": pa.array(uf[sel], pa.uint64()),
            "doc_id": pa.array(ids[rk], pa.int64()),
            "n_tok": pa.array(cnt[rk], pa.int64()),
        })


class _ExplodeAllTokens:
    """(doc_id, text) -> one row per DISTINCT token (doc_id, tok, n_tok);
    feeds the distributed df join path."""

    def __init__(self, units: str = "token") -> None:
        self.hasher = TokenHasher()
        self.extract = _get_units(units)

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        uf, uoffs = self.extract(b.column("text"), self.hasher)
        n = len(uoffs) - 1
        cnt = np.diff(uoffs)
        row = np.repeat(np.arange(n, dtype=np.int64), cnt)
        return pa.table({
            "tok": pa.array(uf, pa.uint64()),
            "doc_id": pa.array(ids[row], pa.int64()),
            "n_tok": pa.array(cnt[row], pa.int64()),
        })


def _explode_all_tokens_fn(units: str = "token"):
    """Task-path _ExplodeAllTokens (fresh hasher per task): used when a
    JoinOperator shares the DAG — actor pools alongside join aggregator
    pools deadlock small clusters (each reserves CPU slots)."""

    def fn(b: pa.Table) -> pa.Table:
        return _ExplodeAllTokens(units)(b)

    return fn


_explode_all_tokens_task = _explode_all_tokens_fn("token")


def _prefix_regroup_batch(tau: float):
    """Block fn for the df-join path: the block holds complete doc_id
    groups of (doc_id, tok, n_tok, df) rows; re-derive each doc's prefix
    with the same batch-wide lexsort as the broadcast path."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"tok": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        nt = batch.column("n_tok").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        # group rows by doc (block is hash-partitioned but not sorted)
        o = np.argsort(ids, kind="stable")
        ids, toks, nt, dfv = ids[o], toks[o], nt[o], dfv[o]
        from nise_ray.ops.groupapply import segments
        starts, cnt = segments(ids)
        uoffs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(cnt, out=uoffs[1:])
        row = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        sel, rk = _prefix_select(toks, dfv, row, uoffs, cnt, tau)
        return pa.table({
            "tok": pa.array(toks[sel], pa.uint64()),
            "doc_id": pa.array(ids[starts][rk], pa.int64()),
            "n_tok": pa.array(nt[starts][rk], pa.int64()),
        })

    return fn


class _VerifyPairs:
    """Distributed exact verification: per batch of candidate pairs,
    gather both endpoints' sorted-unique token sets from the broadcast
    needed-docs map and count intersections with ONE lexsort + adjacent-
    duplicate scan — no per-pair Python (the round-3 driver loop)."""

    def __init__(self, map_ref, tau: float) -> None:
        self.ids, self.flat, self.offs = ray.get(map_ref)
        self.tau = tau

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_PAIRS.empty_table()
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        hi = max(len(self.ids) - 1, 0)
        iu = np.clip(np.searchsorted(self.ids, u), 0, hi)
        iv = np.clip(np.searchsorted(self.ids, v), 0, hi)
        if not ((self.ids[iu] == u).all() and (self.ids[iv] == v).all()):
            raise AssertionError("pair endpoint missing from token-set map")
        cu = self.offs[iu + 1] - self.offs[iu]
        cv = self.offs[iv + 1] - self.offs[iv]
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        a_idx = _ranges(self.offs[iu], cu)
        b_idx = _ranges(self.offs[iv], cv)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_hash = np.concatenate([self.flat[a_idx], self.flat[b_idx]])
        order = np.lexsort((all_hash, all_pair))
        ps, hs = all_pair[order], all_hash[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        n_inter = np.bincount(ps[1:][dup], minlength=npair)
        n_union = cu + cv - n_inter
        keep = n_inter.astype(np.float64) >= self.tau * n_union
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "n_inter": pa.array(n_inter[keep], pa.int64()),
            "n_union": pa.array(n_union[keep], pa.int64()),
        })


def _endpoints_batch(batch: pa.Table) -> pa.Table:
    """(u, v) pair batch -> block-distinct endpoint doc_ids."""
    e = np.unique(np.concatenate([
        batch.column("u").to_numpy(zero_copy_only=False),
        batch.column("v").to_numpy(zero_copy_only=False)]))
    return pa.table({"doc_id": pa.array(e, pa.int64())})


def _distinct_doc_batch(batch: pa.Table) -> pa.Table:
    """Merge fn for the endpoint exchange: distinct doc_id per block
    (typed empty on the shuffle's 0-column empty partitions — see
    _df_merge_batch)."""
    if batch.num_rows == 0:
        return _DOCID_SCHEMA.empty_table()
    ids = np.unique(batch.column("doc_id").to_numpy(zero_copy_only=False))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


class _GatherTokenSets:
    """Actor-pool stage: (doc_id, text) -> (doc_id, toks) list rows for
    the docs in the broadcast needed-set (pair endpoints)."""

    def __init__(self, needed_ref, units: str = "token") -> None:
        self.needed = ray.get(needed_ref)
        self.hasher = TokenHasher()
        self.extract = _get_units(units)

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(self.needed, ids), 0,
                      max(len(self.needed) - 1, 0))
        rows = np.flatnonzero(self.needed[pos] == ids) \
            if len(self.needed) else np.empty(0, np.int64)
        if len(rows) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "toks": pa.array([], pa.large_list(pa.uint64()))})
        sel = b.take(pa.array(rows))
        uf, uoffs = self.extract(sel.column("text"), self.hasher)
        return pa.table({
            "doc_id": sel.column("doc_id"),
            "toks": pa.LargeListArray.from_arrays(
                pa.array(uoffs, pa.int64()), pa.array(uf, pa.uint64())),
        })


def _list_flat_offs(col: "pa.ChunkedArray | pa.Array"):
    """list column -> (flat values np array, 0-based int64 offsets).
    Offsets normalize against the FIRST PHYSICAL VALUE OFFSET
    (g_offs - g_offs[0]), not the list-slot slice offset: flatten()
    returns exactly the values the logical slice references, so this
    stays correct for sliced / non-compacted arrays where the two
    offsets differ."""
    lists = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    offs = np.asarray(lists.offsets, dtype=np.int64)
    if len(offs):
        offs = offs - offs[0]
    return flat, offs


def _pack_tokset_map(got: pa.Table):
    """Collected (doc_id, toks) rows -> broadcast ref of (sorted ids,
    flat hashes, offsets) for searchsorted lookup in the verifiers."""
    gids = got.column("doc_id").to_numpy(zero_copy_only=False)
    g_flat, g_offs = _list_flat_offs(got.column("toks"))
    g_flat = g_flat.astype(U64)
    order = np.argsort(gids)
    cnts = np.diff(g_offs)[order]
    flat_sorted = g_flat[_ranges(g_offs[:-1][order], cnts)]
    offs_sorted = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(cnts, out=offs_sorted[1:])
    return ray.put((gids[order], flat_sorted, offs_sorted))


def _flat_to_bin(flat: np.ndarray, offs: np.ndarray) -> pa.Array:
    """(flat fixed-width values, element offsets) -> large_binary rows
    (each row = its elements' raw bytes). Arrow's acero join rejects
    list-typed NON-KEY columns ("not supported in join non-key field"),
    so the join verify path ships token sets as binary blobs instead;
    _bin_flat_offs inverts this zero-copy on the other side."""
    byte_offs = (offs * flat.dtype.itemsize).astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(byte_offs.tobytes()),
         pa.py_buffer(flat.tobytes())])


def _bin_flat_offs(col: "pa.ChunkedArray | pa.Array", dtype):
    """large_binary column -> (flat values of `dtype`, 0-based element
    offsets). Caller guarantees no nulls (fail-loud upstream)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    itemsize = np.dtype(dtype).itemsize
    if n == 0:
        return np.empty(0, dtype), np.zeros(1, np.int64)
    bufs = arr.buffers()
    byte_offs = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + n + 1]
    if bufs[2] is None or byte_offs[-1] == byte_offs[0]:
        return np.empty(0, dtype), np.zeros(n + 1, np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    flat = data[byte_offs[0]:byte_offs[-1]].view(dtype)
    return flat, (byte_offs - byte_offs[0]) // itemsize


def _tokset_rows_fn(units: str = "token"):
    """Task-path (doc_id, text) -> (doc_id, toks[binary]) for the join
    verify path (fresh hasher per task; join aggregator pools alongside
    actor pools deadlock small clusters)."""
    extract = _get_units(units)

    def fn(b: pa.Table) -> pa.Table:
        uf, uoffs = extract(b.column("text"), TokenHasher())
        return pa.table({"doc_id": b.column("doc_id"),
                         "toks": _flat_to_bin(uf.astype(U64), uoffs)})

    return fn



def _proj_toks_u(b: pa.Table) -> pa.Table:
    """After the u-side join: fail loud on a missing endpoint (left-
    outer null — documents must cover every pair endpoint), rename."""
    toks = b.column("toks")
    if toks.null_count:
        raise AssertionError("pair endpoint missing from documents "
                             "(u-side join produced NULL token set)")
    return pa.table({"u": b.column("u"), "v": b.column("v"),
                     "toks_u": toks})


def _verify_lists_fn(tau: float, contain: bool):
    """Join-path verify kernel: batch carries each pair's BOTH endpoint
    token sets as list columns (u, v, toks_u, toks) — same one-lexsort
    intersection count as the broadcast verifiers, no resident map."""

    def fn(b: pa.Table) -> pa.Table:
        empty = _EMPTY_CONTAIN if contain else _EMPTY_PAIRS
        if b.num_rows == 0:
            return empty.empty_table()
        if b.column("toks").null_count:
            raise AssertionError("pair endpoint missing from documents "
                                 "(v-side join produced NULL token set)")
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        flat_u, offs_u = _bin_flat_offs(b.column("toks_u"), U64)
        flat_v, offs_v = _bin_flat_offs(b.column("toks"), U64)
        cu, cv = np.diff(offs_u), np.diff(offs_v)
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_hash = np.concatenate([flat_u.astype(U64),
                                   flat_v.astype(U64)])
        order = np.lexsort((all_hash, all_pair))
        ps, hs = all_pair[order], all_hash[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        n_inter = np.bincount(ps[1:][dup], minlength=npair)
        if contain:
            n_min = np.minimum(cu, cv)
            keep = n_inter.astype(np.float64) >= tau * n_min
            return pa.table({
                "doc_id_u": pa.array(u[keep], pa.int64()),
                "doc_id_v": pa.array(v[keep], pa.int64()),
                "n_inter": pa.array(n_inter[keep], pa.int64()),
                "n_min": pa.array(n_min[keep], pa.int64())})
        n_union = cu + cv - n_inter
        keep = n_inter.astype(np.float64) >= tau * n_union
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "n_inter": pa.array(n_inter[keep], pa.int64()),
            "n_union": pa.array(n_union[keep], pa.int64())})

    return fn


def _pair_verify_tail(docs, pairs_ds, tau: float, verify_mode: str,
                      verify_broadcast_max: int, contain: bool,
                      units: str = "token") -> pa.Table:
    """Shared exact-verify tail for the Jaccard and containment joins.

    verify_mode: "broadcast" | "join" | "auto" — how each pair's
    endpoint token sets reach the verify kernel. "broadcast" collects
    the distinct-endpoint token sets once and ray.puts a searchsorted
    map (fast while endpoints are output-sized); "join" is the 100-TB
    path: the distinct-endpoint DATASET semi-joins documents for token
    sets, two left-outer hash joins attach them per pair, and the
    kernel verifies per batch with no resident map; "auto" gates on
    the measured distinct endpoint count. Both modes fail loud on a
    pair endpoint missing from documents and are parity-tested."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply
    from nise_ray.util import collect_table

    empty = _EMPTY_CONTAIN if contain else _EMPTY_PAIRS
    # distinct endpoints as a DATASET (one doc_id exchange) — the gate
    # count is metadata after materialize, nothing driver-sized yet
    ep_ds = hash_group_apply(
        pairs_ds.map_batches(_endpoints_batch, batch_format="pyarrow"),
        ["doc_id"], _distinct_doc_batch, sort=False).materialize()
    n_needed = ep_ds.count()
    if n_needed == 0:
        return empty.empty_table()
    if verify_mode == "auto":
        verify_mode = ("broadcast" if n_needed <= verify_broadcast_max
                       else "join")

    if verify_mode == "broadcast":
        needed = np.sort(collect_table(ep_ds).column("doc_id").to_numpy(
            zero_copy_only=False))
        needed_ref = ray.put(needed)
        got = collect_table(docs.map_batches(
            _GatherTokenSets, fn_constructor_args=(needed_ref, units),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency()))
        map_ref = _pack_tokset_map(got)
        cls = _VerifyContainment if contain else _VerifyPairs
        verified = pairs_ds.map_batches(
            cls, fn_constructor_args=(map_ref, tau),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency())
    elif verify_mode == "join":
        from nise_ray.ops.groupapply import join_input
        from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
        # patch the captured DataContexts BEFORE joining: a fresh process
        # calling with verify_mode='join' directly would otherwise run
        # the join with the library-default 200-aggregator fleet (the
        # small-cluster deadlock use_hash_shuffle documents)
        _hash_shuffle_on(docs, ep_ds, pairs_ds)
        np_ = _join_partitions()
        # every sparse join input goes through join_input (Ray's join
        # loses its schema broadcast when a side's first block is empty
        # — see groupapply.join_input)
        sel = docs.join(join_input(ep_ds), join_type="inner",
                        on=("doc_id",), num_partitions=np_)
        toksets = join_input(sel.map_batches(_tokset_rows_fn(units),
                                             batch_format="pyarrow",
                                             zero_copy_batch=True))
        j1 = join_input(pairs_ds).join(toksets, join_type="left_outer",
                                       on=("u",), right_on=("doc_id",),
                                       num_partitions=np_)
        j1 = join_input(j1.map_batches(_proj_toks_u,
                                       batch_format="pyarrow"))
        j2 = j1.join(toksets, join_type="left_outer", on=("v",),
                     right_on=("doc_id",), num_partitions=np_)
        verified = j2.map_batches(_verify_lists_fn(tau, contain),
                                  batch_format="pyarrow")
    else:
        raise ValueError(f"unknown verify_mode {verify_mode!r}")

    out = collect_table(verified)
    if out.num_rows == 0:
        return empty.empty_table()
    return out.select([f.name for f in empty]).sort_by(
        [("doc_id_u", "ascending"), ("doc_id_v", "ascending")])


def token_jaccard_pairs(sf_dir: str, tau: float = 0.5,
                        df_mode: str = "auto",
                        df_broadcast_max: int = 10_000_000,
                        verify_mode: str = "auto",
                        verify_broadcast_max: int = 1_000_000,
                        units: str = "token") -> pa.Table:
    """All document pairs with exact token-set Jaccard >= tau, as
    (doc_id_u, doc_id_v, n_inter, n_union), sorted by (u, v).
    See module docstring for the prefix-filtered plan.

    df_mode: "broadcast" | "join" | "auto" — how the per-token document
    frequency reaches the prefix selector. "join" is the 100-TB path
    (distributed hash join on tok + doc_id regroup, no vocab-sized
    driver/worker state); "auto" gates on the measured vocab size.
    verify_mode gates the exact-verify endpoint token-set attach the
    same way (see _pair_verify_tail) — no ungated driver
    materialization anywhere on the path."""
    from nise_ray.ops.groupapply import (
        default_concurrency,
        hash_group_apply,
        segments,
    )
    from nise_ray.util import collect_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    # ---- pass 1: global document frequency per token (vocab-sized) ------
    partials = docs.map_batches(_DfPartial, fn_constructor_args=(units,),
                                batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    # vocab-sized, consumed twice in join mode (gate count + join input)
    df_ds = hash_group_apply(partials, ["tok"], _df_merge_batch).materialize()
    if df_mode == "auto":
        df_mode = "broadcast" if df_ds.count() <= df_broadcast_max else "join"

    # ---- pass 2: prefix explode ----------------------------------------
    if df_mode == "broadcast":
        df_t = collect_table(df_ds)
        toks_sorted = df_t.column("tok").to_numpy(
            zero_copy_only=False).astype(U64)
        order = np.argsort(toks_sorted)
        df_ref = ray.put((toks_sorted[order],
                          df_t.column("df").to_numpy(
                              zero_copy_only=False)[order]))
        prefix = docs.map_batches(
            _PrefixExplodeBroadcast,
            fn_constructor_args=(df_ref, tau, units),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency())
    elif df_mode == "join":
        from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
        full = docs.map_batches(_ExplodeAllTokens,
                                fn_constructor_args=(units,),
                                batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
        _hash_shuffle_on(full, df_ds)
        joined = full.join(df_ds, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("tok",))
        prefix = hash_group_apply(joined, ["doc_id"],
                                  _prefix_regroup_batch(tau), sort=False)
    else:
        raise ValueError(f"unknown df_mode {df_mode!r}")

    # ---- pass 3: candidate pairs per token group + (u,v) distinct -------
    # all-bucket vectorized pair generation (one lexsort + index
    # arithmetic; the per-bucket argsort/triu loop was the kernel's
    # dominant CPU on skewed prefix-token buckets)
    def pair_gen(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        out = all_bucket_size_filtered_pairs(
            batch.column("tok").to_numpy(zero_copy_only=False).astype(U64),
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("n_tok").to_numpy(zero_copy_only=False), tau)
        if out is None:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        return pa.table({"u": pa.array(out[0], pa.int64()),
                         "v": pa.array(out[1], pa.int64())})

    cands = hash_group_apply(prefix, ["tok"], pair_gen)

    # pair-set-sized, consumed twice (endpoint distinct + verify input)
    pairs_ds = hash_group_apply(cands, ["u", "v"], distinct_uv_batch,
                                sort=False).materialize()

    # ---- pass 4: mode-gated distributed exact verification --------------
    return _pair_verify_tail(docs, pairs_ds, tau, verify_mode,
                             verify_broadcast_max, contain=False,
                             units=units)


def source_overlap_pairs(sf_dir: str, tau: float = 0.5,
                         broadcast_max: int = 5_000_000) -> pa.Table:
    """Fork/source-overlap detection: aggregate the exact token-Jaccard
    near-duplicate doc pairs to the SOURCE level — (source_u, source_v,
    n_pairs) for every pair of distinct sources that share at least one
    near-duplicate document pair (J >= tau), source_u < source_v.

    This is the repo-overlap query a code-dedup pipeline runs to collapse
    forks: the heavy lifting is the prefix-filtered similarity self-join
    (one token-bucket exchange, no all-pairs); the source rollup is a
    vocab-sized aggregation. The doc_id -> source lookup is a broadcast
    gated on the document count with a distributed-join fallback."""
    from nise_ray.util import collect_table

    pairs = token_jaccard_pairs(sf_dir, tau=tau)
    if pairs.num_rows == 0:
        return pa.table({"source_u": pa.array([], pa.string()),
                         "source_v": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    pu = pairs.column("doc_id_u").to_numpy(zero_copy_only=False)
    pv = pairs.column("doc_id_v").to_numpy(zero_copy_only=False)
    if docs.count() <= broadcast_max:  # parquet metadata count, no scan
        m = collect_table(docs)
        ids = m.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        src = m.column("source").combine_chunks().take(pa.array(order))
        iu = np.searchsorted(ids, pu)
        iv = np.searchsorted(ids, pv)
        if not ((ids[np.clip(iu, 0, len(ids) - 1)] == pu).all()
                and (ids[np.clip(iv, 0, len(ids) - 1)] == pv).all()):
            raise ValueError("pair endpoint missing from documents table")
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        su, sv = codes[iu], codes[iv]
    else:
        # distributed fallback: two hash joins attach both endpoints'
        # sources, with a projection between them so the second join's
        # right columns cannot collide with the first's
        from nise_ray.ops.relational import _join_partitions
        np_ = _join_partitions()
        pd_ds = ray.data.from_arrow(pairs.select(["doc_id_u", "doc_id_v"]))
        j = pd_ds.join(docs, join_type="inner", num_partitions=np_,
                       on=("doc_id_u",), right_on=("doc_id",))

        def _proj1(b: pa.Table) -> pa.Table:
            return pa.table({"doc_id_v": b.column("doc_id_v"),
                             "source_u": b.column("source")})

        from nise_ray.ops.groupapply import join_input
        j = join_input(j.map_batches(_proj1, batch_format="pyarrow"))
        j = j.join(docs, join_type="inner", num_partitions=np_,
                   on=("doc_id_v",), right_on=("doc_id",))

        def _proj2(b: pa.Table) -> pa.Table:
            return pa.table({"source_u": b.column("source_u"),
                             "source_v": b.column("source")})

        jt = collect_table(j.map_batches(_proj2, batch_format="pyarrow"))
        all_src = pa.concat_arrays([
            jt.column("source_u").combine_chunks(),
            jt.column("source_v").combine_chunks()])
        enc = all_src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        su, sv = codes[:jt.num_rows], codes[jt.num_rows:]
    # canonical order by source NAME (matches SQL LEAST/GREATEST), drop
    # same-source pairs, count per (source_u, source_v)
    nu, nv = names[su], names[sv]
    swap = nu > nv
    nu[swap], nv[swap] = nv[swap], nu[swap]
    keep = nu != nv
    nu, nv = nu[keep], nv[keep]
    order = np.lexsort((nv, nu))
    nu, nv = nu[order], nv[order]
    new = np.empty(len(nu), dtype=bool)
    if len(nu):
        new[0] = True
        new[1:] = (nu[1:] != nu[:-1]) | (nv[1:] != nv[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(nu)))
    return pa.table({
        "source_u": pa.array(nu[starts].tolist(), pa.string()),
        "source_v": pa.array(nv[starts].tolist(), pa.string()),
        "n_pairs": pa.array(counts.astype(np.int64), pa.int64()),
    })


_EMPTY_CONTAIN = pa.schema([
    ("doc_id_u", pa.int64()), ("doc_id_v", pa.int64()),
    ("n_inter", pa.int64()), ("n_min", pa.int64()),
])


class _VerifyContainment:
    """Distributed exact verification for the containment join: same
    one-lexsort intersection count as _VerifyPairs, but the keep
    predicate is |inter| >= tau * min(|Tu|, |Tv|) (containment of the
    smaller set in the larger) and the output carries n_min so
    consumers derive containment = n_inter / n_min with no float in
    the contract."""

    def __init__(self, map_ref, tau: float) -> None:
        self.ids, self.flat, self.offs = ray.get(map_ref)
        self.tau = tau

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_CONTAIN.empty_table()
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        hi = max(len(self.ids) - 1, 0)
        iu = np.clip(np.searchsorted(self.ids, u), 0, hi)
        iv = np.clip(np.searchsorted(self.ids, v), 0, hi)
        if not ((self.ids[iu] == u).all() and (self.ids[iv] == v).all()):
            raise AssertionError("pair endpoint missing from token-set map")
        cu = self.offs[iu + 1] - self.offs[iu]
        cv = self.offs[iv + 1] - self.offs[iv]
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        a_idx = _ranges(self.offs[iu], cu)
        b_idx = _ranges(self.offs[iv], cv)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_hash = np.concatenate([self.flat[a_idx], self.flat[b_idx]])
        order = np.lexsort((all_hash, all_pair))
        ps, hs = all_pair[order], all_hash[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        n_inter = np.bincount(ps[1:][dup], minlength=npair)
        n_min = np.minimum(cu, cv)
        keep = n_inter.astype(np.float64) >= self.tau * n_min
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "n_inter": pa.array(n_inter[keep], pa.int64()),
            "n_min": pa.array(n_min[keep], pa.int64()),
        })


def containment_token_pairs(sf_dir: str, tau: float = 0.8,
                            df_mode: str = "auto",
                            df_broadcast_max: int = 10_000_000,
                            verify_mode: str = "auto",
                            verify_broadcast_max: int = 1_000_000,
                            ) -> pa.Table:
    """All document pairs whose SMALLER token set is tau-contained in
    the larger: |Tu ∩ Tv| >= tau * min(|Tu|, |Tv|) — the asymmetric
    near-dup signal that catches a file pasted into a bigger one,
    which symmetric Jaccard misses (a 100-line file inside a
    10,000-line file has J ~ 0.01 but containment 1.0). Output
    (doc_id_u, doc_id_v, n_inter, n_min) sorted, integer-exact.

    Scale shape (prefix-probe x full-index, the containment variant of
    Bayardo'07/PPJoin): overlap >= ceil(tau * min(nu, nv)) means the
    SMALLER side's (df, tok)-rarest prefix of length n - ceil(tau*n) + 1
    must share a token with the larger side's FULL set, so candidates
    come from probe rows (prefix explode, reused from the Jaccard op)
    meeting index rows (_ExplodeAllTokens) in one token-keyed exchange;
    each unordered pair generates exactly once, from its smaller side
    (ties broken by doc_id). Hot stopword tokens have high df and
    almost never enter a prefix, so their index groups pair with ~zero
    probes — the skew guard is the prefix itself. Verification is the
    same mode-gated tail as token_jaccard_pairs (_pair_verify_tail:
    broadcast under verify_broadcast_max endpoints, distributed join
    fallback above it)."""
    from nise_ray.ops.groupapply import (
        default_concurrency,
        hash_group_apply,
        segments,
    )
    from nise_ray.util import collect_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    partials = docs.map_batches(_DfPartial, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    # vocab-sized; consumed twice in join mode (gate count + join input)
    df_ds = hash_group_apply(partials, ["tok"], _df_merge_batch) \
        .materialize()
    if df_ds.count() == 0:
        return _EMPTY_CONTAIN.empty_table()
    if df_mode == "auto":
        df_mode = ("broadcast" if df_ds.count() <= df_broadcast_max
                   else "join")
    if df_mode == "broadcast":
        df_t = collect_table(df_ds)
        toks_sorted = df_t.column("tok").to_numpy(
            zero_copy_only=False).astype(U64)
        order = np.argsort(toks_sorted)
        df_ref = ray.put((toks_sorted[order],
                          df_t.column("df").to_numpy(
                              zero_copy_only=False)[order]))
        probe = docs.map_batches(
            _PrefixExplodeBroadcast, fn_constructor_args=(df_ref, tau),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency())
    elif df_mode == "join":
        # 100-TB path: df attaches via a distributed hash join on tok,
        # the per-doc prefix re-derives in a doc_id regroup — identical
        # machinery to token_jaccard_pairs df_mode='join'. Both explode
        # stages run TASK-path here (plain fns, fresh hasher per task):
        # a JoinOperator's aggregator pool plus two ACTOR-pool map
        # stages in one candidate DAG deadlocks small clusters (each
        # pool reserves CPU slots concurrently — the documented
        # round-4 engine gotcha).
        from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
        full = docs.map_batches(_explode_all_tokens_task,
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        _hash_shuffle_on(full, df_ds)
        joined = full.join(df_ds, join_type="inner",
                           num_partitions=_join_partitions(),
                           on=("tok",))
        probe = hash_group_apply(joined, ["doc_id"],
                                 _prefix_regroup_batch(tau), sort=False)
    else:
        raise ValueError(f"unknown df_mode {df_mode!r}")

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "side", pa.array(np.full(b.num_rows, side, np.int8),
                                 pa.int8()))
        fn.__name__ = f"TagSide{side}"
        return fn

    if df_mode == "join":
        # keep the whole candidate DAG actor-pool-free alongside the join
        index = docs.map_batches(_explode_all_tokens_task,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    else:
        index = docs.map_batches(_ExplodeAllTokens, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 concurrency=default_concurrency())
    both = probe.map_batches(tag(1), batch_format="pyarrow",
                             zero_copy_batch=True).union(
        index.map_batches(tag(0), batch_format="pyarrow",
                          zero_copy_batch=True))

    def pair_gen(batch: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        tok = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tok").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        # per token: index rows sorted by (n_tok, doc_id); each probe
        # pairs every STRICTLY-GREATER index key, so each unordered
        # pair emits exactly once, from its smaller side
        o = np.lexsort((ids, nt, side, tok))  # probes after index rows
        tok, ids, nt, side = tok[o], ids[o], nt[o], side[o]
        starts, counts = segments(tok)
        us, vs = [], []
        for s, c in zip(starts, counts):
            g_side = side[s:s + c]
            n_idx = int((g_side == 0).sum())
            if n_idx == 0 or n_idx == c:
                continue
            gi_n = nt[s:s + n_idx]
            gi_id = ids[s:s + n_idx]
            gp_n = nt[s + n_idx:s + c]
            gp_id = ids[s + n_idx:s + c]
            # first index row with key strictly greater than the probe's;
            # (n_tok, doc_id) packs into one int64 — guarded, a 2^32+
            # doc-id space would need a two-level searchsorted instead
            if gi_id.max() >= (1 << 32) or gp_id.max() >= (1 << 32):
                raise AssertionError("containment pair_gen: doc_id >= "
                                     "2^32, widen the composite key")
            lo = np.searchsorted(gi_n * (1 << 32) + gi_id,
                                 gp_n * (1 << 32) + gp_id, side="right")
            cnt = n_idx - lo
            if not (cnt > 0).any():
                continue
            sel = _ranges(lo, cnt)
            us.append(np.repeat(gp_id, np.maximum(cnt, 0)))
            vs.append(gi_id[sel])
        if not us:
            return empty
        u = np.concatenate(us)
        v = np.concatenate(vs)
        lo_id = np.minimum(u, v)
        hi_id = np.maximum(u, v)
        return pa.table({"u": pa.array(lo_id, pa.int64()),
                         "v": pa.array(hi_id, pa.int64())})

    cands = hash_group_apply(both, ["tok"], pair_gen, sort=False)

    pairs_ds = hash_group_apply(cands, ["u", "v"], distinct_uv_batch,
                                sort=False).materialize()

    return _pair_verify_tail(docs, pairs_ds, tau, verify_mode,
                             verify_broadcast_max, contain=True)


def _labeled_docs(sf_dir: str, tau: float, extra_cols: list[str],
                  broadcast_max: int) -> "ray.data.Dataset":
    """documents (doc_id + extra_cols) with the exact-Jaccard component
    label attached as cluster_id (min doc_id of the component;
    singletons label themselves). The label table is bounded by the
    DUP-NODE set — at a heavily-duplicated 10^12-file corpus that is
    corpus-scale, so the attach is GATED: label maps up to
    `broadcast_max` rows are ray.put once and looked up inside
    map_batches; beyond the gate a distributed left-outer hash join
    attaches them (same two paths as components.attach_labels, which
    the flagship pipeline uses)."""
    from nise_ray.config import DedupConfig
    from nise_ray.ops.components import distributed_components
    from nise_ray.ops.groupapply import default_partitions
    from nise_ray.util import collect_table

    pairs = token_jaccard_pairs(sf_dir, tau=tau)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"] + extra_cols)

    def self_label(b: pa.Table) -> pa.Table:
        return b.append_column("cluster_id", b.column("doc_id"))

    if pairs.num_rows == 0:
        return docs.map_batches(self_label, batch_format="pyarrow")

    edges = ray.data.from_arrow(pa.table({
        "u": pairs.column("doc_id_u").cast(pa.uint64()),
        "v": pairs.column("doc_id_v").cast(pa.uint64()),
    }))
    # materialize once: the count gate and the collect/join below must
    # not re-execute the CC rounds
    labels_ds = distributed_components(edges, DedupConfig()).materialize()

    if labels_ds.count() <= broadcast_max:
        labels = collect_table(labels_ds)
        lk = labels.column("doc_key").to_numpy(zero_copy_only=False)
        lv = labels.column("cluster_id").to_numpy(zero_copy_only=False)
        order = np.argsort(lk)
        lab_ref = ray.put((lk[order].astype(np.int64),
                           lv[order].astype(np.int64)))

        def attach(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(lab_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            if len(keys):
                pos = np.clip(np.searchsorted(keys, ids), 0,
                              len(keys) - 1)
                hit = keys[pos] == ids
                lbl = np.where(hit, vals[pos], ids)
            else:
                lbl = ids
            return b.append_column("cluster_id",
                                   pa.array(lbl, pa.int64()))

        return docs.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)

    # distributed fallback: left-outer hash join on doc_id
    def to_int_ids(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_key").cast(pa.int64()),
            "cluster_id": b.column("cluster_id").cast(pa.int64())})

    lab64 = labels_ds.map_batches(to_int_ids, batch_format="pyarrow")
    from nise_ray.ops.groupapply import join_input
    lab64 = join_input(lab64)  # sparse side: see groupapply
    joined = docs.join(lab64, join_type="left_outer", on=("doc_id",),
                       num_partitions=default_partitions(0))

    def fill(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cl = pc.coalesce(b.column("cluster_id"), b.column("doc_id"))
        return b.set_column(b.schema.get_field_index("cluster_id"),
                            "cluster_id", cl.cast(pa.int64()))

    return joined.map_batches(fill, batch_format="pyarrow")


def jaccard_components(sf_dir: str, tau: float = 0.8,
                       broadcast_max: int = 50_000_000) -> "ray.data.Dataset":
    """FULL dedup-cluster assignment over the EXACT similarity graph:
    every document labeled with the min doc_id of its connected
    component in the token-Jaccard >= tau graph (singletons label
    themselves). This composes the two halves of the dedup core —
    exact pair generation (prefix-filtered self-join, above) and the
    alternating large-star/small-star connected components
    (ops/components.distributed_components) — into ONE SQL-checkable
    query: DuckDB's recursive CTE computes the transitive closure of
    the same edge set, so the star decomposition's fixed point is
    oracle-verified end-to-end, not just parity-tested against the
    driver union-find.

    Scale: edges are output-sized (tau=0.8 keeps the graph sparse); the
    CC rounds are the bounded star exchanges; the label attach is
    broadcast-gated with a distributed left-outer join fallback
    (_labeled_docs) — both paths parity-tested."""

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "cluster_id": b.column("cluster_id")})

    return _labeled_docs(sf_dir, tau, [], broadcast_max).map_batches(
        project, batch_format="pyarrow")


def dedup_cluster_stats(sf_dir: str, tau: float = 0.8,
                        broadcast_max: int = 50_000_000) -> pa.Table:
    """Survivorship rollup over the exact-Jaccard dedup clusters: one
    row per cluster with (cluster_id, n_members, total_chars,
    saved_chars = chars removed if only the kept min-doc_id member
    survives). The input is the oracled jaccard_components assignment;
    this adds the aggregate-after-CC step every dedup report runs
    ("how much does deduplication save?"), still fully SQL-checkable
    via the same recursive CTE plus a join back to documents.

    Scale: rides the component labeling (bounded star exchanges, gated
    broadcast/join attach) plus ONE cluster-count-sized combiner
    exchange; all sums are int64."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    labeled = _labeled_docs(sf_dir, tau, ["n_chars"], broadcast_max)

    _EMPTY = pa.table({"cluster_id": pa.array([], pa.int64()),
                       "n_members": pa.array([], pa.int64()),
                       "total_chars": pa.array([], pa.int64()),
                       "kept_chars": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        lbl = b.column("cluster_id").to_numpy(zero_copy_only=False)
        order = np.argsort(lbl, kind="stable")
        starts, _ = segments(lbl[order])
        # the min member appears in exactly one batch, so summing the
        # kept_chars partials is exact
        kept = np.where(ids == lbl, nch, 0)
        return pa.table({
            "cluster_id": pa.array(lbl[order][starts], pa.int64()),
            "n_members": pa.array(
                np.add.reduceat(np.ones(len(ids), np.int64), starts),
                pa.int64()),
            "total_chars": pa.array(np.add.reduceat(nch[order], starts),
                                    pa.int64()),
            "kept_chars": pa.array(np.add.reduceat(kept[order], starts),
                                   pa.int64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64()),
                             "total_chars": pa.array([], pa.int64()),
                             "saved_chars": pa.array([], pa.int64())})
        cid = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        order = np.argsort(cid, kind="stable")
        starts, _ = segments(cid[order])
        red = lambda c: np.add.reduceat(  # noqa: E731
            batch.column(c).to_numpy(zero_copy_only=False)[order], starts)
        tot = red("total_chars")
        return pa.table({
            "cluster_id": pa.array(cid[order][starts], pa.int64()),
            "n_members": pa.array(red("n_members"), pa.int64()),
            "total_chars": pa.array(tot, pa.int64()),
            "saved_chars": pa.array(tot - red("kept_chars"), pa.int64()),
        })

    partials = labeled.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    out = collect_table(hash_group_apply(partials, ["cluster_id"], merge,
                                         sort=False))
    return out.sort_by([("cluster_id", "ascending")])


def jaccard_threshold_sweep(sf_dir: str, tau_min: float = 0.5,
                            **modes) -> pa.Table:
    """Tau-sensitivity curve for the exact token-Jaccard join: one row
    per Jaccard decile bucket >= tau_min with (bucket, n_pairs,
    total_union) — the diagnostic a dedup run reads to PICK its
    threshold (how many pairs appear/disappear as tau moves), computed
    from ONE exact join at tau_min instead of re-running the join per
    candidate tau.

    bucket k covers jw in [k/10, (k+1)/10) via pure INTEGER arithmetic
    ((10 * n_inter) // n_union — identical to DuckDB's `//`), so the
    oracle comparison has no float-boundary hazard; jw == 1.0 lands in
    bucket 10. Scale: rides the prefix-filtered join (all its gates),
    plus one 11-row aggregation."""
    pairs = token_jaccard_pairs(sf_dir, tau=tau_min, **modes)
    if pairs.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64()),
                         "total_union": pa.array([], pa.int64())})
    ni = pairs.column("n_inter").to_numpy(zero_copy_only=False)
    nu = pairs.column("n_union").to_numpy(zero_copy_only=False)
    k = (10 * ni) // nu
    order = np.argsort(k, kind="stable")
    ks = k[order]
    new = np.ones(len(ks), dtype=bool)
    new[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(ks)))
    return pa.table({
        "bucket": pa.array(ks[starts], pa.int64()),
        "n_pairs": pa.array(counts, pa.int64()),
        "total_union": pa.array(np.add.reduceat(nu[order], starts),
                                pa.int64()),
    })
