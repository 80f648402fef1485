"""All-pairs TF-IDF cosine similarity self-join over `documents` —
Bayardo / Ma / Srikant "Scaling Up All Pairs Similarity Search"
(WWW'07) with the max-weight suffix bound.

Where token_jaccard_pairs treats documents as token SETS, this operator
weighs tokens: w(d, t) = tf(d, t) * ln(N / df(t)), vectors L2-normalized,
similarity = dot product. Output pairs have cosine >= tau — the
lexical near-dup signal robust to token-frequency skew (a doc repeating
one rare identifier 50 times still matches its renamed twin).

Scale shape (three combiner passes + one candidate exchange + the
distributed verify):

  1. df pass — vocab-sized combiner exchange (shared with the Jaccard
     op's _DfPartial machinery).
  2. maxw pass — per-token MAX of the normalized weight, order-
     insensitive so per-block maxima merge exactly; broadcast with df.
  3. prefix explode — per doc, tokens sorted in the GLOBAL order
     (maxw desc, tok asc); the maximal suffix S with
     sum_{t in S} w_t * maxw_t < tau cannot on its own reach tau, so
     only the complement (the prefix) is probed. Candidates = probe
     prefix rows meeting FULL index rows in one token-keyed exchange —
     each side's own suffix bound independently guarantees every
     qualifying pair is generated (probe x full, as the containment
     join), so a one-sided doc_id rule emits each pair once.
  4. verify — needed-endpoint (token, weight) vectors broadcast once,
     per-pair dot products via one lexsort + adjacent-duplicate product
     sum per batch of pairs; no per-pair Python.

The DuckDB oracle recomputes the same weights relationally; the
output carries cosine rounded to 4 decimals (sum order across engines
differs in the last ulp; a 1e-4 grid makes that invisible except on
measure-zero boundaries)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.hashing import U64
from nise_ray.ops.normalize import TokenHasher, batch_token_hashes
from nise_ray.ops.simjoin import _DfPartial, _df_merge_batch, _ranges

_EMPTY_COS = pa.schema([
    ("doc_id_u", pa.int64()), ("doc_id_v", pa.int64()),
    ("cosine", pa.float64()),
])


def _row_token_tf(col, hasher: TokenHasher):
    """text column -> per-row (unique token hashes, tf counts, offsets):
    one batched tokenize, one lexsort, run-length counts."""
    flat_h, offs, _ = batch_token_hashes(col, hasher, normalize=False)
    n = len(offs) - 1
    cnt = np.diff(offs)
    row = np.repeat(np.arange(n, dtype=np.int64), cnt)
    if len(flat_h) == 0:
        z = np.zeros(n + 1, dtype=np.int64)
        return (np.empty(0, dtype=U64), np.empty(0, dtype=np.int64), z)
    order = np.lexsort((flat_h, row))
    f, r = flat_h[order], row[order]
    new = np.ones(len(f), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(f)))
    uf, ur = f[starts], r[starts]
    ucnt = np.bincount(ur, minlength=n).astype(np.int64)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ucnt, out=uoffs[1:])
    return uf, tf, uoffs


def _doc_weights(uf: np.ndarray, tf: np.ndarray, uoffs: np.ndarray,
                 toks: np.ndarray, idf: np.ndarray):
    """(weights, inverse norms per row) for per-row unique tokens; the
    norm sums each row's w^2 in token-hash-sorted order (deterministic
    across every call site, so verify recomputes bit-identical norms)."""
    n = len(uoffs) - 1
    pos = np.searchsorted(toks, uf)
    w = tf.astype(np.float64) * idf[pos]
    sq = np.zeros(n, dtype=np.float64)
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(uoffs))
    starts = uoffs[:-1][np.diff(uoffs) > 0]
    if len(w):
        sums = np.add.reduceat(w * w, starts)
        sq[np.unique(row)] = sums
    with np.errstate(divide="ignore"):
        inv = np.where(sq > 0, 1.0 / np.sqrt(sq), 0.0)
    return w, inv, row


def _explode_tf_task(b: pa.Table) -> pa.Table:
    """Task-path explode: (doc_id, text) -> (tok, doc_id, tf) — plain fn
    because join mode runs it alongside JoinOperator aggregator pools
    (actor pools there deadlock small clusters)."""
    hasher = TokenHasher()
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    uf, tf, uoffs = _row_token_tf(b.column("text"), hasher)
    row = np.repeat(np.arange(len(uoffs) - 1, dtype=np.int64),
                    np.diff(uoffs))
    return pa.table({"tok": pa.array(uf, pa.uint64()),
                     "doc_id": pa.array(ids[row], pa.int64()),
                     "tf": pa.array(tf, pa.int64())})


def _per_doc_norm_batch(n_docs: int):
    """Block fn for the doc_id regroup after the df join: compute
    w = tf * ln(N/df) and the per-doc L2 norm with the w^2 sum in
    token-ascending order — bit-identical to the broadcast path's
    _doc_weights. Emits the weighted postings (tok, doc_id, nw)."""
    from nise_ray.ops.groupapply import segments

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "nw": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = batch.column("tok").to_numpy(
            zero_copy_only=False).astype(U64)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, ids))
        ids, toks, tf, dfv = ids[order], toks[order], tf[order], dfv[order]
        w = tf.astype(np.float64) * np.log(
            np.float64(n_docs) / dfv.astype(np.float64))
        starts, counts = segments(ids)
        sq = np.add.reduceat(w * w, starts)
        with np.errstate(divide="ignore"):
            inv = np.where(sq > 0, 1.0 / np.sqrt(sq), 0.0)
        nw = w * np.repeat(inv, counts)
        return pa.table({"tok": pa.array(toks, pa.uint64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "nw": pa.array(nw, pa.float64())})

    return fn


def _maxw_merge(batch: pa.Table) -> pa.Table:
    """Per-token max merge (order-insensitive, exact)."""
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return batch
    t = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    m = batch.column("mw").to_numpy(zero_copy_only=False)
    starts, _ = segments(t)
    return pa.table({
        "tok": pa.array(t[starts], pa.uint64()),
        "mw": pa.array(np.maximum.reduceat(m, starts), pa.float64()),
    })


def _mw_partial_task(b: pa.Table) -> pa.Table:
    """Per-block (tok -> max nw) partial over weighted postings."""
    from nise_ray.ops.groupapply import segments
    if b.num_rows == 0:
        return pa.table({"tok": pa.array([], pa.uint64()),
                         "mw": pa.array([], pa.float64())})
    t = b.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    nw = b.column("nw").to_numpy(zero_copy_only=False)
    order = np.argsort(t, kind="stable")
    starts, _ = segments(t[order])
    return pa.table({
        "tok": pa.array(t[order][starts], pa.uint64()),
        "mw": pa.array(np.maximum.reduceat(nw[order], starts),
                       pa.float64()),
    })


def _prefix_from_joined(tau: float):
    """Block fn for the doc_id regroup after the maxw join: per-doc
    (maxw desc, tok asc) order, reverse-cumulative suffix bound, keep
    the prefix — same math as the broadcast path's PrefixExplode."""
    from nise_ray.ops.groupapply import segments

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "side": pa.array([], pa.int8())})
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = batch.column("tok").to_numpy(
            zero_copy_only=False).astype(U64)
        nw = batch.column("nw").to_numpy(zero_copy_only=False)
        mw = batch.column("mw").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -mw, ids))
        contrib = (nw * mw)[order]
        rev = np.cumsum(contrib[::-1])[::-1]
        sstarts, scounts = segments(ids[order])
        ends = np.append(sstarts[1:], len(contrib))
        tail_after = np.zeros(len(sstarts), dtype=np.float64)
        tail_after[:-1] = rev[ends[:-1]]
        rowrev = rev - np.repeat(tail_after, scounts)
        keep = rowrev >= tau - 1e-9
        sel = order[keep]
        return pa.table({
            "tok": pa.array(toks[sel], pa.uint64()),
            "doc_id": pa.array(ids[sel], pa.int64()),
            "side": pa.array(np.full(len(sel), 1, np.int8), pa.int8()),
        })

    return fn


def tfidf_cosine_pairs(sf_dir: str, tau: float = 0.6,
                       df_mode: str = "auto",
                       broadcast_max: int = 10_000_000) -> pa.Table:
    """All document pairs with L2-normalized TF-IDF cosine >= tau, as
    (doc_id_u, doc_id_v, cosine-rounded-4), sorted. See module docstring
    for the Bayardo'07 plan.

    df_mode: "broadcast" ray.puts the vocab-sized (idf, maxw) maps;
    "join" is the 100-TB path — weighted postings (tok, doc_id, nw)
    build through a distributed df join + doc_id regroup, materialize
    ONCE (at corpus scale this is the parquet-checkpoint candidate,
    same pattern as the signed table), and feed the maxw combiner, the
    maxw join + prefix regroup, the full index side, and the
    verification vector gather — all without any vocab-sized driver or
    worker state. Both modes are parity-tested to the same pairs."""
    from nise_ray.ops.groupapply import (
        default_concurrency,
        hash_group_apply,
        segments,
    )
    from nise_ray.util import collect_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    n_docs = docs.count()
    if n_docs == 0:
        return _EMPTY_COS.empty_table()

    # ---- pass 1: document frequency ------------------------------------
    partials = docs.map_batches(_DfPartial, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    # vocab-sized; consumed twice in join mode (gate count + join input)
    df_ds = hash_group_apply(partials, ["tok"], _df_merge_batch) \
        .materialize()
    if df_ds.count() == 0:
        return _EMPTY_COS.empty_table()
    if df_mode == "auto":
        df_mode = ("broadcast" if df_ds.count() <= broadcast_max
                   else "join")
    if df_mode == "join":
        return _tfidf_cosine_join_mode(docs, df_ds, n_docs, tau)
    if df_mode != "broadcast":
        raise ValueError(f"unknown df_mode {df_mode!r}")
    df_t = collect_table(df_ds)
    toks = df_t.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    dfv = df_t.column("df").to_numpy(zero_copy_only=False)
    o = np.argsort(toks)
    toks, dfv = toks[o], dfv[o]
    # DuckDB's integer '/' is double division; np.float64(n)/df matches
    idf = np.log(np.float64(n_docs) / dfv.astype(np.float64))
    idf_ref = ray.put((toks, idf))

    # ---- pass 2: per-token max normalized weight (order-insensitive) ---
    class MaxWPartial:
        def __init__(self) -> None:
            self.toks, self.idf = ray.get(idf_ref)
            self.hasher = TokenHasher()

        def __call__(self, b: pa.Table) -> pa.Table:
            uf, tf, uoffs = _row_token_tf(b.column("text"), self.hasher)
            if len(uf) == 0:
                return pa.table({"tok": pa.array([], pa.uint64()),
                                 "mw": pa.array([], pa.float64())})
            w, inv, row = _doc_weights(uf, tf, uoffs, self.toks, self.idf)
            nw = w * inv[row]
            order = np.argsort(uf, kind="stable")
            starts, _ = segments(uf[order])
            return pa.table({
                "tok": pa.array(uf[order][starts], pa.uint64()),
                "mw": pa.array(np.maximum.reduceat(nw[order], starts),
                               pa.float64()),
            })

    mw_parts = docs.map_batches(MaxWPartial, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    mw_t = collect_table(hash_group_apply(mw_parts, ["tok"], _maxw_merge))
    mt = mw_t.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    mv = mw_t.column("mw").to_numpy(zero_copy_only=False)
    o = np.argsort(mt)
    maxw_ref = ray.put((mt[o], mv[o]))

    # ---- pass 3: prefix explode (probe) + full explode (index) ---------
    class PrefixExplode:
        """Emit each doc's prefix under the max-weight suffix bound:
        tokens in (maxw desc, tok asc) global order; the maximal suffix
        whose sum(w_norm * maxw) < tau (with an ulp slack) is skipped."""

        def __init__(self, side: int) -> None:
            self.toks, self.idf = ray.get(idf_ref)
            self.mt, self.mv = ray.get(maxw_ref)
            self.hasher = TokenHasher()
            self.side = side

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            uf, tf, uoffs = _row_token_tf(b.column("text"), self.hasher)
            empty = pa.table({"tok": pa.array([], pa.uint64()),
                              "doc_id": pa.array([], pa.int64()),
                              "side": pa.array([], pa.int8())})
            if len(uf) == 0:
                return empty
            if self.side == 0:
                # the full index side needs only (tok, doc_id) — skip
                # the weight/norm computation entirely
                row = np.repeat(np.arange(len(uoffs) - 1, dtype=np.int64),
                                np.diff(uoffs))
                keep = np.ones(len(uf), dtype=bool)
            else:
                w, inv, row = _doc_weights(uf, tf, uoffs, self.toks,
                                           self.idf)
                nw = w * inv[row]
                mpos = np.searchsorted(self.mt, uf)
                mw = self.mv[mpos]
                # per-row (maxw desc, tok asc) order in one lexsort
                order = np.lexsort((uf, -mw, row))
                contrib = (nw * mw)[order]
                # per-row reverse cumulative sum: global reverse cumsum
                # minus the tail that belongs to LATER rows
                rev = np.cumsum(contrib[::-1])[::-1]
                sstarts, scounts = segments(row[order])
                ends = np.append(sstarts[1:], len(contrib))
                tail_after = np.zeros(len(sstarts), dtype=np.float64)
                tail_after[:-1] = rev[ends[:-1]]
                rowrev = rev - np.repeat(tail_after, scounts)
                # token j stays in the prefix if its own suffix can
                # still reach tau (1e-9 slack keeps the guarantee under
                # float summation error — a superset of candidates is
                # always safe)
                keep_sorted = rowrev >= tau - 1e-9
                keep = np.zeros(len(uf), dtype=bool)
                keep[order[keep_sorted]] = True
            return pa.table({
                "tok": pa.array(uf[keep], pa.uint64()),
                "doc_id": pa.array(ids[row[keep]], pa.int64()),
                "side": pa.array(np.full(int(keep.sum()), self.side,
                                         np.int8), pa.int8()),
            })

    probe = docs.map_batches(PrefixExplode, fn_constructor_args=(1,),
                             batch_format="pyarrow", zero_copy_batch=True,
                             concurrency=default_concurrency())
    index = docs.map_batches(PrefixExplode, fn_constructor_args=(0,),
                             batch_format="pyarrow", zero_copy_batch=True,
                             concurrency=default_concurrency())
    both = probe.union(index)

    def build_map(needed_ref):
        class GatherVectors:
            def __init__(self) -> None:
                self.needed = ray.get(needed_ref)
                self.toks, self.idf = ray.get(idf_ref)
                self.hasher = TokenHasher()

            def __call__(self, b: pa.Table) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(self.needed, ids), 0,
                              len(self.needed) - 1)
                rows = np.flatnonzero(self.needed[pos] == ids)
                empty = pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "toks": pa.array([], pa.large_list(pa.uint64())),
                    "ws": pa.array([], pa.large_list(pa.float64()))})
                if len(rows) == 0:
                    return empty
                sel = b.take(pa.array(rows))
                uf, tf, uoffs = _row_token_tf(sel.column("text"),
                                              self.hasher)
                w, inv, row = _doc_weights(uf, tf, uoffs, self.toks,
                                           self.idf)
                nw = w * inv[row]
                return pa.table({
                    "doc_id": sel.column("doc_id"),
                    "toks": pa.LargeListArray.from_arrays(
                        pa.array(uoffs, pa.int64()),
                        pa.array(uf, pa.uint64())),
                    "ws": pa.LargeListArray.from_arrays(
                        pa.array(uoffs, pa.int64()),
                        pa.array(nw, pa.float64())),
                })

        got = collect_table(docs.map_batches(
            GatherVectors, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency()))
        gids = got.column("doc_id").to_numpy(zero_copy_only=False)
        tlists = got.column("toks").combine_chunks()
        wlists = got.column("ws").combine_chunks()
        g_flat = tlists.flatten().to_numpy(
            zero_copy_only=False).astype(U64)
        w_flat = wlists.flatten().to_numpy(zero_copy_only=False)
        g_offs = np.asarray(tlists.offsets, dtype=np.int64) \
            - tlists.offset
        return _pack_vector_map(gids, g_flat, w_flat, g_offs)

    return _candidates_and_verify(both, tau, build_map)


def _pack_vector_map(gids, g_flat, w_flat, g_offs):
    """Repack per-doc (token, weight) lists sorted by doc_id into the
    broadcast (ids, flat_toks, flat_ws, offsets) tuple the verifier
    searchsorts."""
    order = np.argsort(gids)
    cnts = np.diff(g_offs)[order]
    sel = _ranges(g_offs[:-1][order], cnts)
    offs_sorted = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(cnts, out=offs_sorted[1:])
    return ray.put((gids[order], g_flat[sel], w_flat[sel], offs_sorted))


def _cosine_pair_gen(batch: pa.Table) -> pa.Table:
    from nise_ray.ops.groupapply import segments
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    tok = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    side = batch.column("side").to_numpy(zero_copy_only=False)
    o = np.lexsort((ids, side, tok))
    tok, ids, side = tok[o], ids[o], side[o]
    starts, counts = segments(tok)
    us, vs = [], []
    for s, c in zip(starts, counts):
        g_side = side[s:s + c]
        n_idx = int((g_side == 0).sum())
        if n_idx == 0 or n_idx == c:
            continue
        gi_id = ids[s:s + n_idx]
        gp_id = ids[s + n_idx:s + c]
        # probe u pairs every index doc with GREATER id: each
        # unordered pair emits once, and either side's suffix bound
        # guarantees it (probe prefix x full index)
        lo = np.searchsorted(gi_id, gp_id, side="right")
        cnt = n_idx - lo
        if not (cnt > 0).any():
            continue
        sel = _ranges(lo, cnt)
        us.append(np.repeat(gp_id, cnt))
        vs.append(gi_id[sel])
    if not us:
        return empty
    return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                     "v": pa.array(np.concatenate(vs), pa.int64())})


def _distinct_uv(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    first = np.ones(len(order), dtype=bool)
    first[1:] = (u[order][1:] != u[order][:-1]) | \
                (v[order][1:] != v[order][:-1])
    return batch.take(pa.array(order[first]))


class _VerifyCosine:
    """Per-batch pair dot products: one lexsort + adjacent-duplicate
    product bincount — no per-pair Python."""

    def __init__(self, map_ref, tau: float) -> None:
        (self.ids, self.flat, self.w, self.offs) = ray.get(map_ref)
        self.tau = tau

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_COS.empty_table()
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        hi = max(len(self.ids) - 1, 0)
        iu = np.clip(np.searchsorted(self.ids, u), 0, hi)
        iv = np.clip(np.searchsorted(self.ids, v), 0, hi)
        if not ((self.ids[iu] == u).all() and (self.ids[iv] == v).all()):
            raise AssertionError("pair endpoint missing from vector map")
        cu = self.offs[iu + 1] - self.offs[iu]
        cv = self.offs[iv + 1] - self.offs[iv]
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        a_idx = _ranges(self.offs[iu], cu)
        b_idx = _ranges(self.offs[iv], cv)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_hash = np.concatenate([self.flat[a_idx], self.flat[b_idx]])
        all_w = np.concatenate([self.w[a_idx], self.w[b_idx]])
        order = np.lexsort((all_hash, all_pair))
        ps, hs, ws = all_pair[order], all_hash[order], all_w[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        prod = (ws[1:] * ws[:-1])[dup]
        cos = np.bincount(ps[1:][dup], weights=prod, minlength=npair)
        keep = cos >= self.tau
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "cosine": pa.array(np.round(cos[keep], 4), pa.float64()),
        })


def _candidates_and_verify(both, tau: float, build_map) -> pa.Table:
    """Shared tail of both df modes: tok-keyed candidate exchange,
    (u, v) distinct, endpoint gather, verification. `build_map` takes
    the needed-doc ref and returns the packed vector-map ref."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply
    from nise_ray.util import collect_table

    cands = hash_group_apply(both, ["tok"], _cosine_pair_gen, sort=False)
    pairs_ds = hash_group_apply(cands, ["u", "v"], _distinct_uv,
                                sort=False).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        e = np.unique(np.concatenate([
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False)]))
        return pa.table({"doc_id": pa.array(e, pa.int64())})

    ep = collect_table(pairs_ds.map_batches(endpoints,
                                            batch_format="pyarrow"))
    if ep.num_rows == 0:
        return _EMPTY_COS.empty_table()
    needed = np.unique(ep.column("doc_id").to_numpy(zero_copy_only=False))
    map_ref = build_map(ray.put(needed))
    verified = pairs_ds.map_batches(
        _VerifyCosine, fn_constructor_args=(map_ref, tau),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency())
    out = collect_table(verified)
    if out.num_rows == 0:
        return _EMPTY_COS.empty_table()
    return out.sort_by([("doc_id_u", "ascending"),
                        ("doc_id_v", "ascending")])


def _tfidf_cosine_join_mode(docs, df_ds, n_docs: int, tau: float
                            ) -> pa.Table:
    """The no-vocab-broadcast path: weighted postings build through a
    distributed df join + doc_id regroup and materialize ONCE (the
    parquet-checkpoint candidate at corpus scale, same pattern as the
    signed table); they feed the maxw combiner, the maxw join + prefix
    regroup, the full index side, and the verification vector gather.
    Every map stage in the join DAGs is TASK-path (plain fns) — actor
    pools alongside JoinOperator aggregator pools deadlock small
    clusters (documented engine gotcha)."""
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
    from nise_ray.util import collect_table

    full = docs.map_batches(_explode_tf_task, batch_format="pyarrow",
                            zero_copy_batch=True)
    _hash_shuffle_on(full, df_ds)
    j1 = full.join(df_ds, join_type="inner",
                   num_partitions=_join_partitions(), on=("tok",))
    w_ds = hash_group_apply(j1, ["doc_id"], _per_doc_norm_batch(n_docs),
                            sort=False).materialize()

    mw_parts = w_ds.map_batches(_mw_partial_task, batch_format="pyarrow",
                                zero_copy_batch=True)
    mw_ds = hash_group_apply(mw_parts, ["tok"], _maxw_merge).materialize()

    _hash_shuffle_on(w_ds, mw_ds)
    j2 = w_ds.join(mw_ds, join_type="inner",
                   num_partitions=_join_partitions(), on=("tok",))
    probe = hash_group_apply(j2, ["doc_id"], _prefix_from_joined(tau),
                             sort=False)

    def index_project(b: pa.Table) -> pa.Table:
        return pa.table({
            "tok": b.column("tok"),
            "doc_id": b.column("doc_id"),
            "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
        })

    index_project.__name__ = "IndexSideProject"
    both = probe.union(w_ds.map_batches(index_project,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))

    def build_map(needed_ref):
        def filter_needed(b: pa.Table) -> pa.Table:
            needed = ray.get(needed_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(needed, ids), 0,
                          max(len(needed) - 1, 0))
            hit = needed[pos] == ids if len(needed) else \
                np.zeros(len(ids), dtype=bool)
            return b.filter(pa.array(hit))

        filter_needed.__name__ = "FilterNeededPostings"
        got = collect_table(w_ds.map_batches(filter_needed,
                                             batch_format="pyarrow",
                                             zero_copy_batch=True))
        ids = got.column("doc_id").to_numpy(zero_copy_only=False)
        toks = got.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        nw = got.column("nw").to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, ids))
        sids, stoks, snw = ids[order], toks[order], nw[order]
        new = np.ones(len(sids), dtype=bool)
        new[1:] = sids[1:] != sids[:-1]
        starts = np.flatnonzero(new)
        gids = sids[starts]
        offs = np.append(starts, len(sids)).astype(np.int64)
        return ray.put((gids, stoks, snw, offs))

    return _candidates_and_verify(both, tau, build_map)
