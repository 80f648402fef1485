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


def tfidf_cosine_pairs(sf_dir: str, tau: float = 0.6,
                       broadcast_max: int = 10_000_000) -> pa.Table:
    """All document pairs with L2-normalized TF-IDF cosine >= tau, as
    (doc_id_u, doc_id_v, cosine-rounded-4), sorted. See module docstring
    for the Bayardo'07 plan."""
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
    df_t = collect_table(hash_group_apply(partials, ["tok"],
                                          _df_merge_batch))
    if df_t.num_rows == 0:
        return _EMPTY_COS.empty_table()
    if df_t.num_rows > broadcast_max:
        raise NotImplementedError(
            "tfidf_cosine_pairs: vocab above the broadcast gate — attach "
            "df/idf via the distributed tok join (token_jaccard_pairs "
            "df_mode='join' shape)")
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

    def maxw_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        m = batch.column("mw").to_numpy(zero_copy_only=False)
        starts, _ = segments(t)
        return pa.table({
            "tok": pa.array(t[starts], pa.uint64()),
            "mw": pa.array(np.maximum.reduceat(m, starts), pa.float64()),
        })

    mw_parts = docs.map_batches(MaxWPartial, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    mw_t = collect_table(hash_group_apply(mw_parts, ["tok"], maxw_merge))
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
            w, inv, row = _doc_weights(uf, tf, uoffs, self.toks, self.idf)
            nw = w * inv[row]
            if self.side == 0:
                keep = np.ones(len(uf), dtype=bool)
            else:
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

    def pair_gen(batch: pa.Table) -> pa.Table:
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

    cands = hash_group_apply(both, ["tok"], pair_gen, sort=False)

    def distinct_uv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        first = np.ones(len(order), dtype=bool)
        first[1:] = (u[order][1:] != u[order][:-1]) | \
                    (v[order][1:] != v[order][:-1])
        return batch.take(pa.array(order[first]))

    pairs_ds = hash_group_apply(cands, ["u", "v"], distinct_uv,
                                sort=False).materialize()

    # ---- pass 4: distributed verification ------------------------------
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
    needed_ref = ray.put(needed)

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
            uf, tf, uoffs = _row_token_tf(sel.column("text"), self.hasher)
            w, inv, row = _doc_weights(uf, tf, uoffs, self.toks, self.idf)
            nw = w * inv[row]
            return pa.table({
                "doc_id": sel.column("doc_id"),
                "toks": pa.LargeListArray.from_arrays(
                    pa.array(uoffs, pa.int64()), pa.array(uf, pa.uint64())),
                "ws": pa.LargeListArray.from_arrays(
                    pa.array(uoffs, pa.int64()), pa.array(nw, pa.float64())),
            })

    got = collect_table(docs.map_batches(
        GatherVectors, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    gids = got.column("doc_id").to_numpy(zero_copy_only=False)
    tlists = got.column("toks").combine_chunks()
    wlists = got.column("ws").combine_chunks()
    g_flat = tlists.flatten().to_numpy(zero_copy_only=False).astype(U64)
    w_flat = wlists.flatten().to_numpy(zero_copy_only=False)
    g_offs = np.asarray(tlists.offsets, dtype=np.int64) - tlists.offset
    order = np.argsort(gids)
    cnts = np.diff(g_offs)[order]
    sel = _ranges(g_offs[:-1][order], cnts)
    flat_sorted = g_flat[sel]
    w_sorted = w_flat[sel]
    offs_sorted = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(cnts, out=offs_sorted[1:])
    map_ref = ray.put((gids[order], flat_sorted, w_sorted, offs_sorted))

    class VerifyCosine:
        def __init__(self) -> None:
            (self.ids, self.flat, self.w, self.offs) = ray.get(map_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _EMPTY_COS.empty_table()
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            hi = max(len(self.ids) - 1, 0)
            iu = np.clip(np.searchsorted(self.ids, u), 0, hi)
            iv = np.clip(np.searchsorted(self.ids, v), 0, hi)
            if not ((self.ids[iu] == u).all()
                    and (self.ids[iv] == v).all()):
                raise AssertionError("pair endpoint missing from vector "
                                     "map")
            cu = self.offs[iu + 1] - self.offs[iu]
            cv = self.offs[iv + 1] - self.offs[iv]
            npair = len(u)
            pair_idx = np.arange(npair, dtype=np.int64)
            a_idx = _ranges(self.offs[iu], cu)
            b_idx = _ranges(self.offs[iv], cv)
            all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                       np.repeat(pair_idx, cv)])
            all_hash = np.concatenate([self.flat[a_idx],
                                       self.flat[b_idx]])
            all_w = np.concatenate([self.w[a_idx], self.w[b_idx]])
            order = np.lexsort((all_hash, all_pair))
            ps, hs, ws = all_pair[order], all_hash[order], all_w[order]
            dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
            prod = (ws[1:] * ws[:-1])[dup]
            cos = np.bincount(ps[1:][dup], weights=prod,
                              minlength=npair)
            keep = cos >= tau
            return pa.table({
                "doc_id_u": pa.array(u[keep], pa.int64()),
                "doc_id_v": pa.array(v[keep], pa.int64()),
                "cosine": pa.array(np.round(cos[keep], 4), pa.float64()),
            })

    verified = pairs_ds.map_batches(
        VerifyCosine, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency())
    out = collect_table(verified)
    if out.num_rows == 0:
        return _EMPTY_COS.empty_table()
    return out.sort_by([("doc_id_u", "ascending"),
                        ("doc_id_v", "ascending")])
