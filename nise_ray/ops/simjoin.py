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
     instances); the (tok -> df) map is broadcast via ray.put (vocab-sized;
     at 100 TB replace with a distributed join on tok, same shape as
     join_verify).
  2. prefix explode: each doc emits only its p = n - ceil(tau*n) + 1
     RAREST tokens (global order = (df, tok) asc). The prefix-filter
     theorem guarantees any pair with J >= tau shares a prefix token, so
     the candidate exchange moves O((1-tau) * corpus tokens) rows instead
     of all of them — and hot tokens (stopwords, boilerplate) have high
     df, so they almost never enter a prefix: the skew that melts a naive
     token-inverted-index join is filtered out by construction.
  3. candidate pairs per token group with the size filter
     (min(nu,nv) >= tau * max(nu,nv)), then one (u, v) distinct exchange.
  4. verify: exact intersection against a broadcast needed-docs token-set
     map (gathered with the NeededFilter pattern — driver memory scales
     with the PAIR set, not the corpus).

Output is integer-exact: (doc_id_u, doc_id_v, n_inter, n_union) — no
float in the contract, so the DuckDB hash comparison has no rounding
hazard; consumers derive jaccard = n_inter / n_union.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.hashing import U64, blake2b64
from nise_ray.ops.normalize import _TOKEN

_EMPTY_PAIRS = pa.schema([
    ("doc_id_u", pa.int64()), ("doc_id_v", pa.int64()),
    ("n_inter", pa.int64()), ("n_union", pa.int64()),
])


def _distinct_token_hashes(text: str) -> np.ndarray:
    toks = set(_TOKEN.findall(text))
    if not toks:
        return np.empty(0, dtype=U64)
    return np.unique(np.fromiter((blake2b64(t.encode()) for t in toks),
                                 dtype=U64, count=len(toks)))


def _df_partial_batch(b: pa.Table) -> pa.Table:
    """Per-batch combiner: (tok, partial document frequency)."""
    toks: list[np.ndarray] = [
        _distinct_token_hashes(t) for t in b.column("text").to_pylist()]
    allt = (np.concatenate(toks) if toks else np.empty(0, dtype=U64))
    if len(allt) == 0:
        return pa.table({"tok": pa.array([], pa.uint64()),
                         "df": pa.array([], pa.int64())})
    uniq, counts = np.unique(allt, return_counts=True)
    return pa.table({"tok": pa.array(uniq, pa.uint64()),
                     "df": pa.array(counts, pa.int64())})


def _df_merge_batch(batch: pa.Table) -> pa.Table:
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return batch
    tok = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    df = batch.column("df").to_numpy(zero_copy_only=False)
    starts, _ = segments(tok)
    return pa.table({
        "tok": pa.array(tok[starts], pa.uint64()),
        "df": pa.array(np.add.reduceat(df, starts), pa.int64()),
    })


def token_jaccard_pairs(sf_dir: str, tau: float = 0.5) -> pa.Table:
    """All document pairs with exact token-set Jaccard >= tau, as
    (doc_id_u, doc_id_v, n_inter, n_union), sorted by (u, v).
    See module docstring for the prefix-filtered plan."""
    from nise_ray.ops.groupapply import (
        default_concurrency,
        hash_group_apply,
        segments,
    )
    from nise_ray.util import collect_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    # ---- pass 1: global document frequency per token (vocab-sized) ------
    partials = docs.map_batches(_df_partial_batch, batch_format="pyarrow",
                                zero_copy_batch=True)
    df_t = collect_table(hash_group_apply(partials, ["tok"], _df_merge_batch))
    toks_sorted = df_t.column("tok").to_numpy(zero_copy_only=False).astype(U64)
    order = np.argsort(toks_sorted)
    toks_sorted = toks_sorted[order]
    dfs_sorted = df_t.column("df").to_numpy(zero_copy_only=False)[order]
    df_ref = ray.put((toks_sorted, dfs_sorted))

    # ---- pass 2: prefix explode ----------------------------------------
    class PrefixExplode:
        def __init__(self) -> None:
            self.toks, self.dfs = ray.get(df_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            out_tok: list[np.ndarray] = []
            out_doc: list[int] = []
            out_n: list[int] = []
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            for i, text in enumerate(b.column("text").to_pylist()):
                th = _distinct_token_hashes(text)
                n = len(th)
                if n == 0:
                    continue
                pos = np.searchsorted(self.toks, th)
                dfv = self.dfs[pos]  # every token exists in the global map
                # global canonical order: (df asc, tok asc); prefix length
                # p = n - ceil(tau*n) + 1 (Bayardo'07 Jaccard prefix)
                p = n - int(np.ceil(np.round(tau * n, 9))) + 1
                sel = np.lexsort((th, dfv))[:p]
                out_tok.append(th[sel])
                out_doc.append(int(ids[i]))
                out_n.append(n)
            if not out_tok:
                return pa.table({"tok": pa.array([], pa.uint64()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "n_tok": pa.array([], pa.int64())})
            lens = [len(x) for x in out_tok]
            return pa.table({
                "tok": pa.array(np.concatenate(out_tok), pa.uint64()),
                "doc_id": pa.array(np.repeat(out_doc, lens), pa.int64()),
                "n_tok": pa.array(np.repeat(out_n, lens), pa.int64()),
            })

    prefix = docs.map_batches(PrefixExplode, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=default_concurrency())

    # ---- pass 3: candidate pairs per token group + (u,v) distinct -------
    def pair_gen(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "nu": pa.array([], pa.int64()),
                             "nv": pa.array([], pa.int64())})
        tok = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tok").to_numpy(zero_copy_only=False)
        starts, counts = segments(tok)
        us, vs, nus, nvs = [], [], [], []
        for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
            gid = ids[s:s + c]
            gnt = nt[s:s + c]
            o = np.argsort(gid)
            gid, gnt = gid[o], gnt[o]
            ii, jj = np.triu_indices(len(gid), k=1)
            # size filter: J >= tau requires min(nu,nv) >= tau*max(nu,nv)
            lo = np.minimum(gnt[ii], gnt[jj])
            hi = np.maximum(gnt[ii], gnt[jj])
            keep = lo.astype(np.float64) >= tau * hi
            if keep.any():
                us.append(gid[ii[keep]]); vs.append(gid[jj[keep]])
                nus.append(gnt[ii[keep]]); nvs.append(gnt[jj[keep]])
        if not us:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "nu": pa.array([], pa.int64()),
                             "nv": pa.array([], pa.int64())})
        return pa.table({
            "u": pa.array(np.concatenate(us), pa.int64()),
            "v": pa.array(np.concatenate(vs), pa.int64()),
            "nu": pa.array(np.concatenate(nus), pa.int64()),
            "nv": pa.array(np.concatenate(nvs), pa.int64()),
        })

    cands = hash_group_apply(prefix, ["tok"], pair_gen)

    def distinct_uv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        first = np.ones(len(order), dtype=bool)
        first[1:] = (u[order][1:] != u[order][:-1]) | (v[order][1:] != v[order][:-1])
        return batch.take(pa.array(order[first]))

    pairs = collect_table(hash_group_apply(cands, ["u", "v"], distinct_uv,
                                           sort=False))
    if pairs.num_rows == 0:
        return _EMPTY_PAIRS.empty_table()

    # ---- pass 4: exact verification against needed docs' token sets -----
    pu = pairs.column("u").to_numpy(zero_copy_only=False)
    pv = pairs.column("v").to_numpy(zero_copy_only=False)
    needed = np.unique(np.concatenate([pu, pv]))
    needed_ref = ray.put(needed)

    class GatherTokenSets:
        def __init__(self) -> None:
            self.needed = ray.get(needed_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.needed, ids), 0,
                          len(self.needed) - 1)
            rows = np.flatnonzero(self.needed[pos] == ids)
            if len(rows) == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "toks": pa.array([], pa.list_(pa.uint64()))})
            sel = b.take(pa.array(rows))
            return pa.table({
                "doc_id": sel.column("doc_id"),
                "toks": pa.array(
                    [_distinct_token_hashes(t)
                     for t in sel.column("text").to_pylist()],
                    pa.list_(pa.uint64())),
            })

    got = collect_table(docs.map_batches(
        GatherTokenSets, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    by_id: dict[int, np.ndarray] = {}
    ids = got.column("doc_id").to_numpy(zero_copy_only=False)
    toks_col = got.column("toks")
    for i in range(got.num_rows):
        by_id[int(ids[i])] = np.asarray(toks_col[i].as_py(), dtype=U64)

    n_inter = np.empty(pairs.num_rows, dtype=np.int64)
    n_union = np.empty(pairs.num_rows, dtype=np.int64)
    for i, (a, b_) in enumerate(zip(pu, pv)):
        ta, tb = by_id[int(a)], by_id[int(b_)]
        inter = len(np.intersect1d(ta, tb, assume_unique=True))
        n_inter[i] = inter
        n_union[i] = len(ta) + len(tb) - inter
    keep = n_inter.astype(np.float64) >= tau * n_union
    out = pa.table({
        "doc_id_u": pa.array(pu[keep], pa.int64()),
        "doc_id_v": pa.array(pv[keep], pa.int64()),
        "n_inter": pa.array(n_inter[keep], pa.int64()),
        "n_union": pa.array(n_union[keep], pa.int64()),
    })
    return out.sort_by([("doc_id_u", "ascending"), ("doc_id_v", "ascending")])


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

        j = j.map_batches(_proj1, batch_format="pyarrow")
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
