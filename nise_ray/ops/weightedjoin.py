"""WEIGHTED (TF-multiset) similarity self-join family over `documents`.

The unweighted token-Jaccard join (ops/simjoin.py) treats a token that
appears 40 times the same as one that appears once — wrong for code
corpora, where boilerplate files differ exactly in how often the same
identifiers repeat. Weighted Jaccard over term frequencies,

    J_w(a, b) = Σ_t min(tf_a(t), tf_b(t)) / Σ_t max(tf_a(t), tf_b(t))
              = m / (S_a + S_b - m),   m = Σ min,  S = Σ tf  (doc length),

is the standard fix (and what weighted-MinHash sketches estimate).

Three operators:

- ``weighted_jaccard_pairs``: EXACT, fully oracled. The prefix-filter
  theorem generalizes: J_w >= tau implies m >= tau*S_a (proof:
  m(1+tau) >= tau(S_a+S_b) >= tau(S_a+m) since S_b >= m), so if two
  docs share no token in a's WEIGHT-prefix — the shortest rarest-first
  token run whose cumulative weight reaches S_a - ceil(tau*S_a) + 1,
  leaving suffix weight < tau*S_a — the pair cannot qualify. Plan
  mirrors simjoin: one vocab-sized df exchange (broadcast/join/auto
  mode-gated), weight-prefix explode, per-token candidate buckets with
  the size filter min(S) >= tau*max(S), (u,v) distinct, distributed
  exact multiset verify. Output (doc_id_u, doc_id_v, w_inter, w_union,
  jw) — the int columns are exact and jw is ONE double division of
  exact ints, so the DuckDB oracle hashes bit-exact.

- ``weighted_minhash_pairs``: the probabilistic 100-TB path — Ioffe's
  Consistent Weighted Sampling (ICDM 2010): per hash k each token
  draws (r, c, beta) from splitmix64-derived uniforms, the doc samples
  argmin_t c/(y*e^r) with y = e^(r*(floor(ln w/r + beta) - beta)), and
  Pr[sample_a == sample_b] = J_w exactly. Signatures band into LSH
  buckets exactly like the MinHash path; candidates are verified with
  the SAME exact multiset verifier, so output pairs are never false
  positives — recall is the only probabilistic quantity.

- ``weighted_recall_report``: measured recall of the CWS-LSH path
  against the exact join — the same falsification surface as
  ann_recall_report / dedup_recall_report.

Scale contracts: df pass is combiner-shaped (vocab-sized exchange, no
token instances); the prefix explode moves O((1-tau) * corpus weight)
rows; hot boilerplate tokens have high df and rarely enter a prefix, so
the inverted-index skew is filtered by construction; the verify state
is bounded by the PAIR set, not the corpus. CWS signing is one actor
pool doing K vectorized passes per batch — no exchange until the band
explode, which is the one keyed shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.hashing import U64, band_keys, splitmix64
from nise_ray.ops.normalize import TokenHasher, batch_token_hashes
from nise_ray.ops.simjoin import (
    _DfPartial,
    _bin_flat_offs,
    _df_merge_batch,
    _distinct_doc_batch,
    _endpoints_batch,
    _flat_to_bin,
    _list_flat_offs,
    _ranges,
)

def _segment_sum_int64(keys: np.ndarray, vals: np.ndarray,
                       n: int) -> np.ndarray:
    """Sum int64 `vals` into `n` slots by NONDECREASING `keys` —
    integer-exact (unlike bincount's float64 weights, which loses
    exactness past 2^53) and vectorized (unlike np.add.at, whose
    unbuffered per-element loop was an order of magnitude slower on
    the verify hot path). keys come pre-sorted from the pair-major
    lexsort in the verifiers."""
    out = np.zeros(n, dtype=np.int64)
    if len(keys) == 0:
        return out
    new = np.ones(len(keys), dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    out[keys[starts]] = np.add.reduceat(vals.astype(np.int64), starts)
    return out


_EMPTY_WPAIRS = pa.schema([
    ("doc_id_u", pa.int64()), ("doc_id_v", pa.int64()),
    ("w_inter", pa.int64()), ("w_union", pa.int64()),
    ("jw", pa.float64()),
])


def _row_token_tf(col, hasher: TokenHasher):
    """text column -> per-row (distinct token hashes, tf per entry,
    offsets, total weight per row). Raw-text tokenization to match the
    oracle; one batched split+hash, one lexsort — no per-row Python."""
    flat_h, offs, _ = batch_token_hashes(col, hasher, normalize=False)
    n = len(offs) - 1
    tot = np.diff(offs)  # S per row = token instances
    if len(flat_h) == 0:
        return (np.empty(0, U64), np.empty(0, np.int64),
                np.zeros(n + 1, np.int64), tot)
    row = np.repeat(np.arange(n, dtype=np.int64), tot)
    order = np.lexsort((flat_h, row))
    f, r = flat_h[order], row[order]
    new = np.ones(len(f), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(f)))
    uf, urow = f[starts], r[starts]
    ucnt = np.bincount(urow, minlength=n).astype(np.int64)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ucnt, out=uoffs[1:])
    return uf, tf.astype(np.int64), uoffs, tot.astype(np.int64)


def _wprefix_targets(tot: np.ndarray, tau: float) -> np.ndarray:
    """Required prefix WEIGHT per row: S - ceil(tau*S) + 1 (suffix then
    weighs <= ceil(tau*S) - 1 < tau*S). 0 for empty rows."""
    t = tot - np.ceil(np.round(tau * tot, 9)).astype(np.int64) + 1
    return np.where(tot > 0, t, 0)


def _wprefix_select(uf, tf, dfv, uoffs, ucnt, tot, tau):
    """Weight-prefix selection, one batch-wide lexsort: per row keep the
    shortest (df asc, tok asc)-ordered run whose cumulative tf reaches
    the target. Returns (flat indices into row-major order, row ids)."""
    n = len(ucnt)
    row = np.repeat(np.arange(n, dtype=np.int64), ucnt)
    order = np.lexsort((uf, dfv, row))
    tfo = tf[order]
    cw_ex = np.cumsum(tfo) - tfo  # exclusive, global
    safe = np.minimum(uoffs[:-1], max(len(cw_ex) - 1, 0))
    base = cw_ex[safe] if len(cw_ex) else np.zeros(n, np.int64)
    ex_in_row = cw_ex - np.repeat(base, ucnt)
    keep = ex_in_row < np.repeat(_wprefix_targets(tot, tau), ucnt)
    return order[keep], row[keep]


class _WDfPartial(_DfPartial):
    """df combiner over the weighted path's distinct-token extraction —
    df counts DOCS containing a token (weights don't change df)."""

    def __call__(self, b: pa.Table) -> pa.Table:
        uf, _, _, _ = _row_token_tf(b.column("text"), self.hasher)
        if len(uf) == 0:
            return pa.table({"tok": pa.array([], pa.uint64()),
                             "df": pa.array([], pa.int64())})
        uniq, counts = np.unique(uf, return_counts=True)
        return pa.table({"tok": pa.array(uniq, pa.uint64()),
                         "df": pa.array(counts, pa.int64())})


_PREFIX_SCHEMA = pa.schema([("tok", pa.uint64()), ("doc_id", pa.int64()),
                            ("s_tot", pa.int64())])


class _WPrefixExplodeBroadcast:
    """Weight-prefix explode with the broadcast (tok -> df) map."""

    def __init__(self, df_ref, tau: float) -> None:
        self.toks, self.dfs = ray.get(df_ref)
        self.tau = tau
        self.hasher = TokenHasher()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        uf, tf, uoffs, tot = _row_token_tf(b.column("text"), self.hasher)
        if len(uf) == 0:
            return _PREFIX_SCHEMA.empty_table()
        ucnt = np.diff(uoffs)
        dfv = self.dfs[np.searchsorted(self.toks, uf)]
        sel, rk = _wprefix_select(uf, tf, dfv, uoffs, ucnt, tot, self.tau)
        return pa.table({"tok": pa.array(uf[sel], pa.uint64()),
                         "doc_id": pa.array(ids[rk], pa.int64()),
                         "s_tot": pa.array(tot[rk], pa.int64())})


class _WExplodeAllTokens:
    """(doc_id, text) -> (tok, tf, doc_id, s_tot) per DISTINCT token;
    feeds the distributed df join path."""

    def __init__(self) -> None:
        self.hasher = TokenHasher()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        uf, tf, uoffs, tot = _row_token_tf(b.column("text"), self.hasher)
        ucnt = np.diff(uoffs)
        row = np.repeat(np.arange(len(ucnt), dtype=np.int64), ucnt)
        return pa.table({"tok": pa.array(uf, pa.uint64()),
                         "tf": pa.array(tf, pa.int64()),
                         "doc_id": pa.array(ids[row], pa.int64()),
                         "s_tot": pa.array(tot[row], pa.int64())})


def _wexplode_all_task(b: pa.Table) -> pa.Table:
    """Task-path _WExplodeAllTokens (join pools + actor pools deadlock
    small clusters — same rationale as simjoin._explode_all_tokens_task)."""
    return _WExplodeAllTokens()(b)


def _wprefix_regroup_batch(tau: float):
    """Block fn for the df-join path: complete doc_id groups of
    (doc_id, tok, tf, s_tot, df) rows -> weight-prefix per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PREFIX_SCHEMA.empty_table()
        from nise_ray.ops.groupapply import segments
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = batch.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        st = batch.column("s_tot").to_numpy(zero_copy_only=False)
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        o = np.argsort(ids, kind="stable")
        ids, toks, tf, st, dfv = ids[o], toks[o], tf[o], st[o], dfv[o]
        starts, ucnt = segments(ids)
        uoffs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(ucnt, out=uoffs[1:])
        tot = st[starts]
        sel, rk = _wprefix_select(toks, tf, dfv, uoffs, ucnt, tot, tau)
        return pa.table({"tok": pa.array(toks[sel], pa.uint64()),
                         "doc_id": pa.array(ids[starts][rk], pa.int64()),
                         "s_tot": pa.array(tot[rk], pa.int64())})

    return fn


def _pair_gen_weighted(tau: float):
    """Candidate pairs per token bucket with the weighted size filter
    min(S_u, S_v) >= tau * max(S_u, S_v) (follows from m >= tau*S and
    m <= min(S)) — all buckets vectorized at once via the shared
    all_bucket_size_filtered_pairs kernel."""
    from nise_ray.ops.simjoin import all_bucket_size_filtered_pairs

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        out = all_bucket_size_filtered_pairs(
            batch.column("tok").to_numpy(zero_copy_only=False).astype(U64),
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("s_tot").to_numpy(zero_copy_only=False), tau)
        if out is None:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        return pa.table({"u": pa.array(out[0], pa.int64()),
                         "v": pa.array(out[1], pa.int64())})

    return fn


def _distinct_uv(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        # typed empty — see simjoin._df_merge_batch (0-column shuffle
        # empties poison downstream joins)
        return pa.schema([("u", pa.int64()),
                          ("v", pa.int64())]).empty_table()
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    first = np.ones(len(order), dtype=bool)
    first[1:] = (u[order][1:] != u[order][:-1]) | \
                (v[order][1:] != v[order][:-1])
    return batch.take(pa.array(order[first]))


class _VerifyWeighted:
    """Distributed exact multiset verification: per batch of candidate
    pairs, gather both endpoints' (tok, tf) lists from the broadcast
    needed-docs map; m = Σ min(tf) over shared tokens via ONE lexsort +
    adjacent-duplicate scan (each (pair, tok) run has exactly two
    entries when shared — per-doc tokens are distinct)."""

    def __init__(self, map_ref, tau: float) -> None:
        (self.ids, self.flat_tok, self.flat_tf,
         self.offs, self.tot) = ray.get(map_ref)
        self.tau = tau

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_WPAIRS.empty_table()
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        hi = max(len(self.ids) - 1, 0)
        iu = np.clip(np.searchsorted(self.ids, u), 0, hi)
        iv = np.clip(np.searchsorted(self.ids, v), 0, hi)
        if not ((self.ids[iu] == u).all() and (self.ids[iv] == v).all()):
            raise AssertionError("pair endpoint missing from tf map")
        cu = self.offs[iu + 1] - self.offs[iu]
        cv = self.offs[iv + 1] - self.offs[iv]
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        a_idx = _ranges(self.offs[iu], cu)
        b_idx = _ranges(self.offs[iv], cv)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_tok = np.concatenate([self.flat_tok[a_idx],
                                  self.flat_tok[b_idx]])
        all_tf = np.concatenate([self.flat_tf[a_idx], self.flat_tf[b_idx]])
        order = np.lexsort((all_tok, all_pair))
        ps, hs, ws = all_pair[order], all_tok[order], all_tf[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        m = _segment_sum_int64(ps[1:][dup],
                               np.minimum(ws[1:], ws[:-1])[dup], npair)
        su, sv = self.tot[iu], self.tot[iv]
        w_union = su + sv - m
        # ONE double division of exact ints — identical to the SQL
        jw = np.divide(m.astype(np.float64), w_union.astype(np.float64))
        keep = jw >= self.tau
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "w_inter": pa.array(m[keep], pa.int64()),
            "w_union": pa.array(w_union[keep], pa.int64()),
            "jw": pa.array(jw[keep], pa.float64()),
        })


def _gather_tf_map(docs: "ray.data.Dataset", needed: np.ndarray):
    """Broadcast (doc_id-sorted ids, flat toks, flat tfs, offsets,
    totals) for the needed docs — bounded by the pair set, not the
    corpus."""
    from nise_ray.ops.groupapply import default_concurrency
    from nise_ray.util import collect_table

    needed_ref = ray.put(needed)

    class Gather:
        def __init__(self) -> None:
            self.needed = ray.get(needed_ref)
            self.hasher = TokenHasher()

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.needed, ids), 0,
                          max(len(self.needed) - 1, 0))
            rows = np.flatnonzero(self.needed[pos] == ids)
            if len(rows) == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "toks": pa.array([], pa.large_list(pa.uint64())),
                    "tfs": pa.array([], pa.large_list(pa.int64())),
                    "tot": pa.array([], pa.int64())})
            sel = b.take(pa.array(rows))
            uf, tf, uoffs, tot = _row_token_tf(sel.column("text"),
                                               self.hasher)
            return pa.table({
                "doc_id": sel.column("doc_id"),
                "toks": pa.LargeListArray.from_arrays(
                    pa.array(uoffs, pa.int64()), pa.array(uf, pa.uint64())),
                "tfs": pa.LargeListArray.from_arrays(
                    pa.array(uoffs, pa.int64()), pa.array(tf, pa.int64())),
                "tot": pa.array(tot, pa.int64())})

    got = collect_table(docs.map_batches(
        Gather, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    gids = got.column("doc_id").to_numpy(zero_copy_only=False)
    # offsets normalize against the first physical VALUE offset (inside
    # _list_flat_offs), not the list-slot slice offset — correct even
    # for sliced / non-compacted list arrays
    g_tok, g_offs = _list_flat_offs(got.column("toks"))
    g_tok = g_tok.astype(U64)
    g_tf, _ = _list_flat_offs(got.column("tfs"))
    order = np.argsort(gids)
    cnts = np.diff(g_offs)[order]
    rng = _ranges(g_offs[:-1][order], cnts)
    offs_sorted = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(cnts, out=offs_sorted[1:])
    tot = got.column("tot").to_numpy(zero_copy_only=False)[order]
    return ray.put((gids[order], g_tok[rng], g_tf[rng], offs_sorted,
                    tot.astype(np.int64)))


def _tf_rows_task(b: pa.Table) -> pa.Table:
    """Task-path (doc_id, text) -> (doc_id, toks[binary], tfs[binary],
    tot) rows for the join verify path. Token/tf vectors ship as
    large_binary blobs — acero joins reject list-typed non-key columns
    (see simjoin._flat_to_bin). Fresh hasher per task: join aggregator
    pools alongside actor pools deadlock small clusters."""
    uf, tf, uoffs, tot = _row_token_tf(b.column("text"), TokenHasher())
    return pa.table({
        "doc_id": b.column("doc_id"),
        "toks": _flat_to_bin(uf.astype(U64), uoffs),
        "tfs": _flat_to_bin(tf.astype(np.int64), uoffs),
        "tot": pa.array(tot, pa.int64())})


def _proj_w_u(b: pa.Table) -> pa.Table:
    """After the u-side join: fail loud on missing endpoint, rename."""
    if b.column("toks").null_count:
        raise AssertionError("pair endpoint missing from documents "
                             "(u-side join produced NULL tf map)")
    return pa.table({"u": b.column("u"), "v": b.column("v"),
                     "toks_u": b.column("toks"),
                     "tfs_u": b.column("tfs"),
                     "tot_u": b.column("tot")})


def _verify_w_lists_fn(tau: float):
    """Join-path weighted verify kernel: batch carries both endpoints'
    (tok, tf) lists + totals; same one-lexsort Σmin count as
    _VerifyWeighted with int64 accumulation, no resident map."""

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_WPAIRS.empty_table()
        if b.column("toks").null_count:
            raise AssertionError("pair endpoint missing from documents "
                                 "(v-side join produced NULL tf map)")
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        tok_u, offs_u = _bin_flat_offs(b.column("toks_u"), U64)
        tf_u, _ = _bin_flat_offs(b.column("tfs_u"), np.int64)
        tok_v, offs_v = _bin_flat_offs(b.column("toks"), U64)
        tf_v, _ = _bin_flat_offs(b.column("tfs"), np.int64)
        cu, cv = np.diff(offs_u), np.diff(offs_v)
        su = b.column("tot_u").to_numpy(zero_copy_only=False)
        sv = b.column("tot").to_numpy(zero_copy_only=False)
        npair = len(u)
        pair_idx = np.arange(npair, dtype=np.int64)
        all_pair = np.concatenate([np.repeat(pair_idx, cu),
                                   np.repeat(pair_idx, cv)])
        all_tok = np.concatenate([tok_u.astype(U64), tok_v.astype(U64)])
        all_tf = np.concatenate([tf_u, tf_v]).astype(np.int64)
        order = np.lexsort((all_tok, all_pair))
        ps, hs, ws = all_pair[order], all_tok[order], all_tf[order]
        dup = (ps[1:] == ps[:-1]) & (hs[1:] == hs[:-1])
        m = _segment_sum_int64(ps[1:][dup],
                               np.minimum(ws[1:], ws[:-1])[dup], npair)
        w_union = su + sv - m
        jw = np.divide(m.astype(np.float64), w_union.astype(np.float64))
        keep = jw >= tau
        return pa.table({
            "doc_id_u": pa.array(u[keep], pa.int64()),
            "doc_id_v": pa.array(v[keep], pa.int64()),
            "w_inter": pa.array(m[keep], pa.int64()),
            "w_union": pa.array(w_union[keep], pa.int64()),
            "jw": pa.array(jw[keep], pa.float64())})

    return fn


def _verify_pairs_ds(docs, pairs_ds, tau: float,
                     verify_mode: str = "auto",
                     verify_broadcast_max: int = 1_000_000) -> pa.Table:
    """Shared mode-gated exact-verify tail (mirrors
    simjoin._pair_verify_tail): "broadcast" collects the distinct-
    endpoint (tok, tf) map and ray.puts it once (endpoint-bounded —
    gated because a dup-heavy corpus pushes endpoints toward corpus
    cardinality); "join" semi-joins documents on the distinct-endpoint
    DATASET and attaches both endpoints' tf lists via two hash joins —
    no driver/worker-resident map; "auto" gates on the measured
    endpoint count. Parity-tested."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply
    from nise_ray.util import collect_table

    ep_ds = hash_group_apply(
        pairs_ds.map_batches(_endpoints_batch, batch_format="pyarrow"),
        ["doc_id"], _distinct_doc_batch, sort=False).materialize()
    n_needed = ep_ds.count()
    if n_needed == 0:
        return _EMPTY_WPAIRS.empty_table()
    if verify_mode == "auto":
        verify_mode = ("broadcast" if n_needed <= verify_broadcast_max
                       else "join")

    if verify_mode == "broadcast":
        needed = np.sort(collect_table(ep_ds).column("doc_id").to_numpy(
            zero_copy_only=False))
        map_ref = _gather_tf_map(docs, needed)
        verified = pairs_ds.map_batches(
            _VerifyWeighted, fn_constructor_args=(map_ref, tau),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency())
    elif verify_mode == "join":
        from nise_ray.ops.groupapply import join_input
        from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
        # patch captured DataContexts before joining (see simjoin)
        _hash_shuffle_on(docs, ep_ds, pairs_ds)
        np_ = _join_partitions()
        # sparse join inputs wrapped in join_input — see groupapply
        sel = docs.join(join_input(ep_ds), join_type="inner",
                        on=("doc_id",), num_partitions=np_)
        tfsets = join_input(sel.map_batches(_tf_rows_task,
                                            batch_format="pyarrow",
                                            zero_copy_batch=True))
        j1 = join_input(pairs_ds).join(tfsets, join_type="left_outer",
                                       on=("u",), right_on=("doc_id",),
                                       num_partitions=np_)
        j1 = join_input(j1.map_batches(_proj_w_u, batch_format="pyarrow"))
        j2 = j1.join(tfsets, join_type="left_outer", on=("v",),
                     right_on=("doc_id",), num_partitions=np_)
        verified = j2.map_batches(_verify_w_lists_fn(tau),
                                  batch_format="pyarrow")
    else:
        raise ValueError(f"unknown verify_mode {verify_mode!r}")

    out = collect_table(verified)
    if out.num_rows == 0:
        return _EMPTY_WPAIRS.empty_table()
    return out.select([f.name for f in _EMPTY_WPAIRS]).sort_by(
        [("doc_id_u", "ascending"), ("doc_id_v", "ascending")])


def weighted_jaccard_pairs(sf_dir: str, tau: float = 0.5,
                           df_mode: str = "auto",
                           df_broadcast_max: int = 10_000_000,
                           verify_mode: str = "auto",
                           verify_broadcast_max: int = 1_000_000,
                           ) -> pa.Table:
    """All document pairs with exact WEIGHTED (term-frequency) Jaccard
    >= tau, as (doc_id_u, doc_id_v, w_inter, w_union, jw), sorted by
    (u, v). See module docstring for the weight-prefix-filtered plan;
    df_mode gates the (tok -> df) attach exactly like simjoin, and
    verify_mode gates the exact-verify endpoint tf-map attach the same
    way (_verify_pairs_ds)."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    partials = docs.map_batches(_WDfPartial, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())
    df_ds = hash_group_apply(partials, ["tok"], _df_merge_batch).materialize()
    if df_mode == "auto":
        df_mode = "broadcast" if df_ds.count() <= df_broadcast_max else "join"

    if df_mode == "broadcast":
        from nise_ray.util import collect_table
        df_t = collect_table(df_ds)
        toks = df_t.column("tok").to_numpy(zero_copy_only=False).astype(U64)
        order = np.argsort(toks)
        df_ref = ray.put((toks[order],
                          df_t.column("df").to_numpy(
                              zero_copy_only=False)[order]))
        prefix = docs.map_batches(
            _WPrefixExplodeBroadcast, fn_constructor_args=(df_ref, tau),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=default_concurrency())
    elif df_mode == "join":
        from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions
        full = docs.map_batches(_wexplode_all_task, batch_format="pyarrow",
                                zero_copy_batch=True)
        _hash_shuffle_on(full, df_ds)
        joined = full.join(df_ds, join_type="inner",
                           num_partitions=_join_partitions(), on=("tok",))
        prefix = hash_group_apply(joined, ["doc_id"],
                                  _wprefix_regroup_batch(tau), sort=False)
    else:
        raise ValueError(f"unknown df_mode {df_mode!r}")

    cands = hash_group_apply(prefix, ["tok"], _pair_gen_weighted(tau))
    pairs_ds = hash_group_apply(cands, ["u", "v"], _distinct_uv,
                                sort=False).materialize()
    return _verify_pairs_ds(docs, pairs_ds, tau, verify_mode,
                            verify_broadcast_max)


# ---------------------------------------------------------------------------
# CWS (Ioffe 2010) weighted-MinHash LSH path
# ---------------------------------------------------------------------------

_TWO_NEG53 = np.float64(2.0) ** -53


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 -> uniform in (0, 1): top 53 bits + half-ulp offset (never
    0 or 1, so every log below is finite)."""
    return ((h >> U64(11)).astype(np.float64) + 0.5) * _TWO_NEG53


def cws_signatures(uf: np.ndarray, tf: np.ndarray, uoffs: np.ndarray,
                   k: int, seed: int = 0x5EED) -> np.ndarray:
    """Consistent Weighted Sampling signatures (Ioffe, ICDM 2010) for
    rows of (distinct token, integer weight) multisets: uint64[n, k]
    with Pr[sig_a[j] == sig_b[j]] = J_w(a, b) per component. Rows with
    no tokens get signature 0 (callers exclude them from pairing).

    Per hash j and token t: r, c ~ Gamma(2,1) (= -ln(u1*u2)), beta ~
    U(0,1), all from splitmix64 streams keyed on (token hash, j) — the
    'consistent' part: the same token draws the same randomness in
    every document. t_j = floor(ln w / r + beta); y = exp(r*(t_j -
    beta)); sample the token minimizing a = c / (y * e^r); the emitted
    component hashes (token, t_j) so equal samples collide iff both the
    token AND its quantized level agree."""
    n = len(uoffs) - 1
    sig = np.zeros((n, k), dtype=U64)
    if len(uf) == 0:
        return sig
    ucnt = np.diff(uoffs)
    nz = ucnt > 0
    starts_nz = uoffs[:-1][nz]
    lnw = np.log(tf.astype(np.float64))
    with np.errstate(over="ignore"):
        base = uf * U64(0x9E3779B97F4A7C15)
        for j in range(k):
            h = splitmix64(base ^ splitmix64(U64(seed + 1_000_003 * j)))
            u1 = _unit(h)
            h = splitmix64(h)
            u2 = _unit(h)
            h = splitmix64(h)
            u3 = _unit(h)
            h = splitmix64(h)
            u4 = _unit(h)
            h = splitmix64(h)
            beta = _unit(h)
            r = -np.log(u1 * u2)
            c = -np.log(u3 * u4)
            tj = np.floor(lnw / r + beta)
            # ln a = ln c - r*(tj - beta) - r  (monotone in a; min ln a)
            lna = np.log(c) - r * (tj - beta) - r
            # O(n) per-row argmin: reduceat min + first-match gather
            # (replaces the per-k lexsort; ties resolve to the first
            # in-row occurrence exactly as the stable lexsort did)
            minv = np.minimum.reduceat(lna, starts_nz)
            cand = np.flatnonzero(lna == np.repeat(minv, ucnt[nz]))
            arg = cand[np.searchsorted(cand, starts_nz, side="left")]
            comp = splitmix64(uf[arg] ^ splitmix64(
                tj[arg].astype(np.int64).astype(U64)))
            sig[nz, j] = comp
    return sig


def weighted_minhash_pairs(sf_dir: str, tau: float = 0.5, k: int = 126,
                           bands: int = 42,
                           verify_mode: str = "auto",
                           verify_broadcast_max: int = 1_000_000,
                           ) -> pa.Table:
    """Weighted near-duplicate pairs via CWS-LSH: sign (actor pool, K
    vectorized CWS passes per batch), band into buckets (one keyed
    exchange — threshold J* ~ (1/bands)^(rows_per_band/k)), candidate
    pairs per bucket, (u,v) distinct, then EXACT multiset verify (same
    verifier as weighted_jaccard_pairs) — zero false positives; recall
    is measured by weighted_recall_report. Same output contract as the
    exact join.

    Default banding k=126 / bands=42 (3 rows per band): CWS collision
    probability per component is exactly J_w, so expected recall at
    J_w = tau = 0.5 is 1 - (1 - 0.5^3)^42 ~ 0.996 (bucket threshold
    J* = (1/42)^(1/3) ~ 0.29 — the looser threshold buys recall at the
    boundary; the size filter and the exact verifier keep the extra
    candidates cheap)."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply

    if k % bands != 0:  # not assert — must survive `python -O`
        raise ValueError(f"k ({k}) must be divisible by bands ({bands})")
    rows_per_band = k // bands
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    class Sign:
        def __init__(self) -> None:
            self.hasher = TokenHasher()

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            uf, tf, uoffs, tot = _row_token_tf(b.column("text"),
                                               self.hasher)
            sig = cws_signatures(uf, tf, uoffs, k)
            nz = np.diff(uoffs) > 0
            keys = band_keys(sig[nz], bands, rows_per_band)
            return pa.table({
                "bkey": pa.array(keys.ravel(), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids[nz], bands), pa.int64()),
                "s_tot": pa.array(np.repeat(tot[nz], bands), pa.int64()),
            })

    exploded = docs.map_batches(Sign, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        from nise_ray.ops.simjoin import all_bucket_size_filtered_pairs
        if batch.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        out = all_bucket_size_filtered_pairs(
            batch.column("bkey").to_numpy(zero_copy_only=False).astype(U64),
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            batch.column("s_tot").to_numpy(zero_copy_only=False), tau)
        if out is None:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        return pa.table({"u": pa.array(out[0], pa.int64()),
                         "v": pa.array(out[1], pa.int64())})

    cands = hash_group_apply(exploded, ["bkey"], bucket_pairs)
    pairs_ds = hash_group_apply(cands, ["u", "v"], _distinct_uv,
                                sort=False).materialize()
    return _verify_pairs_ds(docs, pairs_ds, tau, verify_mode,
                            verify_broadcast_max)


def weighted_recall_report(sf_dir: str, tau: float = 0.5) -> pa.Table:
    """Measured recall of the CWS-LSH path against the exact
    weight-prefix join: (n_true, n_lsh, n_hit, recall). Precision is
    1.0 by construction (both paths share the exact verifier)."""
    exact = weighted_jaccard_pairs(sf_dir, tau=tau)
    lsh = weighted_minhash_pairs(sf_dir, tau=tau)

    def keyset(t: pa.Table) -> set:
        return set(zip(t.column("doc_id_u").to_pylist(),
                       t.column("doc_id_v").to_pylist()))

    te, tl = keyset(exact), keyset(lsh)
    hit = len(te & tl)
    recall = float(hit) / len(te) if te else 1.0
    return pa.table({"n_true": pa.array([len(te)], pa.int64()),
                     "n_lsh": pa.array([len(tl)], pa.int64()),
                     "n_hit": pa.array([hit], pa.int64()),
                     "recall": pa.array([recall], pa.float64())})


def nearest_neighbor_docs(sf_dir: str, tau: float = 0.3,
                          nn_broadcast_max: int = 50_000_000,
                          ) -> "ray.data.Dataset":
    """Per document: its most similar OTHER document by weighted
    Jaccard, restricted to jw >= tau (docs with no neighbor above tau
    keep NULL nn_doc_id / nn_jw) — the text-side analog of ann_topk
    (k=1) and the diagnostic a dedup run reads to pick its threshold.

    Completeness above tau comes from the EXACT weight-prefix join, so
    the result is fully oracled (an LSH candidate path would make the
    reported neighbor probabilistic). Ties on jw break toward the
    smaller neighbor id; jw doubles are bit-identical in both engines
    (one division of exact ints), so the tie-break order agrees too.
    The pair set is output-sized; the per-doc argmax rides one doc_id
    hash exchange; the final NULL-preserving attach is gated — the
    (doc -> nn) map is broadcast up to nn_broadcast_max rows, beyond
    that a distributed left-outer hash join attaches it (both paths
    parity-tested)."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply
    from nise_ray.util import collect_table

    pairs = weighted_jaccard_pairs(sf_dir, tau=tau)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def null_out(b: pa.Table) -> pa.Table:
        n = b.num_rows
        null_i = pa.array(np.zeros(n, np.int64), mask=np.ones(n, bool))
        null_f = pa.array(np.zeros(n, np.float64), mask=np.ones(n, bool))
        return pa.table({"doc_id": b.column("doc_id"),
                         "nn_doc_id": null_i, "nn_jw": null_f})

    if pairs.num_rows == 0:
        return docs.map_batches(null_out, batch_format="pyarrow")

    u = pairs.column("doc_id_u").to_numpy(zero_copy_only=False)
    v = pairs.column("doc_id_v").to_numpy(zero_copy_only=False)
    jw = pairs.column("jw").to_numpy(zero_copy_only=False)
    both = pa.table({
        "doc_id": pa.array(np.concatenate([u, v]), pa.int64()),
        "nb": pa.array(np.concatenate([v, u]), pa.int64()),
        "jw": pa.array(np.concatenate([jw, jw]), pa.float64()),
    })

    def argmax_per_doc(batch: pa.Table) -> pa.Table:
        from nise_ray.ops.groupapply import segments
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "jw": pa.array([], pa.float64())})
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nb = batch.column("nb").to_numpy(zero_copy_only=False)
        j = batch.column("jw").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -j, d))  # per doc: jw desc, nb asc
        starts, _ = segments(d[order])
        take = order[starts]
        return pa.table({"doc_id": pa.array(d[take], pa.int64()),
                         "nb": pa.array(nb[take], pa.int64()),
                         "jw": pa.array(j[take], pa.float64())})

    # per-doc argmax: bounded by the DOC side of the pair set — at a
    # heavily-duplicated corpus that is corpus-scale, so the NULL-
    # preserving attach is gated: broadcast below nn_broadcast_max,
    # distributed left-outer join above (both paths parity-tested)
    best_ds = hash_group_apply(ray.data.from_arrow(both), ["doc_id"],
                               argmax_per_doc, sort=False).materialize()

    if best_ds.count() <= nn_broadcast_max:
        best = collect_table(best_ds)
        bk = best.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(bk)
        nn_ref = ray.put((
            bk[order],
            best.column("nb").to_numpy(zero_copy_only=False)[order],
            best.column("jw").to_numpy(zero_copy_only=False)[order]))

        class Attach:
            def __init__(self) -> None:
                self.keys, self.nb, self.jw = ray.get(nn_ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(self.keys, ids), 0,
                              max(len(self.keys) - 1, 0))
                hit = self.keys[pos] == ids if len(self.keys) else \
                    np.zeros(len(ids), bool)
                return pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "nn_doc_id": pa.array(
                        np.where(hit,
                                 self.nb[pos] if len(self.keys) else 0, 0),
                        pa.int64(), mask=~hit),
                    "nn_jw": pa.array(
                        np.where(hit,
                                 self.jw[pos] if len(self.keys) else 0.0,
                                 0.0), pa.float64(), mask=~hit),
                })

        return docs.map_batches(Attach, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())

    # distributed fallback: left-outer hash join keeps NULLs naturally
    from nise_ray.ops.groupapply import default_partitions

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "nn_doc_id": b.column("nb"),
                         "nn_jw": b.column("jw")})

    from nise_ray.ops.groupapply import join_input
    joined = docs.join(join_input(
                           best_ds.map_batches(rename,
                                               batch_format="pyarrow")),
                       join_type="left_outer", on=("doc_id",),
                       num_partitions=default_partitions(0))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "nn_doc_id": b.column("nn_doc_id").cast(pa.int64()),
                         "nn_jw": b.column("nn_jw").cast(pa.float64())})

    return joined.map_batches(project, batch_format="pyarrow")
