"""Second analytics batch (round 4): value-distribution window ranks
(PERCENT_RANK / CUME_DIST) and bigram collocation lift — two shapes the
inventory lacked (rank-fraction windows over a partition, and an
adjacency-count association measure joining two count tables).

Scale contracts:

- ``percent_rank_docs`` rides ONE lang-keyed exchange; the per-block
  kernel is a lexsort + two searchsorteds per segment (vectorized over
  all segments at once); rank fractions are exact int->double divisions,
  bit-identical to DuckDB's window functions.
- ``bigram_collocations`` is combiner-shaped: per-batch bigram/unigram
  partial counts (dictionary-encoded, one np.unique per batch) -> one
  hash exchange each -> a broadcast-gated unigram attach with a REAL
  distributed two-join fallback past the gate (the 100-TB path; no
  vocab-sized driver state). ``lift`` is computed from exact int counts
  with one double multiply/divide per side, same op order as the SQL, so
  it hashes bit-exact with no rounding heal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import hash_group_apply, segments

U64 = np.uint64
_TOKEN_SPLIT = r"[^A-Za-z0-9_]+"


def percent_rank_docs(sf_dir: str) -> "ray.data.Dataset":
    """PERCENT_RANK() and CUME_DIST() of n_chars within each lang:
    (doc_id, lang, n_chars, pct_rank, cume_dist), matching

        percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
        cume_dist()    OVER (PARTITION BY lang ORDER BY n_chars)

    pct_rank = (#strictly-smaller)/(n-1) (0 for singleton groups, as
    SQL defines); cume_dist = (#less-or-equal)/n. Ties share both
    fractions, so the engine's sort-order within ties is immaterial."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])

    def ranks(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "lang": pa.array([], pa.string()),
                          "n_chars": pa.array([], pa.int64()),
                          "pct_rank": pa.array([], pa.float64()),
                          "cume_dist": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        code = lang.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((nc, code))
        code_s, nc_s, doc_s = code[order], nc[order], doc[order]
        starts, counts = segments(code_s)
        seg_of = np.zeros(len(order), dtype=np.int64)
        seg_of[starts[1:]] = 1
        np.cumsum(seg_of, out=seg_of)
        # strictly-smaller / less-or-equal counts per row, all segments in
        # one pass: encode (segment, value) so a global searchsorted of
        # the sorted keys answers every segment at once
        lo_v, hi_v = int(nc_s.min()), int(nc_s.max())
        span = hi_v - lo_v + 2
        enc = seg_of * span + (nc_s - lo_v)
        n_less = np.searchsorted(enc, enc, side="left") - starts[seg_of]
        n_le = np.searchsorted(enc, enc, side="right") - starts[seg_of]
        n = counts[seg_of]
        denom = np.maximum(n - 1, 1).astype(np.float64)
        pct = n_less.astype(np.float64) / denom
        pct[n == 1] = 0.0
        cume = n_le.astype(np.float64) / n.astype(np.float64)
        return pa.table({"doc_id": pa.array(doc_s, pa.int64()),
                         "lang": lang.take(pa.array(order, pa.int64())),
                         "n_chars": pa.array(nc_s, pa.int64()),
                         "pct_rank": pa.array(pct, pa.float64()),
                         "cume_dist": pa.array(cume, pa.float64())})

    return hash_group_apply(ds, ["lang"], ranks)


def _token_lists(txt):
    """split_pattern_regex token lists with flat values + rebased offsets
    + the batch dictionary (codes, vocab) — empty fragments NOT yet
    dropped (callers mask by the empty-string code)."""
    import pyarrow.compute as pc

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.split_pattern_regex(txt, pattern=_TOKEN_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    offs = np.asarray(lists.offsets, dtype=np.int64) - lists.offset
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return idx, offs, enc.dictionary


def _kept_token_stream(txt):
    """(codes, row_ids, vocab) of the regexp_extract_all token stream —
    empty split fragments dropped, adjacency within a row preserved."""
    idx, offs, vocab = _token_lists(txt)
    n = len(offs) - 1
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    vlist = vocab.to_pylist()
    try:
        empty_code = vlist.index("")
    except ValueError:
        empty_code = -1
    if empty_code >= 0:
        keep = idx != empty_code
        idx, row = idx[keep], row[keep]
    return idx, row, vocab


def _bigram_partial(b: pa.Table) -> pa.Table:
    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    idx, row, vocab = _kept_token_stream(b.column("text"))
    if len(idx) < 2:
        return empty
    same = row[1:] == row[:-1]
    ca, cb = idx[:-1][same], idx[1:][same]
    if len(ca) == 0:
        return empty
    v = len(vocab)
    key = ca * v + cb
    uk, cnt = np.unique(key, return_counts=True)
    ia = pa.array(uk // v, pa.int64())
    ib = pa.array(uk % v, pa.int64())
    return pa.table({"tok_a": vocab.take(ia),
                     "tok_b": vocab.take(ib),
                     "n_ab": pa.array(cnt, pa.int64())})


def _unigram_partial(b: pa.Table) -> pa.Table:
    empty = pa.table({"tok": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    idx, _row, vocab = _kept_token_stream(b.column("text"))
    if len(idx) == 0:
        return empty
    uk, cnt = np.unique(idx, return_counts=True)
    return pa.table({"tok": vocab.take(pa.array(uk, pa.int64())),
                     "n": pa.array(cnt, pa.int64())})


def _string_group_sum(key_cols: list[str], n_col: str, out_col: str):
    """Block kernel summing ``n_col`` per distinct string-key tuple.
    Blocks arrive hash-partitioned AND sorted on the key columns (the
    exchange sorts within partitions), so segments() over dictionary
    codes in row order finds exact string groups."""
    def merge(b: pa.Table) -> pa.Table:
        cols = {k: pa.array([], pa.string()) for k in key_cols}
        cols[out_col] = pa.array([], pa.int64())
        if b.num_rows == 0:
            return pa.table(cols)
        codes = []
        arrs = []
        for k in key_cols:
            a = b.column(k)
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            arrs.append(a)
            codes.append(a.dictionary_encode().indices
                         .to_numpy(zero_copy_only=False).astype(np.int64))
        order = np.lexsort(codes[::-1])
        n = b.column(n_col).to_numpy(zero_copy_only=False)[order]
        sorted_codes = [c[order] for c in codes]
        chg = np.zeros(len(order), dtype=bool)
        chg[0] = True
        for c in sorted_codes:
            chg[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(chg)
        sums = np.add.reduceat(n, starts)
        first = pa.array(order[starts], pa.int64())
        out = {k: a.take(first) for k, a in zip(key_cols, arrs)}
        out[out_col] = pa.array(sums, pa.int64())
        return pa.table(out)
    return merge


def bigram_collocations(sf_dir: str, min_count: int = 2,
                        df_mode: str = "auto",
                        broadcast_max: int = 10_000_000) -> pa.Table:
    """Adjacent-token (bigram) collocation table over documents:
    (tok_a, tok_b, n_ab, n_a, n_b, lift) for bigrams with
    n_ab >= min_count, where lift = (n_ab * N) / (n_a * n_b) with N the
    total token count — the association ratio whose log is PMI (emitted
    unlogged so the value is one exact IEEE multiply+divide on exact
    int->double conversions, bit-equal to the SQL).

    df_mode "broadcast" ships the (tok-hash -> count) unigram map once
    via ray.put; "join" attaches counts with two distributed hash joins
    on the token string (the 100-TB path); "auto" gates on measured
    vocab size. Both modes are parity-tested."""
    from nise_ray.ops.normalize import TokenHasher
    from nise_ray.util import collect_table

    docs = lambda: ray.data.read_parquet(  # noqa: E731 — two passes
        f"{sf_dir}/documents.parquet", columns=["text"])

    uni = hash_group_apply(
        docs().map_batches(_unigram_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["tok"], _string_group_sum(["tok"], "n", "n")).materialize()
    n_total = int(sum(r["n"] for r in
                      uni.map_batches(
                          lambda b: pa.table({"n": pa.array(
                              [0 if b.num_rows == 0 else
                               int(np.sum(b.column("n").to_numpy(
                                   zero_copy_only=False)))], pa.int64())}),
                          batch_format="pyarrow",
                          zero_copy_batch=True).take_all()))

    big_partials = docs().map_batches(_bigram_partial,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
    big = hash_group_apply(big_partials, ["tok_a", "tok_b"],
                           _string_group_sum(["tok_a", "tok_b"],
                                             "n_ab", "n_ab"))

    if df_mode == "auto":
        df_mode = "broadcast" if uni.count() <= broadcast_max else "join"

    n_total_f = float(n_total)
    if df_mode == "broadcast":
        ut = collect_table(uni)
        hasher = TokenHasher()
        th = hasher.hash_vocab(ut.column("tok").to_pylist())
        order = np.argsort(th)
        keys = th[order]
        vals = ut.column("n").to_numpy(zero_copy_only=False)[order]
        ref = ray.put((keys, vals))

        def attach(b: pa.Table) -> pa.Table:
            empty = pa.table({"tok_a": pa.array([], pa.string()),
                              "tok_b": pa.array([], pa.string()),
                              "n_ab": pa.array([], pa.int64()),
                              "n_a": pa.array([], pa.int64()),
                              "n_b": pa.array([], pa.int64()),
                              "lift": pa.array([], pa.float64())})
            if b.num_rows == 0:
                return empty
            nab = b.column("n_ab").to_numpy(zero_copy_only=False)
            keep = nab >= min_count
            if not keep.any():
                return empty
            b = b.filter(pa.array(keep))
            nab = nab[keep]
            k, v = ray.get(ref)
            h = TokenHasher()

            def look(col: str) -> np.ndarray:
                a = b.column(col)
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
                enc = a.dictionary_encode()
                vh = h.hash_vocab(enc.dictionary.to_pylist())
                hh = vh[enc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)]
                pos = np.searchsorted(k, hh)
                pos = np.clip(pos, 0, max(len(k) - 1, 0))
                if len(k) == 0 or (k[pos] != hh).any():
                    raise KeyError(f"bigram token missing from unigram "
                                   f"map ({col})")
                return v[pos]

            na, nb = look("tok_a"), look("tok_b")
            lift = (nab.astype(np.float64) * n_total_f) / \
                (na.astype(np.float64) * nb.astype(np.float64))
            return pa.table({"tok_a": b.column("tok_a"),
                             "tok_b": b.column("tok_b"),
                             "n_ab": pa.array(nab, pa.int64()),
                             "n_a": pa.array(na, pa.int64()),
                             "n_b": pa.array(nb, pa.int64()),
                             "lift": pa.array(lift, pa.float64())})

        out = big.map_batches(attach, batch_format="pyarrow",
                              zero_copy_batch=True)
        return collect_table(out)

    if df_mode != "join":
        raise ValueError(f"unknown df_mode {df_mode!r}")

    from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions

    def pre_filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        keep = b.column("n_ab").to_numpy(zero_copy_only=False) >= min_count
        return b.filter(pa.array(keep))

    filtered = big.map_batches(pre_filter, batch_format="pyarrow",
                               zero_copy_batch=True)
    _hash_shuffle_on(filtered, uni)
    np_ = _join_partitions()
    ua = uni.map_batches(
        lambda b: b.rename_columns(["tok", "n_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j1 = filtered.join(ua, join_type="inner", num_partitions=np_,
                       on=("tok_a",), right_on=("tok",))
    ub = uni.map_batches(
        lambda b: b.rename_columns(["tok", "n_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j2 = j1.join(ub, join_type="inner", num_partitions=np_,
                 on=("tok_b",), right_on=("tok",))

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({"tok_a": pa.array([], pa.string()),
                          "tok_b": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64()),
                          "n_a": pa.array([], pa.int64()),
                          "n_b": pa.array([], pa.int64()),
                          "lift": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        nab = b.column("n_ab").to_numpy(zero_copy_only=False)
        na = b.column("n_a").to_numpy(zero_copy_only=False)
        nb = b.column("n_b").to_numpy(zero_copy_only=False)
        lift = (nab.astype(np.float64) * n_total_f) / \
            (na.astype(np.float64) * nb.astype(np.float64))
        return pa.table({"tok_a": b.column("tok_a"),
                         "tok_b": b.column("tok_b"),
                         "n_ab": pa.array(nab, pa.int64()),
                         "n_a": pa.array(na, pa.int64()),
                         "n_b": pa.array(nb, pa.int64()),
                         "lift": pa.array(lift, pa.float64())})

    return collect_table(j2.map_batches(finish, batch_format="pyarrow",
                                        zero_copy_batch=True))


def winsorized_doc_lengths(sf_dir: str, lo_q: float = 0.05,
                           hi_q: float = 0.95) -> "ray.data.Dataset":
    """WINSORIZATION: clamp each document's n_chars to its language's
    [lo_q, hi_q] interpolated quantile band — the robust-statistics
    outlier treatment applied before training-mix length statistics.

    Scale shape: the per-lang bounds ride the SAME one-exchange
    closed-form interpolated-quantile kernel as
    lang_length_quantiles_cont (a lang's value vector fits one block;
    swap in the DDSketch combiner for pathological skew), producing a
    #langs-row table collected to the driver and broadcast ONCE via
    ray.put; the clamp itself is a stateless vectorized map over the
    corpus — no second exchange, output streams. Bounds are rounded to
    4dp on BOTH engines (the proven-portable quantile_cont contract)
    so the clamp compares identical doubles."""
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def bounds(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, codes))
        sc, sv = codes[order], vals[order]
        starts, counts = segments(sc)

        def q_cont(q: float) -> np.ndarray:
            h = q * (counts - 1)
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            hi = np.minimum(lo + 1, counts - 1)
            v = sv[starts + lo] + (sv[starts + hi] - sv[starts + lo]) * frac
            return np.round(v, 4)

        langs = lang.dictionary.take(pa.array(sc[starts]))
        return pa.table({"lang": langs.cast(pa.string()),
                         "lo": pa.array(q_cont(lo_q), pa.float64()),
                         "hi": pa.array(q_cont(hi_q), pa.float64())})

    bt = collect_table(hash_group_apply(ds, ["lang"], bounds, 0,
                                        sort=False))
    lut = {l: (lo, hi) for l, lo, hi in
           zip(bt.column("lang").to_pylist(),
               bt.column("lo").to_numpy(zero_copy_only=False),
               bt.column("hi").to_numpy(zero_copy_only=False))}
    lut_ref = ray.put(lut)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])

    def clamp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64()),
                             "w_chars": pa.array([], pa.float64())})
        table = ray.get(lut_ref)
        lang = b.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dvoc = lang.dictionary.to_pylist()
        los = np.asarray([table[v][0] for v in dvoc], np.float64)[codes]
        his = np.asarray([table[v][1] for v in dvoc], np.float64)[codes]
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        # greatest(lo, least(hi, x)) — same nesting as the oracle
        w = np.maximum(los, np.minimum(his, x))
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars").cast(pa.int64()),
            "w_chars": pa.array(w, pa.float64()),
        })

    return docs.map_batches(clamp, batch_format="pyarrow",
                            zero_copy_batch=True)
