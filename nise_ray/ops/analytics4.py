"""Fourth analytics batch (round 4, session 8): three shapes the
inventory still lacked —

- ``redact_docs``: regex REDACTION — the secret-scanning / PII-scrub
  rewrite every corpus release pipeline runs before publishing (C4
  strips lorem-ipsum and code; The Pile / RefinedWeb strip emails,
  phone numbers, API keys). Every prior text op here either filters
  docs (blocklist_filter, gopher) or computes features; none rewrites
  content in place under a rule set while counting hits per doc.

- ``lang_token_char_regression``: grouped OLS — per-language slope /
  intercept of chars-per-token, the simplest "fit a line per group"
  feature a data-quality dashboard computes. Distributed as the classic
  five-moment combiner (n, Σx, Σy, Σxy, Σx²), all EXACT int64, so the
  fit is reproducible bit-for-bit regardless of accumulation order —
  the normal equations touch floating point at exactly two correctly
  rounded int→double conversions (numerator, denominator) plus the
  division, mirrored verbatim in the oracle SQL.

- ``last_touch_attribution``: marketing-style AS-OF SELF-join — for
  every purchase, the same user's most recent STRICTLY-earlier click.
  Unlike asof_join_events (two distinct tables, tolerance window) this
  is a self-join of two filtered projections of one stream with SQL
  NOT-EXISTS tie semantics (ties on ts broken by max event_id), and it
  must emit NULL rows for purchases with no prior click — LEFT-outer
  as-of, which the inner as-of cannot express.

Scale contracts:

- ``redact_docs`` is a stateless vectorized map (two RE2 kernels per
  batch via pyarrow.compute, no Python rows) — embarrassingly parallel,
  no exchange.
- ``lang_token_char_regression`` rides ONE group-count-sized exchange
  of int64 moment partials; the corpus never moves. int64 partials are
  exact up to ~4×10^11 docs/lang at this corpus' token×char magnitudes
  (per-doc xy ≈ 2×10^7); past that, promote partials to float128 or
  split the exchange — documented, not silently wrong.
- ``last_touch_attribution`` rides ONE user_id hash exchange; the
  kernel is two lexsorts plus one global searchsorted over a
  (user-code, relative-ts) int64 encoding answering every user at once,
  with the same overflow guard + per-segment fallback the other
  windowed kernels use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import hash_group_apply, segments

# Two redaction rules, applied in order. RE2 syntax on BOTH engines
# (pyarrow.compute and DuckDB both embed RE2), so hit counts and
# rewrites agree byte-for-byte. The digit rule is the classic
# phone/account-number scrub; the keyword rule stands in for a
# secret-scanning wordlist and is what makes the oracle discriminative
# on this synthetic corpus (which contains no digit runs).
_NUM_RE = r"[0-9]{4,}"
_KEY_RE = r"\bkey\b"


def redact_docs(sf_dir: str) -> "ray.data.Dataset":
    """Per doc: text with digit runs -> '<NUM>' and the token 'key' ->
    '<KEY>', plus the per-rule hit counts (counted on the ORIGINAL
    text; the two patterns cannot overlap — one is all-digits, the
    other all-letters). Output: (doc_id, clean_text, n_num, n_key)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def redact(b: pa.Table) -> pa.Table:
        text = b.column("text")
        n_num = pc.count_substring_regex(text, _NUM_RE).cast(pa.int64())
        n_key = pc.count_substring_regex(text, _KEY_RE).cast(pa.int64())
        clean = pc.replace_substring_regex(text, _NUM_RE, "<NUM>")
        clean = pc.replace_substring_regex(clean, _KEY_RE, "<KEY>")
        return pa.table({"doc_id": b.column("doc_id"),
                         "clean_text": clean,
                         "n_num": n_num, "n_key": n_key})

    return ds.map_batches(redact, batch_format="pyarrow",
                          zero_copy_batch=True)


_EMPTY_REG = pa.table({"lang": pa.array([], pa.string()),
                       "n_docs": pa.array([], pa.int64()),
                       "slope": pa.array([], pa.float64()),
                       "intercept": pa.array([], pa.float64())})

_EMPTY_REG_PART = pa.table({"lang": pa.array([], pa.string()),
                            "n": pa.array([], pa.int64()),
                            "sx": pa.array([], pa.int64()),
                            "sy": pa.array([], pa.int64()),
                            "sxy": pa.array([], pa.int64()),
                            "sxx": pa.array([], pa.int64())})


def lang_token_char_regression(sf_dir: str) -> "ray.data.Dataset":
    """Per language: OLS fit n_chars ~ n_tokens (y ~ x) via the normal
    equations over exact integer moments:

        slope     = (n*Σxy - Σx*Σy) / (n*Σxx - Σx*Σx)
        intercept = (Σy - slope*Σx) / n

    n_tokens counts `[A-Za-z0-9_]+` runs — the same tokenizer as
    token_stats and the oracle's regexp_extract_all. Moments are summed
    as int64 per batch (one reduceat per language), exchanged once, and
    finished in arbitrary-precision Python ints, so the only floating
    point is float(num)/float(den) and the intercept expression —
    written in the oracle SQL in the identical op order (HUGEINT
    arithmetic, then one CAST AS DOUBLE each). Zero-variance groups
    yield IEEE inf/nan like SQL double division would."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text", "n_chars"])

    def _sums(lang_arr, n, sx, sy, sxy, sxx) -> pa.Table:
        enc = lang_arr.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, _ = segments(codes[order])
        red = lambda a: np.add.reduceat(a[order], starts)  # noqa: E731
        return pa.table({
            "lang": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n": pa.array(red(n), pa.int64()),
            "sx": pa.array(red(sx), pa.int64()),
            "sy": pa.array(red(sy), pa.int64()),
            "sxy": pa.array(red(sxy), pa.int64()),
            "sxx": pa.array(red(sxx), pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_REG_PART
        x = pc.count_substring_regex(b.column("text"), r"[A-Za-z0-9_]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = b.column("n_chars").to_numpy(zero_copy_only=False)
        return _sums(b.column("lang"), np.ones(b.num_rows, np.int64),
                     x, y, x * y, x * x)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_REG
        merged = _sums(batch.column("lang"),
                       *(batch.column(c).to_numpy(zero_copy_only=False)
                         for c in ("n", "sx", "sy", "sxy", "sxx")))
        langs, nd, slopes, inters = [], [], [], []
        for i in range(merged.num_rows):
            n, sx, sy, sxy, sxx = (int(merged.column(c)[i].as_py())
                                   for c in ("n", "sx", "sy", "sxy", "sxx"))
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            # the ONLY float ops; den==0 -> IEEE inf/nan, matching SQL
            slope = np.divide(np.float64(num), np.float64(den))
            inter = (np.float64(sy) - slope * np.float64(sx)) / np.float64(n)
            langs.append(merged.column("lang")[i].as_py())
            nd.append(n)
            slopes.append(float(slope))
            inters.append(float(inter))
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "n_docs": pa.array(nd, pa.int64()),
                         "slope": pa.array(slopes, pa.float64()),
                         "intercept": pa.array(inters, pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_group_apply(partials, ["lang"], finish, 0, sort=False)


def last_touch_attribution(sf_dir: str) -> "ray.data.Dataset":
    """For every 'purchase' event: the same user's most recent 'click'
    with ts STRICTLY before the purchase (ties on ts broken by the
    larger click event_id); purchases with no prior click keep NULL
    click_id / gap_us — a LEFT-outer as-of self-join. Output:
    (purchase_id, user_id, click_id, gap_us)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["purchase", "click"]))

    return hash_group_apply(ds, ["user_id"], _attribute_block, 0,
                            sort=False)


_EMPTY_ATTR = pa.table({"purchase_id": pa.array([], pa.int64()),
                        "user_id": pa.array([], pa.int64()),
                        "click_id": pa.array([], pa.int64()),
                        "gap_us": pa.array([], pa.int64())})


def _attribute_block(batch: pa.Table,
                     _headroom: int = np.iinfo(np.int64).max) -> pa.Table:
    """Kernel for one user-complete block; `_headroom` exists so tests
    can force the per-user fallback branch and assert parity."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _EMPTY_ATTR
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = batch.column("ts").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    is_p = pc.equal(batch.column("event_type"), "purchase") \
        .to_numpy(zero_copy_only=False)
    up, tp, ep = uid[is_p], ts[is_p], eid[is_p]
    if len(up) == 0:
        return _EMPTY_ATTR
    uc, tc, ec = uid[~is_p], ts[~is_p], eid[~is_p]
    if len(uc) == 0:
        null = pa.array(np.zeros(len(up), np.int64),
                        mask=np.ones(len(up), bool))
        return pa.table({"purchase_id": pa.array(ep, pa.int64()),
                         "user_id": pa.array(up, pa.int64()),
                         "click_id": null, "gap_us": null})
    uniq = np.unique(np.concatenate([uc, up]))
    cc = np.searchsorted(uniq, uc)
    cp = np.searchsorted(uniq, up)
    tmin = min(tc.min(), tp.min())
    span = np.int64(max(tc.max(), tp.max()) - tmin) + 2
    idx = np.empty(len(up), np.int64)
    if span < _headroom // max(len(uniq), 1):
        # one encoding: within equal (user, ts) clicks sort by
        # event_id, so idx points at the max-eid tie winner
        enc_c = cc * span + (tc - tmin)
        order = np.lexsort((ec, enc_c))
        enc_c, tc, ec = enc_c[order], tc[order], ec[order]
        idx[:] = np.searchsorted(enc_c, cp * span + (tp - tmin),
                                 side="left") - 1
        valid = idx >= 0
        valid[valid] &= enc_c[idx[valid]] >= cp[valid] * span
    else:  # degenerate-width guard: per-user sweep, same result
        order = np.lexsort((ec, tc, cc))
        cc, tc, ec = cc[order], tc[order], ec[order]
        starts, counts = segments(cc)
        seg_at = np.full(len(uniq), -1, np.int64)
        seg_at[cc[starts]] = np.arange(len(starts))
        valid = np.zeros(len(up), bool)
        for j in range(len(up)):
            s = seg_at[cp[j]]
            if s < 0:
                continue
            lo, c = starts[s], counts[s]
            k = lo + np.searchsorted(tc[lo:lo + c], tp[j],
                                     side="left") - 1
            if k >= lo:
                idx[j], valid[j] = k, True
    safe = np.where(valid, idx, 0)
    click = pa.array(ec[safe], pa.int64(), mask=~valid)
    gap = pa.array(tp - tc[safe], pa.int64(), mask=~valid)
    return pa.table({"purchase_id": pa.array(ep, pa.int64()),
                     "user_id": pa.array(up, pa.int64()),
                     "click_id": click, "gap_us": gap})


def linear_attribution(sf_dir: str, window_days: int = 7,
                       ) -> "ray.data.Dataset":
    """Multi-touch LINEAR attribution: every purchase splits one unit
    of credit equally across ALL the same user's clicks in the trailing
    window [purchase_ts - window_days, purchase_ts) — the fractional
    sibling of last_touch_attribution (which a single as-of pick cannot
    express). Output: one row per (purchase, contributing click) with
    (purchase_id, user_id, click_id, share = 1/n_window_clicks);
    purchases with no in-window click emit nothing (their credit is
    unattributed). share is one double division of exact ints, so the
    DuckDB comparison hashes bit-exact.

    Same scale shape as last_touch: ONE user_id hash exchange, then a
    per-block kernel of one lexsort + two global searchsorteds over the
    (user-code, relative-ts) encoding; the explode is output-sized
    (window memberships), never corpus x corpus."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from nise_ray.ops.groupapply import hash_group_apply

    win_us = np.int64(window_days) * 86_400_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["purchase", "click"]))

    def attribute(batch: pa.Table) -> pa.Table:
        return _linear_attr_block(batch, win_us)

    return hash_group_apply(ds, ["user_id"], attribute, 0, sort=False)


_EMPTY_LINEAR = pa.table({"purchase_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "click_id": pa.array([], pa.int64()),
                          "share": pa.array([], pa.float64())})


def _linear_attr_block(batch: pa.Table, win_us,
                       _headroom: int = np.iinfo(np.int64).max) -> pa.Table:
    """Kernel for one user-complete block; `_headroom` exists so tests
    can force the per-user fallback branch and assert parity (same
    contract as _attribute_block — a degenerately wide timestamp span
    degrades to the sweep instead of aborting the job)."""
    import pyarrow.compute as pc

    from nise_ray.ops.groupapply import segments
    from nise_ray.ops.simjoin import _ranges

    if batch.num_rows == 0:
        return _EMPTY_LINEAR
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    ts = batch.column("ts").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    is_p = pc.equal(batch.column("event_type"), "purchase") \
        .to_numpy(zero_copy_only=False)
    up, tp, ep = uid[is_p], ts[is_p], eid[is_p]
    uc, tc, ec = uid[~is_p], ts[~is_p], eid[~is_p]
    if len(up) == 0 or len(uc) == 0:
        return _EMPTY_LINEAR
    uniq = np.unique(np.concatenate([uc, up]))
    cc = np.searchsorted(uniq, uc)
    cp = np.searchsorted(uniq, up)
    tmin = min(tc.min(), tp.min())
    span = np.int64(max(tc.max(), tp.max()) - tmin) + win_us + 2
    if span < _headroom // max(len(uniq), 1):
        enc_c = cc * span + (tc - tmin)
        order = np.argsort(enc_c, kind="stable")
        enc_c, tc, ec = enc_c[order], tc[order], ec[order]
        enc_p = cp * span + (tp - tmin)
        base = cp * span
        # clicks with ts in [p.ts - window, p.ts), same user
        hi = np.searchsorted(enc_c, enc_p, side="left")
        lo = np.searchsorted(enc_c, np.maximum(enc_p - win_us, base),
                             side="left")
    else:  # degenerate-width guard: per-user sweep, same result
        order = np.lexsort((tc, cc))
        cc, tc, ec = cc[order], tc[order], ec[order]
        starts, counts = segments(cc)
        seg_at = np.full(len(uniq), -1, np.int64)
        seg_at[cc[starts]] = np.arange(len(starts))
        lo = np.zeros(len(up), np.int64)
        hi = np.zeros(len(up), np.int64)
        for j in range(len(up)):
            s = seg_at[cp[j]]
            if s < 0:
                continue
            s0, c = starts[s], counts[s]
            seg_t = tc[s0:s0 + c]
            lo[j] = s0 + np.searchsorted(seg_t, tp[j] - win_us,
                                         side="left")
            hi[j] = s0 + np.searchsorted(seg_t, tp[j], side="left")
    n_win = hi - lo
    keep = n_win > 0
    if not keep.any():
        return _EMPTY_LINEAR
    hi, lo, n_win = hi[keep], lo[keep], n_win[keep]
    idx = _ranges(lo, n_win)
    share = 1.0 / np.repeat(n_win, n_win).astype(np.float64)
    return pa.table({
        "purchase_id": pa.array(np.repeat(ep[keep], n_win), pa.int64()),
        "user_id": pa.array(np.repeat(up[keep], n_win), pa.int64()),
        "click_id": pa.array(ec[idx], pa.int64()),
        "share": pa.array(share, pa.float64()),
    })


def late_events_report(sf_dir: str, tolerance_s: int = 3600,
                       ) -> "ray.data.Dataset":
    """Out-of-order arrival diagnostic (the measurement behind any
    streaming watermark choice): treating event_id as ARRIVAL order,
    an event is LATE if its ts lags the running max ts of the user's
    EARLIER arrivals by more than `tolerance_s`. Output per user:
    (user_id, n_events, n_late, max_lag_s) with max_lag_s the worst
    observed lag in whole seconds (0 when never behind).

    Distinct window shape: a cumulative max ORDERED BY A DIFFERENT KEY
    than the value (arrival id vs event time) — none of the other
    window ops decouple the two. One user_id hash exchange; the kernel
    is one lexsort + ONE global np.maximum.accumulate over a
    (segment, relative-ts) encoding whose per-segment prefix maxima
    cannot leak across users (an earlier segment's encoded values are
    all smaller than any current-segment value), with the usual
    int64-headroom guard + per-segment fallback."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    tol_us = np.int64(tolerance_s) * 1_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])

    _EMPTY = pa.table({"user_id": pa.array([], pa.int64()),
                       "n_events": pa.array([], pa.int64()),
                       "n_late": pa.array([], pa.int64()),
                       "max_lag_s": pa.array([], pa.int64())})

    def report(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))
        uid, ts = uid[order], ts[order]
        starts, counts = segments(uid)
        seg_of = np.zeros(len(ts), dtype=np.int64)
        seg_of[starts[1:]] = 1
        np.cumsum(seg_of, out=seg_of)
        tmin = ts.min()
        rel = ts - tmin
        span = np.int64(rel.max()) + 2
        lag = np.full(len(ts), np.iinfo(np.int64).min, dtype=np.int64)
        if span < np.iinfo(np.int64).max // max(len(starts), 1):
            base = seg_of * span
            enc = base + rel + 1  # +1 so 'no prior in segment' == base
            run = np.maximum.accumulate(enc)
            prior = run[:-1]  # prior arrivals' running max, shifted
            has_prior = prior > base[1:]  # a current-segment value seen
            cur_lag = (prior - 1 - base[1:]) - rel[1:]
            lag[1:][has_prior] = cur_lag[has_prior]
        else:  # degenerate-width guard: per-segment sweep, same result
            for s, c in zip(starts, counts):
                if c < 2:
                    continue
                seg = ts[s:s + c]
                prior = np.maximum.accumulate(seg)[:-1]
                lag[s + 1:s + c] = prior - seg[1:]
        late = lag > tol_us
        pos_lag = np.maximum(lag, 0)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "n_late": pa.array(np.add.reduceat(late.astype(np.int64),
                                               starts), pa.int64()),
            "max_lag_s": pa.array(
                np.maximum.reduceat(pos_lag, starts) // 1_000_000,
                pa.int64()),
        })

    return hash_group_apply(ds, ["user_id"], report, 0, sort=False)
