"""Dataset-analytics operators over the `documents` table: deterministic
stratified sampling and ROLLUP-style multi-level aggregates.

Both are combiner-shaped: every block reduces to (at most) group-count
rows before the single small exchange — nothing corpus-sized ever moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# Knuth multiplicative hash — computable identically in numpy int64 and
# ANSI SQL (doc_id * 2654435761 fits int64 for doc_id < 3.5e9; the
# oracle uses the same expression, so the sample is engine-independent).
SAMPLE_MULT = 2_654_435_761
SAMPLE_MOD = 1 << 32


# doc_id * SAMPLE_MULT must not exceed int64, or numpy wraps silently
# (two's complement) while the SQL oracle ERRORS on overflow — the
# cross-engine key agreement would break without any signal. Fail loudly
# instead; a 2^63-scale id space needs a different (uint64/splitmix) key.
_SAMPLE_ID_MAX = (2 ** 63 - 1) // SAMPLE_MULT


def _sample_key(doc_id: np.ndarray) -> np.ndarray:
    if len(doc_id) and int(doc_id.max()) > _SAMPLE_ID_MAX:
        raise ValueError(
            f"doc_id > {_SAMPLE_ID_MAX} overflows the int64 Knuth-hash "
            "sample key (numpy would wrap where SQL errors); use a "
            "64-bit-safe key for ids at this scale")
    return (doc_id * np.int64(SAMPLE_MULT)) % np.int64(SAMPLE_MOD)


def stratified_sample_docs(sf_dir: str, k: int = 10) -> pa.Table:
    """Deterministic STRATIFIED SAMPLE: the k documents per language with
    the smallest multiplicative-hash key (a uniform pseudo-random but
    reproducible choice — the batch analogue of ORDER BY hash LIMIT k per
    stratum). Per-batch local top-k per lang (combiner), one hash
    exchange on lang, final top-k per segment. Output is k x |langs|
    rows: (lang, doc_id, n_chars)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        lang = b.column("lang").combine_chunks().dictionary_encode()
        codes = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        key = _sample_key(did)
        order = np.lexsort((did, key, codes))
        sc = codes[order]
        starts, counts = segments(sc)
        pos = np.arange(len(order), dtype=np.int64)
        rank = pos - np.repeat(starts, counts)
        keep = rank < k
        sel = order[keep]
        return pa.table({
            "lang": lang.dictionary.take(pa.array(sc[keep])).cast(pa.string()),
            "doc_id": pa.array(did[sel], pa.int64()),
            "n_chars": pa.array(nch[sel], pa.int64()),
        })

    partial = ds.map_batches(local_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
    final = hash_group_apply(partial, ["lang"], local_topk, 0, sort=False)
    return collect_table(final).sort_by(
        [("lang", "ascending"), ("doc_id", "ascending")])


def snapshot_diff_docs(sf_dir: str) -> "ray.data.Dataset":
    """SNAPSHOT DIFF — the corpus-version reconciliation a continuously
    growing training set runs between two crawls: classify every doc as
    added / removed / changed / unchanged across two snapshots via a
    DISTRIBUTED FULL OUTER hash join on the doc key.

    The two snapshots derive deterministically from the one documents
    table (driver contract is a single sf_dir): snapshot A = docs with
    doc_id % 5 != 0, snapshot B = docs with doc_id % 3 != 0, and B's
    content version is bumped for doc_id % 7 == 0 (simulating edits) —
    all mod arithmetic, so the DuckDB oracle reproduces the exact same
    snapshots. Output: (doc_id, status) per doc in A ∪ B, streamed (the
    result is corpus-sized; no driver collect).

    Scale shape: two filtered projections of one read, one full_outer
    hash exchange, a stateless status map — identical plan at any corpus
    size; this is also the engine's coverage of the full_outer join
    primitive (inner / left_outer / left_anti are exercised elsewhere)."""
    import pyarrow.compute as pc

    from nise_ray.ops.relational import _hash_shuffle_on, _join_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def mk_a(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did % 5) != 0
        return pa.table({
            "doc_id": pa.array(did[keep], pa.int64()),
            "va": b.column("n_chars").filter(pa.array(keep)).cast(pa.int64()),
        })

    def mk_b(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did % 3) != 0
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)[keep]
        bumped = nch + ((did[keep] % 7) == 0)
        return pa.table({
            "doc_id_b": pa.array(did[keep], pa.int64()),
            "vb": pa.array(bumped, pa.int64()),
        })

    a = ds.map_batches(mk_a, batch_format="pyarrow", zero_copy_batch=True)
    b = ds.map_batches(mk_b, batch_format="pyarrow", zero_copy_batch=True)
    _hash_shuffle_on(a, b)
    joined = a.join(b, join_type="full_outer",
                    num_partitions=_join_partitions(),
                    on=("doc_id",), right_on=("doc_id_b",))

    def status(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "status": pa.array([], pa.string())})
        # Ray's full_outer join coalesces the two key columns into one
        # `doc_id`; snapshot membership is carried by the payload
        # validity (va/vb are never null inside their own snapshot).
        in_a = pc.is_valid(batch.column("va")).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(batch.column("vb")).to_numpy(zero_copy_only=False)
        va = batch.column("va").fill_null(-1).to_numpy(zero_copy_only=False)
        vb = batch.column("vb").fill_null(-1).to_numpy(zero_copy_only=False)
        st = np.where(~in_a, "added",
                      np.where(~in_b, "removed",
                               np.where(va != vb, "changed", "unchanged")))
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         "status": pa.array(st, pa.string())})

    return joined.map_batches(status, batch_format="pyarrow")


def _finest_lang_source(sf_dir: str) -> pa.Table:
    """(lang, source, n_docs, sum_chars) — the finest grouping level,
    computed with a per-batch combiner + one exchange. ROLLUP and CUBE
    both derive every coarser level from this group-count-sized table on
    the driver, so the corpus is read once either way."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        lang = b.column("lang").combine_chunks().dictionary_encode()
        src = b.column("source").combine_chunks().dictionary_encode()
        lc = lang.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sc = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        n_docs = b.column("n_docs").to_numpy(zero_copy_only=False) \
            if "n_docs" in b.schema.names else np.ones(b.num_rows, np.int64)
        combo = lc * np.int64(len(src.dictionary) + 1) + sc
        order = np.argsort(combo, kind="stable")
        starts, _ = segments(combo[order])
        first = order[starts]
        return pa.table({
            "lang": lang.take(pa.array(first)).cast(pa.string()),
            "source": src.take(pa.array(first)).cast(pa.string()),
            "n_docs": pa.array(np.add.reduceat(n_docs[order], starts), pa.int64()),
            "sum_chars": pa.array(np.add.reduceat(nch[order], starts), pa.int64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        # re-run the combiner over the exchanged partials: sum_chars
        # carried as n_chars, n_docs as partial counts
        renamed = pa.table({
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "n_chars": batch.column("sum_chars"),
            "n_docs": batch.column("n_docs"),
        })
        return combine(renamed)

    partial = ds.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
    return collect_table(hash_group_apply(partial, ["lang", "source"],
                                          merge, 0, sort=False))


def _coarsen(finest: pa.Table, key_col: str) -> pa.Table:
    """Sum the finest level over one retained grouping key; the other
    key becomes the 'ALL' sentinel."""
    keys = finest.column(key_col).to_pylist()
    nd = finest.column("n_docs").to_numpy(zero_copy_only=False)
    sch = finest.column("sum_chars").to_numpy(zero_copy_only=False)
    acc: dict[str, list[int]] = {}
    for i, k in enumerate(keys):
        a = acc.setdefault(k, [0, 0])
        a[0] += int(nd[i])
        a[1] += int(sch[i])
    out = sorted(acc)
    cols = {
        "lang": pa.array(out if key_col == "lang" else ["ALL"] * len(out),
                         pa.string()),
        "source": pa.array(out if key_col == "source" else
                           ["ALL"] * len(out), pa.string()),
        "n_docs": pa.array([acc[k][0] for k in out], pa.int64()),
        "sum_chars": pa.array([acc[k][1] for k in out], pa.int64()),
    }
    return pa.table(cols)


def _grand_total(finest: pa.Table) -> pa.Table:
    nd = finest.column("n_docs").to_numpy(zero_copy_only=False)
    sch = finest.column("sum_chars").to_numpy(zero_copy_only=False)
    return pa.table({
        "lang": pa.array(["ALL"], pa.string()),
        "source": pa.array(["ALL"], pa.string()),
        "n_docs": pa.array([int(nd.sum())], pa.int64()),
        "sum_chars": pa.array([int(sch.sum())], pa.int64()),
    })


def rollup_doc_counts(sf_dir: str) -> pa.Table:
    """ROLLUP aggregate: document counts + total chars at three levels —
    (lang, source), (lang, ALL), (ALL, ALL) — the batch form of
    GROUP BY ROLLUP(lang, source). The finest level is computed with a
    per-batch combiner + one exchange; coarser levels derive from the
    finest (group-count sized) on the driver, so the corpus is read
    once. NULL grouping keys are emitted as the sentinel 'ALL' to keep
    the cross-engine hash compare total-order-safe."""
    finest = _finest_lang_source(sf_dir)
    return pa.concat_tables([finest, _coarsen(finest, "lang"),
                             _grand_total(finest)]).sort_by(
        [("lang", "ascending"), ("source", "ascending")])


def cube_doc_counts(sf_dir: str) -> pa.Table:
    """CUBE aggregate — GROUP BY CUBE(lang, source): all FOUR grouping
    sets (lang, source), (lang, ALL), (ALL, source), (ALL, ALL). Same
    shape as ROLLUP plus the (ALL, source) marginal; every coarser level
    is derived from the one group-count-sized finest exchange, so CUBE
    costs exactly what ROLLUP costs regardless of corpus size."""
    finest = _finest_lang_source(sf_dir)
    return pa.concat_tables([finest, _coarsen(finest, "lang"),
                             _coarsen(finest, "source"),
                             _grand_total(finest)]).sort_by(
        [("lang", "ascending"), ("source", "ascending")])


def grouping_sets_doc_counts(sf_dir: str) -> pa.Table:
    """GROUPING SETS aggregate — GROUP BY GROUPING SETS ((lang),
    (source)): the two marginals WITHOUT the finest level or the grand
    total, a set selection neither ROLLUP nor CUBE can express. grp_id
    carries SQL's GROUPING(lang, source) bit mask (1 = source
    aggregated away, 2 = lang aggregated away) so a consumer can tell
    the levels apart without sniffing sentinels. Derived from the same
    single group-count-sized finest exchange as ROLLUP/CUBE — arbitrary
    grouping sets cost ONE corpus pass regardless of how many sets are
    requested."""
    finest = _finest_lang_source(sf_dir)

    def with_id(t: pa.Table, gid: int) -> pa.Table:
        return t.append_column("grp_id",
                               pa.array([gid] * t.num_rows, pa.int64()))

    return pa.concat_tables([with_id(_coarsen(finest, "lang"), 1),
                             with_id(_coarsen(finest, "source"), 2)]) \
        .sort_by([("lang", "ascending"), ("source", "ascending")])


def _lang_moments_raw(sf_dir: str) -> pa.Table:
    """Merged per-language moment sums (lang, n, s1, s2) over n_chars —
    the shared first pass of lang_char_moments and doc_zscores. Each
    block emits one row per language it saw; one group-count-sized
    exchange merges them. Sums of integers are exact in double, so the
    derived mean is bit-identical to SQL's avg()."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    _EMPTY_MOM = pa.table({"lang": pa.array([], pa.string()),
                           "n": pa.array([], pa.int64()),
                           "s1": pa.array([], pa.float64()),
                           "s2": pa.array([], pa.float64())})

    def _sum_by_lang(lang_arr: pa.ChunkedArray, n: np.ndarray,
                     s1: np.ndarray, s2: np.ndarray) -> pa.Table:
        enc = lang_arr.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, _ = segments(codes[order])
        return pa.table({
            "lang": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            "s1": pa.array(np.add.reduceat(s1[order], starts), pa.float64()),
            "s2": pa.array(np.add.reduceat(s2[order], starts), pa.float64()),
        })

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_MOM
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        return _sum_by_lang(b.column("lang"),
                            np.ones(b.num_rows, np.int64), x, x * x)

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_MOM
        return _sum_by_lang(
            b.column("lang"),
            b.column("n").to_numpy(zero_copy_only=False),
            b.column("s1").to_numpy(zero_copy_only=False),
            b.column("s2").to_numpy(zero_copy_only=False))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return collect_table(hash_group_apply(partials, ["lang"], merge, 0,
                                          sort=False))


def lang_char_moments(sf_dir: str) -> pa.Table:
    """Distributed MOMENTS aggregate: per-language mean and population
    stddev of document length via the classic mergeable moment sums
    (n, Σx, Σx²) — the combiner shape every distributed variance /
    z-score / normalization stage uses (first pass shared with
    doc_zscores via _lang_moments_raw).
    Cancellation caveat: Σx² - (Σx)²/n loses precision when sd/mean is
    tiny at huge n — for 100-TB production use shift by a per-block
    pivot (first value) or a Welford/Chan pairwise merge; at the tested
    scales the direct sums match DuckDB's stddev_pop bit-exactly after
    round(,4). Returns (lang, n_docs, mean_chars, sd_chars)."""
    t = _lang_moments_raw(sf_dir)
    if t.num_rows == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "mean_chars": pa.array([], pa.float64()),
                         "sd_chars": pa.array([], pa.float64())})
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    s1 = t.column("s1").to_numpy(zero_copy_only=False)
    s2 = t.column("s2").to_numpy(zero_copy_only=False)
    mean = s1 / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    out = pa.table({
        "lang": t.column("lang"),
        "n_docs": t.column("n"),
        "mean_chars": pa.array(np.round(mean, 4), pa.float64()),
        "sd_chars": pa.array(np.round(np.sqrt(var), 4), pa.float64()),
    })
    return out.sort_by([("lang", "ascending")])


def doc_zscores(sf_dir: str) -> "ray.data.Dataset":
    """Per-group FEATURE STANDARDIZATION: every document's length
    z-scored against its language's distribution — the normalization
    pass a training pipeline runs before mixing quality signals across
    languages. Two passes, the canonical shape for any broadcast-stats
    transform: (1) the group-count-sized moment exchange
    (_lang_moments_raw — languages number in the hundreds at any corpus
    size, so the stats table always broadcasts); (2) a stateless
    streaming map that attaches (mean, sd_pop) by sorted-key lookup and
    emits z = (x - mean) / sd, NULL where sd == 0 (constant group,
    matching SQL's x / NULLIF(0)). mean is exact (integer sums in
    double), so cross-engine agreement needs only the round(,4) on the
    final ratio. Output is corpus-sized and streams:
    (doc_id, lang, n_chars, z_chars)."""
    t = _lang_moments_raw(sf_dir)
    if t.num_rows == 0:
        langs = np.empty(0, dtype=object)
        means = np.empty(0, dtype=np.float64)
        sds = np.empty(0, dtype=np.float64)
    else:
        langs = np.array(t.column("lang").to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        means = s1 / n
        var = np.maximum(s2 / n - means * means, 0.0)
        sds = np.sqrt(var)
        order = np.argsort(langs)
        langs, means, sds = langs[order], means[order], sds[order]
    stats_ref = ray.put((langs, means, sds))

    def attach_z(b: pa.Table) -> pa.Table:
        langs, means, sds = ray.get(stats_ref)
        bl = np.array(b.column("lang").to_pylist(), dtype=object)
        pos = np.searchsorted(langs, bl) if len(langs) else \
            np.zeros(len(bl), dtype=np.int64)
        pos = np.clip(pos, 0, max(len(langs) - 1, 0))
        if len(langs) and not (langs[pos] == bl).all():
            raise AssertionError("lang missing from moments table")
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sd = sds[pos] if len(langs) else np.zeros(len(bl))
        mean = means[pos] if len(langs) else np.zeros(len(bl))
        zero_sd = sd == 0.0
        z = np.round((x - mean) / np.where(zero_sd, 1.0, sd), 4)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars").cast(pa.int64()),
            "z_chars": pa.array(z, pa.float64(), mask=zero_sd),
        })

    attach_z.__name__ = "AttachZScore"
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    return docs.map_batches(attach_z, batch_format="pyarrow",
                            zero_copy_batch=True)


def _make_chunk_batch(size: int, stride: int):
    """Whole-batch chunk-explode kernel shared by chunk_documents and
    prepare_training_docs — see chunk_documents for the contract."""
    import pyarrow.compute as pc

    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def chunk_batch(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_idx": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        text = b.column("text").combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        nchunks = np.where(lens > 0, (lens - 1) // stride + 1, 0)
        max_i = int(nchunks.max()) if len(nchunks) else 0
        if max_i == 0:
            return empty
        doc_ids = b.column("doc_id")
        parts = []
        for i in range(max_i):
            sel = pa.array(np.flatnonzero(nchunks > i))
            sub = pc.utf8_slice_codeunits(text.take(sel),
                                          start=i * stride,
                                          stop=i * stride + size)
            parts.append(pa.table({
                "doc_id": doc_ids.take(sel),
                "chunk_idx": pa.array(
                    np.full(len(sel), i, dtype=np.int64), pa.int64()),
                "chunk_text": sub,
            }))
        return pa.concat_tables(parts)

    return chunk_batch


def chunk_documents(sf_dir: str, size: int = 512,
                    stride: int = 384) -> "ray.data.Dataset":
    """Context-window CHUNKING — the flat-map explode every pretraining
    pipeline runs before tokenization: each document becomes overlapping
    character windows [i*stride, i*stride + size), i = 0 ..
    floor((len-1)/stride), emitted as (doc_id, chunk_idx, chunk_text);
    empty documents emit no chunks. Stateless single pass, vectorized:
    one Arrow utf8_slice_codeunits kernel per chunk index (the loop is
    bounded by longest-doc/stride, each iteration is whole-batch), no
    per-row Python. Codepoint slicing matches SQL substr character
    semantics exactly, so the DuckDB oracle hashes bit-exact."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_make_chunk_batch(size, stride),
                          batch_format="pyarrow", zero_copy_batch=True)


def _greedy_pack_seq(did: np.ndarray, nch: np.ndarray,
                     budget: int) -> "tuple[np.ndarray, ...]":
    """Single-bucket greedy pack sweep (doc_id order): returns
    (sorted doc_ids, pack seq per doc, sorted weights). A pack always
    takes >= 1 doc; it closes when ADDING the next doc would exceed the
    budget, so an oversized doc gets a singleton pack. Pure function —
    the per-group kernel pack_documents applies per bucket, and the
    property tests drive directly (no Ray needed)."""
    order = np.argsort(did, kind="stable")
    d, w = did[order], nch[order].astype(np.int64)
    cs = np.cumsum(w)
    seq_arr = np.empty(len(d), dtype=np.int64)
    idx, seq, base = 0, 0, np.int64(0)
    while idx < len(d):
        j = int(np.searchsorted(cs, base + budget, side="right"))
        j = max(j, idx + 1)          # oversized doc -> own pack
        seq_arr[idx:j] = seq
        base = cs[j - 1]
        idx, seq = j, seq + 1
    return d, seq_arr, w


def pack_documents(sf_dir: str, budget: int = 2048,
                   bucket_docs: int = 1000) -> "ray.data.Dataset":
    """SEQUENCE PACKING — greedy assignment of documents into fixed-size
    character budgets (the pretraining batching op: concatenate docs
    until the context window is full, then start a new pack).

    Determinism across any cluster width: docs are first bucketed by
    doc_id // bucket_docs (ONE hash exchange), then packed greedily in
    doc_id order WITHIN each bucket — the result is a pure function of
    the data, never of block boundaries. A doc larger than the budget
    gets its own pack. pack_id = bucket * 2^32 + seq-within-bucket.

    The per-group sweep is a loop over PACKS (not rows): each iteration
    is one np.searchsorted on the running cumsum to find how many docs
    fit, so cost is n_packs * O(log n_bucket) with buckets processed in
    parallel. Returns (doc_id, pack_id, n_chars), streamed."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    if budget <= 0 or bucket_docs <= 0:
        raise ValueError("budget and bucket_docs must be positive")

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def add_bucket(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array(did // bucket_docs, pa.int64()))

    def pack_group(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pack_id": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        bucket = b.column("bucket").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        out_did, out_pid, out_nch = [], [], []
        starts, counts = segments(bucket)
        # pack_id = bucket << 32 | seq: a bucket >= 2^31 would wrap the
        # int64 pack_id negative and collide with buckets 2^31 apart
        if int(bucket.max()) >= 2 ** 31:
            raise ValueError(
                "doc_id // bucket_docs >= 2^31 overflows the packed "
                "int64 pack_id; raise bucket_docs for this id range")
        for s, c in zip(starts, counts):
            d, seq_arr, w = _greedy_pack_seq(did[s:s + c], nch[s:s + c],
                                             budget)
            out_did.append(d)
            out_pid.append((bucket[s] << np.int64(32)) + seq_arr)
            out_nch.append(w)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_did), pa.int64()),
            "pack_id": pa.array(np.concatenate(out_pid), pa.int64()),
            "n_chars": pa.array(np.concatenate(out_nch), pa.int64()),
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
    return hash_group_apply(bucketed, ["bucket"], pack_group, 0)


def weighted_sample_docs(sf_dir: str, k: int = 50) -> pa.Table:
    """WEIGHTED SAMPLE WITHOUT REPLACEMENT — Efraimidis-Spirakis A-Res
    (Inf. Proc. Letters 2006): each doc gets key u^(1/w) with w = its
    n_chars weight and u a deterministic uniform from the same Knuth
    multiplicative hash the stratified sampler uses; the global top-k
    keys ARE the weighted sample. Distributed shape: per-batch local
    top-k partial (combiner), driver merges k x n_blocks rows — nothing
    corpus-sized moves, no shuffle, order-independent and reproducible.

    Output is (doc_id, n_chars) of the selected set sorted by doc_id —
    the KEY is not emitted: numpy and DuckDB pow() differ by 1 ulp on
    ~half of values, which would fail the exact hash compare, while the
    selected set itself is stable (boundary gaps are ~1e-5, ten orders
    above ulp noise)."""
    from nise_ray.util import collect_table

    def key_of(did: np.ndarray, nch: np.ndarray) -> np.ndarray:
        u = (_sample_key(did) + 1) / float(SAMPLE_MOD + 1)
        return np.power(u, 1.0 / np.maximum(nch, 1))

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        key = key_of(did, nch)
        keep = min(k, len(did))
        # top-k by (key DESC, doc_id ASC)
        top = np.lexsort((did, -key))[:keep]
        return pa.table({"doc_id": pa.array(did[top], pa.int64()),
                         "n_chars": pa.array(nch[top], pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    part = collect_table(ds.map_batches(local_topk, batch_format="pyarrow",
                                        zero_copy_batch=True))
    # final merge: recompute keys on the k x n_blocks partial rows
    return local_topk(part).sort_by([("doc_id", "ascending")])


def length_histogram(sf_dir: str, bucket_width: int = 100) -> pa.Table:
    """Equi-width HISTOGRAM of document length per language —
    (lang, bucket_lo, n_docs) with bucket_lo = (n_chars // width) *
    width. Fixed-width buckets keep it one-pass combiner-shaped (a
    min/max-scaled histogram would need a second pass): every block
    reduces to its own (lang, bucket) counts, one group-count-sized
    exchange merges. SQL-oracled exactly (integer floor division both
    engines)."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    _EMPTY = pa.table({"lang": pa.array([], pa.string()),
                       "bucket_lo": pa.array([], pa.int64()),
                       "n_docs": pa.array([], pa.int64())})

    def _sum_counts(lang_arr, blo: np.ndarray, n: np.ndarray) -> pa.Table:
        enc = lang_arr.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        wide = codes * np.int64(2 ** 40) + blo   # bucket_lo < 2^40 chars
        order = np.lexsort((blo, codes))
        starts, _ = segments(wide[order])
        sel = order[starts]
        return pa.table({
            "lang": enc.take(pa.array(sel)).cast(pa.string()),
            "bucket_lo": pa.array(blo[sel], pa.int64()),
            "n_docs": pa.array(np.add.reduceat(n[order], starts),
                               pa.int64()),
        })

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        blo = (nch // bucket_width) * bucket_width
        return _sum_counts(b.column("lang"), blo.astype(np.int64),
                           np.ones(b.num_rows, np.int64))

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        return _sum_counts(
            b.column("lang"),
            b.column("bucket_lo").to_numpy(zero_copy_only=False),
            b.column("n_docs").to_numpy(zero_copy_only=False))

    t = collect_table(hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["lang"], merge, 0, sort=False))
    return t.sort_by([("lang", "ascending"), ("bucket_lo", "ascending")])


def value_time_correlation(sf_dir: str) -> pa.Table:
    """Grouped PEARSON CORRELATION via mergeable cross-moment sums — per
    event_type, corr(value, second-of-day): the drift/seasonality probe
    an event pipeline runs per segment. Combiner shape: each block emits
    one (type, n, Σx, Σy, Σxy, Σx², Σy²) row per type it saw, one
    group-count-sized exchange merges them, the driver finishes the
    closed form r = (nΣxy − ΣxΣy) / sqrt((nΣx²−Σx²)(nΣy²−Σy²)).
    Same cancellation caveat as lang_char_moments (x is bounded in
    [0, 86400) so the direct sums are well-conditioned here; shift by a
    per-block pivot for unbounded x at 100 TB). Returns
    (event_type, n_events, corr_value_tod) rounded to 4."""
    import ray as _ray

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = _ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_type", "ts", "value"])
    DAY_US = 86_400_000_000
    # ne = count(*) rows; n..syy accumulate only NULL-free (x, y) pairs,
    # matching SQL corr()'s NULL-pair skipping while n_events stays count(*)
    COLS = ("ne", "n", "sx", "sy", "sxy", "sxx", "syy")
    _EMPTY = pa.table({"event_type": pa.array([], pa.string()),
                       **{c: pa.array([], pa.float64()) for c in COLS}})

    def _sum_by_type(et: pa.ChunkedArray, vals: "dict[str, np.ndarray]"):
        enc = et.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, _ = segments(codes[order])
        return pa.table({
            "event_type": enc.take(pa.array(order[starts])).cast(pa.string()),
            **{c: pa.array(np.add.reduceat(vals[c][order], starts),
                           pa.float64()) for c in COLS},
        })

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # np.fmod = sign-of-dividend remainder, matching SQL's % on
        # BIGINT for pre-epoch (negative) timestamps; numpy's % is
        # floored and would silently diverge from the oracle there
        x = np.fmod(ts, DAY_US).astype(np.float64) / 1e6
        y = b.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64)
        valid = ~np.isnan(y)  # corr() skips NULL pairs; count(*) doesn't
        xv = np.where(valid, x, 0.0)
        yv = np.where(valid, y, 0.0)
        return _sum_by_type(b.column("event_type"), {
            "ne": np.ones(b.num_rows, np.float64),
            "n": valid.astype(np.float64), "sx": xv, "sy": yv,
            "sxy": xv * yv, "sxx": xv * xv, "syy": yv * yv})

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        return _sum_by_type(b.column("event_type"), {
            c: b.column(c).to_numpy(zero_copy_only=False) for c in COLS})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    t = collect_table(hash_group_apply(partials, ["event_type"], merge, 0,
                                       sort=False))
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "corr_value_tod": pa.array([], pa.float64())})
    v = {c: t.column(c).to_numpy(zero_copy_only=False) for c in COLS}
    num = v["n"] * v["sxy"] - v["sx"] * v["sy"]
    den = np.sqrt(np.maximum(v["n"] * v["sxx"] - v["sx"] ** 2, 0.0)
                  * np.maximum(v["n"] * v["syy"] - v["sy"] ** 2, 0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where(den > 0, num / den, np.nan)
    out = pa.table({
        "event_type": t.column("event_type"),
        "n_events": pa.array(v["ne"].astype(np.int64), pa.int64()),
        "corr_value_tod": pa.array(np.round(r, 4), pa.float64()),
    })
    return out.sort_by([("event_type", "ascending")])


def prepare_training_docs(sf_dir: str, min_chars: int = 100,
                          min_alpha_pct: int = 50, size: int = 512,
                          stride: int = 384,
                          broadcast_max: int = 50_000_000,
                          run_dir: "str | None" = None,
                          resume: bool = False
                          ) -> "ray.data.Dataset":
    """COMPOSED training-corpus prep pipeline — the end-to-end flow a
    pretraining data team actually runs, as ONE streaming Dataset plan:

        quality filter  ->  exact dedup (keep min doc_id)  ->  chunking

    1. quality gate: codepoint length >= min_chars AND alpha chars make
       up >= min_alpha_pct% — both tested as INTEGER inequalities
       (n_alpha*100 >= pct*n_chars) so the oracle comparison has no FP
       boundary;
    2. exact dedup over the SURVIVORS: sha256 prefix exchange (ids +
       digests only — the text column never rides the shuffle), min
       doc_id per digest group becomes the keep-list, applied back to
       the filtered stream via a broadcast-gated id filter (distributed
       semi-join past `broadcast_max`);
    3. chunk explode (shared `_make_chunk_batch` kernel) over the kept
       docs -> (doc_id, chunk_idx, chunk_text).

    Every stage is the already-oracled primitive (quality_scores,
    exact_dedup_docs, chunk_documents); this op verifies their
    COMPOSITION end-to-end against one DuckDB query."""
    import pyarrow.compute as pc

    import ray as _ray

    from nise_ray.checkpoint import ParamsConfig, RunContext
    from nise_ray.ops.dedupx import _exact_group_batch, _sha_prep_batch
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.pipeline import _stage
    from nise_ray.util import collect_table

    # run_dir enables per-stage checkpoints (survivors + chunks) with
    # the same resume/_SUCCESS/params-hash contract as curate_corpus
    ctx = None
    if run_dir is not None:
        ctx = RunContext(run_dir, ParamsConfig(
            op="prepare_training_docs", sf_dir=sf_dir,
            min_chars=min_chars, min_alpha_pct=min_alpha_pct, size=size,
            stride=stride, broadcast_max=broadcast_max), resume=resume)

    def quality_filter(b: pa.Table) -> pa.Table:
        text = b.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (n_chars >= min_chars) & \
               (n_alpha * 100 >= min_alpha_pct * n_chars)
        return b.take(pa.array(np.flatnonzero(keep)))

    def filtered() -> "_ray.data.Dataset":
        ds = _ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["doc_id", "text"])
        return ds.map_batches(quality_filter, batch_format="pyarrow",
                              zero_copy_batch=True)

    def build_kept() -> "_ray.data.Dataset":
        # keep-list: min doc_id per distinct surviving text (ids only)
        prepped = filtered().map_batches(_sha_prep_batch,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
        groups = hash_group_apply(prepped, ["d0"],
                                  _exact_group_batch).materialize()
        n_keep = groups.count()
        if n_keep <= broadcast_max:
            keep_t = collect_table(groups)
            keep_ids = np.sort(keep_t.column("rep_doc_id").to_numpy(
                zero_copy_only=False)) if keep_t.num_rows else \
                np.empty(0, np.int64)
            keep_ref = ray.put(keep_ids)

            def keep_filter(b: pa.Table) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                kept_ids = ray.get(keep_ref)
                if len(kept_ids) == 0:
                    return b.slice(0, 0)
                pos = np.clip(np.searchsorted(kept_ids, ids), 0,
                              len(kept_ids) - 1)
                return b.take(pa.array(
                    np.flatnonzero(kept_ids[pos] == ids)))

            return filtered().map_batches(keep_filter,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
        # distributed semi-join on doc_id (keep-list is corpus-scale:
        # one distinct text per group survives)
        from nise_ray.ops.relational import (_hash_shuffle_on,
                                             _join_partitions)
        keys = groups.map_batches(
            lambda b: pa.table({"doc_id": b.column("rep_doc_id")}),
            batch_format="pyarrow")
        docs = filtered()
        _hash_shuffle_on(docs, keys)
        from nise_ray.ops.groupapply import join_input
        keys = join_input(keys)  # sparse side: see groupapply
        return docs.join(keys, join_type="inner", on=("doc_id",),
                         num_partitions=_join_partitions())

    if ctx is None:
        # default path stays ONE streaming plan (the documented
        # contract): survivors flow straight into the chunk explode
        # with no materialization barrier
        return build_kept().map_batches(
            _make_chunk_batch(size, stride), batch_format="pyarrow",
            zero_copy_batch=True)

    _KEPT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("text", pa.string())])
    kept, _ = _stage(ctx, "prep_kept", build_kept, _KEPT_SCHEMA)

    _OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("chunk_idx", pa.int64()),
                             ("chunk_text", pa.string())])
    out, _ = _stage(ctx, "prep_out", lambda: kept.map_batches(
        _make_chunk_batch(size, stride), batch_format="pyarrow",
        zero_copy_batch=True), _OUT_SCHEMA)
    return out


def lang_char_skewkurt(sf_dir: str) -> pa.Table:
    """HIGHER-MOMENT aggregates: per-language sample skewness and excess
    kurtosis of document length from mergeable raw power sums
    (n, Σx, Σx², Σx³, Σx⁴) — the 3rd/4th-moment extension of the
    lang_char_moments combiner, matching DuckDB's bias-corrected G1/G2
    estimators (verified formula fit: G1 = g1·sqrt(n(n-1))/(n-2),
    G2 = ((n+1)g2 + 6)(n-1)/((n-2)(n-3)) on the central moments derived
    from the power sums). Same cancellation caveat as the 2nd-moment op;
    round(,4) absorbs summation-order noise. NULL where the corrections
    are undefined (n < 3 for skew, n < 4 for kurtosis) or the group is
    constant. Returns (lang, n_docs, skew_chars, kurt_chars)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    from nise_ray.ops.groupapply import segments
    from nise_ray.util import collect_table

    cols = ["n", "s1", "s2", "s3", "s4"]
    _EMPTY = pa.table({"lang": pa.array([], pa.string()),
                       **{c: pa.array([], pa.int64() if c == "n"
                                      else pa.float64()) for c in cols}})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        x = b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        enc = b.column("lang").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, _ = segments(codes[order])
        xo = x[order]
        vals = {"n": np.add.reduceat(np.ones(len(x), np.int64), starts)}
        p = xo.copy()
        for c in ("s1", "s2", "s3", "s4"):
            vals[c] = np.add.reduceat(p, starts)
            p = p * xo
        return pa.table({
            "lang": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n": pa.array(vals["n"], pa.int64()),
            **{c: pa.array(vals[c], pa.float64())
               for c in ("s1", "s2", "s3", "s4")}})

    partials = collect_table(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "skew_chars": pa.array([], pa.float64()),
                         "kurt_chars": pa.array([], pa.float64())})
    # group-count-sized driver merge (lexicographic lang order)
    langs = np.asarray(partials.column("lang").to_pylist(), dtype=object)
    order = np.argsort(langs, kind="stable")
    starts, _ = segments(
        np.unique(langs, return_inverse=True)[1][order])
    merged = {c: np.add.reduceat(
        partials.column(c).to_numpy(zero_copy_only=False)[order], starts)
        for c in cols}
    n = merged["n"].astype(np.float64)
    mean = merged["s1"] / n
    with np.errstate(invalid="ignore", divide="ignore"):
        m2 = merged["s2"] / n - mean ** 2
        m3 = merged["s3"] / n - 3 * mean * merged["s2"] / n + 2 * mean ** 3
        m4 = (merged["s4"] / n - 4 * mean * merged["s3"] / n
              + 6 * mean ** 2 * merged["s2"] / n - 3 * mean ** 4)
        g1 = m3 / m2 ** 1.5
        G1 = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2 ** 2 - 3.0
        G2 = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
    skew_ok = (merged["n"] >= 3) & (m2 > 0)
    kurt_ok = (merged["n"] >= 4) & (m2 > 0)
    return pa.table({
        "lang": pa.array(langs[order][starts].astype(object), pa.string()),
        "n_docs": pa.array(merged["n"], pa.int64()),
        "skew_chars": pa.array(np.round(G1, 4), pa.float64(),
                               mask=~skew_ok),
        "kurt_chars": pa.array(np.round(G2, 4), pa.float64(),
                               mask=~kurt_ok),
    })


def lang_doc_share(sf_dir: str) -> pa.Table:
    """RATIO-TO-REPORT window (value / SUM(value) OVER ()): each
    language's share of the corpus — the percent-of-total attach every
    mixture-weighting pipeline computes before sampling. Counts are
    exact int64, so the share is ONE double division of exact integers
    and hashes bit-exact cross-engine with no rounding.

    Plan: per-block language counts (combiner, group-count-sized
    partials), a driver merge, and the grand total from the same
    partials — zero exchanges; the window 'partition' is the whole
    relation, so the total is a scalar broadcast by construction.
    Returns (lang, n_docs, share) sorted by lang."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang"])
    from nise_ray.ops.groupapply import segments
    from nise_ray.util import collect_table

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = b.column("lang").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        starts, counts = segments(codes[order])
        return pa.table({
            "lang": enc.take(pa.array(order[starts])).cast(pa.string()),
            "n": pa.array(counts, pa.int64())})

    partials = collect_table(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True))
    if partials.num_rows == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "share": pa.array([], pa.float64())})
    langs = np.asarray(partials.column("lang").to_pylist(), dtype=object)
    n = partials.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(langs, kind="stable")
    starts, _ = segments(np.unique(langs, return_inverse=True)[1][order])
    merged = np.add.reduceat(n[order], starts)
    total = merged.sum()
    return pa.table({
        "lang": pa.array(langs[order][starts].astype(object), pa.string()),
        "n_docs": pa.array(merged, pa.int64()),
        "share": pa.array(merged.astype(np.float64) / total, pa.float64()),
    })


def user_value_trend(sf_dir: str) -> pa.Table:
    """Grouped LINEAR REGRESSION (regr_slope / regr_intercept): per
    user, the least-squares trend of event value over second-of-day —
    the drift detector a metrics pipeline fits per segment, and the
    regression-family completion of value_time_correlation (same
    mergeable cross-moment sums, one fewer power). Combiner shape: each
    block emits (user, n, Σx, Σy, Σxy, Σx²) rows, one user exchange
    merges them, the driver closes slope = (nΣxy−ΣxΣy)/(nΣx²−Σx²) and
    intercept = ȳ − slope·x̄ (DuckDB's formulas, verified to 1e-15;
    round(,4) heals summation order). x is bounded in [0, 86400) so the
    direct sums stay well-conditioned. NULL pairs are skipped like
    SQL's regr_*; NULL slope/intercept for degenerate (constant-x or
    n<2) groups. Returns (user_id, n_pairs, slope, intercept)."""
    import ray as _ray

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = _ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    DAY_US = 86_400_000_000
    COLS = ("n", "sx", "sy", "sxy", "sxx")
    _EMPTY = pa.table({"user_id": pa.array([], pa.int64()),
                       **{c: pa.array([], pa.float64()) for c in COLS}})

    def _sum_by_user(uid: np.ndarray, vals: "dict[str, np.ndarray]"):
        order = np.argsort(uid, kind="stable")
        starts, _ = segments(uid[order])
        return pa.table({
            "user_id": pa.array(uid[order][starts], pa.int64()),
            **{c: pa.array(np.add.reduceat(vals[c][order], starts),
                           pa.float64()) for c in COLS},
        })

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = np.fmod(ts, DAY_US).astype(np.float64) / 1e6
        y = b.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        valid = ~np.isnan(y)
        xv = np.where(valid, x, 0.0)
        yv = np.where(valid, y, 0.0)
        return _sum_by_user(uid, {
            "n": valid.astype(np.float64), "sx": xv, "sy": yv,
            "sxy": xv * yv, "sxx": xv * xv})

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        return _sum_by_user(
            b.column("user_id").to_numpy(zero_copy_only=False),
            {c: b.column(c).to_numpy(zero_copy_only=False) for c in COLS})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    t = collect_table(hash_group_apply(partials, ["user_id"], merge, 0,
                                       sort=False))
    if t.num_rows == 0 or "user_id" not in t.schema.names:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64()),
                         "slope": pa.array([], pa.float64()),
                         "intercept": pa.array([], pa.float64())})
    v = {c: t.column(c).to_numpy(zero_copy_only=False) for c in COLS}
    den = v["n"] * v["sxx"] - v["sx"] ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(den > 0,
                         (v["n"] * v["sxy"] - v["sx"] * v["sy"]) / den,
                         np.nan)
        intercept = np.where(den > 0,
                             v["sy"] / v["n"] - slope * v["sx"] / v["n"],
                             np.nan)
    out = pa.table({
        "user_id": t.column("user_id"),
        "n_pairs": pa.array(v["n"].astype(np.int64), pa.int64()),
        "slope": pa.array(np.round(slope, 4), pa.float64()),
        "intercept": pa.array(np.round(intercept, 4), pa.float64()),
    })
    return out.sort_by([("user_id", "ascending")])


def user_event_entropy(sf_dir: str) -> pa.Table:
    """Grouped CATEGORICAL ENTROPY: per user, the Shannon entropy (log2)
    of their event-type mix — the behavioral-diversity signal (0 = one
    event type, log2(k) = uniform over k types), matching DuckDB's
    entropy() aggregate. Combiner shape: per-block (user, type) counts
    (distinct-pair-bounded partials), one user exchange, per-segment
    H = log2(n) − Σ c·log2(c) / n — exact integer counts into one
    closed form, round(,4) for cross-engine log noise. Returns
    (user_id, n_events, type_entropy)."""
    import ray as _ray

    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = _ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["user_id", "event_type"])
    _EMPTY = pa.table({"user_id": pa.array([], pa.int64()),
                       "event_type": pa.array([], pa.string()),
                       "cnt": pa.array([], pa.int64())})

    def pair_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        et = b.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, uid))
        su, sc = uid[order], codes[order]
        change = np.empty(len(order), dtype=bool)
        change[0] = True
        change[1:] = (su[1:] != su[:-1]) | (sc[1:] != sc[:-1])
        starts = np.flatnonzero(change)
        cnt = np.diff(np.append(starts, len(order)))
        return pa.table({
            "user_id": pa.array(su[starts], pa.int64()),
            "event_type": et.dictionary.take(pa.array(sc[starts]))
            .cast(pa.string()),
            "cnt": pa.array(cnt, pa.int64())})

    def entropy_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "type_entropy": pa.array([], pa.float64())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        et = b.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, uid))
        su, sc, scnt = uid[order], codes[order], cnt[order]
        # merge split partials of the same (user, type) first
        change = np.empty(len(order), dtype=bool)
        change[0] = True
        change[1:] = (su[1:] != su[:-1]) | (sc[1:] != sc[:-1])
        pstarts = np.flatnonzero(change)
        c = np.add.reduceat(scnt, pstarts).astype(np.float64)
        pu = su[pstarts]
        ustarts, _ = segments(pu)
        n = np.add.reduceat(c, ustarts)
        clog = np.add.reduceat(c * np.log2(c), ustarts)
        h = np.log2(n) - clog / n
        return pa.table({
            "user_id": pa.array(pu[ustarts], pa.int64()),
            "n_events": pa.array(n.astype(np.int64), pa.int64()),
            "type_entropy": pa.array(np.round(h, 4), pa.float64())})

    partials = ds.map_batches(pair_counts, batch_format="pyarrow",
                              zero_copy_batch=True)
    t = collect_table(hash_group_apply(partials, ["user_id"],
                                       entropy_merge, 0, sort=False))
    if t.num_rows == 0 or "user_id" not in t.schema.names:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "type_entropy": pa.array([], pa.float64())})
    return t.sort_by([("user_id", "ascending")])


def event_anomaly_days(sf_dir: str, z_thresh: float = 2.0) -> pa.Table:
    """Daily-volume anomaly detection: every day's event count z-scored
    against the global daily distribution, with days beyond z_thresh
    population-sigmas flagged — the ops-telemetry sweep a pipeline runs
    over its own ingest volumes.

    Scale shape: per-block (day, count) partials (days-sized, the
    combiner pattern), one driver merge over |days| rows, moments from
    the daily counts on the driver (|days| is bounded by calendar time,
    never data size). Returns (day, n_events, z, is_anomaly) sorted."""
    from nise_ray.ops.groupapply import segments
    from nise_ray.util import collect_table

    day_us = 86_400_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        day = b.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // day_us
        order = np.argsort(day, kind="stable")
        starts, counts = segments(day[order])
        return pa.table({"day": pa.array(day[order][starts], pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    day_partial.__name__ = "DailyCountPartial"
    partials = collect_table(ds.map_batches(
        day_partial, batch_format="pyarrow", zero_copy_batch=True))
    empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                      "n_events": pa.array([], pa.int64()),
                      "z": pa.array([], pa.float64()),
                      "is_anomaly": pa.array([], pa.bool_())})
    if partials.num_rows == 0:
        return empty
    day = partials.column("day").to_numpy(zero_copy_only=False)
    n = partials.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(day, kind="stable")
    starts, _ = segments(day[order])
    days = day[order][starts]
    counts = np.add.reduceat(n[order], starts)
    cf = counts.astype(np.float64)
    m = cf.sum() / len(cf)
    sd = np.sqrt(np.maximum((cf * cf).sum() / len(cf) - m * m, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(sd > 0, (cf - m) / sd, 0.0)
    # sd == 0 (constant daily volume) -> NULL z, matching SQL NULLIF
    null_mask = np.full(len(cf), sd == 0.0)
    return pa.table({
        "day": pa.array(days * day_us).cast(pa.timestamp("us")),
        "n_events": pa.array(counts, pa.int64()),
        "z": pa.array(np.round(z, 4), pa.float64(), mask=null_mask),
        "is_anomaly": pa.array(np.abs(cf - m) > z_thresh * sd, pa.bool_()),
    })
