"""Dedup operators specialised for the `documents` table — the
training-data-pipeline surface (exact / MinHash-LSH / SimHash /
n-gram-Jaccard dedup), re-using the corpus engine via the
documents→corpus adapter.

Scale discipline (round-2 rewrite): no `groupby(text)` (full-text shuffle
keys), no driver-side collection of corpus-sized tables, no per-row path
parsing. `doc_id` rides through the engine as a passthrough column
(io.corpus_from_documents / ops.sign), exact dedup shuffles on the 64-bit
sha prefix with full-digest verification inside segments, and doc_key→
doc_id mapping is a scale-gated broadcast lookup with a distributed-join
fallback (same pattern as ops.components.attach_labels).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64
from nise_ray.io import corpus_from_documents
from nise_ray.pipeline import dedup_pipeline


def _sha_prep_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, d0..d3): the full sha256 digest split
    into four uint64 words — segment comparison downstream is then pure
    numpy (full 256-bit equality, no string columns in the shuffle)."""
    texts = b.column("text").to_pylist()
    n = len(texts)
    words = np.empty((n, 4), dtype=U64)
    for i, t in enumerate(texts):
        words[i] = np.frombuffer(hashlib.sha256(t.encode()).digest(), dtype="<u8")
    return pa.table({
        "doc_id": b.column("doc_id"),
        "d0": pa.array(words[:, 0], pa.uint64()),
        "d1": pa.array(words[:, 1], pa.uint64()),
        "d2": pa.array(words[:, 2], pa.uint64()),
        "d3": pa.array(words[:, 3], pa.uint64()),
    })


def _exact_group_batch(batch: pa.Table) -> pa.Table:
    """Per hash-partition block (complete d0 groups co-located): order by
    the FULL digest, find equal-digest runs, emit (rep_doc_id = min doc_id,
    n_dups = run length) — one vectorized pass, zero per-group Python."""
    if batch.num_rows == 0:
        return pa.table({"rep_doc_id": pa.array([], pa.int64()),
                         "n_dups": pa.array([], pa.int64())})
    d = [batch.column(c).to_numpy(zero_copy_only=False).astype(U64)
         for c in ("d0", "d1", "d2", "d3")]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((d[3], d[2], d[1], d[0]))
    sd = [x[order] for x in d]
    n = len(order)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or.reduce([sd_i[1:] != sd_i[:-1] for sd_i in sd], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    reps = np.minimum.reduceat(ids[order], starts)
    return pa.table({
        "rep_doc_id": pa.array(reps, pa.int64()),
        "n_dups": pa.array(counts, pa.int64()),
    })


def exact_dedup_documents(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup groups: (rep_doc_id, n_dups) — one row per distinct
    text, representative = min doc_id. Hash-partition on the 64-bit sha
    prefix (cheap uint64 shuffle key — never the text itself), full-digest
    equality verified vectorized inside each segment."""
    from nise_ray.ops.groupapply import hash_group_apply
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    prepped = ds.map_batches(_sha_prep_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    return hash_group_apply(prepped, ["d0"], _exact_group_batch)


def minhash_dedup_documents(sf_dir: str, cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """Near-dup clustering of documents: (doc_id, cluster_size) via the
    full corpus engine over the adapted documents table. cluster ids are
    internal doc_keys, so the stable output is per-doc cluster size —
    computed with ONE hash exchange on cluster_id (nothing corpus-sized
    reaches the driver)."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    cfg = cfg or DedupConfig()
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    assigns = res.assignments.select_columns(["doc_id", "cluster_id"])

    def size_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_size": pa.array([], pa.int64())})
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        starts, counts = segments(cl)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_size": pa.array(np.repeat(counts, counts), pa.int64()),
        })

    # no output sort: the ROW SET is deterministic (one row per doc) and
    # a corpus-sized global sort would be a pure-cosmetics all-to-all at
    # 10^12 rows; consumers sort slices as needed
    return hash_group_apply(assigns, ["cluster_id"], size_batch)


def simhash_documents(sf_dir: str, cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """(doc_id, simhash_hex) fingerprints for every document — doc_id is
    the passthrough column, projected vectorized from the signed table."""
    cfg = cfg or DedupConfig()
    from nise_ray.ops.sign import make_sign_fn
    corpus = corpus_from_documents(sf_dir)
    signed = corpus.map_batches(make_sign_fn(cfg), batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=cfg.batch_size)

    def project(b: pa.Table) -> pa.Table:
        sh = b.column("simhash").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash_hex": pa.array([f"{int(x):016x}" for x in sh], pa.string()),
        })

    return signed.map_batches(project, batch_format="pyarrow")


def simhash_sha_docs(sf_dir: str, w: int = 3) -> "ray.data.Dataset":
    """(doc_id, simhash_hex) SimHash fingerprints over sha256-derived
    w-gram shingle hashes — the externally ORACLE-ABLE member of the
    SimHash family. The production simhash_documents fingerprint rides
    the pinned blake2b+poly_fold shingle hash (fast, config-frozen, but
    not expressible in SQL); this variant swaps ONLY the shingle hash
    for ``sha256(space-joined w-gram)[:8] big-endian`` — a function
    DuckDB computes verbatim — and reuses the identical vectorized
    majority kernel (hashing.simhash_from_shingles), so the bit-count
    majority logic itself is what the oracle checks end-to-end
    (bit j set iff 2 * popcount_j > n_shingles over the DISTINCT
    shingle set; docs with < w tokens fingerprint to 0).

    Scale: stateless vectorized map, no exchange."""
    from nise_ray.hashing import simhash_from_shingles
    from nise_ray.ops.normalize import batch_sha_ngram_hashes

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        flat, offs = batch_sha_ngram_hashes(b.column("text"), w)
        sh = simhash_from_shingles(flat, offs)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash_hex": pa.array([f"{int(x):016x}" for x in sh],
                                    pa.string()),
        })

    return docs.map_batches(fp, batch_format="pyarrow",
                            zero_copy_batch=True)


def ngram_jaccard_exact_pairs(sf_dir: str, w: int = 3, tau: float = 0.5,
                              **modes) -> pa.Table:
    """All document pairs with EXACT w-gram-shingle Jaccard >= tau, as
    (doc_id_u, doc_id_v, n_inter, n_union) over each doc's DISTINCT
    shingle set — the exact, fully-SQL-oracle-able counterpart of the
    LSH-candidate ngram_jaccard_pairs (whose `est` is a signature
    agreement fraction, not SQL-expressible).

    Plan: the whole prefix-filtered self-join machinery
    (simjoin.token_jaccard_pairs — df combiner exchange, rarest-first
    prefix explode, per-shingle candidate buckets with the size filter,
    mode-gated exact verify) parameterized with sha_ngram units, so the
    skew/scale story is inherited unchanged: hot boilerplate shingles
    get high df and never enter a prefix."""
    from nise_ray.ops.simjoin import token_jaccard_pairs

    return token_jaccard_pairs(sf_dir, tau=tau,
                               units=f"sha_ngram_{w}", **modes)


def _doc_id_mapper(assigns: "ray.data.Dataset", cfg: DedupConfig):
    """Broadcast (doc_key -> doc_id) lookup built ONCE via ray.put (scale-
    gated on cfg.broadcast_label_max, mirroring attach_labels); returns a
    map_batches class that maps u/v columns vectorized."""
    from nise_ray.util import collect_table
    t = collect_table(assigns.select_columns(["doc_key", "doc_id"]))
    keys = t.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    vals = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    class PairMapper:
        def __init__(self) -> None:
            self.keys, self.vals = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"doc_id_u": pa.array([], pa.int64()),
                                 "doc_id_v": pa.array([], pa.int64()),
                                 "est": pa.array([], pa.float32())})
            u = b.column("u").to_numpy(zero_copy_only=False).astype(U64)
            v = b.column("v").to_numpy(zero_copy_only=False).astype(U64)
            iu = np.clip(np.searchsorted(self.keys, u), 0, len(self.keys) - 1)
            iv = np.clip(np.searchsorted(self.keys, v), 0, len(self.keys) - 1)
            # every edge endpoint MUST exist in the assignments table; a
            # silent nearest-neighbor mapping would corrupt pair ids
            if not ((self.keys[iu] == u).all() and (self.keys[iv] == v).all()):
                missing = int((self.keys[iu] != u).sum() + (self.keys[iv] != v).sum())
                raise AssertionError(
                    f"{missing} edge endpoints missing from doc_key->doc_id map")
            du = self.vals[iu]
            dv = self.vals[iv]
            return pa.table({
                "doc_id_u": pa.array(np.minimum(du, dv), pa.int64()),
                "doc_id_v": pa.array(np.maximum(du, dv), pa.int64()),
                "est": b.column("est"),
            })

    return PairMapper


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.7,
                        cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """Verified near-dup pairs (doc_id_u, doc_id_v, est) between documents
    — the n-gram-Jaccard dedup surface (LSH candidates, signature-verified
    at threshold tau). doc_key -> doc_id mapping is a broadcast lookup
    under the scale gate and a two-sided distributed join beyond it."""
    from nise_ray.ops.groupapply import default_concurrency
    cfg = cfg or DedupConfig(tau=tau)
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    if not res.stats.get("n_edges"):
        # empty edge set: nothing to map (and an all-empty join side
        # would hit Ray's schema-broadcast loss — see join_input)
        return ray.data.from_arrow(pa.table({
            "doc_id_u": pa.array([], pa.int64()),
            "doc_id_v": pa.array([], pa.int64()),
            "est": pa.array([], pa.float32())}))
    edges = res.edges.select_columns(["u", "v", "est"])
    assigns = res.assignments

    n_docs = res.stats.get("n_docs") or assigns.count()
    if n_docs <= cfg.broadcast_label_max:
        mapper = _doc_id_mapper(assigns, cfg)
        mapped = edges.map_batches(mapper, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   concurrency=default_concurrency())
    else:
        # distributed fallback: two hash joins attach each endpoint's
        # doc_id (keymaps pre-renamed so the output column names are
        # deterministic, no suffix guessing)
        from nise_ray.ops.groupapply import default_partitions
        np_ = default_partitions(0)

        def ren(b: pa.Table, key: str, val: str) -> "pa.Table":
            return b.rename_columns([key, val])

        keymap = assigns.select_columns(["doc_key", "doc_id"])
        km_u = keymap.map_batches(lambda b: ren(b, "u", "du"),
                                  batch_format="pyarrow")
        km_v = keymap.map_batches(lambda b: ren(b, "v", "dv"),
                                  batch_format="pyarrow")
        from nise_ray.ops.groupapply import join_input
        edges, km_u, km_v = (join_input(edges), join_input(km_u),
                             join_input(km_v))  # sparse sides
        j1 = edges.join(km_u, join_type="inner", num_partitions=np_, on=("u",))
        j2 = join_input(j1).join(km_v, join_type="inner",
                                 num_partitions=np_, on=("v",))

        def finish(b: pa.Table) -> pa.Table:
            du = b.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
            dv = b.column("dv").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "doc_id_u": pa.array(np.minimum(du, dv), pa.int64()),
                "doc_id_v": pa.array(np.maximum(du, dv), pa.int64()),
                "est": b.column("est"),
            })

        mapped = j2.map_batches(finish, batch_format="pyarrow")
    # no output sort: the pair SET is deterministic; a global sort on the
    # output is pure cosmetics (consumers sort slices as needed)
    return mapped


def dedup_rate_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-SOURCE exact-duplicate rate: (source, n_docs, n_distinct,
    dup_rate) — the dedup health readout a corpus-intake pipeline
    publishes per provider (which crawl/source ships the most exact
    copies). dup_rate = 1 - n_distinct/n_docs is one double division of
    exact int64 counts, so the oracle comparison is bit-exact.

    Plan: each block collapses to distinct (source, sha256) pairs plus
    its row count per source (combiner — the exchange carries at most
    |distinct pairs| rows, never corpus rows; full 32-byte digests ride
    as fixed-size binary, hex only in SQL); ONE hash exchange on source
    finishes distinct counts per segment. Same shape as the engine's
    exact-dup grouper, reread as an aggregate."""
    import hashlib

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    _EMPTY = pa.table({"source": pa.array([], pa.string()),
                       "sha": pa.array([], pa.binary(32)),
                       "cnt": pa.array([], pa.int64())})

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        texts = b.column("text").to_pylist()
        shas = np.array([hashlib.sha256(t.encode()).digest()
                         for t in texts], dtype=object)
        src = b.column("source").combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((shas, codes))
        sc, ss = codes[order], shas[order]
        change = np.empty(len(order), dtype=bool)
        change[0] = True
        change[1:] = (sc[1:] != sc[:-1]) | (ss[1:] != ss[:-1])
        starts = np.flatnonzero(change)
        cnt = np.diff(np.append(starts, len(order)))
        return pa.table({
            "source": src.dictionary.take(pa.array(sc[starts]))
            .cast(pa.string()),
            "sha": pa.array(list(ss[starts]), pa.binary(32)),
            "cnt": pa.array(cnt, pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "dup_rate": pa.array([], pa.float64())})
        src = batch.column("source").combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        shas = np.array(batch.column("sha").to_pylist(), dtype=object)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((shas, codes))
        sc, ss, scnt = codes[order], shas[order], cnt[order]
        pair_first = np.empty(len(order), dtype=bool)
        pair_first[0] = True
        pair_first[1:] = (sc[1:] != sc[:-1]) | (ss[1:] != ss[:-1])
        starts, _ = segments(sc)
        n_docs = np.add.reduceat(scnt, starts)
        n_distinct = np.add.reduceat(pair_first.astype(np.int64), starts)
        dup = 1.0 - n_distinct.astype(np.float64) / n_docs
        return pa.table({
            "source": src.dictionary.take(pa.array(sc[starts]))
            .cast(pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_rate": pa.array(dup, pa.float64())})

    pre = ds.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return hash_group_apply(pre, ["source"], finish, 0, sort=False)


def chunk_dedup_docs(sf_dir: str, size: int = 48) -> "ray.data.Dataset":
    """Cross-corpus CHUNK-level dedup with reassembly — the C4/FineWeb
    'drop repeated spans' op expressed over fixed NON-overlapping
    character windows: each document is cut into size-char windows
    [i*size, (i+1)*size); a window is KEPT iff it is the globally FIRST
    occurrence of its text (lexicographic min (doc_id, chunk_idx) over
    all equal windows); each document is reassembled as the in-order
    concatenation of its kept windows. Output one row per input doc
    (docs whose every window is a duplicate keep an empty text):
    (doc_id, text, n_chunks, n_kept), bit-comparable to the DuckDB
    substr/row_number/string_agg oracle (codepoint slicing == SQL
    substr semantics, as chunk_documents pins).

    Scale shape (no broadcast, no driver state, two narrow exchanges):
      1. stateless chunk explode (the shared _make_chunk_batch kernel
         with stride == size, so reassembly is exact concatenation);
      2. winner exchange keyed on a 64-bit chunk-hash prefix carrying
         only (h64, 16-byte blake2b digest, doc_id, chunk_idx) — the
         exact-dup-grouper pattern: shuffle on the prefix, confirm on
         the full digest inside the segment, segment min wins. Digest
         equality stands in for string equality (128-bit blake2b is
         collision-free at 10^12 chunks for all practical purposes);
      3. reassembly exchange on doc_id where each doc's text rides
         ONCE alongside its 16-byte keep rows (the carry/union pattern
         the minhash explode uses for signatures) — kept windows are
         re-sliced with an Arrow kernel loop bounded by
         max-chunks-per-doc and joined with ONE binary_join; no
         per-row Python anywhere.
    """
    import pyarrow.compute as pc

    from nise_ray.ops.analytics import _make_chunk_batch
    from nise_ray.ops.groupapply import hash_group_apply

    if size <= 0:
        raise ValueError("size must be positive")

    _EMPTY_KEYED = pa.table({
        "h64": pa.array([], pa.int64()),
        "dig": pa.array([], pa.binary(16)),
        "doc_id": pa.array([], pa.int64()),
        "chunk_idx": pa.array([], pa.int64())})
    _EMPTY_KEEP = pa.table({"doc_id": pa.array([], pa.int64()),
                            "chunk_idx": pa.array([], pa.int64())})
    _EMPTY_OUT = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "n_chunks": pa.array([], pa.int64()),
        "n_kept": pa.array([], pa.int64())})

    chunker = _make_chunk_batch(size, size)

    def key_batch(b: pa.Table) -> pa.Table:
        ch = chunker(b)
        if ch.num_rows == 0:
            return _EMPTY_KEYED
        enc = ch.column("chunk_text").combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        # blake2b once per UNIQUE window in the batch (dictionary path,
        # same discipline as TokenHasher.hash_vocab)
        digs = [hashlib.blake2b(v.encode(), digest_size=16).digest()
                for v in vocab]
        pre = b"".join(d[:8] for d in digs)
        h64v = (np.frombuffer(pre, dtype=np.int64) if digs
                else np.empty(0, dtype=np.int64))
        dig_v = np.array(digs, dtype=object)
        return pa.table({
            "h64": pa.array(h64v[idx], pa.int64()),
            "dig": pa.array(list(dig_v[idx]), pa.binary(16)),
            "doc_id": ch.column("doc_id"),
            "chunk_idx": ch.column("chunk_idx")})

    def winners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_KEEP
        dig = np.array(t.column("dig").to_pylist(), dtype=object)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        cidx = t.column("chunk_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((cidx, did, dig))
        d = dig[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = d[1:] != d[:-1]
        sel = order[first]
        return pa.table({"doc_id": pa.array(did[sel], pa.int64()),
                         "chunk_idx": pa.array(cidx[sel], pa.int64())})

    def tag_keep(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "chunk_idx": t.column("chunk_idx"),
            "text": pa.nulls(t.num_rows, pa.string())})

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "chunk_idx": pa.array(
                np.full(t.num_rows, -1, dtype=np.int64), pa.int64()),
            "text": t.column("text")})

    def reassemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_OUT
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        cidx = t.column("chunk_idx").to_numpy(zero_copy_only=False)
        txt = t.column("text").combine_chunks()
        drows = np.flatnonzero(cidx == -1)
        order_d = drows[np.argsort(did[drows], kind="stable")]
        doc_ids = did[order_d]
        texts = txt.take(pa.array(order_d))
        lens = pc.utf8_length(texts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chunks = np.where(lens > 0, (lens - 1) // size + 1, 0)
        krows = np.flatnonzero(cidx != -1)
        kd, ki = did[krows], cidx[krows]
        korder = np.lexsort((ki, kd))
        kd, ki = kd[korder], ki[korder]
        rank = np.searchsorted(doc_ids, kd)
        pieces, pos_list = [], []
        for i in np.unique(ki):          # bounded by max chunks per doc
            sel = np.flatnonzero(ki == i)
            sub = pc.utf8_slice_codeunits(
                texts.take(pa.array(rank[sel])),
                start=int(i) * size, stop=(int(i) + 1) * size)
            pieces.append(sub.combine_chunks()
                          if isinstance(sub, pa.ChunkedArray) else sub)
            pos_list.append(sel)
        if pieces:
            flat_unordered = pa.concat_arrays(pieces)
            pos = np.concatenate(pos_list)
            inv = np.empty(len(pos), dtype=np.int64)
            inv[pos] = np.arange(len(pos), dtype=np.int64)
            flat = flat_unordered.take(pa.array(inv))
        else:
            flat = pa.array([], pa.string())
        counts = np.bincount(rank, minlength=len(doc_ids)).astype(np.int64)
        offs = np.zeros(len(doc_ids) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), flat)
        joined = pc.binary_join(lists, "")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": joined.cast(pa.string()),
            "n_chunks": pa.array(n_chunks, pa.int64()),
            "n_kept": pa.array(counts, pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    keyed = ds.map_batches(key_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    keep = hash_group_apply(keyed, ["h64"], winners, 0, sort=False)
    carry = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    merged = carry.union(keep.map_batches(tag_keep, batch_format="pyarrow",
                                          zero_copy_batch=True))
    return hash_group_apply(merged, ["doc_id"], reassemble, 0, sort=False)


def _type2_hash_col(txt) -> np.ndarray:
    """blake2b-8 of the type-2-normalized text column (identifiers ->
    ID, integer literals -> N): two Arrow RE2 kernels, then each
    DISTINCT normalized form hashed once via the dictionary indices
    (normalization collapses duplicates aggressively)."""
    import pyarrow.compute as pc

    from nise_ray.hashing import blake2b64

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    nt = pc.replace_substring_regex(
        txt, pattern=r"[A-Za-z_][A-Za-z0-9_]*", replacement="ID")
    nt = pc.replace_substring_regex(nt, pattern=r"[0-9]+",
                                    replacement="N")
    enc = nt.dictionary_encode()
    uniq = np.fromiter(
        (blake2b64(s.encode("utf-8", errors="surrogatepass"))
         for s in enc.dictionary.to_pylist()),
        dtype=U64, count=len(enc.dictionary))
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


def type2_clone_groups(sf_dir: str) -> "ray.data.Dataset":
    """Type-2 clone detection over the documents corpus: exact-duplicate
    grouping AFTER identifier/literal normalization — every identifier
    token collapses to `ID` and every integer literal to `N`, so
    renamed-variable copies of the same code (type-2 clones in the
    clone-detection literature; Roy & Cordy's taxonomy) land in one
    group. Output: (doc_id, clone_id, group_size) for every member of a
    group with >= 2 docs; clone_id = min doc_id of the group.

    Scale shape: the normalization is two Arrow RE2 kernels per block
    (bit-matching DuckDB's regexp_replace(..., 'g'), RE2 on both sides);
    only the 8-byte blake2b of the normalized form plus doc_id leaves
    the block, ONE 16-byte/row hash exchange groups them, and each
    partition emits its groups vectorized (segments + reduceat min)."""
    import pyarrow.compute as pc

    from nise_ray.hashing import blake2b64
    from nise_ray.ops.groupapply import hash_group_apply, segments

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def norm_hash(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(_type2_hash_col(b.column("text")),
                                       pa.uint64()),
                         "doc_id": b.column("doc_id")})

    norm_hash.__name__ = "Type2NormHash"
    hashed = docs.map_batches(norm_hash, batch_format="pyarrow",
                              zero_copy_batch=True)

    def group_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "clone_id": pa.array([], pa.int64()),
                          "group_size": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(U64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        starts, counts = segments(h)
        multi = counts >= 2
        if not multi.any():
            return empty
        gid = np.repeat(np.arange(len(starts)), counts)
        keep = multi[gid]
        clone_id = ids[starts]  # min doc_id (ids sorted within group)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "clone_id": pa.array(clone_id[gid[keep]], pa.int64()),
            "group_size": pa.array(counts[gid[keep]], pa.int64()),
        })

    group_batch.__name__ = "Type2CloneGroups"
    return hash_group_apply(hashed, ["h"], group_batch, sort=False)


def clone_group_representatives(sf_dir: str) -> "ray.data.Dataset":
    """KEEP-BEST representative selection over type-2 clone groups: for
    every group of >= 2 renamed-variable copies, pick the copy to KEEP
    — the one with the most raw characters (richer identifiers), ties
    broken by min doc_id — instead of the blind min-doc_id rule. This
    is the policy step a curation pipeline runs after clone detection:
    (clone_id, rep_doc_id, group_size). clone_id stays min doc_id so
    group identity is join-stable with type2_clone_groups.

    Scale shape: identical to type2_clone_groups (per-block RE2
    normalize + dictionary hash, ONE 24-byte/row hash exchange); the
    argmax is a per-segment reduceat sweep — group-count-sized output,
    no driver state."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "n_chars"])

    def norm_hash(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(_type2_hash_col(b.column("text")),
                                       pa.uint64()),
                         "doc_id": b.column("doc_id"),
                         "n_chars": b.column("n_chars")})

    norm_hash.__name__ = "Type2NormHashChars"
    hashed = docs.map_batches(norm_hash, batch_format="pyarrow",
                              zero_copy_batch=True)

    def pick(batch: pa.Table) -> pa.Table:
        empty = pa.table({"clone_id": pa.array([], pa.int64()),
                          "rep_doc_id": pa.array([], pa.int64()),
                          "group_size": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(U64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        # sort groups by (h, -n_chars, doc_id): the first row of each
        # segment IS the keep-best pick; a second (h, doc_id) ordering
        # is avoided by taking min(ids) per segment via reduceat
        order = np.lexsort((ids, -nc, h))
        h, ids, nc = h[order], ids[order], nc[order]
        starts, counts = segments(h)
        multi = counts >= 2
        if not multi.any():
            return empty
        clone_id = np.minimum.reduceat(ids, starts)
        return pa.table({
            "clone_id": pa.array(clone_id[multi], pa.int64()),
            "rep_doc_id": pa.array(ids[starts][multi], pa.int64()),
            "group_size": pa.array(counts[multi], pa.int64()),
        })

    pick.__name__ = "CloneKeepBest"
    return hash_group_apply(hashed, ["h"], pick, sort=False)


def dedup_recall_report(sf_dir: str, tau: float = 0.7,
                        gate_tau: float = 0.8,
                        max_docs: int = 50_000) -> pa.Table:
    """First-class surface for the north-rule metric (dup-pair recall
    >= 0.99): run the flagship near-dup pipeline over the documents
    corpus and measure its pair recall against the BRUTE-FORCE exact
    oracle (true token-shingle Jaccard, nise_ray/oracle.py) on pairs at
    or above `gate_tau` — comfortably inside the LSH curve's
    high-probability region for the pinned band config, mirroring the
    e2e recall gate. A found pair counts if it is an emitted edge OR
    implied by the edge set's connected closure (clustering merges
    transitively). Returns ONE row:
    (n_docs, n_gate_pairs, n_hit, recall).

    The oracle is O(n^2/inverted-index) by construction, so this
    surface is gated at `max_docs` — it is a MEASUREMENT harness for
    sampled tiers, not a corpus-scale operator; at 100 TB you run it on
    a uniform sample (stratified_sample_docs) exactly like the
    reference's recall audits."""
    from nise_ray.oracle import oracle_dedup
    from nise_ray.ops.components import UnionFind
    from nise_ray.util import collect_table

    corpus_ds = corpus_from_documents(sf_dir)
    corpus = collect_table(corpus_ds)
    if corpus.num_rows > max_docs:
        raise AssertionError(
            f"dedup_recall_report: {corpus.num_rows} docs > max_docs="
            f"{max_docs}; run it on a sample — the truth side is the "
            "brute-force oracle")
    cfg = DedupConfig(tau=tau)
    res = dedup_pipeline(corpus_from_documents(sf_dir), cfg)
    edges = collect_table(res.edges)
    found = set(zip(edges.column("u").to_pylist(),
                    edges.column("v").to_pylist()))
    uf = UnionFind()
    for u, v in found:
        uf.union(u, v)
    truth, _ = oracle_dedup(corpus, tau=tau, w=cfg.shingle_w)
    denom = hit = 0
    for (u, v), (jv, kind) in truth.items():
        if kind == "exact" or jv >= gate_tau:
            denom += 1
            if (u, v) in found or (u in uf.parent and v in uf.parent
                                   and uf.find(u) == uf.find(v)):
                hit += 1
    recall = hit / denom if denom else 1.0
    return pa.table({
        "n_docs": pa.array([corpus.num_rows], pa.int64()),
        "n_gate_pairs": pa.array([denom], pa.int64()),
        "n_hit": pa.array([hit], pa.int64()),
        "recall": pa.array([round(recall, 4)], pa.float64()),
    })


def cross_dedup_docs(sf_dir: str,
                     prefix_chars: int = 200) -> "ray.data.Dataset":
    """CROSS-CORPUS dedup by document-prefix fingerprint: mark every
    candidate-split document (odd doc_id) whose first ``prefix_chars``
    characters already appear in the reference split (even doc_id) —
    the dedup-a-fresh-crawl-against-the-existing-corpus step (CCNet-
    style prefix keying), which must NOT re-dedup the reference
    internally. Output: (doc_id, in_reference) for every candidate doc.

    Scale shape: both splits ride ONE exchange keyed on the 64-bit
    sha256 prefix of the sliced text (the text itself never shuffles);
    within each block a digest lexsort finds equal-prefix runs and
    candidates inherit "reference present in my run" vectorized. Split
    membership derives from doc_id parity, so no side tag is shipped."""
    from nise_ray.ops.groupapply import hash_group_apply
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def slice_prefix(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pa.compute.utf8_slice_codeunits(
                b.column("text"), start=0, stop=prefix_chars)})

    slice_prefix.__name__ = "PrefixSlice"
    prepped = ds.map_batches(slice_prefix, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .map_batches(_sha_prep_batch, batch_format="pyarrow",
                             zero_copy_batch=True)

    def mark(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "in_reference": pa.array([], pa.int64())})
        d = [batch.column(c).to_numpy(zero_copy_only=False).astype(U64)
             for c in ("d0", "d1", "d2", "d3")]
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d[3], d[2], d[1], d[0]))
        sd = [x[order] for x in d]
        sids = ids[order]
        n = len(order)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.logical_or.reduce([x[1:] != x[:-1] for x in sd],
                             out=change[1:])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        is_ref = (sids % 2 == 0)
        has_ref = np.repeat(
            np.add.reduceat(is_ref, starts) > 0, counts)
        cand = ~is_ref
        return pa.table({
            "doc_id": pa.array(sids[cand], pa.int64()),
            "in_reference": pa.array(
                has_ref[cand].astype(np.int64), pa.int64())})

    mark.__name__ = "CrossDedupMark"
    return hash_group_apply(prepped, ["d0"], mark, 0, sort=False)


def near_dedup_keep_best(sf_dir: str,
                         cfg: DedupConfig | None = None
                         ) -> "ray.data.Dataset":
    """KEEP-BEST policy over NEAR-dup clusters (the minhash pipeline's
    connected components): every document labeled with its cluster,
    cluster size, and keep = 1 on the single representative — the
    member with the most characters, ties broken by min doc_id. This is
    the selection step a curation pipeline runs after near-dup
    clustering (keep the richest copy, drop the rest); the exact-dup
    variant is clone_group_representatives. Rows-only surface
    (clustering is not SQL-expressible); invariants are tested instead:
    exactly one keep per cluster, keep maximizes (n_chars, -doc_id).

    Scale shape: the flagship pipeline produces assignments; n_chars
    attaches via a tagged-union co-group on doc_id (both sides are
    doc-sized Datasets — no broadcast); the policy pass is ONE
    cluster_id exchange with a per-segment lexsort pick."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    cfg = cfg or DedupConfig()
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    assigns = res.assignments.select_columns(["doc_id", "cluster_id"])

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])

    # cluster_id is a uint64 min-doc_key hash — NEVER cast to int64
    # (overflows past 2^63); an explicit side tag orders the co-group
    # instead of a value sentinel.
    def tag_a(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "cluster_id": b.column("cluster_id")
                         .cast(pa.uint64()),
                         "n_chars": pa.array(
                             np.zeros(b.num_rows, np.int64), pa.int64()),
                         "side": pa.array(
                             np.ones(b.num_rows, np.int64), pa.int64())})

    def tag_d(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "cluster_id": pa.array(
                             np.zeros(b.num_rows, np.uint64),
                             pa.uint64()),
                         "n_chars": b.column("n_chars").cast(pa.int64()),
                         "side": pa.array(
                             np.zeros(b.num_rows, np.int64), pa.int64())})

    tag_a.__name__, tag_d.__name__ = "TagAssign", "TagChars"
    both = assigns.map_batches(tag_a, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        docs.map_batches(tag_d, batch_format="pyarrow",
                         zero_copy_batch=True))

    def attach(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.uint64()),
                          "n_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        cl = b.column("cluster_id").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        side = b.column("side").to_numpy(zero_copy_only=False)
        # per doc_id group: side=0 is the docs row (n_chars), side=1
        # the assignment row (cluster_id) — sorted LAST in each pair
        order = np.lexsort((side, did))
        did, cl, nc = did[order], cl[order], nc[order]
        starts, counts = segments(did)
        if not (counts == 2).all():
            raise AssertionError("near_dedup_keep_best: doc_id must "
                                 "appear exactly once per side")
        return pa.table({
            "doc_id": pa.array(did[starts], pa.int64()),
            "cluster_id": pa.array(cl[starts + 1], pa.uint64()),
            "n_chars": pa.array(nc[starts], pa.int64())})

    attach.__name__ = "AttachChars"
    labeled = hash_group_apply(both, ["doc_id"], attach, 0, sort=False)

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.uint64()),
                             "cluster_size": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.int64())})
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, cl))
        did, cl, nc = did[order], cl[order], nc[order]
        starts, counts = segments(cl)
        keep = np.zeros(len(order), dtype=np.int64)
        keep[starts] = 1
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "cluster_id": pa.array(cl, pa.uint64()),
            "cluster_size": pa.array(np.repeat(counts, counts),
                                     pa.int64()),
            "keep": pa.array(keep, pa.int64())})

    pick.__name__ = "ClusterKeepBest"
    return hash_group_apply(labeled, ["cluster_id"], pick, 0, sort=False)
