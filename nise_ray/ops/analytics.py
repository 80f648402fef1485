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


def _sample_key(doc_id: np.ndarray) -> np.ndarray:
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


def rollup_doc_counts(sf_dir: str) -> pa.Table:
    """ROLLUP aggregate: document counts + total chars at three levels —
    (lang, source), (lang, ALL), (ALL, ALL) — the batch form of
    GROUP BY ROLLUP(lang, source). The finest level is computed with a
    per-batch combiner + one exchange; coarser levels derive from the
    finest (group-count sized) on the driver, so the corpus is read
    once. NULL grouping keys are emitted as the sentinel 'ALL' to keep
    the cross-engine hash compare total-order-safe."""
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
    finest = collect_table(hash_group_apply(partial, ["lang", "source"],
                                            merge, 0, sort=False))
    # driver-side rollup over the group-count-sized finest level
    lang = finest.column("lang").to_pylist()
    nd = finest.column("n_docs").to_numpy(zero_copy_only=False)
    sch = finest.column("sum_chars").to_numpy(zero_copy_only=False)
    rows_lang: dict[str, list[int]] = {}
    for i, lg in enumerate(lang):
        acc = rows_lang.setdefault(lg, [0, 0])
        acc[0] += int(nd[i])
        acc[1] += int(sch[i])
    out_lang = sorted(rows_lang)
    lvl1 = pa.table({
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(["ALL"] * len(out_lang), pa.string()),
        "n_docs": pa.array([rows_lang[lg][0] for lg in out_lang], pa.int64()),
        "sum_chars": pa.array([rows_lang[lg][1] for lg in out_lang], pa.int64()),
    })
    lvl0 = pa.table({
        "lang": pa.array(["ALL"], pa.string()),
        "source": pa.array(["ALL"], pa.string()),
        "n_docs": pa.array([int(nd.sum())], pa.int64()),
        "sum_chars": pa.array([int(sch.sum())], pa.int64()),
    })
    return pa.concat_tables([finest, lvl1, lvl0]).sort_by(
        [("lang", "ascending"), ("source", "ascending")])
