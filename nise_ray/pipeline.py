"""Pipeline orchestration — the full batch dedup run (SURVEY §4.1).

    read_parquet -> Signer (actor-pool map_batches, zero-copy Arrow)
      -> exact edges        groupby(content_sha256)            [shuffle 1]
      -> minhash edges      band explode -> groupby(band_key)  [shuffle 2]
      -> simhash edges      block explode -> groupby(block)    [shuffle 2b]
      -> union + distinct   groupby(u, v)                      [shuffle 3]
      -> connected components (driver union-find | hash-to-min)
      -> label attach (broadcast lookup | distributed join) -> assignments

The driver holds only: the DAG, the config, manifest metadata, and — on the
small-graph fast path — the verified-edge union-find. Every dataset stays
a streaming ray.data.Dataset; full materialization happens only at stage
checkpoints (partitioned parquet) when a run_dir is given.
"""

from __future__ import annotations

import dataclasses
import shutil
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from nise_ray.checkpoint import RunContext, lineage_wrap
from nise_ray.config import DedupConfig
from nise_ray.io import read_corpus
from nise_ray.ops.components import (
    attach_labels,
    distributed_components,
    driver_components,
)
from nise_ray.ops.exact import exact_batch_edge_gen
from nise_ray.ops.groupapply import hash_group_apply, use_hash_shuffle
from nise_ray.ops.lsh import (
    EDGE_SCHEMA,
    explode_bands,
    make_batch_pair_gen,
    make_batch_salted_pair_gen,
)
from nise_ray.ops.sign import Signer, make_sign_fn
from nise_ray.ops.simhash_stage import (
    explode_simhash_blocks,
    make_batch_simhash_pair_gen,
)
from nise_ray.ops.unified import (
    broadcast_sig_map,
    explode_unified,
    join_verify,
    make_sig_verifier,
    make_unified_pair_gen,
)
from nise_ray.ops.substring import (
    explode_fingerprints,
    make_batch_substring_pair_gen,
)

_SRC_RANK = {"exact": 0, "minhash": 1, "simhash": 2, "substring": 3}

ASSIGNMENT_COLUMNS = [
    "repo", "path", "commit", "lang", "doc_key", "content_sha256",
    "n_bytes", "n_tokens", "n_shingles", "cluster_id",
]




def _sha_hex_batch(batch: pa.Table) -> pa.Table:
    """content_sha256 fixed_size_binary(32) -> hex string (output contract;
    vectorized nibble lookup, see util.hex_column)."""
    from nise_ray.util import hex_column
    i = batch.schema.get_field_index("content_sha256")
    return batch.set_column(i, "content_sha256",
                            hex_column(batch.column("content_sha256"), 32))


def edge_distinct_batch(batch: pa.Table) -> pa.Table:
    """Block-level (u, v) distinct for hash_group_apply (sort=False): one
    full lexsort by (u, v, src-rank, -est), then first row per (u, v) —
    zero per-group Python."""
    if batch.num_rows <= 1:
        return batch
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    est = batch.column("est").to_numpy(zero_copy_only=False)
    src_codes = batch.column("src").combine_chunks().dictionary_encode()
    dict_rank = np.array([_SRC_RANK.get(s, 9)
                          for s in src_codes.dictionary.to_pylist()],
                         dtype=np.int8)
    rank = dict_rank[src_codes.indices.to_numpy(zero_copy_only=False)]
    order = np.lexsort((-est, rank, v, u))
    su, sv = u[order], v[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])
    return batch.take(pa.array(order[first]))


@dataclasses.dataclass
class DedupResult:
    assignments: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    substring_pairs: "ray.data.Dataset | None"
    stats: dict[str, Any]
    run_dir: str | None = None


def _stage(ctx: RunContext | None, name: str, build,
           empty_schema: pa.Schema | None = None,
           timings: "dict[str, float] | None" = None):
    """Stage checkpoint wrapper: resume reads completed stages back from
    partitioned parquet; fresh runs write-through then stream from disk."""
    t0 = time.time()
    try:
        if ctx is None:
            return build().materialize(), False
        if ctx.resume and ctx.is_complete(name):
            # partitioning=None: stage dirs are named stage=<name>, which
            # hive inference would otherwise surface as a phantom column
            return ray.data.read_parquet(ctx.stage_dir(name),
                                         partitioning=None), True
        return _stage_checkpointed(ctx, name, build, empty_schema)
    finally:
        if timings is not None:
            timings[name] = round(time.time() - t0, 3)


def _stage_checkpointed(ctx: RunContext, name: str, build,
                        empty_schema: pa.Schema | None):
    ds = build()
    out_dir = ctx.stage_dir(name)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir)
    import glob
    import os
    if not glob.glob(os.path.join(out_dir, "*.parquet")):
        # a stage can legitimately produce zero rows (e.g. no simhash
        # pairs); keep the checkpoint readable with the right schema
        os.makedirs(out_dir, exist_ok=True)
        schema = empty_schema
        if schema is None:
            ray_schema = ds.schema(fetch_if_missing=True)
            schema = getattr(ray_schema, "base_schema", None) or pa.schema([])
        pq.write_table(schema.empty_table(), os.path.join(out_dir, "empty.parquet"))
    ctx.mark_complete(name)
    return ray.data.read_parquet(out_dir, partitioning=None), False


def _edge_select(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.select_columns(["u", "v", "est", "src"])


def _sign_chunked(ctx: RunContext, cfg: DedupConfig,
                  corpus: "str | list[str]") -> "ray.data.Dataset":
    """Partition-level checkpointing for the sign stage: the input FILE
    LIST is split into chunks, each signed and checkpointed as
    stage=signed/chunk=NNNNN; a resumed run re-signs only incomplete
    chunks (north-rule "resumes from per-partition checkpoints"). Chunk
    identity = position in the sorted file list, fingerprinted in each
    chunk's _SUCCESS marker."""
    import glob
    import hashlib as _hashlib
    import os

    if isinstance(corpus, str):
        if os.path.isdir(corpus):
            files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
        else:
            files = [corpus]
    else:
        files = sorted(corpus)
    if not files:
        raise ValueError(f"no parquet files under {corpus}")
    chunk_size = cfg.sign_chunk_files or max(8, len(files) // 16)
    chunks = [files[i:i + chunk_size] for i in range(0, len(files), chunk_size)]

    sign_fn = make_sign_fn(cfg)
    wrapped = lineage_wrap(sign_fn, ctx.manifest_dir("signed"),
                           ctx.run_id, "signed")
    out_dirs: list[str] = []
    any_signed = False
    for i, chunk in enumerate(chunks):
        cdir = os.path.join(ctx.stage_dir("signed"), f"chunk={i:05d}")
        # marker OUTSIDE the chunk dir so read_parquet(cdir) sees only parquet
        marker = cdir + ".done.json"
        fp = _hashlib.sha256(("\n".join(os.path.basename(f) for f in chunk)
                              + ctx.cfg.config_hash()).encode()).hexdigest()[:16]
        if ctx.resume and os.path.exists(marker):
            import json as _json
            with open(marker) as f:
                if _json.load(f).get("fingerprint") == fp:
                    out_dirs.append(cdir)
                    continue
        shutil.rmtree(cdir, ignore_errors=True)
        ds = read_corpus(chunk).map_batches(
            wrapped, batch_format="pyarrow", batch_size=cfg.batch_size,
            zero_copy_batch=True)
        ds.write_parquet(cdir)
        from nise_ray.checkpoint import _atomic_write_json
        _atomic_write_json(marker, {
            "run_id": ctx.run_id, "stage": "signed", "chunk": i,
            "fingerprint": fp, "n_files": len(chunk),
            "completed_at": time.time(),
        })
        out_dirs.append(cdir)
        any_signed = True
    # don't re-stamp the stage marker on a fully-skipped resume: the
    # _SUCCESS mtime is the "nothing re-ran" audit signal
    if any_signed or not ctx.is_complete("signed"):
        ctx.mark_complete("signed", n_chunks=len(chunks))
    # read_parquet accepts one dir OR a list of FILES — expand chunk dirs
    signed_files: list[str] = []
    for d in out_dirs:
        signed_files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return ray.data.read_parquet(signed_files, partitioning=None)


def dedup_pipeline(
    corpus: "str | list[str] | ray.data.Dataset",
    cfg: DedupConfig | None = None,
    run_dir: str | None = None,
    resume: bool = False,
) -> DedupResult:
    cfg = cfg or DedupConfig()
    ctx = RunContext(run_dir, cfg, resume=resume) if run_dir else None
    t_start = time.time()
    use_hash_shuffle()

    corpus_ds = (read_corpus(corpus) if isinstance(corpus, (str, list))
                 else corpus)

    # ---- stage A: sign (stateful, zero-copy Arrow). Default: task path
    # with a per-worker signer cache — elastic, no CPU-slot pinning; set
    # cfg.sign_concurrency for an explicit actor pool. ------------------
    def build_signed():
        if cfg.sign_concurrency:
            ds = corpus_ds.map_batches(
                Signer, fn_constructor_args=(cfg,), batch_format="pyarrow",
                batch_size=cfg.batch_size, zero_copy_batch=True,
                concurrency=cfg.sign_concurrency)
        else:
            ds = corpus_ds.map_batches(
                make_sign_fn(cfg), batch_format="pyarrow",
                batch_size=cfg.batch_size, zero_copy_batch=True)
        if ctx is not None:
            wrapped = lineage_wrap(lambda b: b, ctx.manifest_dir("signed"),
                                   ctx.run_id, "signed")
            ds = ds.map_batches(wrapped, batch_format="pyarrow",
                                zero_copy_batch=True)
        return ds

    stage_timings: dict[str, float] = {}
    if ctx is not None and isinstance(corpus, (str, list)):
        t0 = time.time()
        signed = _sign_chunked(ctx, cfg, corpus)
        stage_timings["signed"] = round(time.time() - t0, 3)
    else:
        signed, _ = _stage(ctx, "signed", build_signed, timings=stage_timings)

    return _pipeline_from_signed(signed, cfg, ctx, run_dir, t_start,
                                 stage_timings)


def _pipeline_from_signed(
    signed: "ray.data.Dataset",
    cfg: DedupConfig,
    ctx: RunContext | None,
    run_dir: str | None,
    t_start: float,
    stage_timings: dict[str, float],
) -> DedupResult:
    """Everything after the sign stage — shared by dedup_pipeline and the
    delta/incremental path (which unions checkpoint-reused base chunks
    with freshly signed delta chunks)."""
    n_docs = signed.count()
    if n_docs == 0:
        # empty corpus: short-circuit (Ray's hash-shuffle finalize chokes
        # on column-less empty blocks; nothing to shuffle anyway)
        empty = ray.data.from_arrow(EDGE_SCHEMA.empty_table())
        stats0 = {"n_edges": 0, "n_docs": 0, "n_labeled_docs": 0,
                  "cc_path": "empty", "stage_wall_s": stage_timings,
                  "wall_s": time.time() - t_start,
                  "config_hash": cfg.config_hash()}
        return DedupResult(
            assignments=ray.data.from_arrow(
                pa.schema([(c, pa.string()) for c in
                           ("repo", "path", "commit", "lang", "content_sha256")]
                          + [("doc_key", pa.uint64()), ("n_bytes", pa.int64()),
                             ("n_tokens", pa.int64()), ("n_shingles", pa.int64()),
                             ("cluster_id", pa.uint64())]).empty_table()),
            edges=empty, substring_pairs=None, stats=stats0, run_dir=run_dir)

    # ---- edge-producing branches ---------------------------------------
    edge_sets: list[ray.data.Dataset] = []

    # partition count derives from DATA SIZE, not cluster width (north
    # rule: pinned, manifest-recorded, stable across resumes). Sizing by
    # cluster CPUs made the 8-CPU and 32-CPU runs of the identical job
    # execute different plans (8 vs 32 partitions) — the N vs 4N scaling
    # comparison then measured two different jobs. ~25k docs/partition
    # keeps blocks in the tens-of-MB range through the narrow exchange.
    # The schedulability clamp (aggregator pools reserve CPU per
    # partition and deadlock if they can't fully schedule) applies only
    # to the ENGINE-CHOSEN data-sized count. A user-pinned
    # cfg.shuffle_partitions is honored verbatim — clamping it would
    # silently re-introduce cluster-width-dependent plans exactly where
    # the pin promises stability (resume on a differently-sized cluster,
    # N-vs-4N legs executing different plans). A pin beyond the
    # schedulable bound FAILS LOUDLY instead: honoring it hangs forever
    # (verified: a 512-partition pin on an 8-CPU cluster deadlocks the
    # aggregator pool), and a hang is strictly worse than an error that
    # names the fix.
    from nise_ray.ops.groupapply import schedulable_partitions
    if cfg.shuffle_partitions:
        n_parts = cfg.shuffle_partitions
        bound = schedulable_partitions(n_parts)
        if n_parts > bound:
            raise ValueError(
                f"cfg.shuffle_partitions={n_parts} exceeds the schedulable "
                f"bound {bound} for this cluster (shuffle aggregator pools "
                f"reserve CPU per partition eagerly and an unschedulable "
                f"pool deadlocks the run) — lower the pin, run on a wider "
                f"cluster, or leave shuffle_partitions=0 for the data-sized "
                f"default")
    else:
        n_parts = schedulable_partitions(max(8, min(512, n_docs // 25_000)))

    # explode-task bundle size: enough docs per task that the exchange
    # moves few large objects (the shuffle map pays a fixed put+RPC per
    # input block x partition), but never so few tasks that the explode
    # under-parallelizes the cluster (measured: a fixed 32k bundle cost
    # +0.8 s on the 100k-doc tier at 32 CPUs while winning 3-4x exchange
    # CPU at the 1M tier). Result-invariant.
    from nise_ray.ops.groupapply import _cluster_cpus
    explode_bs = int(min(cfg.explode_batch_size,
                         max(cfg.batch_size,
                             n_docs // (4 * _cluster_cpus()))))

    def _lineage(fn, stage: str):
        """Per-partition lineage records for shuffle stages (R14)."""
        if ctx is None:
            return fn
        return lineage_wrap(fn, ctx.manifest_dir(stage), ctx.run_id, stage)

    # In-memory runs FUSE the three edge branches into one streaming
    # execution (no per-branch materialization barrier — the streaming
    # executor runs all branch shuffles concurrently, which is where the
    # scaling headroom is). Checkpointed runs keep per-stage barriers so
    # resume can skip each branch independently.
    fused = ctx is None

    def _branch(name, build):
        if fused:
            return build()
        ds, _ = _stage(ctx, name, build, EDGE_SCHEMA, stage_timings)
        return ds

    # Default: UNIFIED candidate shuffle — exact + band + block rows share
    # one explode and ONE keyed exchange (separate shuffle operators each
    # spawn an aggregator fleet and contend; measured 3-4x slower). The
    # salted two-phase band path keeps the per-branch plan below.
    unified = cfg.salt_shards == 1 and cfg.minhash_enabled
    # Verification strategy (cfg.verify_mode): a NARROW exchange (no
    # 4K-byte sig per exploded row, ~10x less volume) defers pair
    # verification to either a broadcast sig map ("broadcast", gated on
    # corpus size) or a two-sided distributed signature hash join
    # ("join", the 10^12-file configuration); "carry" ships sigs through
    # the exchange and verifies inline.
    verify_mode = cfg.verify_mode
    if verify_mode == "auto":
        if not unified:
            verify_mode = "carry"  # per-branch plans verify inline
        elif n_docs <= cfg.broadcast_label_max:
            verify_mode = "broadcast"
        else:
            # beyond the broadcast gate the scale-correct default is the
            # fully distributed signature hash join — NOT the wide
            # carried-sig exchange (~10x the shuffle bytes)
            verify_mode = "join"
    narrow = unified and verify_mode in ("broadcast", "join")

    if unified:
        def build_candidates():
            exploded = signed.map_batches(
                lambda b: explode_unified(b, cfg, carry_sigs=not narrow),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=explode_bs)
            return hash_group_apply(
                exploded, ["key"],
                _lineage(make_unified_pair_gen(cfg, verify=not narrow),
                         "edges_candidates"),
                n_parts)
        edge_sets.append(_edge_select(_branch("edges_candidates",
                                              build_candidates)))

    if cfg.exact_enabled and not unified:
        def build_exact():
            narrow = signed.select_columns(["sha64", "content_sha256", "doc_key"])
            return hash_group_apply(narrow, ["sha64"],
                                    _lineage(exact_batch_edge_gen, "edges_exact"),
                                    n_parts)
        edge_sets.append(_edge_select(_branch("edges_exact", build_exact)))

    if cfg.minhash_enabled and not unified:
        def build_minhash():
            exploded = signed.map_batches(
                lambda b: explode_bands(b, cfg),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=explode_bs)
            if cfg.salt_shards > 1:
                phase1 = hash_group_apply(
                    exploded, ["bkey"], make_batch_salted_pair_gen(cfg), n_parts)

                def split_edges(b: pa.Table) -> pa.Table:
                    mask = pa.compute.invert(b.column("is_rep"))
                    return b.filter(mask).select(["u", "v", "est", "src"])

                def split_reps(b: pa.Table) -> pa.Table:
                    return b.filter(b.column("is_rep")).select(
                        ["band_key", "doc_key", "sha64", "minhash"])

                edges1 = phase1.map_batches(split_edges, batch_format="pyarrow")
                reps = phase1.map_batches(split_reps, batch_format="pyarrow")
                edges2 = hash_group_apply(
                    reps, ["band_key"],
                    make_batch_pair_gen(cfg, key_col="band_key"), n_parts)
                return edges1.union(_edge_select(edges2))
            return hash_group_apply(
                exploded, ["bkey"],
                _lineage(make_batch_pair_gen(cfg), "edges_minhash"), n_parts)
        edge_sets.append(_edge_select(_branch("edges_minhash", build_minhash)))

    if cfg.simhash_enabled and not unified:
        def build_simhash():
            exploded = signed.map_batches(
                lambda b: explode_simhash_blocks(b, cfg),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=explode_bs)
            return hash_group_apply(
                exploded, ["block_key"],
                _lineage(make_batch_simhash_pair_gen(cfg), "edges_simhash"),
                n_parts)
        edge_sets.append(_edge_select(_branch("edges_simhash", build_simhash)))

    # ---- union + distinct (+ deferred verification) ---------------------
    def _driver_distinct_verify(cand: "ray.data.Dataset") -> "ray.data.Dataset":
        """Driver fast path (scale-gated): collect the narrow candidate
        rows, numpy-lexsort distinct, verify against the needed-keys sig
        map — avoids a whole (u, v) exchange whose row count is small
        relative to the corpus. Distributed fallback: hash shuffle +
        broadcast verifier (below)."""
        from nise_ray.util import collect_table
        t = collect_table(cand)
        if t.num_rows == 0:
            return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        est = t.column("est").to_numpy(zero_copy_only=False)
        src_codes = t.column("src").combine_chunks().dictionary_encode()
        rank_map = np.array([_SRC_RANK.get(s, 9)
                             for s in src_codes.dictionary.to_pylist()],
                            dtype=np.int8)
        rank = rank_map[src_codes.indices.to_numpy(zero_copy_only=False)]
        order = np.lexsort((-est, rank, v, u))
        su, sv = u[order], v[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])
        keep = order[first]
        t = t.take(pa.array(keep))
        if narrow:
            uu = u[keep]
            vv = v[keep]
            needed = np.unique(np.concatenate([uu, vv]))
            ref = broadcast_sig_map(signed, cfg.minhash_k, needed)
            keys, sigs = ray.get(ref)
            ee = est[keep].copy()
            need = ee < 0
            if need.any():
                iu = np.clip(np.searchsorted(keys, uu[need]), 0, len(keys) - 1)
                iv = np.clip(np.searchsorted(keys, vv[need]), 0, len(keys) - 1)
                ok = (keys[iu] == uu[need]) & (keys[iv] == vv[need])
                match = (sigs[iu] == sigs[iv]).sum(axis=1)
                ee[need] = np.where(
                    ok, match.astype(np.float32) / np.float32(cfg.minhash_k),
                    np.float32(0.0))
            t = t.set_column(t.schema.get_field_index("est"), "est",
                             pa.array(ee.astype(np.float32), pa.float32()))
            t = t.filter(pa.array(ee >= cfg.tau))
        return ray.data.from_arrow(t)

    def build_edges():
        if not edge_sets:
            return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
        ds = edge_sets[0]
        for other in edge_sets[1:]:
            ds = ds.union(other)
        if verify_mode == "join":
            # fully distributed: stream the candidate union STRAIGHT into
            # the distinct shuffle (no materialization barrier, no count
            # gate — the 10^12-file configuration holds no driver state),
            # then the two-sided signature hash join verifies. Non-unified
            # plans already verified inline (est >= tau at pair gen), so
            # the join would be pure redundant work — distinct only.
            from nise_ray.ops.groupapply import (default_partitions,
                                                 join_safe_partitions)
            distinct = hash_group_apply(ds, ["u", "v"],
                                        _lineage(edge_distinct_batch, "edges"),
                                        n_parts, sort=False)
            if narrow:
                return join_verify(distinct, signed, cfg,
                                   join_safe_partitions(
                                       default_partitions(n_parts)))
            return distinct
        if n_docs <= cfg.driver_docs_max:
            # driver fast path gated on the ALREADY-KNOWN doc count — no
            # materialize()+count() barrier on the candidate union (the
            # round-2 version paid a full barrier here just to count)
            return _driver_distinct_verify(ds)
        distinct = hash_group_apply(ds, ["u", "v"],
                                    _lineage(edge_distinct_batch, "edges"),
                                    n_parts, sort=False)
        if not narrow:
            return distinct  # carried sigs: already verified inline
        # broadcast verifier over the needed-keys sig map
        distinct = distinct.materialize()
        from nise_ray.util import collect_table
        uv = collect_table(distinct.select_columns(["u", "v"]))
        needed = np.unique(np.concatenate([
            uv.column("u").to_numpy(zero_copy_only=False),
            uv.column("v").to_numpy(zero_copy_only=False),
        ])) if uv.num_rows else np.empty(0, dtype=np.uint64)
        ref = broadcast_sig_map(signed, cfg.minhash_k, needed)
        from nise_ray.ops.groupapply import default_concurrency
        return distinct.map_batches(
            make_sig_verifier(ref, cfg), batch_format="pyarrow",
            zero_copy_batch=True, concurrency=default_concurrency())
    edges, _ = _stage(ctx, "edges", build_edges, EDGE_SCHEMA, stage_timings)

    # ---- connected components ------------------------------------------
    t_cc = time.time()
    n_edges = edges.count()
    stats: dict[str, Any] = {"n_edges": n_edges,
                             "verify_mode_resolved": verify_mode,
                             "shuffle_partitions_resolved": n_parts}
    if n_edges == 0:
        labels: pa.Table | ray.data.Dataset = pa.table(
            {"doc_key": pa.array([], pa.uint64()),
             "cluster_id": pa.array([], pa.uint64())})
        stats["cc_path"] = "empty"
    elif n_edges <= cfg.driver_cc_max_edges:
        labels = driver_components(edges)
        stats["cc_path"] = "driver_union_find"
        stats["n_clusters"] = int(
            len(np.unique(labels.column("cluster_id").to_numpy(
                zero_copy_only=False))))
    else:
        # materialize once: attach_labels and the n_labeled_docs stat both
        # consume this — lazy, each would re-run the final label shuffle
        cc_stats: dict[str, Any] = {}
        labels = distributed_components(edges, cfg, stats=cc_stats).materialize()
        stats["cc_path"] = "distributed_two_star"
        stats.update(cc_stats)

    stage_timings["components"] = round(time.time() - t_cc, 3)

    # ---- label attach + assignments ------------------------------------
    def build_assignments():
        ds = attach_labels(signed, labels, cfg)
        # keep passthrough columns (e.g. the documents adapter's doc_id);
        # minhash/sha64 stay engine-internal
        extras = [c for c in signed.schema().names
                  if c not in ASSIGNMENT_COLUMNS
                  and c not in ("minhash", "simhash", "sha64", "content")]
        ds = ds.select_columns(ASSIGNMENT_COLUMNS + extras)
        # the engine carries content_sha256 as fixed_size_binary(32) (half
        # the exchange width, zero-copy digest access); outputs expose hex
        return ds.map_batches(_sha_hex_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    assignments, _ = _stage(ctx, "assignments", build_assignments,
                            timings=stage_timings)

    stats["n_docs"] = n_docs
    stats["n_labeled_docs"] = (labels.num_rows if isinstance(labels, pa.Table)
                               else labels.count())
    stats["stage_wall_s"] = stage_timings
    stats["wall_s"] = time.time() - t_start
    stats["config_hash"] = cfg.config_hash()
    if ctx is not None:
        ctx.mark_complete("pipeline", stats={k: v for k, v in stats.items()})

    return DedupResult(assignments=assignments, edges=edges,
                       substring_pairs=None, stats=stats,
                       run_dir=run_dir)


def dedup_delta(
    base_corpus: "str | list[str]",
    delta_corpus: "str | list[str]",
    cfg: DedupConfig | None = None,
    base_run_dir: str | None = None,
    run_dir: str | None = None,
) -> DedupResult:
    """Incremental dedup over base ∪ delta (SURVEY §3.8 extension):
    training-data corpora grow continuously, and re-signing an unchanged
    100 TB base to dedup a 1 TB delta is the dominant wasted cost.

    The base corpus is signed through `_sign_chunked` against
    ``base_run_dir`` with resume semantics — chunks whose file-list +
    config fingerprint already match their `.done.json` marker are
    READ BACK from checkpoint, not re-signed (the same per-partition
    mechanism the north rule's resume requirement uses). Only the delta
    files are signed fresh (checkpointed under ``run_dir`` when given).
    The union then flows through the normal edge / components /
    assignments stages, so the result is IDENTICAL to a from-scratch run
    over base ∪ delta (verified in tests): signing is per-row, and every
    downstream stage is deterministic in the row SET, not its chunking.
    """
    cfg = cfg or DedupConfig()
    t_start = time.time()
    use_hash_shuffle()
    stage_timings: dict[str, float] = {}

    if base_run_dir is None:
        raise ValueError("dedup_delta needs base_run_dir (the checkpointed "
                         "sign chunks to reuse)")
    base_ctx = RunContext(base_run_dir, cfg, resume=True)
    t0 = time.time()
    signed_base = _sign_chunked(base_ctx, cfg, base_corpus)
    stage_timings["signed_base"] = round(time.time() - t0, 3)

    ctx = RunContext(run_dir, cfg, resume=False) if run_dir else None
    t0 = time.time()
    if ctx is not None:
        signed_delta = _sign_chunked(ctx, cfg, delta_corpus)
    else:
        signed_delta = read_corpus(delta_corpus).map_batches(
            make_sign_fn(cfg), batch_format="pyarrow",
            batch_size=cfg.batch_size, zero_copy_batch=True)
    stage_timings["signed_delta"] = round(time.time() - t0, 3)

    signed = signed_base.union(signed_delta)
    return _pipeline_from_signed(signed, cfg, ctx, run_dir, t_start,
                                 stage_timings)


def substring_pairs(
    corpus: "str | list[str] | ray.data.Dataset",
    cfg: DedupConfig | None = None,
) -> "ray.data.Dataset":
    """Stage E'' as an independent branch over the corpus (it needs raw
    content, which the signed table intentionally drops). Output schema:
    (u, v, n_shared_fps, u_start, u_end, v_start, v_end) — per-pair span
    bounds over the shared winnowing anchors (byte offsets in the
    NORMALIZED text; each anchor covers winnow_k bytes), actionable for
    corpus cleaning."""
    from nise_ray.ops.substring import (
        SPAN_SCHEMA,
        make_u_translate_batch,
        make_v_finalize_batch,
        merge_span_partials,
    )
    cfg = cfg or DedupConfig()
    use_hash_shuffle()
    corpus_ds = (read_corpus(corpus) if isinstance(corpus, (str, list))
                 else corpus)
    # driver-vs-distributed span path gated on the CORPUS SIZE (metadata-
    # only count for parquet inputs), mirroring the main edge path's
    # known-doc-count gate — the round-3 version paid a materialize()+
    # count() FULL BARRIER on the fingerprint pair set here just to pick
    # the path, which serialized the fp exchange against the span stage
    # (measured 13% substring_corpus regression).
    n_docs = corpus_ds.count()
    fps = corpus_ds.map_batches(
        lambda b: explode_fingerprints(b, cfg),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=cfg.batch_size)
    pairs = hash_group_apply(fps, ["fp"], make_batch_substring_pair_gen(cfg),
                             cfg.shuffle_partitions)
    if n_docs <= cfg.driver_docs_max:
        # driver fast path (scale-gated, mirrors the main edge distinct):
        # one streaming consume of the PRE-AGGREGATED span partials
        # (distinct-pair-sized, not one row per shared fingerprint)
        from nise_ray.util import collect_table
        t = collect_table(pairs)
        if t.num_rows == 0:
            return ray.data.from_arrow(SPAN_SCHEMA.empty_table())
        return ray.data.from_arrow(merge_span_partials(t, cfg.winnow_k))
    # distributed path: two pair-sized exchanges translate the sha pair
    # identities back to doc_keys using the map rows that rode the fp
    # exchange — pass 1 (keyed u = sha) completes the (u, v) merge and
    # translates u; pass 2 (keyed v = sha) translates v and finalizes
    p1 = hash_group_apply(pairs, ["u"], make_u_translate_batch(cfg),
                          cfg.shuffle_partitions, sort=False)
    return hash_group_apply(p1, ["v"], make_v_finalize_batch(cfg),
                            cfg.shuffle_partitions, sort=False)
