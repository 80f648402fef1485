"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in nise_ray library code) calls ray.init()/ray.shutdown().

queries() exposes every implemented operator family from SURVEY.md §3 plus
the training-data ops (dedup / similarity search / text analysis); each
SQL-expressible one has a matching oracle_sql() entry with IDENTICAL
column names (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: full near-dup detection + clustering over the
    sf0.001 documents table adapted to the corpus schema."""
    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.pipeline import dedup_pipeline

    corpus = corpus_from_documents(SF0001)
    result = dedup_pipeline(corpus, DedupConfig())
    return result.assignments


# --------------------------------------------------------------------------
# query callables (each takes sf_dir, returns Dataset | pandas | pa.Table)
# --------------------------------------------------------------------------

def _q_exact_dedup(sf_dir: str):
    from nise_ray.ops.dedupx import exact_dedup_documents
    return exact_dedup_documents(sf_dir)


def _q_token_stats(sf_dir: str):
    from nise_ray.ops.textstats import token_stats
    return token_stats(sf_dir)


def _q_quality(sf_dir: str):
    from nise_ray.ops.textstats import quality_scores
    return quality_scores(sf_dir)


def _q_fingerprints(sf_dir: str):
    from nise_ray.ops.textstats import fingerprints
    return fingerprints(sf_dir)


def _q_lang_distribution(sf_dir: str):
    import pyarrow as pa

    import ray
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    counted = ds.groupby("lang").count()

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["lang", "n_docs"])

    return counted.map_batches(rename, batch_format="pyarrow")


def _q_embedding_norms(sf_dir: str):
    from nise_ray.ops.ann import embedding_norms
    return embedding_norms(sf_dir)


def _q_export_tar_shards(sf_dir: str):
    import os

    from nise_ray.export import export_tar_shards
    out = os.path.join("/tmp/nise_export",
                       os.path.basename(os.path.normpath(sf_dir)))
    manifest = export_tar_shards(sf_dir, out, n_shards=16)
    # sha256 is the integrity/resume token — not SQL-expressible, so the
    # oracled surface is the (shard_id, n_docs, text_bytes) accounting
    return manifest.select(["shard_id", "n_docs", "text_bytes"])


def _q_embedding_covariance(sf_dir: str):
    from nise_ray.ops.linalg import embedding_covariance
    return embedding_covariance(sf_dir)


def _q_embedding_pca(sf_dir: str):
    from nise_ray.ops.linalg import embedding_pca
    return embedding_pca(sf_dir)


def _q_label_centroids(sf_dir: str):
    from nise_ray.ops.linalg import label_centroids
    return label_centroids(sf_dir)


def _q_packed_docs(sf_dir: str):
    from nise_ray.ops.packing import packed_docs
    return packed_docs(sf_dir, capacity=2048)


def _q_winsorized_doc_lengths(sf_dir: str):
    from nise_ray.ops.analytics2 import winsorized_doc_lengths
    return winsorized_doc_lengths(sf_dir)


def _q_top_tokens_per_lang(sf_dir: str):
    from nise_ray.ops.textstats import top_tokens_per_lang
    return top_tokens_per_lang(sf_dir, k=10)


def _q_ann_topk_pq(sf_dir: str):
    from nise_ray.ops.pq import pq_topk
    return pq_topk(sf_dir, n_queries=5, k=10, rerank=50)


def _q_pq_encode(sf_dir: str):
    from nise_ray.ops.pq import pq_encode
    return pq_encode(sf_dir)


def _q_hive_pruned_counts(sf_dir: str):
    from nise_ray.ops.hive import hive_pruned_counts
    return hive_pruned_counts(sf_dir, lang="en")


def _q_skyline_parts(sf_dir: str):
    from nise_ray.ops.skyline import skyline_parts
    return skyline_parts(sf_dir)


def _q_embedding_outliers(sf_dir: str):
    from nise_ray.ops.linalg import embedding_outliers
    return embedding_outliers(sf_dir)


def _q_ann_topk(sf_dir: str):
    from nise_ray.ops.ann import brute_force_topk
    return brute_force_topk(sf_dir, n_queries=5, k=10)


def _q_ann_topk_lsh(sf_dir: str):
    from nise_ray.ops.ann import lsh_topk
    return lsh_topk(sf_dir, n_queries=5, k=10)


def _q_ann_topk_ivf(sf_dir: str):
    from nise_ray.ops.ann import ivf_topk
    return ivf_topk(sf_dir, n_queries=5, k=10)


def _q_language_id(sf_dir: str):
    from nise_ray.ops.textstats import language_id
    return language_id(sf_dir)


def _q_minhash_dedup(sf_dir: str):
    from nise_ray.ops.dedupx import minhash_dedup_documents
    return minhash_dedup_documents(sf_dir)


def _q_simhash_docs(sf_dir: str):
    from nise_ray.ops.dedupx import simhash_documents
    return simhash_documents(sf_dir)


def _q_ngram_jaccard(sf_dir: str):
    from nise_ray.ops.dedupx import ngram_jaccard_pairs
    return ngram_jaccard_pairs(sf_dir)


def _q_kcore_docs(sf_dir: str):
    # k-core of the exact dup graph: the densely-duplicated boilerplate
    # families (>= k neighbors INSIDE the subgraph, not mere degree)
    from nise_ray.ops.graph import kcore_docs
    return kcore_docs(sf_dir, k=3, tau=0.5)


def _q_jaccard_threshold_sweep(sf_dir: str):
    # tau-sensitivity curve from ONE exact join: pairs per jw decile
    # bucket >= 0.5, integer bucketing so the compare is float-safe
    from nise_ray.ops.simjoin import jaccard_threshold_sweep
    return jaccard_threshold_sweep(sf_dir, tau_min=0.5)


def _q_simhash_sha(sf_dir: str):
    # SimHash over sha256-derived trigram shingles: the ORACLE-ABLE
    # SimHash (bit-majority logic checked end-to-end in SQL); the
    # production simhash_docs keeps the pinned blake2b shingle hash
    from nise_ray.ops.dedupx import simhash_sha_docs
    return simhash_sha_docs(sf_dir, w=3)


def _q_ngram_jaccard_exact(sf_dir: str):
    # EXACT trigram-shingle Jaccard self-join (prefix-filtered plan with
    # sha_ngram units) — the SQL-checkable counterpart of the LSH path
    from nise_ray.ops.dedupx import ngram_jaccard_exact_pairs
    return ngram_jaccard_exact_pairs(sf_dir, w=3, tau=0.5)


def _q_embedding_dups(sf_dir: str):
    from nise_ray.ops.ann import embedding_dup_pairs
    # the synthetic embeddings are near-orthogonal (max cosine ~0.4), so a
    # realistic 0.95+ near-dup threshold finds nothing; 0.3 exercises the
    # LSH-bucket + within-bucket verify machinery on this data
    return embedding_dup_pairs(sf_dir, threshold=0.3)


def _q_embedding_dups_exact(sf_dir: str):
    from nise_ray.ops.ann import embedding_dup_pairs_exact
    # 0.3 matches the LSH variant above so the two results are directly
    # comparable (this one is the exact, SQL-oracled baseline)
    return embedding_dup_pairs_exact(sf_dir, threshold=0.3)


def _q_embedding_clusters(sf_dir: str):
    from nise_ray.ops.ann import embedding_clusters
    # 0.35 sits in the phase-transition band of the synthetic embeddings
    # (sf0.01: 272 pairs -> 236 clusters, biggest 59) so the component
    # structure is non-trivial — multiple large-star/small-star rounds
    return embedding_clusters(sf_dir, threshold=0.35)


def _q_unigram_logprob(sf_dir: str):
    from nise_ray.ops.textstats import unigram_logprob
    return unigram_logprob(sf_dir)


def _q_funnel_counts(sf_dir: str):
    from nise_ray.ops.events import funnel_counts
    return funnel_counts(sf_dir)


def _q_user_event_paths(sf_dir: str):
    from nise_ray.ops.events import user_event_paths
    return user_event_paths(sf_dir)


def _q_user_top_event(sf_dir: str):
    from nise_ray.ops.events import user_top_event
    return user_top_event(sf_dir)


def _q_token_entropy(sf_dir: str):
    from nise_ray.ops.textstats import token_entropy
    return token_entropy(sf_dir)


def _q_value_time_correlation(sf_dir: str):
    from nise_ray.ops.analytics import value_time_correlation
    return value_time_correlation(sf_dir)


def _q_prepare_training_docs(sf_dir: str):
    from nise_ray.ops.analytics import prepare_training_docs
    return prepare_training_docs(sf_dir)


def _q_substring_pairs_sa(sf_dir: str):
    from nise_ray.ops.suffixarray import substring_pairs_sa_exact
    return substring_pairs_sa_exact(sf_dir)


def _q_substring_pairs_sa_global(sf_dir: str):
    # partitioning-independent SA pairs: winnowing-fingerprint candidate
    # routing + per-pair SA verify — equals the whole-corpus SA result
    # without ever needing one block to see the whole corpus
    from nise_ray.ops.suffixarray import substring_pairs_sa_global
    return substring_pairs_sa_global(sf_dir, min_len=100)


def _q_repetition_stats(sf_dir: str):
    from nise_ray.ops.textstats import repetition_stats
    return repetition_stats(sf_dir)


def _q_bigram_repetition(sf_dir: str):
    from nise_ray.ops.textstats import bigram_repetition_stats
    return bigram_repetition_stats(sf_dir)


def _q_bm25_scores(sf_dir: str):
    from nise_ray.ops.textstats import bm25_scores
    return bm25_scores(sf_dir, query="hash join merge")


def _q_chunk_documents(sf_dir: str):
    from nise_ray.ops.analytics import chunk_documents
    return chunk_documents(sf_dir)


def _q_pack_documents(sf_dir: str):
    from nise_ray.ops.analytics import pack_documents
    return pack_documents(sf_dir)


def _q_weighted_sample(sf_dir: str):
    from nise_ray.ops.analytics import weighted_sample_docs
    return weighted_sample_docs(sf_dir, k=50)


def _q_length_histogram(sf_dir: str):
    from nise_ray.ops.analytics import length_histogram
    return length_histogram(sf_dir)


def _q_embedding_kmeans(sf_dir: str):
    from nise_ray.ops.ann import embedding_kmeans
    return embedding_kmeans(sf_dir, n_centroids=16)


def _q_semantic_dedup(sf_dir: str):
    from nise_ray.ops.ann import semantic_dedup
    # 0.3 matches the LSH/exact variants so all three dedup-modality
    # results are directly comparable on this near-orthogonal corpus
    return semantic_dedup(sf_dir, threshold=0.3, n_centroids=4)


def _q_semantic_dedup_keep(sf_dir: str):
    from nise_ray.ops.ann import semantic_dedup_keep
    return semantic_dedup_keep(sf_dir, threshold=0.3, n_centroids=4)


def _q_event_type_user_counts(sf_dir: str):
    from nise_ray.ops.events import event_type_user_counts
    return event_type_user_counts(sf_dir)


def _q_top_docs_per_lang(sf_dir: str):
    from nise_ray.ops.events import top_docs_per_lang
    return top_docs_per_lang(sf_dir, n_per_group=3)


def _q_small_quantity_revenue(sf_dir: str):
    from nise_ray.ops.relational import small_quantity_revenue
    return small_quantity_revenue(sf_dir)


def _q_large_volume_customers(sf_dir: str):
    from nise_ray.ops.relational import large_volume_customers
    return large_volume_customers(sf_dir)


def _q_customers_without_orders(sf_dir: str):
    from nise_ray.ops.relational import customers_without_orders
    return customers_without_orders(sf_dir)


def _q_substring_pairs(sf_dir: str):
    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.pipeline import substring_pairs
    return substring_pairs(corpus_from_documents(sf_dir), DedupConfig())


def _q_substring_containment(sf_dir: str):
    from nise_ray.ops.substring import containment_pairs_documents
    return containment_pairs_documents(sf_dir)


def _q_dedup_flagship(sf_dir: str):
    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.pipeline import dedup_pipeline
    res = dedup_pipeline(corpus_from_documents(sf_dir), DedupConfig())
    return res.assignments.select_columns(
        ["repo", "path", "content_sha256", "cluster_id"])


def _q_dedup_delta(sf_dir: str):
    """Incremental dedup: the documents corpus split 80/20 into base +
    delta; the base is signed once (checkpointed), then dedup_delta
    reuses those sign chunks and signs only the delta. Output is the
    stable (doc_id, cluster_size) view over base ∪ delta — identical to
    a from-scratch run (asserted in tests/test_delta.py). Rows-only
    check: cluster ids are internal hash keys."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa

    import ray
    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.pipeline import dedup_delta
    from nise_ray.util import collect_table

    corpus = collect_table(corpus_from_documents(sf_dir))
    n = corpus.num_rows
    cut = max(1, (n * 4) // 5)
    with tempfile.TemporaryDirectory() as d:
        base_dir = os.path.join(d, "base")
        delta_dir = os.path.join(d, "delta")
        os.makedirs(base_dir)
        os.makedirs(delta_dir)
        import pyarrow.parquet as pq
        pq.write_table(corpus.slice(0, cut),
                       os.path.join(base_dir, "part-0.parquet"))
        pq.write_table(corpus.slice(cut),
                       os.path.join(delta_dir, "part-0.parquet"))
        res = dedup_delta(base_dir, delta_dir, DedupConfig(),
                          base_run_dir=os.path.join(d, "base_run"))
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

        return collect_table(
            hash_group_apply(assigns, ["cluster_id"], size_batch))


def _q_token_jaccard(sf_dir: str):
    from nise_ray.ops.simjoin import token_jaccard_pairs
    return token_jaccard_pairs(sf_dir, tau=0.5)


def _q_jaccard_components(sf_dir: str):
    from nise_ray.ops.simjoin import jaccard_components
    return jaccard_components(sf_dir, tau=0.8)


def _q_longest_repeat_docs(sf_dir: str):
    from nise_ray.ops.strings import longest_repeat_docs
    return longest_repeat_docs(sf_dir)


def _q_dedup_cluster_stats(sf_dir: str):
    from nise_ray.ops.simjoin import dedup_cluster_stats
    return dedup_cluster_stats(sf_dir, tau=0.8)


def _q_nearest_neighbor_docs(sf_dir: str):
    from nise_ray.ops.weightedjoin import nearest_neighbor_docs
    return nearest_neighbor_docs(sf_dir, tau=0.3)


def _q_weighted_jaccard(sf_dir: str):
    from nise_ray.ops.weightedjoin import weighted_jaccard_pairs
    return weighted_jaccard_pairs(sf_dir, tau=0.5)


def _q_weighted_minhash(sf_dir: str):
    from nise_ray.ops.weightedjoin import weighted_minhash_pairs
    return weighted_minhash_pairs(sf_dir, tau=0.5)


def _q_weighted_recall_report(sf_dir: str):
    from nise_ray.ops.weightedjoin import weighted_recall_report
    return weighted_recall_report(sf_dir, tau=0.5)


def _q_source_overlap(sf_dir: str):
    from nise_ray.ops.simjoin import source_overlap_pairs
    return source_overlap_pairs(sf_dir, tau=0.5)


def _q_decontaminate(sf_dir: str):
    from nise_ray.ops.decontam import decontaminate
    return decontaminate(sf_dir, eval_max=20, w=5)


def _q_asof_join(sf_dir: str):
    from nise_ray.ops.events import asof_join_events
    return asof_join_events(sf_dir, left_type="click", right_type="view")


def _q_lang_quantiles(sf_dir: str):
    from nise_ray.ops.events import lang_length_quantiles
    return lang_length_quantiles(sf_dir)


def _q_lang_quantiles_cont(sf_dir: str):
    from nise_ray.ops.events import lang_length_quantiles_cont
    return lang_length_quantiles_cont(sf_dir)


def _q_lang_quantiles_sketch(sf_dir: str):
    """DDSketch-style log-binned quantile sketch (rows-only: the output
    is an alpha-relative-error ESTIMATE, not SQL-expressible; the exact
    variant lang_length_quantiles is the oracled baseline and the
    error-bound test in tests/test_events_ops.py pins the guarantee)."""
    from nise_ray.ops.events import lang_length_quantiles_sketch
    return lang_length_quantiles_sketch(sf_dir)


def _q_range_join(sf_dir: str):
    from nise_ray.ops.events import user_prior_event_counts
    return user_prior_event_counts(sf_dir, window_minutes=60)


def _q_running_stats(sf_dir: str):
    from nise_ray.ops.events import user_running_stats
    return user_running_stats(sf_dir)


def _q_windowed_events(sf_dir: str):
    from nise_ray.ops.events import windowed_event_counts
    return windowed_event_counts(sf_dir, hours=1)


def _q_sliding_windows(sf_dir: str):
    from nise_ray.ops.events import sliding_window_counts
    return sliding_window_counts(sf_dir, window_hours=1, hop_minutes=30)


def _q_user_sessions(sf_dir: str):
    from nise_ray.ops.events import user_sessions
    return user_sessions(sf_dir, gap_minutes=30)


def _q_event_type_pivot(sf_dir: str):
    from nise_ray.ops.events import event_type_pivot
    return event_type_pivot(sf_dir)


def _q_stratified_sample(sf_dir: str):
    from nise_ray.ops.analytics import stratified_sample_docs
    return stratified_sample_docs(sf_dir, k=10)


def _q_rollup_doc_counts(sf_dir: str):
    from nise_ray.ops.analytics import rollup_doc_counts
    return rollup_doc_counts(sf_dir)


def _q_cube_doc_counts(sf_dir: str):
    from nise_ray.ops.analytics import cube_doc_counts
    return cube_doc_counts(sf_dir)


def _q_grouping_sets_doc_counts(sf_dir: str):
    from nise_ray.ops.analytics import grouping_sets_doc_counts
    return grouping_sets_doc_counts(sf_dir)


def _q_redact_docs(sf_dir: str):
    from nise_ray.ops.analytics4 import redact_docs
    return redact_docs(sf_dir)


def _q_lang_token_char_regression(sf_dir: str):
    from nise_ray.ops.analytics4 import lang_token_char_regression
    return lang_token_char_regression(sf_dir)


def _q_last_touch_attribution(sf_dir: str):
    from nise_ray.ops.analytics4 import last_touch_attribution
    return last_touch_attribution(sf_dir)


def _q_linear_attribution(sf_dir: str):
    from nise_ray.ops.analytics4 import linear_attribution
    return linear_attribution(sf_dir, window_days=7)


def _q_late_events_report(sf_dir: str):
    from nise_ray.ops.analytics4 import late_events_report
    return late_events_report(sf_dir, tolerance_s=3600)


def _q_lang_char_moments(sf_dir: str):
    from nise_ray.ops.analytics import lang_char_moments
    return lang_char_moments(sf_dir)


def _q_user_value_quartiles(sf_dir: str):
    from nise_ray.ops.events import user_value_quartiles
    return user_value_quartiles(sf_dir)


def _q_snapshot_diff(sf_dir: str):
    from nise_ray.ops.analytics import snapshot_diff_docs
    return snapshot_diff_docs(sf_dir)


def _q_top_doc_terms(sf_dir: str):
    from nise_ray.ops.textstats import top_doc_terms
    return top_doc_terms(sf_dir, k=3)


def _q_top_tokens_sketch(sf_dir: str):
    """Misra-Gries bounded heavy-hitter sketch (rows-only: the
    per-block truncation choice is not SQL-expressible; the exact
    counterpart `top_tokens` is the oracled default)."""
    from nise_ray.ops.textstats import top_tokens_sketch
    return top_tokens_sketch(sf_dir)


def _q_top_tokens(sf_dir: str):
    from nise_ray.ops.textstats import top_tokens
    return top_tokens(sf_dir, k=50)


def _q_user_event_stats(sf_dir: str):
    from nise_ray.ops.events import user_event_stats
    return user_event_stats(sf_dir)


def _q_top_docs_by_len(sf_dir: str):
    from nise_ray.ops.events import top_docs_by_len
    return top_docs_by_len(sf_dir, k=20)


def _q_pricing_summary(sf_dir: str):
    from nise_ray.ops.relational import pricing_summary
    return pricing_summary(sf_dir)


def _q_segment_revenue(sf_dir: str):
    from nise_ray.ops.relational import segment_revenue
    return segment_revenue(sf_dir)


def _q_top_unshipped(sf_dir: str):
    from nise_ray.ops.relational import top_unshipped_orders
    return top_unshipped_orders(sf_dir)


def _q_nation_revenue(sf_dir: str):
    from nise_ray.ops.relational import nation_revenue
    return nation_revenue(sf_dir)


def _q_local_supplier_revenue(sf_dir: str):
    from nise_ray.ops.relational import local_supplier_revenue
    return local_supplier_revenue(sf_dir)


def _q_order_priority_counts(sf_dir: str):
    from nise_ray.ops.relational import order_priority_counts
    return order_priority_counts(sf_dir)


def _q_event_interarrival(sf_dir: str):
    from nise_ray.ops.events import event_interarrival
    return event_interarrival(sf_dir)


def _q_volume_shipping(sf_dir: str):
    from nise_ray.ops.relational2 import volume_shipping
    return volume_shipping(sf_dir)


def _q_ann_recall_report(sf_dir: str):
    from nise_ray.ops.ann import ann_recall_report
    return ann_recall_report(sf_dir)


def _q_compression_ratio(sf_dir: str):
    from nise_ray.ops.textstats import compression_ratio
    return compression_ratio(sf_dir)


def _q_event_anomaly_days(sf_dir: str):
    from nise_ray.ops.analytics import event_anomaly_days
    return event_anomaly_days(sf_dir)


def _q_dedup_recall_report(sf_dir: str):
    from nise_ray.ops.dedupx import dedup_recall_report
    return dedup_recall_report(sf_dir)


def _q_tfidf_cosine_pairs(sf_dir: str):
    from nise_ray.ops.allpairs import tfidf_cosine_pairs
    return tfidf_cosine_pairs(sf_dir)


def _q_retention_cohorts(sf_dir: str):
    from nise_ray.ops.events import retention_cohorts
    return retention_cohorts(sf_dir)


def _q_type2_clone_groups(sf_dir: str):
    from nise_ray.ops.dedupx import type2_clone_groups
    return type2_clone_groups(sf_dir)


def _q_containment_pairs(sf_dir: str):
    from nise_ray.ops.simjoin import containment_token_pairs
    return containment_token_pairs(sf_dir)


def _q_forecast_revenue_change(sf_dir: str):
    from nise_ray.ops.relational3 import forecast_revenue_change
    return forecast_revenue_change(sf_dir)


def _q_priority_shipment_counts(sf_dir: str):
    from nise_ray.ops.relational3 import priority_shipment_counts
    return priority_shipment_counts(sf_dir)


def _q_market_share(sf_dir: str):
    from nise_ray.ops.relational3 import market_share
    return market_share(sf_dir)


def _q_product_profit(sf_dir: str):
    from nise_ray.ops.relational3 import product_profit
    return product_profit(sf_dir)


def _q_waiting_suppliers(sf_dir: str):
    from nise_ray.ops.relational3 import waiting_suppliers
    return waiting_suppliers(sf_dir)


def _q_customer_order_distribution(sf_dir: str):
    from nise_ray.ops.relational2 import customer_order_distribution
    return customer_order_distribution(sf_dir)


def _q_disjunctive_filter_revenue(sf_dir: str):
    from nise_ray.ops.relational2 import disjunctive_filter_revenue
    return disjunctive_filter_revenue(sf_dir)


def _q_value_rank_windows(sf_dir: str):
    from nise_ray.ops.events import value_rank_windows
    return value_rank_windows(sf_dir)


def _q_monthly_revenue(sf_dir: str):
    from nise_ray.ops.relational2 import monthly_revenue
    return monthly_revenue(sf_dir)


def _q_event_transitions(sf_dir: str):
    from nise_ray.ops.events import event_transitions
    return event_transitions(sf_dir)


def _q_doc_zscores(sf_dir: str):
    from nise_ray.ops.analytics import doc_zscores
    return doc_zscores(sf_dir)


def _q_event_type_user_counts_approx(sf_dir: str):
    """Grouped HLL count-distinct (rows-only: the estimate is hash-seed
    dependent; the error bound vs the exact oracled operator is asserted
    in tests/test_relational2.py)."""
    from nise_ray.ops.events import event_type_user_counts_approx
    return event_type_user_counts_approx(sf_dir)


def _q_promo_revenue_share(sf_dir: str):
    from nise_ray.ops.relational import promo_revenue_share
    return promo_revenue_share(sf_dir)


def _q_shingle_stats(sf_dir: str):
    """Corpus shingle statistics (SURVEY 3.5 distinct-shingle count):
    exact distinct via one hash exchange + HyperLogLog (no-shuffle scale
    path), returned as a 1-row table (rows-only check: the shingle hash
    is not SQL-expressible)."""
    import pyarrow as pa

    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.metrics import shingle_stats
    stats = shingle_stats(corpus_from_documents(sf_dir), DedupConfig())
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in sorted(stats.items())})


def _q_flagship_sha_audit(sf_dir: str):
    """End-to-end sha256 invariant through the FULL dedup pipeline,
    hash-verified against DuckDB: every input row comes out of the
    clustering run with its content sha256 intact."""
    from nise_ray.config import DedupConfig
    from nise_ray.io import corpus_from_documents
    from nise_ray.pipeline import dedup_pipeline
    res = dedup_pipeline(corpus_from_documents(sf_dir), DedupConfig())
    return res.assignments.select_columns(
        ["doc_id", "repo", "path", "content_sha256"])


def _q_index_query(sf_dir: str):
    """Build the LSH index over the documents-adapted corpus and query it
    with its own first 20 docs (batch self-query; rows-only check)."""
    import tempfile

    import ray
    from nise_ray.config import DedupConfig
    from nise_ray.index import build_index, query_index
    from nise_ray.io import corpus_from_documents
    from nise_ray.util import collect_table
    cfg = DedupConfig()
    corpus = corpus_from_documents(sf_dir)
    with tempfile.TemporaryDirectory() as d:
        build_index(corpus, d, cfg)
        q = collect_table(corpus_from_documents(sf_dir).sort("path").limit(20))
        return collect_table(query_index(d, q, cfg, top_k=5))


def _q_multimodal_features(sf_dir: str):
    import ray
    from nise_ray.ops.multimodal import ImageFeatureExtractor, make_fake_media_table
    media = ray.data.from_arrow(make_fake_media_table(n=128, seed=42))
    return media.map_batches(
        ImageFeatureExtractor, fn_constructor_kwargs={"fake": True},
        batch_size=32, concurrency=(1, 4), batch_format="pyarrow")


def _q_multimodal_real_audio(sf_dir: str):
    # REAL decode: PCM-16 WAV payloads parsed with the pure-numpy codec
    # (no PIL/ffmpeg needed) -> per-clip duration/rms/peak/zcr features
    import ray
    from nise_ray.ops.multimodal import (AudioFeatureExtractor,
                                         make_real_media_table)
    media = ray.data.from_arrow(make_real_media_table(n=96, seed=42))
    auds = media.filter(lambda r: r["kind"] == "audio")
    return auds.map_batches(AudioFeatureExtractor, batch_size=16,
                            concurrency=(1, 4), batch_format="pyarrow")


def _q_multimodal_real_image(sf_dir: str):
    # REAL decode, fake=False: planted PNG payloads (all five scanline
    # filters, gray/RGB/RGBA) inflate with the stdlib-zlib codec and
    # BMP payloads with the pure-numpy parser — block-mean grid
    # features from the actual pixels, per-actor decoder state
    import ray
    from nise_ray.ops.multimodal import (RealImageFeatureExtractor,
                                         make_png_media_table,
                                         make_real_media_table)
    import pyarrow as _pa
    bmp = ray.data.from_arrow(make_real_media_table(n=48, seed=42)) \
        .filter(lambda r: r["kind"] == "image")
    png_t = make_png_media_table(n=40, seed=42)
    # disjoint media_id spaces: keyed consumers (sorts, dedups, joins)
    # must never see two different payloads under one id
    png_t = png_t.set_column(
        png_t.schema.get_field_index("media_id"), "media_id",
        _pa.compute.add(png_t.column("media_id"), 1000))
    png = ray.data.from_arrow(png_t)
    return bmp.union(png).map_batches(
        RealImageFeatureExtractor, fn_constructor_kwargs={"fake": False},
        batch_size=16, concurrency=(1, 4), batch_format="pyarrow")


def _q_moving_event_stats(sf_dir: str):
    from nise_ray.ops.events import moving_event_stats
    return moving_event_stats(sf_dir, frame_rows=7)


def _q_scrub_event_props(sf_dir: str):
    from nise_ray.ops.strings import scrub_event_props
    return scrub_event_props(sf_dir)


def _q_high_value_users_intersect(sf_dir: str):
    from nise_ray.ops.relational2 import high_value_user_sets
    return high_value_user_sets(sf_dir, op="intersect")


def _q_edit_distance_pairs(sf_dir: str):
    from nise_ray.ops.strings import edit_distance_pairs
    return edit_distance_pairs(sf_dir, k=30)


def _q_zipf_fit(sf_dir: str):
    from nise_ray.ops.textstats import zipf_fit
    return zipf_fit(sf_dir)


def _q_dedup_rate_by_source(sf_dir: str):
    from nise_ray.ops.dedupx import dedup_rate_by_source
    return dedup_rate_by_source(sf_dir)


def _q_chunk_dedup(sf_dir: str):
    from nise_ray.ops.dedupx import chunk_dedup_docs
    return chunk_dedup_docs(sf_dir)


def _q_user_props_bitmask(sf_dir: str):
    from nise_ray.ops.strings import user_props_bitmask
    return user_props_bitmask(sf_dir)


def _q_user_value_trend(sf_dir: str):
    from nise_ray.ops.analytics import user_value_trend
    return user_value_trend(sf_dir)


def _q_user_event_entropy(sf_dir: str):
    from nise_ray.ops.analytics import user_event_entropy
    return user_event_entropy(sf_dir)


def _q_lang_mad_chars(sf_dir: str):
    from nise_ray.ops.events import lang_mad_chars
    return lang_mad_chars(sf_dir)


def _q_normalized_docs(sf_dir: str):
    from nise_ray.ops.normalize import normalize_documents
    return normalize_documents(sf_dir)


def _q_lang_doc_share(sf_dir: str):
    from nise_ray.ops.analytics import lang_doc_share
    return lang_doc_share(sf_dir)


def _q_lang_char_skewkurt(sf_dir: str):
    from nise_ray.ops.analytics import lang_char_skewkurt
    return lang_char_skewkurt(sf_dir)


def _q_dup_graph_triangles(sf_dir: str):
    from nise_ray.ops.ann import dup_graph_triangles
    return dup_graph_triangles(sf_dir, threshold=0.3)


def _q_pagerank_dup_graph(sf_dir: str):
    """Iterative PageRank over the dup-pair graph (rows-only: FP power
    iteration is not SQL-expressible; semantics pinned by the dense
    numpy parity test in tests/test_relational2.py)."""
    from nise_ray.ops.graph import pagerank_dup_graph
    return pagerank_dup_graph(sf_dir, threshold=0.3, n_iter=10)


def _q_user_first_last_event(sf_dir: str):
    from nise_ray.ops.events import user_first_last_event
    return user_first_last_event(sf_dir)


def _q_top_suppliers_by_qty(sf_dir: str):
    from nise_ray.ops.relational2 import top_suppliers_by_qty
    return top_suppliers_by_qty(sf_dir)


def _q_brand_supplier_counts(sf_dir: str):
    from nise_ray.ops.relational2 import brand_supplier_counts
    return brand_supplier_counts(sf_dir)


def _q_returned_item_report(sf_dir: str):
    from nise_ray.ops.relational2 import returned_item_report
    return returned_item_report(sf_dir)


def _q_global_sales_opportunity(sf_dir: str):
    from nise_ray.ops.relational2 import global_sales_opportunity
    return global_sales_opportunity(sf_dir)


def _q_token_cooccurrence(sf_dir: str):
    from nise_ray.ops.textstats import token_cooccurrence
    return token_cooccurrence(sf_dir, vocab_limit=64)


def _q_high_value_users_except(sf_dir: str):
    from nise_ray.ops.relational2 import high_value_user_sets
    return high_value_user_sets(sf_dir, op="except")


def _q_min_cost_supplier(sf_dir: str):
    from nise_ray.ops.relational3 import min_cost_supplier
    return min_cost_supplier(sf_dir)


def _q_important_parts(sf_dir: str):
    from nise_ray.ops.relational3 import important_parts
    return important_parts(sf_dir)


def _q_dominant_part_suppliers(sf_dir: str):
    from nise_ray.ops.relational3 import dominant_part_suppliers
    return dominant_part_suppliers(sf_dir)


def _q_gopher_quality(sf_dir: str):
    from nise_ray.ops.textstats import gopher_quality
    return gopher_quality(sf_dir)


def _q_ohlc_resample(sf_dir: str):
    from nise_ray.ops.events import ohlc_resample
    return ohlc_resample(sf_dir)


def _q_daily_type_coverage(sf_dir: str):
    from nise_ray.ops.events import daily_type_coverage
    return daily_type_coverage(sf_dir)


def _q_shipment_overlaps(sf_dir: str):
    from nise_ray.ops.relational4 import shipment_overlap_counts
    return shipment_overlap_counts(sf_dir)


def _q_merge_upsert(sf_dir: str):
    from nise_ray.ops.relational4 import merge_upsert_docs
    return merge_upsert_docs(sf_dir)


def _q_unpivot_quality(sf_dir: str):
    from nise_ray.ops.relational4 import unpivot_quality_metrics
    return unpivot_quality_metrics(sf_dir)


def _q_activity_streaks(sf_dir: str):
    from nise_ray.ops.relational4 import user_activity_streaks
    return user_activity_streaks(sf_dir)


def _q_source_vocab_jaccard(sf_dir: str):
    from nise_ray.ops.relational4 import source_vocab_jaccard
    return source_vocab_jaccard(sf_dir)


def _q_duplicate_lines(sf_dir: str):
    from nise_ray.ops.lines import duplicate_lines_docs
    return duplicate_lines_docs(sf_dir)


def _q_line_dedup(sf_dir: str):
    from nise_ray.ops.lines import line_dedup_docs
    return line_dedup_docs(sf_dir)


def _q_rolling_wau(sf_dir: str):
    from nise_ray.ops.lines import rolling_active_users
    return rolling_active_users(sf_dir)


def _q_dup_ngram_coverage(sf_dir: str):
    from nise_ray.ops.ngramcov import dup_ngram_coverage
    return dup_ngram_coverage(sf_dir)


def _q_percent_rank(sf_dir: str):
    from nise_ray.ops.analytics2 import percent_rank_docs
    return percent_rank_docs(sf_dir)


def _q_bigram_collocations(sf_dir: str):
    from nise_ray.ops.analytics2 import bigram_collocations
    return bigram_collocations(sf_dir)


def _q_time_window_stats(sf_dir: str):
    from nise_ray.ops.analytics3 import time_window_stats
    return time_window_stats(sf_dir, hours=1)


def _q_daily_counts_filled(sf_dir: str):
    from nise_ray.ops.analytics3 import daily_counts_filled
    return daily_counts_filled(sf_dir)


def _q_dup_graph_degrees(sf_dir: str):
    from nise_ray.ops.graph import dup_graph_degrees
    return dup_graph_degrees(sf_dir)


def _q_groups_window_stats(sf_dir: str):
    from nise_ray.ops.analytics3 import groups_window_stats
    return groups_window_stats(sf_dir)


def _q_global_doc_ranks(sf_dir: str):
    from nise_ray.ops.analytics3 import global_doc_ranks
    return global_doc_ranks(sf_dir)


def _q_user_decay_scores(sf_dir: str):
    from nise_ray.ops.analytics3 import user_decay_scores
    return user_decay_scores(sf_dir, half_life_days=7)


def _q_source_lang_kl(sf_dir: str):
    from nise_ray.ops.analytics3 import source_lang_kl
    return source_lang_kl(sf_dir)


def _q_data_quality_report(sf_dir: str):
    from nise_ray.ops.relational4 import data_quality_report
    return data_quality_report(sf_dir)


def _q_denormalized_orders(sf_dir: str):
    from nise_ray.ops.relational4 import denormalized_orders
    return denormalized_orders(sf_dir)


def _q_length_deciles(sf_dir: str):
    from nise_ray.ops.analytics3 import length_deciles
    return length_deciles(sf_dir)


def _q_event_type_affinity(sf_dir: str):
    from nise_ray.ops.analytics3 import event_type_affinity
    return event_type_affinity(sf_dir)


def _q_curate_corpus(sf_dir: str):
    from nise_ray.ops.curate import curate_corpus
    return curate_corpus(sf_dir)


def _q_clone_group_representatives(sf_dir: str):
    from nise_ray.ops.dedupx import clone_group_representatives
    return clone_group_representatives(sf_dir)


def _q_near_dedup_keep_best(sf_dir: str):
    from nise_ray.ops.dedupx import near_dedup_keep_best
    return near_dedup_keep_best(sf_dir)


def _q_cross_dedup_docs(sf_dir: str):
    from nise_ray.ops.dedupx import cross_dedup_docs
    return cross_dedup_docs(sf_dir, prefix_chars=200)


def _q_urgent_items_bloom(sf_dir: str):
    from nise_ray.ops.bloom import urgent_items_by_flag
    return urgent_items_by_flag(sf_dir, use_bloom=True)


def _q_hard_negatives(sf_dir: str):
    from nise_ray.ops.ann import hard_negatives
    return hard_negatives(sf_dir, n_queries=5, k=10)


def _q_blocklist_filter(sf_dir: str):
    from nise_ray.ops.textstats import blocklist_filter_docs
    return blocklist_filter_docs(sf_dir)


def _q_dsir_weights(sf_dir: str):
    from nise_ray.ops.dsir import dsir_weights
    return dsir_weights(sf_dir, target_lang="en")


def _q_perplexity_buckets(sf_dir: str):
    from nise_ray.ops.dsir import perplexity_buckets
    return perplexity_buckets(sf_dir, n_buckets=3)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- dedup family (SURVEY §3) ---------------------------------
        "exact_dedup_docs": _q_exact_dedup,
        "minhash_dedup_docs": _q_minhash_dedup,
        "simhash_docs": _q_simhash_docs,
        "simhash_sha_docs": _q_simhash_sha,
        "ngram_jaccard_pairs_docs": _q_ngram_jaccard,
        "ngram_jaccard_exact_pairs_docs": _q_ngram_jaccard_exact,
        "substring_pairs_docs": _q_substring_pairs,
        "substring_containment_docs": _q_substring_containment,
        "substring_pairs_sa": _q_substring_pairs_sa,
        "substring_pairs_sa_global": _q_substring_pairs_sa_global,
        "token_jaccard_pairs_docs": _q_token_jaccard,
        "jaccard_threshold_sweep": _q_jaccard_threshold_sweep,
        "kcore_docs": _q_kcore_docs,
        "jaccard_components": _q_jaccard_components,
        "dedup_cluster_stats": _q_dedup_cluster_stats,
        # rows-only: longest intra-doc repeated substring is not
        # SQL-expressible; pinned by a brute-force oracle in tests
        "longest_repeat_docs": _q_longest_repeat_docs,
        "nearest_neighbor_docs": _q_nearest_neighbor_docs,
        "weighted_jaccard_pairs_docs": _q_weighted_jaccard,
        # rows-only: probabilistic CWS-LSH candidates (exact verify, so
        # no false positives; recall measured by weighted_recall_report)
        "weighted_minhash_pairs": _q_weighted_minhash,
        "weighted_recall_report": _q_weighted_recall_report,
        "source_overlap_pairs": _q_source_overlap,
        "decontaminate_docs": _q_decontaminate,
        "dedup_flagship": _q_dedup_flagship,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "chunk_dedup_docs": _q_chunk_dedup,
        "dedup_delta": _q_dedup_delta,
        # --- similarity search ----------------------------------------
        "ann_topk": _q_ann_topk,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "ann_topk_pq": _q_ann_topk_pq,
        "pq_encode_codes": _q_pq_encode,
        "embedding_norms": _q_embedding_norms,
        "export_tar_shards": _q_export_tar_shards,
        "embedding_covariance": _q_embedding_covariance,
        "embedding_pca": _q_embedding_pca,
        "embedding_outliers": _q_embedding_outliers,
        "label_centroids": _q_label_centroids,
        "packed_docs": _q_packed_docs,
        "winsorized_doc_lengths": _q_winsorized_doc_lengths,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "skyline_parts": _q_skyline_parts,
        "hive_pruned_counts": _q_hive_pruned_counts,
        "embedding_dup_pairs": _q_embedding_dups,
        "embedding_dup_pairs_exact": _q_embedding_dups_exact,
        "embedding_clusters": _q_embedding_clusters,
        "dup_graph_triangles": _q_dup_graph_triangles,
        "pagerank_dup_graph": _q_pagerank_dup_graph,
        "embedding_kmeans": _q_embedding_kmeans,
        "semantic_dedup_pairs": _q_semantic_dedup,
        "semantic_dedup_keep": _q_semantic_dedup_keep,
        # --- text analysis --------------------------------------------
        "token_stats": _q_token_stats,
        "quality_scores": _q_quality,
        "doc_fingerprints": _q_fingerprints,
        "gopher_quality": _q_gopher_quality,
        "repetition_stats": _q_repetition_stats,
        "bigram_repetition_stats": _q_bigram_repetition,
        "bm25_scores": _q_bm25_scores,
        "chunk_documents": _q_chunk_documents,
        "pack_documents": _q_pack_documents,
        "weighted_sample_docs": _q_weighted_sample,
        "unigram_logprob": _q_unigram_logprob,
        "dsir_weights": _q_dsir_weights,
        "perplexity_buckets": _q_perplexity_buckets,
        "token_entropy": _q_token_entropy,
        "prepare_training_docs": _q_prepare_training_docs,
        "curate_corpus": _q_curate_corpus,
        "length_histogram": _q_length_histogram,
        "lang_distribution": _q_lang_distribution,
        "language_id": _q_language_id,
        # --- events / relational ops ----------------------------------
        "asof_join_events": _q_asof_join,
        "range_join_prior_counts": _q_range_join,
        "window_running_stats": _q_running_stats,
        "lang_length_quantiles": _q_lang_quantiles,
        "lang_length_quantiles_cont": _q_lang_quantiles_cont,
        "lang_length_quantiles_sketch": _q_lang_quantiles_sketch,
        "windowed_events": _q_windowed_events,
        "ohlc_resample": _q_ohlc_resample,
        "daily_type_coverage": _q_daily_type_coverage,
        "shipment_overlap_counts": _q_shipment_overlaps,
        "merge_upsert_docs": _q_merge_upsert,
        "unpivot_quality_metrics": _q_unpivot_quality,
        "user_activity_streaks": _q_activity_streaks,
        "source_vocab_jaccard": _q_source_vocab_jaccard,
        "duplicate_lines_docs": _q_duplicate_lines,
        "line_dedup_docs": _q_line_dedup,
        "rolling_wau": _q_rolling_wau,
        "dup_ngram_coverage": _q_dup_ngram_coverage,
        "percent_rank_docs": _q_percent_rank,
        "bigram_collocations": _q_bigram_collocations,
        "time_window_stats": _q_time_window_stats,
        "groups_window_stats": _q_groups_window_stats,
        "daily_counts_filled": _q_daily_counts_filled,
        "dup_graph_degrees": _q_dup_graph_degrees,
        "global_doc_ranks": _q_global_doc_ranks,
        "length_deciles": _q_length_deciles,
        "event_type_affinity": _q_event_type_affinity,
        "data_quality_report": _q_data_quality_report,
        "denormalized_orders": _q_denormalized_orders,
        "user_decay_scores": _q_user_decay_scores,
        "source_lang_kl": _q_source_lang_kl,
        "sliding_windows": _q_sliding_windows,
        "user_sessions": _q_user_sessions,
        "event_type_pivot": _q_event_type_pivot,
        "stratified_sample_docs": _q_stratified_sample,
        "rollup_doc_counts": _q_rollup_doc_counts,
        "cube_doc_counts": _q_cube_doc_counts,
        "grouping_sets_doc_counts": _q_grouping_sets_doc_counts,
        "redact_docs": _q_redact_docs,
        "lang_token_char_regression": _q_lang_token_char_regression,
        "last_touch_attribution": _q_last_touch_attribution,
        "linear_attribution": _q_linear_attribution,
        "late_events_report": _q_late_events_report,
        "lang_char_moments": _q_lang_char_moments,
        "lang_char_skewkurt": _q_lang_char_skewkurt,
        "lang_doc_share": _q_lang_doc_share,
        "normalized_docs": _q_normalized_docs,
        "lang_mad_chars": _q_lang_mad_chars,
        "user_value_trend": _q_user_value_trend,
        "user_event_entropy": _q_user_event_entropy,
        "user_props_bitmask": _q_user_props_bitmask,
        "user_value_quartiles": _q_user_value_quartiles,
        "snapshot_diff_docs": _q_snapshot_diff,
        "top_doc_terms": _q_top_doc_terms,
        "user_event_stats": _q_user_event_stats,
        "top_tokens": _q_top_tokens,
        "zipf_fit": _q_zipf_fit,
        "top_tokens_sketch": _q_top_tokens_sketch,
        "top_docs_by_len": _q_top_docs_by_len,
        "event_type_user_counts": _q_event_type_user_counts,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "pricing_summary": _q_pricing_summary,
        "segment_revenue": _q_segment_revenue,
        "top_unshipped_orders": _q_top_unshipped,
        "nation_revenue": _q_nation_revenue,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "order_priority_counts": _q_order_priority_counts,
        "promo_revenue_share": _q_promo_revenue_share,
        "volume_shipping": _q_volume_shipping,
        "containment_pairs_docs": _q_containment_pairs,
        "type2_clone_groups": _q_type2_clone_groups,
        "clone_group_representatives": _q_clone_group_representatives,
        # rows-only: near-dup clustering is not SQL-expressible; keep
        # policy invariants are tested (one keep per cluster, max chars)
        "near_dedup_keep_best": _q_near_dedup_keep_best,
        "cross_dedup_docs": _q_cross_dedup_docs,
        "urgent_items_bloom": _q_urgent_items_bloom,
        "hard_negatives": _q_hard_negatives,
        "blocklist_filter_docs": _q_blocklist_filter,
        "retention_cohorts": _q_retention_cohorts,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "event_anomaly_days": _q_event_anomaly_days,
        # rows-only: truth side is the brute-force shingle oracle, not SQL
        "dedup_recall_report": _q_dedup_recall_report,
        # rows-only: no SQL engine exposes deterministic DEFLATE
        "compression_ratio": _q_compression_ratio,
        # rows-only: measures the probabilistic LSH/IVF paths
        "ann_recall_report": _q_ann_recall_report,
        "forecast_revenue_change": _q_forecast_revenue_change,
        "priority_shipment_counts": _q_priority_shipment_counts,
        "market_share": _q_market_share,
        "product_profit": _q_product_profit,
        "waiting_suppliers": _q_waiting_suppliers,
        "min_cost_supplier": _q_min_cost_supplier,
        "important_parts": _q_important_parts,
        "dominant_part_suppliers": _q_dominant_part_suppliers,
        "customer_order_distribution": _q_customer_order_distribution,
        "disjunctive_filter_revenue": _q_disjunctive_filter_revenue,
        "event_interarrival": _q_event_interarrival,
        "moving_event_stats": _q_moving_event_stats,
        "scrub_event_props": _q_scrub_event_props,
        "high_value_users_intersect": _q_high_value_users_intersect,
        "high_value_users_except": _q_high_value_users_except,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "user_first_last_event": _q_user_first_last_event,
        "top_suppliers_by_qty": _q_top_suppliers_by_qty,
        "brand_supplier_counts": _q_brand_supplier_counts,
        "returned_item_report": _q_returned_item_report,
        "global_sales_opportunity": _q_global_sales_opportunity,
        "token_cooccurrence": _q_token_cooccurrence,
        "value_rank_windows": _q_value_rank_windows,
        "monthly_revenue": _q_monthly_revenue,
        "event_transitions": _q_event_transitions,
        "doc_zscores": _q_doc_zscores,
        "event_type_user_counts_approx": _q_event_type_user_counts_approx,
        "funnel_counts": _q_funnel_counts,
        "user_event_paths": _q_user_event_paths,
        "user_top_event": _q_user_top_event,
        "value_time_correlation": _q_value_time_correlation,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "large_volume_customers": _q_large_volume_customers,
        "customers_without_orders": _q_customers_without_orders,
        "flagship_sha_audit": _q_flagship_sha_audit,
        "shingle_stats": _q_shingle_stats,
        # --- index build/query (reference's online surface) -----------
        "index_query": _q_index_query,
        # --- multimodal plumbing (deterministic stub decode) ----------
        "multimodal_features": _q_multimodal_features,
        "multimodal_real_audio": _q_multimodal_real_audio,
        "multimodal_real_image": _q_multimodal_real_image,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_docs": """
            SELECT min(doc_id) AS rep_doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        # winnowing stage restricted to containment cases: the guarantee
        # (any shared substring >= 100 normalized chars yields a shared
        # fingerprint) makes the candidate set complete for this subset,
        # so it IS SQL-expressible. Normalization = NFC (identity on the
        # ASCII corpus) + collapse [ \t\r\f\v]+ to one space + strip.
        "substring_containment_docs": """
            WITH n AS (
              SELECT min(doc_id) AS doc_id,
                     trim(regexp_replace(any_value(text),
                                         '[ \t\r\f\x0b\x0c]+', ' ', 'g'),
                          ' ' || chr(10) || chr(13) || chr(9)
                              || chr(11) || chr(12)) AS nt
              FROM documents GROUP BY text)
            SELECT a.doc_id AS doc_id_u, b.doc_id AS doc_id_v
            FROM n a JOIN n b ON a.doc_id < b.doc_id
            WHERE a.nt <> b.nt
              AND ((length(a.nt) >= 100 AND position(a.nt IN b.nt) > 0)
                OR (length(b.nt) >= 100 AND position(b.nt IN a.nt) > 0))
        """,
        # exact token-set Jaccard similarity self-join (prefix-filtered
        # in the engine, brute-force in SQL); integer-only output contract
        # so the hash compare has no float-rounding hazard
        "token_jaccard_pairs_docs": """
            WITH d AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
              FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
              FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT u AS doc_id_u, v AS doc_id_v,
                   i AS n_inter, su.n + sv.n - i AS n_union
            FROM inter
            JOIN sz su ON su.doc_id = u
            JOIN sz sv ON sv.doc_id = v
            WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i)
            ORDER BY 1, 2
        """,
        # SimHash over sha256-derived trigram shingles: DuckDB recomputes
        # the identical shingle hash (sha256 hex -> first 16 nibbles as
        # UBIGINT) and re-derives every fingerprint bit by majority vote
        # (2 * popcount_j > n) with bit arithmetic — the engine's
        # vectorized per-byte unpack/reduceat kernel checked end-to-end
        "simhash_sha_docs": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '[A-Za-z0-9_]+')
                                  AS toks
                       FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     CAST(concat('0x', substr(sha256(
                       array_to_string(toks[i:i+2], ' ')), 1, 16))
                       AS UBIGINT) AS h
                   FROM t, UNNEST(range(1, greatest(len(toks)-2, 0)+1))
                       AS u(i)),
            bits AS (SELECT doc_id, j,
                       CASE WHEN 2*SUM(CAST((h >> CAST(j AS INTEGER)) & 1
                                            AS BIGINT)) > COUNT(*)
                            THEN CAST(1 AS UBIGINT)
                            ELSE CAST(0 AS UBIGINT) END AS bit
                     FROM sh, UNNEST(range(0, 64)) AS b(j)
                     GROUP BY doc_id, j),
            fp AS (SELECT doc_id, bit_or(bit << CAST(j AS INTEGER)) AS f
                   FROM bits GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(lpad(lower(to_hex(fp.f)), 16, '0'),
                            '0000000000000000') AS simhash_hex
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN fp ON fp.doc_id = d.doc_id
            ORDER BY 1
        """,
        # exact trigram-shingle Jaccard self-join: shingle explode via
        # list slicing + self-join in SQL vs the engine's prefix-filtered
        # plan over sha256-shingle units; integer-only output contract
        "ngram_jaccard_exact_pairs_docs": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '[A-Za-z0-9_]+')
                                  AS toks
                       FROM documents),
            d AS (SELECT DISTINCT doc_id,
                         array_to_string(toks[i:i+2], ' ') AS sh
                  FROM t, UNNEST(range(1, greatest(len(toks)-2, 0)+1))
                      AS u(i)),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
                      FROM d a JOIN d b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT u AS doc_id_u, v AS doc_id_v,
                   i AS n_inter, su.n + sv.n - i AS n_union
            FROM inter
            JOIN sz su ON su.doc_id = u
            JOIN sz sv ON sv.doc_id = v
            WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i)
            ORDER BY 1, 2
        """,
        # k-core by recursive CTE: the shrinking-fixpoint trick — a node
        # with >= k ALIVE neighbors at a round must itself be alive (alive
        # sets only shrink), so one self-reference per level suffices;
        # the iteration bound is the node count (absolute convergence)
        "kcore_docs": """
            WITH RECURSIVE
            d AS (SELECT DISTINCT doc_id,
                         unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                             AS tok
                  FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
                      FROM d a JOIN d b
                        ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            e AS (SELECT u, v FROM inter
                  JOIN sz su ON su.doc_id = u
                  JOIN sz sv ON sv.doc_id = v
                  WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i)),
            ee AS (SELECT u AS a, v AS b FROM e
                   UNION ALL SELECT v, u FROM e),
            bound AS (SELECT count(DISTINCT a) AS n FROM ee),
            alive(iter, doc) AS (
              SELECT 0, a FROM (SELECT DISTINCT a FROM ee)
              UNION ALL
              SELECT x.iter + 1, x.b FROM (
                SELECT al.iter AS iter, ee.b AS b, count(*) AS nn
                FROM alive al JOIN ee ON ee.a = al.doc
                GROUP BY al.iter, ee.b) x
              WHERE x.nn >= 3 AND x.iter + 1 <= (SELECT n FROM bound)
            ),
            final AS (SELECT DISTINCT doc FROM alive
                      WHERE iter = (SELECT n FROM bound)),
            core_e AS (SELECT ee.a FROM ee
                       JOIN final f1 ON f1.doc = ee.a
                       JOIN final f2 ON f2.doc = ee.b)
            SELECT a AS doc_id, count(*) AS core_degree
            FROM core_e GROUP BY 1 ORDER BY 1
        """,
        # tau-sensitivity buckets over the same exact join — `//` is
        # DuckDB integer division, matching the numpy (10*i)//u bucketing
        "jaccard_threshold_sweep": """
            WITH d AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
              FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
              FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
            p AS (
              SELECT i, su.n + sv.n - i AS un
              FROM inter
              JOIN sz su ON su.doc_id = u
              JOIN sz sv ON sv.doc_id = v
              WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i))
            SELECT (10 * i) // un AS bucket,
                   count(*) AS n_pairs,
                   CAST(sum(un) AS BIGINT) AS total_union
            FROM p GROUP BY 1 ORDER BY 1
        """,
        # CC over the exact similarity graph via recursive-CTE
        # transitive closure — oracles the star-decomposition
        # connected-components core end-to-end (min-doc_id labels,
        # singletons label themselves)
        "jaccard_components": """
            WITH RECURSIVE
             d AS (SELECT DISTINCT doc_id,
                          unnest(regexp_extract_all(
                              text, '[A-Za-z0-9_]+')) AS tok
                   FROM documents),
             sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
             e AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
                   FROM d a JOIN d b
                        ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
             ed AS (SELECT u, v FROM e
                    JOIN sz su ON su.doc_id = e.u
                    JOIN sz sv ON sv.doc_id = e.v
                    WHERE CAST(e.i AS DOUBLE)
                            >= 0.8 * (su.n + sv.n - e.i)),
             bid AS (SELECT u, v FROM ed
                     UNION ALL SELECT v AS u, u AS v FROM ed),
             reach(node, m) AS (
               SELECT u, v FROM bid
               UNION
               SELECT r.node, b.v FROM reach r JOIN bid b ON b.u = r.m
             )
            SELECT d2.doc_id,
                   CAST(least(d2.doc_id, coalesce(min(r.m), d2.doc_id))
                        AS BIGINT) AS cluster_id
            FROM documents d2 LEFT JOIN reach r ON r.node = d2.doc_id
            GROUP BY d2.doc_id
        """,
        # survivorship rollup over the same recursive-CTE components:
        # per cluster, members / total chars / chars saved by keeping
        # only the min-doc_id member
        "dedup_cluster_stats": """
            WITH RECURSIVE
             d AS (SELECT DISTINCT doc_id,
                          unnest(regexp_extract_all(
                              text, '[A-Za-z0-9_]+')) AS tok
                   FROM documents),
             sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
             e AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
                   FROM d a JOIN d b
                        ON a.tok = b.tok AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
             ed AS (SELECT u, v FROM e
                    JOIN sz su ON su.doc_id = e.u
                    JOIN sz sv ON sv.doc_id = e.v
                    WHERE CAST(e.i AS DOUBLE)
                            >= 0.8 * (su.n + sv.n - e.i)),
             bid AS (SELECT u, v FROM ed
                     UNION ALL SELECT v AS u, u AS v FROM ed),
             reach(node, m) AS (
               SELECT u, v FROM bid
               UNION
               SELECT r.node, b.v FROM reach r JOIN bid b ON b.u = r.m
             ),
             lab AS (
               SELECT d2.doc_id, d2.n_chars,
                      least(d2.doc_id, coalesce(min(r.m), d2.doc_id))
                        AS cluster_id
               FROM documents d2 LEFT JOIN reach r ON r.node = d2.doc_id
               GROUP BY d2.doc_id, d2.n_chars)
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
                   count(*) AS n_members,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN doc_id = cluster_id THEN 0
                                 ELSE n_chars END) AS BIGINT)
                     AS saved_chars
            FROM lab GROUP BY cluster_id
        """,
        # per-doc best weighted-Jaccard neighbor above tau=0.3 (complete
        # via the exact join, so fully oracled); ties on jw break to the
        # smaller neighbor id — jw doubles are bit-identical in both
        # engines, so the tie order agrees
        "nearest_neighbor_docs": """
            WITH tf AS (
              SELECT doc_id, tok, count(*) AS w
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(
                               text, '[A-Za-z0-9_]+')) AS tok
                    FROM documents)
              GROUP BY doc_id, tok),
            s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tot
                  FROM tf GROUP BY doc_id),
            i AS (SELECT a.doc_id AS u, b.doc_id AS v,
                         CAST(sum(least(a.w, b.w)) AS BIGINT) AS m
                  FROM tf a JOIN tf b
                       ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            p AS (SELECT i.u, i.v,
                         CAST(i.m AS DOUBLE)
                           / CAST(su.tot + sv.tot - i.m AS DOUBLE) AS jw
                  FROM i JOIN s su ON su.doc_id = i.u
                         JOIN s sv ON sv.doc_id = i.v
                  WHERE CAST(i.m AS DOUBLE)
                          / CAST(su.tot + sv.tot - i.m AS DOUBLE) >= 0.3),
            bid AS (SELECT u AS doc_id, v AS nb, jw FROM p
                    UNION ALL SELECT v AS doc_id, u AS nb, jw FROM p),
            best AS (SELECT doc_id, nb, jw,
                            row_number() OVER (
                                PARTITION BY doc_id
                                ORDER BY jw DESC, nb ASC) AS rn
                     FROM bid)
            SELECT d.doc_id, b.nb AS nn_doc_id, b.jw AS nn_jw
            FROM documents d
            LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
                 USING (doc_id)
        """,
        # WEIGHTED (term-frequency multiset) Jaccard self-join — the
        # TF-sensitive sibling of token_jaccard_pairs_docs. jw is ONE
        # double division of exact int64s in both engines, so even the
        # float column hashes bit-exact
        "weighted_jaccard_pairs_docs": """
            WITH tf AS (
              SELECT doc_id, tok, count(*) AS w
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(
                               text, '[A-Za-z0-9_]+')) AS tok
                    FROM documents)
              GROUP BY doc_id, tok),
            s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tot
                  FROM tf GROUP BY doc_id),
            i AS (SELECT a.doc_id AS u, b.doc_id AS v,
                         CAST(sum(least(a.w, b.w)) AS BIGINT) AS m
                  FROM tf a JOIN tf b
                       ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
            SELECT i.u AS doc_id_u, i.v AS doc_id_v, i.m AS w_inter,
                   su.tot + sv.tot - i.m AS w_union,
                   CAST(i.m AS DOUBLE)
                     / CAST(su.tot + sv.tot - i.m AS DOUBLE) AS jw
            FROM i JOIN s su ON su.doc_id = i.u
                   JOIN s sv ON sv.doc_id = i.v
            WHERE CAST(i.m AS DOUBLE)
                    / CAST(su.tot + sv.tot - i.m AS DOUBLE) >= 0.5
            ORDER BY 1, 2
        """,
        # fork/source-overlap detection: the token-Jaccard near-dup pairs
        # rolled up to (source_u, source_v) — the repo-overlap query a
        # code-dedup pipeline runs to collapse forks
        "source_overlap_pairs": """
            WITH d AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
              FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
              FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
            p AS (
              SELECT u, v FROM inter
              JOIN sz su ON su.doc_id = u
              JOIN sz sv ON sv.doc_id = v
              WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i))
            SELECT LEAST(du.source, dv.source) AS source_u,
                   GREATEST(du.source, dv.source) AS source_v,
                   count(*) AS n_pairs
            FROM p
            JOIN documents du ON du.doc_id = p.u
            JOIN documents dv ON dv.doc_id = p.v
            WHERE du.source <> dv.source
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        # benchmark decontamination: corpus docs (doc_id >= 20) sharing at
        # least one 5-token n-gram with the eval set (doc_id < 20), with
        # the exact count of distinct shared grams
        "decontaminate_docs": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS ts
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ts, i + 1, i + 5), ' ') AS gram
              FROM toks, UNNEST(range(greatest(len(ts) - 4, 0))) AS u(i)),
            e AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
            SELECT g.doc_id AS doc_id, count(*) AS n_shared
            FROM g JOIN e USING (gram)
            WHERE g.doc_id >= 20
            GROUP BY g.doc_id
            ORDER BY g.doc_id
        """,
        "asof_join_events": """
            SELECT c.event_id AS event_id, c.user_id AS user_id,
                   c.ts AS ts, c.value AS value,
                   v.ts AS right_ts, v.value AS right_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        # self range join: events by the same user within the preceding
        # hour — integer-exact contract
        "range_join_prior_counts": """
            SELECT a.event_id AS event_id, count(b.event_id) AS n_prior
            FROM events a LEFT JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
            GROUP BY a.event_id
        """,
        # window functions: row_number + running max are comparison-only,
        # so the value-hash compare has no float-accumulation hazard
        "window_running_stats": """
            SELECT event_id,
                   row_number() OVER w AS row_num,
                   max(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS running_max
            FROM events WINDOW w AS (PARTITION BY user_id
                                     ORDER BY ts, event_id)
        """,
        "lang_length_quantiles": """
            SELECT lang, count(*) AS n_docs,
                   quantile_disc(n_chars, 0.5) AS p50_chars,
                   quantile_disc(n_chars, 0.9) AS p90_chars
            FROM documents GROUP BY lang
        """,
        "lang_length_quantiles_cont": """
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
            FROM documents GROUP BY lang
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words
            FROM documents
        """,
        "quality_scores": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_c,
                   CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                             / length(text) END AS alpha_ratio
            FROM documents
        """,
        "doc_fingerprints": """
            SELECT doc_id, sha256(text) AS fingerprint FROM documents
        """,
        # equi-width histogram (fixed buckets keep it one-pass)
        "length_histogram": """
            SELECT lang, (n_chars // 100) * 100 AS bucket_lo,
                   count(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        # Efraimidis-Spirakis weighted sample: set selected by the same
        # deterministic key both engines compute; the key itself is NOT
        # emitted (numpy/DuckDB pow differ by 1 ulp on ~half of values;
        # the selected set is stable — boundary gaps ~1e-5 >> ulp)
        "weighted_sample_docs": """
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     pow((((doc_id * 2654435761) % 4294967296) + 1)
                           / 4294967297.0,
                         1.0 / greatest(n_chars, 1)) AS key
              FROM documents ORDER BY key DESC, doc_id LIMIT 50)
        """,
        # overlapping context-window chunking (flat-map explode);
        # codepoint slicing == SQL substr character semantics
        "chunk_documents": """
            WITH n AS (SELECT doc_id, text,
                              CAST(floor((length(text)-1)/384) AS BIGINT)
                                AS last_i
                       FROM documents WHERE length(text) > 0)
            SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
                   substr(text, CAST(1 + u.i*384 AS BIGINT), 512)
                     AS chunk_text
            FROM n, unnest(range(0, last_i + 1)) AS u(i)
        """,
        # Gopher dup-2-gram signals; bigrams via list_transform lambda
        "bigram_repetition_stats": """
            WITH grams AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(length(toks)-1, 0)),
                       i -> toks[i] || chr(1) || toks[i+1])) AS g
              FROM (SELECT doc_id,
                           regexp_extract_all(text, '[A-Za-z0-9_]+')
                             AS toks
                    FROM documents)),
            gf AS (SELECT doc_id, g, count(*) AS c FROM grams
                   GROUP BY 1, 2),
            agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                           CAST(count(*) AS BIGINT) AS n_uniq_bigrams,
                           1.0 - count(*) / CAST(sum(c) AS DOUBLE)
                             AS dup_bigram_frac,
                           max(c) / CAST(sum(c) AS DOUBLE)
                             AS top_bigram_share
                    FROM gf GROUP BY 1)
            SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
                   coalesce(a.n_uniq_bigrams, 0) AS n_uniq_bigrams,
                   coalesce(a.dup_bigram_frac, 0.0) AS dup_bigram_frac,
                   coalesce(a.top_bigram_share, 0.0) AS top_bigram_share
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # BM25 lexical retrieval (Lucene idf variant); rank-free contract
        # (sorted by doc_id, not score) so FP score ties cannot reorder
        "bm25_scores": """
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(
                                    text, '[A-Za-z0-9_]+')) AS token
                         FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS c FROM tok
                   WHERE token IN ('hash', 'join', 'merge') GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            consts AS (SELECT (SELECT count(*) FROM documents) AS n,
                              (SELECT CAST(count(*) AS DOUBLE) FROM tok)
                                / (SELECT count(*) FROM documents) AS avgdl),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
            SELECT tf.doc_id,
                   round(sum( ln((n - df + 0.5)/(df + 0.5) + 1.0)
                              * c * (1.2 + 1.0)
                              / (c + 1.2*(1.0 - 0.75 + 0.75*dl.dl/avgdl)) ),
                         4) AS bm25
            FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
            CROSS JOIN consts
            GROUP BY tf.doc_id
        """,
        # Gopher-style repetition signals (Rae et al. 2021 §A1.1);
        # UNROUNDED integer-ratio doubles are bit-identical across
        # engines, while round(,4) diverges on half-way ties
        "repetition_stats": """
            WITH tok AS (SELECT doc_id,
                                unnest(regexp_extract_all(
                                    text, '[A-Za-z0-9_]+')) AS token
                         FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS c
                   FROM tok GROUP BY 1, 2),
            agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                           CAST(count(*) AS BIGINT) AS n_uniq_tokens,
                           1.0 - count(*) / CAST(sum(c) AS DOUBLE)
                             AS dup_token_frac,
                           max(c) / CAST(sum(c) AS DOUBLE)
                             AS top_token_share
                    FROM tf GROUP BY 1)
            SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
                   coalesce(a.n_uniq_tokens, 0) AS n_uniq_tokens,
                   coalesce(a.dup_token_frac, 0.0) AS dup_token_frac,
                   coalesce(a.top_token_share, 0.0) AS top_token_share
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x))), 4) AS l2_norm
            FROM embeddings
        """,
        # hive-partitioned rewrite -> directory-pruned read -> aggregate;
        # the oracle runs over the ORIGINAL table, so the round-trip
        # losing or duplicating rows fails the gate
        "hive_pruned_counts": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE lang = 'en' GROUP BY source
        """,
        # per-label mean embedding (grouped first-moment combiner)
        "label_centroids": """
            WITH idx AS (SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS i),
                 e AS (SELECT CAST(label AS BIGINT) AS label, i,
                              CAST(embedding[i] AS DOUBLE) AS v
                       FROM embeddings CROSS JOIN idx)
            SELECT label, i, round(avg(v), 6) AS centroid
            FROM e GROUP BY label, i
        """,
        # sequence packing = exclusive running token sum over the global
        # doc_id order, split at capacity boundaries (all exact ints)
        "packed_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                          AS BIGINT) AS n_tokens
              FROM documents),
            s AS (
              SELECT doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS excl
              FROM t)
            SELECT doc_id, n_tokens,
                   CAST(excl // 2048 AS BIGINT) AS bin_id,
                   CAST(excl % 2048 AS BIGINT) AS start_off
            FROM s
        """,
        # winsorization: clamp to the per-lang interpolated quantile
        # band; bounds rounded to 4dp on both engines (the proven
        # quantile_cont portability contract)
        "winsorized_doc_lengths": """
            WITH q AS (SELECT lang,
                              round(quantile_cont(n_chars, 0.05), 4) AS lo,
                              round(quantile_cont(n_chars, 0.95), 4) AS hi
                       FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
                   greatest(q.lo, least(q.hi,
                       CAST(d.n_chars AS DOUBLE))) AS w_chars
            FROM documents d JOIN q USING (lang)
        """,
        # grouped heavy hitters: top-10 tokens per language, ties on
        # token text (same tokenizer contract as top_tokens)
        "top_tokens_per_lang": r"""
            WITH tok AS (SELECT lang,
                                unnest(regexp_extract_all(
                                    text, '[A-Za-z0-9_]+')) AS token
                         FROM documents),
            c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
                  FROM tok GROUP BY lang, token),
            r AS (SELECT lang, token, n,
                         row_number() OVER (PARTITION BY lang
                             ORDER BY n DESC, token) AS rnk
                  FROM c)
            SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, n
            FROM r WHERE rnk <= 10
        """,
        # Pareto frontier (two-phase distributed skyline); NOT EXISTS
        # dominance is the textbook SQL formulation
        "skyline_parts": """
            SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                   p_retailprice
            FROM part a
            WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_size >= a.p_size
                  AND b.p_retailprice >= a.p_retailprice
                  AND (b.p_size > a.p_size
                       OR b.p_retailprice > a.p_retailprice))
        """,
        # manifest accounting of the tar-shard training export: the
        # engine numbers come from the actual write path (bytes counted
        # on the shard members), the oracle from plain SQL
        "export_tar_shards": """
            SELECT CAST(doc_id % 16 AS BIGINT) AS shard_id,
                   count(*) AS n_docs,
                   CAST(sum(strlen(text)) AS BIGINT) AS text_bytes
            FROM documents GROUP BY 1
        """,
        # population covariance of the 64 embedding dims, upper triangle;
        # engine = mergeable (n, Σx, Σxxᵀ) combiner, one row per block
        "embedding_covariance": """
            WITH idx AS (SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS i),
                 e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
                       FROM embeddings CROSS JOIN idx)
            SELECT a.i AS i, b.i AS j,
                   round(covar_pop(a.v, b.v), 6) AS cov
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5)
            SELECT q.qid AS query_id, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS cosine
            FROM q, embeddings e
            WHERE e.vec_id <> q.qid
            QUALIFY row_number() OVER (
                PARTITION BY q.qid
                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                         e.vec_id) <= 10
        """,
        "embedding_dup_pairs_exact": """
            SELECT a.vec_id AS u, b.vec_id AS v,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])),
                         4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])),
                        4) >= 0.3
            ORDER BY 1, 2
        """,
        "dup_graph_triangles": """
            WITH e AS MATERIALIZED (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])), 4) >= 0.3)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e ab
            JOIN e ac ON ab.u = ac.u AND ab.v < ac.v
            JOIN e bc ON bc.u = ab.v AND bc.v = ac.v
        """,
        # connected components as a recursive min-label CTE: reach holds
        # every (node, label-of-a-reachable-node) pair — UNION dedup
        # terminates it — and min(label) per node is the component's min
        # id, exactly the engine's large-star/small-star fixed point.
        # This is the external oracle for the clustering core itself.
        "embedding_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
            ),
            edges AS (
                SELECT u AS a, v AS b FROM pairs
                UNION ALL SELECT v AS a, u AS b FROM pairs
            ),
            reach(node, label) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
            )
            SELECT node AS vec_id, CAST(min(label) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        """,
        "unigram_logprob": """
            WITH tok AS (
                SELECT doc_id, u.t AS token
                FROM documents,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS u(t)
                WHERE u.t <> ''
            ),
            freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM freq),
            per_doc AS (
                SELECT t.doc_id,
                       CAST(count(*) AS BIGINT) AS n_tokens,
                       round(sum(ln(f.c / tot.s)) / count(*), 4) AS lp
                FROM tok t JOIN freq f USING (token), tot
                GROUP BY t.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.lp, 0.0) AS logprob_mean
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        # composed curation chain: Gopher pass -> exact dedup keep-min
        # -> unigram LM over the SURVIVORS -> NTILE(3) per lang, tail
        # bucket dropped. Each stage mirrors its standalone oracle.
        "curate_corpus": r"""
            WITH sig AS (
              SELECT doc_id, lang, text,
                     CAST(length(regexp_extract_all(text, '\S+'))
                          AS BIGINT) AS n_words,
                     CAST(length(text)
                          - length(regexp_extract_all(text, '\s'))
                          AS BIGINT) AS n_wordchars,
                     CAST(length(regexp_extract_all(
                          text, '[^\s]*[A-Za-z][^\s]*')) AS BIGINT)
                       AS n_alpha_words,
                     CAST(length(text) - length(replace(text, '#', ''))
                          AS BIGINT) AS n_hash,
                     CAST((length(text)
                           - length(replace(text, '...', ''))) // 3
                          AS BIGINT) AS n_ellipsis,
                     CAST(length(regexp_extract_all(lower(text),
                          '\b(the|and|of|to|in|is|that|it|for|was)\b'))
                          AS BIGINT) AS n_stopwords
              FROM documents),
            q AS (
              SELECT doc_id, lang, text FROM sig
              WHERE n_words BETWEEN 50 AND 100000
                AND CAST(n_wordchars AS DOUBLE) / n_words
                    BETWEEN 3.0 AND 10.0
                AND CAST(n_hash + n_ellipsis AS DOUBLE) / n_words <= 0.1
                AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8
                AND n_stopwords >= 2),
            keepids AS (SELECT min(doc_id) AS doc_id FROM q
                        GROUP BY text),
            kept AS (SELECT q.* FROM q JOIN keepids USING (doc_id)),
            tok AS (SELECT doc_id, u.t AS token
                    FROM kept,
                         unnest(regexp_extract_all(
                             text, '[A-Za-z0-9_]+')) AS u(t)
                    WHERE u.t <> ''),
            freq AS (SELECT token, count(*) AS c FROM tok
                     GROUP BY token),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM freq),
            per_doc AS (SELECT t.doc_id,
                               round(sum(ln(f.c / tot.s)) / count(*), 4)
                                 AS lp
                        FROM tok t JOIN freq f USING (token), tot
                        GROUP BY t.doc_id),
            scored AS (SELECT k.doc_id, k.lang,
                              COALESCE(p.lp, 0.0) AS logprob_mean
                       FROM kept k LEFT JOIN per_doc p USING (doc_id)),
            tiled AS (SELECT doc_id, lang, logprob_mean,
                             CAST(ntile(3) OVER (PARTITION BY lang
                                  ORDER BY logprob_mean DESC, doc_id)
                                  AS BIGINT) AS bucket
                      FROM scored)
            SELECT * FROM tiled WHERE bucket <= 2
        """,
        # DSIR importance ratio: per-token diff is two ln's in the SAME
        # IEEE op order as the engine (add-one smoothing over the shared
        # vocab); the per-doc mean is rounded (summation-order heal, as
        # unigram_logprob).
        "dsir_weights": """
            WITH tok AS (
                SELECT d.doc_id, d.lang, u.t AS token
                FROM documents d,
                     unnest(regexp_extract_all(d.text,
                                               '[A-Za-z0-9_]+')) AS u(t)
                WHERE u.t <> ''
            ),
            freq AS (SELECT token, count(*) AS c,
                            count(*) FILTER (WHERE lang = 'en') AS ct
                     FROM tok GROUP BY token),
            consts AS (SELECT CAST(count(*) AS DOUBLE) AS v,
                              CAST(sum(c) AS DOUBLE) AS t_raw,
                              CAST(sum(ct) AS DOUBLE) AS t_tgt
                       FROM freq),
            diff AS (SELECT token,
                            ln((CAST(ct AS DOUBLE) + 1.0) / (t_tgt + v))
                          - ln((CAST(c AS DOUBLE) + 1.0) / (t_raw + v))
                            AS d
                     FROM freq, consts),
            per_doc AS (SELECT t.doc_id,
                               CAST(count(*) AS BIGINT) AS n_tokens,
                               round(sum(f.d) / count(*), 4) AS lr
                        FROM tok t JOIN diff f USING (token)
                        GROUP BY t.doc_id)
            SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.lr, 0.0) AS logratio_mean
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        # CCNet head/middle/tail: NTILE(3) per lang over the SAME
        # rounded unigram log-prob as unigram_logprob (rounding makes
        # the ordering key identical cross-engine; doc_id breaks ties).
        "perplexity_buckets": """
            WITH tok AS (SELECT doc_id, u.t AS token
                         FROM documents,
                              unnest(regexp_extract_all(
                                  text, '[A-Za-z0-9_]+')) AS u(t)
                         WHERE u.t <> ''),
            freq AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM freq),
            per_doc AS (SELECT t.doc_id,
                               round(sum(ln(f.c / tot.s)) / count(*), 4)
                                 AS lp
                        FROM tok t JOIN freq f USING (token), tot
                        GROUP BY t.doc_id),
            scored AS (SELECT d.doc_id, d.lang,
                              COALESCE(p.lp, 0.0) AS logprob_mean
                       FROM documents d LEFT JOIN per_doc p
                       USING (doc_id))
            SELECT doc_id, lang, logprob_mean,
                   CAST(ntile(3) OVER (PARTITION BY lang
                                       ORDER BY logprob_mean DESC,
                                                doc_id)
                        AS BIGINT) AS bucket
            FROM scored
        """,
        # stepwise funnel: step k's completion time = min event time of
        # that type strictly after the user's step-(k-1) completion
        "funnel_counts": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'signup' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'view' AND e.ts > s1.t
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'click' AND e.ts > s2.t
                   GROUP BY e.user_id),
            s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s3 ON e.user_id = s3.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s3.t
                   GROUP BY e.user_id)
            SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
            UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
            UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
        """,
        # suffix-array substring pairs: a pair shares a >=100-char run
        # iff it shares some exact 100-gram — the gram equi-join is the
        # SQL-expressible equivalent of the SA adjacent-LCP runs
        "substring_pairs_sa": """
            WITH g AS (
                SELECT doc_id,
                       substr(text, CAST(u.i AS BIGINT), 100) AS gram
                FROM documents,
                     unnest(range(1, greatest(length(text) - 99, 0) + 1))
                       AS u(i)
            )
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM g a JOIN g b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
        """,
        # the co-located variant must equal the same gram equi-join —
        # the partitioning independence is exactly what it buys
        "substring_pairs_sa_global": """
            WITH g AS (
                SELECT doc_id,
                       substr(text, CAST(u.i AS BIGINT), 100) AS gram
                FROM documents,
                     unnest(range(1, greatest(length(text) - 99, 0) + 1))
                       AS u(i)
            )
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM g a JOIN g b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
        """,
        # composed prep pipeline: quality gate -> exact dedup keep-min ->
        # chunk explode, verified end-to-end as one SQL query
        "prepare_training_docs": """
            WITH q AS (
                SELECT doc_id, text FROM documents
                WHERE length(text) >= 100
                  AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                      * 100 >= 50 * length(text)
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
            kept AS (SELECT q.doc_id, q.text
                     FROM q JOIN keep USING (doc_id)),
            n AS (SELECT doc_id, text,
                         CAST(floor((length(text)-1)/384) AS BIGINT)
                           AS last_i
                  FROM kept WHERE length(text) > 0)
            SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
                   substr(text, CAST(1 + u.i*384 AS BIGINT), 512)
                     AS chunk_text
            FROM n, unnest(range(0, last_i + 1)) AS u(i)
        """,
        "token_entropy": """
            WITH tok AS (
                SELECT doc_id, u.t AS token
                FROM documents,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS u(t)
                WHERE u.t <> ''
            ),
            doc AS (SELECT doc_id, token, count(*) AS c
                    FROM tok GROUP BY doc_id, token),
            per AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4)
                           AS entropy
                FROM doc GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "value_time_correlation": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(corr(value,
                              (epoch_us(ts) % 86400000000) / 1000000.0),
                         4) AS corr_value_tod
            FROM events GROUP BY event_type
        """,
        "user_event_paths": """
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   string_agg(event_type, '->' ORDER BY ts, event_id)
                       AS path
            FROM events GROUP BY user_id
        """,
        "user_top_event": """
            SELECT user_id, event_type AS top_event, CAST(n AS BIGINT) AS n
            FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "event_type_user_counts": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "top_docs_per_lang": """
            SELECT lang, doc_id, n_chars, rank FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id) AS rank
              FROM documents)
            WHERE rank <= 3
            ORDER BY lang, rank
        """,
        # Q17-shaped correlated scalar subquery — two-pass threshold plan
        "small_quantity_revenue": """
            SELECT round(sum(l_extendedprice)/7.0, 2) AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#4'
              AND l_quantity < (SELECT 0.2*avg(l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)
        """,
        # Q18-shaped HAVING + join-back, top-k by order value
        "large_volume_customers": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   sum(l_quantity) AS total_qty
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2, 3, 4, 5 HAVING sum(l_quantity) > 200
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "customers_without_orders": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 350000)
            GROUP BY c_nationkey
            ORDER BY c_nationkey
        """,
        # gap-based sessionization (30-min inactivity gap): lag + running
        # sum of session-start flags, then one row per session
        "user_sessions": """
            WITH flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            numbered AS (
              SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                       AS session_num
              FROM flagged)
            SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_num
        """,
        "event_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'error')    AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'view')     AS n_view,
                   count(*) AS n_total
            FROM events GROUP BY user_id
        """,
        # deterministic stratified sample: same multiplicative hash both
        # engines (doc_id * 2654435761 fits int64 — no overflow hazard)
        "stratified_sample_docs": """
            SELECT lang, doc_id, n_chars FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 10
            ORDER BY lang, doc_id
        """,
        "rollup_doc_counts": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY ROLLUP(documents.lang, documents.source)
            ORDER BY 1, 2
        """,
        "cube_doc_counts": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY CUBE(documents.lang, documents.source)
            ORDER BY 1, 2
        """,
        # the two marginals only — a set selection ROLLUP/CUBE cannot
        # express; grp_id = SQL GROUPING(lang, source) bit mask
        "grouping_sets_doc_counts": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   coalesce(source, 'ALL') AS source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(GROUPING(lang, source) AS BIGINT) AS grp_id
            FROM documents
            GROUP BY GROUPING SETS ((lang), (source))
            ORDER BY 1, 2
        """,
        # same RE2 engine on both sides (pyarrow.compute and DuckDB both
        # embed RE2), so rewrites and hit counts agree byte-for-byte
        "redact_docs": """
            SELECT doc_id,
                   regexp_replace(regexp_replace(text, '[0-9]{4,}',
                                                 '<NUM>', 'g'),
                                  '\\bkey\\b', '<KEY>', 'g') AS clean_text,
                   CAST(length(regexp_extract_all(text, '[0-9]{4,}'))
                        AS BIGINT) AS n_num,
                   CAST(length(regexp_extract_all(text, '\\bkey\\b'))
                        AS BIGINT) AS n_key
            FROM documents
        """,
        # normal equations over EXACT integer moments; floating point
        # enters at exactly one CAST each for numerator / denominator
        # (engine mirrors: float(num)/float(den), both correctly
        # rounded int->double), so the fit hashes bit-exact
        "lang_token_char_regression": """
            WITH d AS (SELECT lang,
                              CAST(length(regexp_extract_all(
                                  text, '[A-Za-z0-9_]+')) AS BIGINT) AS x,
                              n_chars AS y
                       FROM documents),
                 s AS (SELECT lang, count(*) AS n, sum(x) AS sx,
                              sum(y) AS sy, sum(x * y) AS sxy,
                              sum(x * x) AS sxx
                       FROM d GROUP BY lang)
            SELECT lang, CAST(n AS BIGINT) AS n_docs,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                     AS intercept
            FROM s
        """,
        # LEFT-outer as-of SELF-join with NOT-EXISTS tie semantics:
        # most recent strictly-earlier click, ties broken by max
        # event_id; purchases with no prior click keep NULLs
        "last_touch_attribution": """
            WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS click_id, user_id, ts AS cts
                       FROM events WHERE event_type = 'click'),
                 ranked AS (
                    SELECT p.purchase_id, c.click_id, c.cts,
                           row_number() OVER (
                               PARTITION BY p.purchase_id
                               ORDER BY c.cts DESC, c.click_id DESC) AS rn
                    FROM p JOIN c ON c.user_id = p.user_id
                                 AND c.cts < p.ts)
            SELECT p.purchase_id, p.user_id, b.click_id,
                   CAST(epoch_us(p.ts) - epoch_us(b.cts) AS BIGINT)
                     AS gap_us
            FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) b
                 USING (purchase_id)
        """,
        # out-of-order arrival diagnostic: running max ts over ARRIVAL
        # order (event_id) vs each event's own ts — the watermark-choice
        # measurement; first arrivals have no prior and are never late
        "late_events_report": """
            WITH w AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prior_max
              FROM events)
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CASE WHEN prior_max IS NOT NULL
                                  AND epoch_us(prior_max) - epoch_us(ts)
                                      > 3600000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                   CAST(max(CASE WHEN prior_max IS NOT NULL
                                 THEN greatest(epoch_us(prior_max)
                                               - epoch_us(ts), 0)
                                 ELSE 0 END) // 1000000 AS BIGINT)
                     AS max_lag_s
            FROM w GROUP BY user_id
        """,
        # multi-touch LINEAR attribution: one unit of credit split
        # equally across the trailing 7-day click window; share is one
        # double division of exact ints
        "linear_attribution": """
            WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id AS click_id, user_id, ts AS cts
                       FROM events WHERE event_type = 'click'),
                 j AS (SELECT p.purchase_id, p.user_id, c.click_id,
                              count(*) OVER (PARTITION BY p.purchase_id)
                                AS n_win
                       FROM p JOIN c ON c.user_id = p.user_id
                                    AND c.cts < p.ts
                                    AND c.cts >= p.ts - INTERVAL 7 DAY)
            SELECT purchase_id, user_id, click_id,
                   CAST(1 AS DOUBLE) / CAST(n_win AS DOUBLE) AS share
            FROM j
        """,
        "lang_char_moments": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS mean_chars,
                   round(stddev_pop(n_chars), 4) AS sd_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "user_value_quartiles": """
            SELECT user_id, event_id, value,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                                       ORDER BY value, event_id) AS BIGINT)
                     AS quartile
            FROM events
        """,
        # snapshot diff: A = doc_id % 5 != 0, B = doc_id % 3 != 0 with
        # content version bumped for doc_id % 7 == 0 — full outer join
        "snapshot_diff_docs": """
            WITH a AS (SELECT doc_id, n_chars AS va FROM documents
                       WHERE doc_id % 5 <> 0),
                 b AS (SELECT doc_id,
                              n_chars + CASE WHEN doc_id % 7 = 0
                                             THEN 1 ELSE 0 END AS vb
                       FROM documents WHERE doc_id % 3 <> 0)
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.va <> b.vb THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        """,
        # per-doc top terms: tf DESC, global df ASC, token ASC —
        # integer-exact tf-idf ranking (idf is monotone in df)
        "top_doc_terms": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tok GROUP BY 1, 2),
            df AS (SELECT token, count(DISTINCT doc_id) AS df
                   FROM tok GROUP BY 1)
            SELECT doc_id, token, tf, df, rank FROM (
              SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf DESC, df.df ASC,
                                                 tf.token) AS rank
              FROM tf JOIN df USING (token))
            WHERE rank <= 3
        """,
        "windowed_events": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "user_event_stats": """
            SELECT user_id, count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY user_id
        """,
        # OHLC resample: open/close via deterministic (ts, event_id)
        # row_number ranks (arg_min/arg_max would tie-break
        # nondeterministically on equal ts); min/max/open/close are
        # selected raw doubles (bit-identical), only the sum is rounded.
        "ohlc_resample": """
            WITH ranked AS (
              SELECT date_trunc('hour', ts) AS bucket, value,
                     row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                        ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                        ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM events)
            SELECT bucket, count(*) AS n_events,
                   max(CASE WHEN rn_a = 1 THEN value END) AS open_value,
                   max(value) AS high_value,
                   min(value) AS low_value,
                   max(CASE WHEN rn_d = 1 THEN value END) AS close_value,
                   round(sum(value), 4) AS sum_value
            FROM ranked GROUP BY bucket
        """,
        # FULL OUTER join shape; NULL (not 0) marks days absent on a side
        "daily_type_coverage": """
            WITH a AS (SELECT date_trunc('day', ts) AS day,
                              count(*) AS n_a
                       FROM events WHERE event_type = 'click' GROUP BY 1),
                 b AS (SELECT date_trunc('day', ts) AS day,
                              count(*) AS n_b
                       FROM events WHERE event_type = 'error' GROUP BY 1)
            SELECT coalesce(a.day, b.day) AS day, n_a, n_b
            FROM a FULL OUTER JOIN b ON a.day = b.day
        """,
        # interval-overlap self-join: the oracle builds the O(n^2) pair
        # set; the engine counts the same pairs with an O(n log n)
        # per-supplier sweep (see ops/relational4.py). Row-value compare
        # == the engine's (shipdate, orderkey, linenumber) lexsort.
        "shipment_overlap_counts": """
            SELECT a.l_suppkey,
                   CAST(count(*) AS BIGINT) AS n_overlap_pairs
            FROM lineitem a JOIN lineitem b
              ON a.l_suppkey = b.l_suppkey
             AND (a.l_shipdate, a.l_orderkey, a.l_linenumber)
                 < (b.l_shipdate, b.l_orderkey, b.l_linenumber)
             AND a.l_shipdate + to_days(CAST(a.l_quantity AS INTEGER))
                 >= b.l_shipdate
            GROUP BY a.l_suppkey
        """,
        # MERGE INTO shape: same deterministic changeset (doc_id%10:
        # 0=update +1000 chars, 1=delete, 2=insert under id+2^40)
        # declared in SQL; the engine applies it with a distributed
        # left-outer join + union, never seeing the modulo rule.
        "merge_upsert_docs": """
            WITH delta AS (
              SELECT doc_id, 'U' AS op, lang,
                     n_chars + 1000 AS n_chars
              FROM documents WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id, 'D', lang, n_chars
              FROM documents WHERE doc_id % 10 = 1
              UNION ALL
              SELECT doc_id + 1099511627776, 'I', lang, n_chars
              FROM documents WHERE doc_id % 10 = 2)
            SELECT b.doc_id, b.lang,
                   CAST(coalesce(d.n_chars, b.n_chars) AS BIGINT)
                     AS n_chars
            FROM documents b
            LEFT JOIN delta d
              ON b.doc_id = d.doc_id AND d.op IN ('U', 'D')
            WHERE d.op IS NULL OR d.op = 'U'
            UNION ALL
            SELECT doc_id, lang, CAST(n_chars AS BIGINT)
            FROM delta WHERE op = 'I'
        """,
        # UNPIVOT of the quality_scores wide table; int metrics cast
        # exactly to double (values << 2^53).
        "unpivot_quality_metrics": """
            WITH q AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars_c,
                     CAST(length(text) - length(replace(text, chr(10), ''))
                          + 1 AS BIGINT) AS n_lines,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE CAST(length(regexp_replace(
                                 text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                               / length(text) END AS alpha_ratio
              FROM documents)
            SELECT doc_id, 'n_chars_c' AS metric,
                   CAST(n_chars_c AS DOUBLE) AS value FROM q
            UNION ALL
            SELECT doc_id, 'n_lines', CAST(n_lines AS DOUBLE) FROM q
            UNION ALL
            SELECT doc_id, 'alpha_ratio', alpha_ratio FROM q
        """,
        # gaps-and-islands: SQL's day - row_number() island key vs the
        # engine's sorted diff sweep; epoch-day floor division matches
        # the engine's ts // DAY_US exactly (timestamps are positive).
        "user_activity_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
                 i AS (SELECT user_id, day,
                              day - row_number() OVER (
                                  PARTITION BY user_id ORDER BY day)
                                AS isl
                       FROM d),
                 s AS (SELECT user_id, isl, count(*) AS len
                       FROM i GROUP BY 1, 2)
            SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                   CAST(max(len) AS BIGINT) AS longest_streak,
                   CAST(count(*) AS BIGINT) AS n_streaks
            FROM s GROUP BY user_id
        """,
        # vocabulary Jaccard between sources: the oracle self-joins the
        # distinct (source, token) set; the engine ORs per-token source
        # bitmasks through one token exchange and folds them with a
        # bits-matrix matmul. ASCII source names make numpy's and
        # DuckDB's (binary-collation) string orders agree on a < b;
        # jaccard = exact-int DOUBLE division, bit-identical.
        "source_vocab_jaccard": """
            WITH st AS (SELECT DISTINCT source, token FROM (
                   SELECT source,
                          unnest(regexp_extract_all(
                              text, '[A-Za-z0-9_]+')) AS token
                   FROM documents)),
                 sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
                 ix AS (SELECT a.source AS source_a,
                               b.source AS source_b,
                               count(*) AS n_shared
                        FROM st a JOIN st b
                          ON a.token = b.token AND a.source < b.source
                        GROUP BY 1, 2)
            SELECT source_a, source_b,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared)
                     AS jaccard
            FROM ix JOIN sz sa ON sa.source = ix.source_a
                    JOIN sz sb ON sb.source = ix.source_b
        """,
        # line-level dedup family: both engines pin the SAME deterministic
        # 10-token re-wrap of the single-line documents (lines are
        # byte-exact substrings of text; see nise_ray/ops/lines.py module
        # docstring). string_split('',' ')=[''] on both sides, so the
        # remainder/empty edge cases agree exactly.
        "duplicate_lines_docs": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
                 expl AS (SELECT doc_id, t,
                                 unnest(generate_series(0,
                                   CAST(floor((len(t)-1)/10) AS BIGINT)))
                                   AS i
                          FROM toks),
                 lines AS (SELECT doc_id,
                                  array_to_string(
                                    t[(i*10+1):(i*10+10)], ' ') AS line
                           FROM expl)
            SELECT line,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   count(*) AS n_occurrences
            FROM lines GROUP BY line
            HAVING count(DISTINCT doc_id) >= 2
        """,
        "line_dedup_docs": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
                 expl AS (SELECT doc_id, t,
                                 unnest(generate_series(0,
                                   CAST(floor((len(t)-1)/10) AS BIGINT)))
                                   AS i
                          FROM toks),
                 lines AS (SELECT doc_id,
                                  array_to_string(
                                    t[(i*10+1):(i*10+10)], ' ') AS line
                           FROM expl),
                 marked AS (SELECT doc_id, line,
                                   count(DISTINCT doc_id)
                                     OVER (PARTITION BY line) AS nd
                            FROM lines)
            SELECT doc_id, count(*) AS n_lines,
                   CAST(sum(CASE WHEN nd < 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept,
                   CAST(coalesce(sum(CASE WHEN nd < 2 THEN len(line)
                                          ELSE 0 END), 0) AS BIGINT)
                     AS kept_chars
            FROM marked GROUP BY doc_id
        """,
        # Lee et al. 2022 duplicate-40-gram coverage: dup = total gram
        # occurrences >= 2 anywhere (incl. within one doc); per-doc
        # covered chars = interval union of [p, p+40) via the lag-window
        # run-grouping trick. Corpus is ASCII, so char offsets here equal
        # the engine's byte offsets (asserted per batch engine-side).
        "dup_ngram_coverage": """
            WITH pos AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS p,
                     substr(text, CAST(u.i + 1 AS BIGINT), 40) AS gram
              FROM documents, unnest(range(0, length(text) - 39)) AS u(i)
              WHERE length(text) >= 40),
            dup AS (SELECT gram FROM pos GROUP BY gram
                    HAVING count(*) >= 2),
            dp AS (SELECT p.doc_id, p.p FROM pos p JOIN dup USING (gram)),
            runs AS (SELECT doc_id, p,
                     CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                                ORDER BY p) <= 40
                          THEN 0 ELSE 1 END AS new_run FROM dp),
            grp AS (SELECT doc_id, p,
                           sum(new_run) OVER (PARTITION BY doc_id
                                              ORDER BY p
                                              ROWS UNBOUNDED PRECEDING)
                             AS g
                    FROM runs),
            cov AS (SELECT doc_id,
                           CAST(sum(mx - mn + 40) AS BIGINT) AS covered
                    FROM (SELECT doc_id, g, min(p) AS mn, max(p) AS mx
                          FROM grp GROUP BY doc_id, g)
                    GROUP BY doc_id)
            SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
                   CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_chars,
                   CASE WHEN length(d.text) = 0 THEN 0.0
                        ELSE coalesce(c.covered, 0) /
                             CAST(length(d.text) AS DOUBLE)
                   END AS dup_cov
            FROM documents d LEFT JOIN cov c USING (doc_id)
        """,
        # rank fractions are exact int->double divisions; ties share both
        # fractions so engine sort order within ties is immaterial.
        "percent_rank_docs": """
            SELECT doc_id, lang, n_chars,
                   percent_rank() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS pct_rank,
                   cume_dist() OVER (PARTITION BY lang
                                     ORDER BY n_chars) AS cume_dist
            FROM documents
        """,
        # lift = (n_ab*N)/(n_a*n_b) computed with exact int->double casts
        # and ONE multiply/divide per side in the same order both engines
        # — bit-exact with no rounding heal (PMI = ln(lift), left
        # unlogged to avoid libm-vs-DuckDB ulp skew).
        "bigram_collocations": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(
                                     text, '[A-Za-z0-9_]+') AS t
                          FROM documents),
                 expl AS (SELECT t, unnest(generate_series(1, len(t)-1))
                                   AS i
                          FROM toks WHERE len(t) >= 2),
                 big AS (SELECT t[i] AS tok_a, t[i+1] AS tok_b FROM expl),
                 bc AS (SELECT tok_a, tok_b, count(*) AS n_ab
                        FROM big GROUP BY 1, 2 HAVING count(*) >= 2),
                 uni AS (SELECT unnest(t) AS tok FROM toks),
                 uc AS (SELECT tok, count(*) AS n FROM uni GROUP BY 1),
                 tot AS (SELECT count(*) AS n_total FROM uni)
            SELECT tok_a, tok_b, n_ab,
                   ua.n AS n_a, ub.n AS n_b,
                   (CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
                   (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)) AS lift
            FROM bc JOIN uc ua ON ua.tok = bc.tok_a
                    JOIN uc ub ON ub.tok = bc.tok_b, tot
        """,
        # RANGE-interval window frame: exact-int metric so the trailing
        # sum is accumulation-order-free and hashes bit-exact; win_avg
        # is one double division of the exact ints on both sides.
        "time_window_stats": """
            SELECT user_id, event_id,
                   CAST(count(*) OVER w AS BIGINT) AS win_cnt,
                   CAST(sum(length(props)) OVER w AS BIGINT) AS win_sum,
                   CAST(sum(length(props)) OVER w AS DOUBLE)
                     / count(*) OVER w AS win_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        # GROUPS frame (1 PRECEDING..CURRENT ROW) stated via dense_rank
        # peer-group ids (this DuckDB build lacks GROUPS mode); exact-int
        # metric, one double division.
        "groups_window_stats": """
            WITH e AS (SELECT user_id, event_id,
                              length(props) AS m,
                              dense_rank() OVER (PARTITION BY user_id
                                                 ORDER BY ts) AS gi
                       FROM events),
            agg AS (SELECT user_id, gi, count(*) AS c, sum(m) AS s
                    FROM e GROUP BY 1, 2)
            SELECT e.user_id, e.event_id,
                   CAST(cur.c + COALESCE(prev.c, 0) AS BIGINT) AS g_cnt,
                   CAST(cur.s + COALESCE(prev.s, 0) AS BIGINT) AS g_sum,
                   CAST(cur.s + COALESCE(prev.s, 0) AS DOUBLE)
                     / (cur.c + COALESCE(prev.c, 0)) AS g_avg
            FROM e
            JOIN agg cur ON cur.user_id = e.user_id AND cur.gi = e.gi
            LEFT JOIN agg prev ON prev.user_id = e.user_id
                              AND prev.gi = e.gi - 1
        """,
        # recency-weighted engagement over a 28-day trailing window:
        # every term is cents * 2^(3 - age//7) — an INTEGER-valued
        # double — so partial sums are exact and accumulation-order-
        # free; the one final /800 divides identical exact operands in
        # both engines (bit-exact WITHOUT any rounding heal).
        "user_decay_scores": """
            WITH m AS (SELECT date_trunc('day', max(ts)) AS md
                       FROM events),
                 e AS (SELECT user_id, value,
                              date_diff('day', date_trunc('day', ts),
                                        m.md) AS age
                       FROM events, m)
            SELECT user_id,
                   sum(round(value * 100) * power(2.0, 3 - age // 7))
                     / 800.0 AS decay_score
            FROM e
            WHERE age < 28
            GROUP BY user_id
        """,
        # cross-corpus dedup: candidate split (odd doc_id) marked when
        # its 200-char prefix exists in the reference split (even).
        "cross_dedup_docs": """
            SELECT d.doc_id,
                   CAST(EXISTS (SELECT 1 FROM documents r
                                WHERE r.doc_id % 2 = 0
                                  AND substr(r.text, 1, 200)
                                      = substr(d.text, 1, 200))
                        AS BIGINT) AS in_reference
            FROM documents d
            WHERE d.doc_id % 2 = 1
        """,
        # bloom-prefiltered semi-join: the bloom stage only shrinks the
        # confirm exchange, so the plain EXISTS oracle hashes bit-exact
        # (quantities are integer-valued doubles -> order-free sums).
        "urgent_items_bloom": """
            SELECT l_returnflag,
                   count(*) AS n_items,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l_orderkey
                            AND o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        # C4-style blocklist content gate: integer counts, hash-exact.
        "blocklist_filter_docs": """
            SELECT doc_id,
                   CAST(length(list_filter(
                       regexp_extract_all(text, '[A-Za-z0-9_]+'),
                       t -> t IN ('dup', 'deadlock'))) AS BIGINT)
                     AS n_blocked,
                   CAST(length(list_filter(
                       regexp_extract_all(text, '[A-Za-z0-9_]+'),
                       t -> t IN ('dup', 'deadlock'))) > 0 AS BIGINT)
                     AS blocked
            FROM documents
        """,
        # contrastive hard-negative mining: top-k most-similar vectors
        # with a DIFFERENT label; same rounding contract as ann_topk.
        "hard_negatives": """
            WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5)
            SELECT q.qid AS query_id, e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS cosine
            FROM q, embeddings e
            WHERE e.vec_id <> q.qid AND e.label <> q.qlabel
            QUALIFY row_number() OVER (
                PARTITION BY q.qid
                ORDER BY list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                         e.vec_id) <= 10
        """,
        # language-mix drift per source: KL(source || corpus), per-term
        # op order identical (share divisions then one ln, one multiply).
        "source_lang_kl": """
            WITH c AS (SELECT source, lang, count(*) AS n
                       FROM documents GROUP BY 1, 2),
                 s AS (SELECT source, sum(n) AS ns FROM c GROUP BY 1),
                 l AS (SELECT lang, sum(n) AS nl FROM c GROUP BY 1),
                 t AS (SELECT sum(n) AS nt FROM c)
            SELECT c.source, CAST(s.ns AS BIGINT) AS n_docs,
                   round(sum((CAST(c.n AS DOUBLE) / s.ns)
                             * ln((CAST(c.n AS DOUBLE) / s.ns)
                                  / (CAST(l.nl AS DOUBLE) / t.nt))), 4)
                     AS kl
            FROM c JOIN s USING (source) JOIN l USING (lang), t
            GROUP BY c.source, s.ns
        """,
        # integrity audit: one row per rule, mixed zero and non-zero
        # counts; referential rules ride one tagged orderkey co-group.
        "data_quality_report": """
            SELECT 'orphan_lineitems' AS rule, CAST((
                SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
            UNION ALL SELECT 'childless_orders', CAST((
                SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
                AS BIGINT)
            UNION ALL SELECT 'shipped_before_order', CAST((
                SELECT count(*) FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
            UNION ALL SELECT 'negative_acctbal', CAST((
                SELECT count(*) FROM customer WHERE c_acctbal < 0)
                AS BIGINT)
            UNION ALL SELECT 'high_tax', CAST((
                SELECT count(*) FROM lineitem WHERE l_tax > 0.06)
                AS BIGINT)
            UNION ALL SELECT 'duplicate_orderkeys', CAST((
                SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                AS BIGINT)
        """,
        # row-preserving star-schema widening; attribute passthrough
        # only, so doubles compare exactly.
        "denormalized_orders": """
            SELECT o_orderkey, o_totalprice, c_name, c_mktsegment,
                   n_name, r_name
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        # global equi-depth boundaries from the exact value histogram
        # (quantile_disc: 0-based rank ceil(q*n) - 1).
        "length_deciles": """
            WITH l AS (SELECT quantile_disc(n_chars,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                           AS q
                       FROM documents)
            SELECT CAST(u.i AS BIGINT) AS decile,
                   CAST(q[u.i] AS BIGINT) AS n_chars_q
            FROM l, unnest(generate_series(1, 9)) AS u(i)
        """,
        # market-basket support: distinct users holding BOTH event
        # types, unordered pair (a < b).
        "event_type_affinity": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                              AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        # global total ordering without a global sort (histogram bases
        # + within-value positions).
        "global_doc_ranks": """
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                        AS BIGINT) AS global_rank
            FROM documents
        """,
        # dense calendar: every (day, type) between corpus min/max day,
        # zero-filled — generate_series dimension generation.
        "daily_counts_filled": """
            WITH b AS (SELECT date_trunc('day', min(ts)) AS lo,
                              date_trunc('day', max(ts)) AS hi
                       FROM events),
                 days AS (SELECT unnest(generate_series(lo, hi,
                                        INTERVAL 1 DAY)) AS day FROM b),
                 types AS (SELECT DISTINCT event_type FROM events),
                 c AS (SELECT date_trunc('day', ts) AS day, event_type,
                              count(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT d.day, t.event_type,
                   COALESCE(c.n, 0) AS n_events
            FROM days d CROSS JOIN types t
            LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
        """,
        # degree per vector in the exact cosine-dup graph, isolated
        # vectors included with degree 0.
        "dup_graph_degrees": """
            WITH e AS MATERIALIZED (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])), 4) >= 0.3),
                 arcs AS (SELECT u AS vec_id FROM e
                          UNION ALL SELECT v FROM e),
                 d AS (SELECT vec_id, count(*) AS degree
                       FROM arcs GROUP BY vec_id)
            SELECT emb.vec_id, COALESCE(d.degree, 0) AS degree
            FROM embeddings emb LEFT JOIN d USING (vec_id)
        """,
        # rolling 7-day distinct active users; the engine's interval-
        # coverage sweep equals the correlated count-distinct window.
        "rolling_wau": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                          FROM events)
            SELECT d.day,
                   CAST((SELECT count(DISTINCT e.user_id) FROM events e
                         WHERE date_trunc('day', e.ts)
                           BETWEEN d.day - INTERVAL 6 DAY AND d.day)
                        AS BIGINT) AS wau
            FROM days d
        """,
        # every signal is an RE2 count in BOTH engines (Arrow
        # count_substring_regex == regexp_extract_all length); ratios are
        # exact int/int IEEE divisions, emitted unrounded.
        "gopher_quality": r"""
            WITH sig AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_words,
                     CAST(length(text)
                          - length(regexp_extract_all(text, '\s')) AS BIGINT)
                       AS n_wordchars,
                     CAST(length(regexp_extract_all(
                          text, '[^\s]*[A-Za-z][^\s]*')) AS BIGINT)
                       AS n_alpha_words,
                     CAST(length(text)
                          - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
                     CAST((length(text) - length(replace(text, '...', '')))
                          // 3 AS BIGINT) AS n_ellipsis,
                     CAST(length(regexp_extract_all(lower(text),
                          '\b(the|and|of|to|in|is|that|it|for|was)\b'))
                          AS BIGINT) AS n_stopwords
              FROM documents),
            ratios AS (
              SELECT doc_id, n_words, n_stopwords,
                     CASE WHEN n_words = 0 THEN 0.0
                          ELSE CAST(n_wordchars AS DOUBLE) / n_words END
                       AS mean_word_len,
                     CASE WHEN n_words = 0 THEN 0.0
                          ELSE CAST(n_alpha_words AS DOUBLE) / n_words END
                       AS alpha_word_ratio,
                     CASE WHEN n_words = 0 THEN 0.0
                          ELSE CAST(n_hash + n_ellipsis AS DOUBLE) / n_words
                          END AS symbol_ratio
              FROM sig)
            SELECT doc_id, n_words, mean_word_len, alpha_word_ratio,
                   symbol_ratio, n_stopwords,
                   CAST(n_words BETWEEN 50 AND 100000
                        AND mean_word_len BETWEEN 3.0 AND 10.0
                        AND symbol_ratio <= 0.1
                        AND alpha_word_ratio >= 0.8
                        AND n_stopwords >= 2 AS BIGINT) AS passes
            FROM ratios
        """,
        "sliding_windows": """
            SELECT make_timestamp(win_us) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM (SELECT epoch_us(ts) AS tus, value FROM events) e
            CROSS JOIN (SELECT unnest(range(0, 2)) AS i) s
            CROSS JOIN LATERAL (SELECT (tus // 1800000000 - s.i)
                                       * 1800000000 AS win_us) w
            WHERE win_us + 3600000000 > tus
            GROUP BY win_us
        """,
        "top_tokens": """
            SELECT token, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                         AS token FROM documents)
            GROUP BY token
            ORDER BY n DESC, token
            LIMIT 50
        """,
        "top_docs_by_len": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 20
        """,
        "segment_revenue": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_unshipped_orders": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "flagship_sha_audit": """
            SELECT doc_id, source AS repo,
                   'doc' || CAST(doc_id AS VARCHAR) AS path,
                   sha256(text) AS content_sha256
            FROM documents
        """,
        "nation_revenue": """
            SELECT n_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "local_supplier_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "promo_revenue_share": """
            SELECT round(sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END), 2) AS promo_revenue,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS total_revenue,
                   round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice
                                               * (1 - l_discount)
                                          ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                     AS promo_share_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "volume_shipping": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS BIGINT) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier, lineitem, orders, customer,
                   nation n1, nation n2
              WHERE s_suppkey = l_suppkey
                AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey
                AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                  OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01') shipping
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        # all-pairs TF-IDF cosine similarity self-join (Bayardo'07
        # max-weight prefix bound); weights tf * ln(N/df), L2-normalized
        "tfidf_cosine_pairs": """
            WITH tf AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                         AS tok
                FROM documents) GROUP BY 1, 2),
            df AS (SELECT tok, count(*) AS dfc FROM tf GROUP BY tok),
            nn AS (SELECT count(*) AS nd FROM documents),
            w AS (SELECT doc_id, tf.tok,
                         c * ln((SELECT nd FROM nn) / dfc) AS w
                  FROM tf JOIN df ON tf.tok = df.tok),
            nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS s FROM w
                    GROUP BY doc_id),
            dot AS (SELECT a.doc_id AS u, b.doc_id AS v,
                           sum(a.w * b.w) AS d
                    FROM w a JOIN w b
                      ON a.tok = b.tok AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
            SELECT u AS doc_id_u, v AS doc_id_v,
                   round(d / (su.s * sv.s), 4) AS cosine
            FROM dot
            JOIN nrm su ON su.doc_id = u
            JOIN nrm sv ON sv.doc_id = v
            WHERE d / (su.s * sv.s) >= 0.6
            ORDER BY 1, 2
        """,
        # daily-volume anomaly sweep: each day's event count z-scored
        # against the global daily distribution (population sigma)
        "event_anomaly_days": """
            WITH d AS (
              SELECT date_trunc('day', ts) AS day, count(*) AS n_events
              FROM events GROUP BY 1),
            s AS (SELECT avg(n_events) AS m, stddev_pop(n_events) AS sd
                  FROM d)
            SELECT day, n_events,
                   round((n_events - m) / NULLIF(sd, 0), 4) AS z,
                   (abs(n_events - m) > 2.0 * sd) AS is_anomaly
            FROM d, s ORDER BY day
        """,
        # retention triangle: users cohorted by first active day,
        # counted at each day offset they return
        "retention_cohorts": """
            WITH ud AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS d
              FROM events),
            c AS (SELECT user_id, min(d) AS cohort FROM ud
                  GROUP BY user_id)
            SELECT c.cohort AS cohort_day,
                   CAST(date_diff('day', c.cohort, ud.d) AS BIGINT)
                       AS day_offset,
                   count(*) AS n_users
            FROM ud JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # type-2 clone detection: exact dup AFTER identifier/number
        # normalization (renamed-variable copies group together)
        # keep-best policy over the same clone groups: rep = most raw
        # chars, ties by min doc_id; clone_id stays min doc_id.
        "clone_group_representatives": """
            WITH n AS (
              SELECT doc_id, n_chars,
                     regexp_replace(
                       regexp_replace(text, '[A-Za-z_][A-Za-z0-9_]*',
                                      'ID', 'g'),
                       '[0-9]+', 'N', 'g') AS nt
              FROM documents),
            r AS (
              SELECT nt, doc_id, n_chars,
                     row_number() OVER (PARTITION BY nt
                                        ORDER BY n_chars DESC, doc_id)
                       AS rn,
                     min(doc_id) OVER (PARTITION BY nt) AS clone_id,
                     count(*) OVER (PARTITION BY nt) AS group_size
              FROM n)
            SELECT clone_id, doc_id AS rep_doc_id,
                   CAST(group_size AS BIGINT) AS group_size
            FROM r WHERE rn = 1 AND group_size >= 2
        """,
        "type2_clone_groups": """
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(text, '[A-Za-z_][A-Za-z0-9_]*',
                                      'ID', 'g'),
                       '[0-9]+', 'N', 'g') AS nt
              FROM documents),
            g AS (
              SELECT nt, min(doc_id) AS clone_id, count(*) AS group_size
              FROM n GROUP BY nt HAVING count(*) >= 2)
            SELECT n.doc_id, g.clone_id, g.group_size
            FROM n JOIN g USING (nt)
            ORDER BY n.doc_id
        """,
        # asymmetric containment near-dup join: smaller token set
        # tau-contained in the larger (catches file-pasted-into-file
        # cases symmetric Jaccard misses)
        "containment_pairs_docs": """
            WITH d AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
              FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
              FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT u AS doc_id_u, v AS doc_id_v,
                   i AS n_inter, LEAST(su.n, sv.n) AS n_min
            FROM inter
            JOIN sz su ON su.doc_id = u
            JOIN sz sv ON sv.doc_id = v
            WHERE CAST(i AS DOUBLE) >= 0.8 * LEAST(su.n, sv.n)
            ORDER BY 1, 2
        """,
        "forecast_revenue_change": """
            SELECT coalesce(round(sum(l_extendedprice * l_discount), 2),
                            0.0) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.04 AND 0.06
              AND l_quantity < 24
        """,
        "priority_shipment_counts": """
            SELECT l_returnflag AS return_flag,
                   CAST(sum(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "market_share": """
            SELECT o_year,
                   round(sum(CASE WHEN nation = 'NATION_5' THEN volume
                                  ELSE 0 END) / sum(volume), 4)
                       AS mkt_share,
                   round(sum(volume), 2) AS total_revenue
            FROM (
              SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part, supplier, lineitem, orders, customer,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r_regionkey
                AND r_name = 'AMERICA'
                AND s_nationkey = n2.n_nationkey
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
                AND p_type = 'PROMO') allnations
            GROUP BY o_year ORDER BY o_year
        """,
        "product_profit": """
            SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
            FROM (
              SELECT n_name AS nation,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity AS amount
              FROM part, supplier, lineitem, orders, nation
              WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
                AND o_orderkey = l_orderkey
                AND s_nationkey = n_nationkey
                AND contains(p_name, 'red')) profit
            GROUP BY nation, o_year ORDER BY nation, o_year
        """,
        "waiting_suppliers": """
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM supplier, lineitem l1, orders
            WHERE s_suppkey = l1.l_suppkey
              AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
              AND EXISTS (SELECT * FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT * FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate >
                                    o_orderdate + INTERVAL 90 DAY)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 10
        """,
        # Q2 shape: groupwise-min decorrelation; min_price is a SELECTED
        # raw double (exact equality both engines), ties keep all rows,
        # and the ORDER BY is total (s_name unique per supplier).
        "min_cost_supplier": """
            WITH mins AS (
              SELECT l_partkey, l_suppkey, l_extendedprice,
                     min(l_extendedprice) OVER (PARTITION BY l_partkey)
                       AS mn
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_size = 15)
            SELECT s_acctbal, s_name, n_name, p_partkey, min_price
            FROM (SELECT DISTINCT l_partkey AS p_partkey, l_suppkey,
                         mn AS min_price
                  FROM mins WHERE l_extendedprice = mn) w
            JOIN supplier ON s_suppkey = w.l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        # Q11 shape: global-scalar HAVING over integer-valued-double
        # quantity sums (exact in both engines; no FP boundary risk).
        "important_parts": """
            SELECT l_partkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_partkey
            HAVING sum(l_quantity) >
                   0.0005 * (SELECT sum(l_quantity) FROM lineitem)
            ORDER BY sum_qty DESC, l_partkey
        """,
        # Q20 shape: nested two-level aggregate + semi-join; share
        # threshold compares exact integer-valued-double sums.
        "dominant_part_suppliers": """
            WITH ps AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY 1, 2),
            tot AS (
              SELECT l_partkey, sum(qty) AS total_qty FROM ps GROUP BY 1)
            SELECT s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS n_dominant_parts
            FROM ps
            JOIN tot USING (l_partkey)
            JOIN supplier ON s_suppkey = ps.l_suppkey
            WHERE qty > 0.15 * total_qty
            GROUP BY 1, 2
            ORDER BY n_dominant_parts DESC, s_suppkey
            LIMIT 20
        """,
        "customer_order_distribution": """
            SELECT c_count, count(*) AS custdist FROM (
              SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey) cc
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "disjunctive_filter_revenue": """
            SELECT coalesce(round(sum(l_extendedprice * (1 - l_discount)),
                                  2), 0.0) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "value_rank_windows": """
            SELECT user_id, event_id, value,
                   CAST(rank() OVER w AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume_dist
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value)
        """,
        "monthly_revenue": """
            SELECT date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "doc_zscores": """
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   round((n_chars - avg(n_chars) OVER w)
                         / nullif(stddev_pop(n_chars) OVER w, 0), 4)
                     AS z_chars
            FROM documents
            WINDOW w AS (PARTITION BY lang)
        """,
        "event_transitions": """
            WITH s AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                       AS prev_type
              FROM events)
            SELECT prev_type, event_type AS next_type,
                   count(*) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_interarrival": """
            SELECT user_id, event_id, ts,
                   date_diff('microsecond', lag(ts) OVER w, ts)
                     AS gap_prev_us,
                   date_diff('microsecond', ts, lead(ts) OVER w)
                     AS gap_next_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "moving_event_stats": """
            SELECT user_id, event_id,
                   CAST(sum(length(props)) OVER w AS BIGINT) AS mov_sum,
                   CAST(count(*) OVER w AS BIGINT) AS mov_cnt,
                   CAST(sum(length(props)) OVER w AS DOUBLE)
                     / (count(*) OVER w) AS mov_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        "scrub_event_props": """
            SELECT event_id,
                   CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '')
                        AS BIGINT) AS k_val,
                   regexp_replace(props, '\\d+', '<NUM>', 'g')
                     AS props_masked
            FROM events
        """,
        "high_value_users_intersect": """
            SELECT user_id FROM events
            WHERE event_type = 'purchase' AND value > 180
            INTERSECT
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value > 180
        """,
        "high_value_users_except": """
            SELECT user_id FROM events
            WHERE event_type = 'purchase' AND value > 180
            EXCEPT
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value > 180
        """,
        "edit_distance_pairs": """
            WITH shortest AS (
                SELECT doc_id, text FROM documents
                ORDER BY n_chars, doc_id LIMIT 30)
            SELECT a.doc_id AS u, b.doc_id AS v,
                   CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
            FROM shortest a, shortest b
            WHERE a.doc_id < b.doc_id
        """,
        "lang_char_skewkurt": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(skewness(n_chars), 4) AS skew_chars,
                   round(kurtosis(n_chars), 4) AS kurt_chars
            FROM documents GROUP BY lang
        """,
        "lang_doc_share": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) AS DOUBLE) / (sum(count(*)) OVER ())
                     AS share
            FROM documents GROUP BY lang
        """,
        "user_value_trend": """
            SELECT user_id, CAST(count(value) AS BIGINT) AS n_pairs,
                   round(regr_slope(value,
                         (epoch_us(ts) % 86400000000) / 1000000.0), 4)
                     AS slope,
                   round(regr_intercept(value,
                         (epoch_us(ts) % 86400000000) / 1000000.0), 4)
                     AS intercept
            FROM events GROUP BY user_id
        """,
        "user_event_entropy": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   round(entropy(event_type), 4) AS type_entropy
            FROM events GROUP BY user_id
        """,
        "zipf_fit": """
            WITH counts AS (
                SELECT tok, count(*) AS n FROM (
                    SELECT unnest(regexp_extract_all(text,
                                  '[A-Za-z0-9_]+')) AS tok
                    FROM documents) t
                WHERE tok <> '' GROUP BY tok),
            ranked AS (
                SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
                FROM counts)
            SELECT CAST(count(*) AS BIGINT) AS n_types,
                   round(regr_slope(log2(n), log2(rnk)), 4) AS zipf_slope,
                   round(regr_intercept(log2(n), log2(rnk)), 4)
                     AS zipf_intercept
            FROM ranked
        """,
        "dedup_rate_by_source": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT sha256(text)) AS BIGINT)
                     AS n_distinct,
                   1.0 - CAST(count(DISTINCT sha256(text)) AS DOUBLE)
                         / count(*) AS dup_rate
            FROM documents GROUP BY source
        """,
        "chunk_dedup_docs": """
            WITH chunks AS (
                SELECT doc_id, i, substr(text, (i-1)*48+1, 48) AS ctext
                FROM documents,
                     unnest(generate_series(
                         1, CAST((len(text)-1)//48 + 1 AS BIGINT))) AS s(i)
                WHERE len(text) > 0
            ), keep AS (
                SELECT doc_id, i, ctext,
                       row_number() OVER (PARTITION BY ctext
                                          ORDER BY doc_id, i) AS rn
                FROM chunks
            )
            SELECT d.doc_id,
                   COALESCE(string_agg(k.ctext, '' ORDER BY k.i), '')
                     AS text,
                   CAST(CASE WHEN len(d.text)=0 THEN 0
                             ELSE (len(d.text)-1)//48+1 END AS BIGINT)
                     AS n_chunks,
                   COUNT(k.i) AS n_kept
            FROM documents d
            LEFT JOIN (SELECT * FROM keep WHERE rn=1) k USING (doc_id)
            GROUP BY d.doc_id, d.text
        """,
        "user_props_bitmask": """
            WITH k AS (
                SELECT user_id,
                       CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1),
                                   '') AS BIGINT) AS kv
                FROM events)
            SELECT user_id, CAST(count(kv) AS BIGINT) AS n_k,
                   CAST(bit_or(kv) AS BIGINT) AS k_or,
                   CAST(bit_and(kv) AS BIGINT) AS k_and,
                   CAST(bit_xor(kv) AS BIGINT) AS k_xor
            FROM k GROUP BY user_id
        """,
        "lang_mad_chars": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(median(n_chars), 4) AS median_chars,
                   round(mad(n_chars), 4) AS mad_chars
            FROM documents GROUP BY lang
        """,
        "normalized_docs": """
            SELECT doc_id,
                   trim(regexp_replace(nfc_normalize(text),
                                       '[ \t\r\f\v]+', ' ', 'g'),
                        ' ' || chr(9) || chr(10) || chr(13)
                            || chr(12) || chr(11)) AS norm_text
            FROM documents
        """,
        "user_first_last_event": """
            SELECT DISTINCT user_id,
                   first_value(event_type) OVER w AS first_et,
                   last_value(event_type) OVER w AS last_et,
                   nth_value(event_type, 2) OVER w AS second_et,
                   CAST(count(*) OVER w AS BIGINT) AS n_events
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
        """,
        "top_suppliers_by_qty": """
            WITH qty AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS total_qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT l_suppkey, total_qty FROM qty
            WHERE total_qty = (SELECT max(total_qty) FROM qty)
        """,
        "returned_item_report": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS revenue,
                   c_acctbal, n_name
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1996-04-01'
              AND l_returnflag = 'R' AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "global_sales_opportunity": """
            SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_nationkey < 7
              AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0 AND c_nationkey < 7)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 350000)
            GROUP BY n_name ORDER BY n_name
        """,
        "brand_supplier_counts": """
            SELECT p_brand,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_size BETWEEN 1 AND 25
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY p_brand
        """,
        "token_cooccurrence": """
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                         AS tok
                FROM documents),
            vocab AS (
                SELECT tok FROM (
                    SELECT unnest(regexp_extract_all(text,
                                  '[A-Za-z0-9_]+')) AS tok
                    FROM documents) t
                WHERE tok <> ''
                GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 64)
            SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id
                                   AND a.tok < b.tok
            WHERE a.tok IN (SELECT tok FROM vocab)
              AND b.tok IN (SELECT tok FROM vocab)
            GROUP BY 1, 2
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        # minhash_dedup_docs / simhash_docs / ngram_jaccard_pairs_docs /
        # substring_pairs_docs / dedup_flagship / ann_topk_lsh /
        # ann_topk_ivf / embedding_dup_pairs / language_id /
        # shingle_stats / index_query / multimodal_features:
        # not ANSI-SQL-expressible (LSH/IVF sampling, hash fingerprints,
        # heuristic scoring, stub decoding) -> rows-only checks.
    }
