import pyarrow as pa

from nise_ray.config import DedupConfig


def test_custom_normalizer_hook_changes_config_hash():
    def upper_norm(s: str) -> str:
        return s.upper()

    base = DedupConfig()
    hooked = DedupConfig(custom_normalizer=upper_norm)
    assert base.config_hash() != hooked.config_hash()
    # and the hook actually runs in the signer
    from nise_ray.ops.sign import Signer
    t = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"],
                  "lang": ["python"], "content": ["abc def ghi jkl mno pqr"]})
    s_base = Signer(base)(t)
    s_hook = Signer(hooked)(t)
    assert s_base.column("minhash")[0].as_py() != s_hook.column("minhash")[0].as_py()
    # sha256 of content is normalization-independent (invariant holds)
    assert (s_base.column("content_sha256")[0].as_py()
            == s_hook.column("content_sha256")[0].as_py())


def test_corpus_filters(ray_session, small_fixture):
    import ray

    from nise_ray.io import filter_corpus
    ds = ray.data.from_arrow(small_fixture.corpus)
    py = filter_corpus(ds, lang="python")
    rows = py.take_all()
    assert rows and all(r["lang"] == "python" for r in rows)
    n_py = len(rows)
    assert n_py < small_fixture.corpus.num_rows


def test_band_bucket_histogram(ray_session, small_fixture):
    import ray

    from nise_ray.metrics import band_bucket_histogram
    from nise_ray.ops.sign import Signer
    cfg = DedupConfig()
    signed = ray.data.from_arrow(small_fixture.corpus).map_batches(
        Signer, fn_constructor_args=(cfg,), batch_format="pyarrow",
        concurrency=(1, 2))
    hist = band_bucket_histogram(signed, cfg)
    sizes = dict(zip(hist.column("bucket_size").to_pylist(),
                     hist.column("n_buckets").to_pylist()))
    assert sizes.get(1, 0) > 0          # most buckets are singletons
    assert any(s >= 2 for s in sizes)   # planted dups collide somewhere
    # total exploded rows = sum(size * count) == docs_with_shingles * bands
    total = sum(s * c for s, c in sizes.items())
    n_docs = sum(1 for r in signed.take_all() if r["n_shingles"] >= 1)
    assert total == n_docs * cfg.bands


def test_cluster_metrics(ray_session, small_fixture):
    import ray

    from nise_ray.metrics import cluster_histogram, cluster_size_topk
    from nise_ray.pipeline import dedup_pipeline
    res = dedup_pipeline(ray.data.from_arrow(small_fixture.corpus), DedupConfig())
    top = cluster_size_topk(res.assignments, k=5)
    assert top.num_rows == 5
    sizes = top.column("size").to_pylist()
    assert sizes == sorted(sizes, reverse=True)
    hist = cluster_histogram(res.assignments)
    assert sum(s * c for s, c in zip(hist.column("size").to_pylist(),
                                     hist.column("n_clusters").to_pylist())) \
        == small_fixture.corpus.num_rows
