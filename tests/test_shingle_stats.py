"""Distinct-shingle count: exact hash-exchange path vs HyperLogLog
no-shuffle path (SURVEY 3.5), plus the nation_revenue broadcast join."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_shingle_stats_exact_vs_hll(ray_session, small_fixture):
    import ray

    from nise_ray.config import DedupConfig
    from nise_ray.metrics import shingle_stats
    from nise_ray.ops.normalize import (
        TokenHasher,
        normalize_text,
        shingle_hashes,
        tokenize,
    )
    fx = small_fixture
    cfg = DedupConfig()
    stats = shingle_stats(ray.data.from_arrow(fx.corpus), cfg)

    # local ground truth
    hasher = TokenHasher()
    all_sh = []
    for text in fx.corpus.column("content").to_pylist():
        toks = tokenize(normalize_text(text))
        all_sh.append(shingle_hashes(hasher.hash_tokens(toks), cfg.shingle_w))
    flat = np.concatenate([s for s in all_sh if len(s)]) if all_sh else np.array([])
    want_instances = int(sum(len(s) for s in all_sh))
    want_distinct = int(len(np.unique(flat)))

    assert stats["n_shingle_instances"] == want_instances
    assert stats["n_distinct_exact"] == want_distinct
    # HLL with p=14 on a few-thousand-element set: small-range corrected,
    # should be within 2%
    rel = abs(stats["n_distinct_hll"] - want_distinct) / max(want_distinct, 1)
    assert rel < 0.02, f"HLL {stats['n_distinct_hll']} vs {want_distinct}"


def test_hll_estimator_accuracy():
    from nise_ray.metrics import _hll_estimate, _hll_registers
    rng = np.random.Generator(np.random.PCG64(3))
    for n in (100, 10_000, 1_000_000):
        h = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        regs = np.frombuffer(
            _hll_registers(h).column("regs")[0].as_py(), dtype=np.uint8)
        est = _hll_estimate(regs)
        assert abs(est - n) / n < 0.03, f"n={n} est={est}"


def test_nation_revenue_matches_duckdb(ray_session):
    from nise_ray.ops.relational import nation_revenue
    got = nation_revenue(SF).to_pandas().sort_values("n_name").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["customer", "orders", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute("""
        SELECT n_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """).fetchdf()
    assert list(got["n_name"]) == list(want["n_name"])
    assert list(got["n_orders"]) == list(want["n_orders"])
    assert np.allclose(got["total_price"], want["total_price"])
