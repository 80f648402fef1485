"""End-to-end pipeline vs the brute-force oracle (SURVEY §6).

Gates (BASELINE.md): dup-pair recall >= 0.99 on exact + high-sim planted
families; per-row content sha256 equality; assignment row count == input
row count; determinism across runs.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from nise_ray.util import collect_table

from nise_ray.config import DedupConfig
from nise_ray.fixtures import gen_corpus
from nise_ray.hashing import doc_key as doc_key_fn
from nise_ray.oracle import oracle_dedup
from nise_ray.pipeline import dedup_pipeline, substring_pairs


@pytest.fixture(scope="module")
def e2e(ray_session, small_fixture):
    import ray
    ds = ray.data.from_arrow(small_fixture.corpus)
    result = dedup_pipeline(ds, DedupConfig())
    assignments = collect_table(result.assignments)
    edges = collect_table(result.edges)
    return small_fixture, result, assignments, edges


def _truth_keys(fx):
    tp = fx.truth_pairs
    out = []
    for i in range(tp.num_rows):
        u = doc_key_fn(tp.column("u_repo")[i].as_py(), tp.column("u_path")[i].as_py(),
                       tp.column("u_commit")[i].as_py())
        v = doc_key_fn(tp.column("v_repo")[i].as_py(), tp.column("v_path")[i].as_py(),
                       tp.column("v_commit")[i].as_py())
        out.append((min(u, v), max(u, v), tp.column("kind")[i].as_py(),
                    tp.column("true_jaccard")[i].as_py()))
    return out


def test_row_count_and_schema(e2e):
    fx, result, assignments, _ = e2e
    assert assignments.num_rows == fx.corpus.num_rows
    assert result.stats["n_docs"] == fx.corpus.num_rows
    for col in ["repo", "path", "commit", "doc_key", "content_sha256", "cluster_id"]:
        assert col in assignments.column_names


def test_sha256_invariant(e2e):
    fx, _, assignments, _ = e2e
    # map (repo,path,commit) -> sha from the ORIGINAL input
    expect = {}
    for i in range(fx.corpus.num_rows):
        key = (fx.corpus.column("repo")[i].as_py(), fx.corpus.column("path")[i].as_py(),
               fx.corpus.column("commit")[i].as_py())
        expect[key] = hashlib.sha256(
            fx.corpus.column("content")[i].as_py().encode()).hexdigest()
    for i in range(assignments.num_rows):
        key = (assignments.column("repo")[i].as_py(), assignments.column("path")[i].as_py(),
               assignments.column("commit")[i].as_py())
        assert assignments.column("content_sha256")[i].as_py() == expect[key]


def test_recall_vs_planted_truth(e2e):
    fx, _, _, edges = e2e
    found = set(zip(edges.column("u").to_pylist(), edges.column("v").to_pylist()))
    # cluster-implied closure: pairs connected through the edge set count
    from nise_ray.ops.components import UnionFind
    uf = UnionFind()
    for u, v in found:
        uf.union(u, v)

    denom = hit = 0
    for u, v, kind, jv in _truth_keys(fx):
        if kind == "exact" or (kind in ("near_high", "whitespace")
                               and jv is not None and jv >= 0.8):
            denom += 1
            if (u, v) in found or (uf.find(u) == uf.find(v) and uf.find(u) is not None
                                   and (u in uf.parent and v in uf.parent)):
                hit += 1
    assert denom > 50, f"fixture too small: {denom} gate pairs"
    recall = hit / denom
    assert recall >= 0.99, f"recall {recall:.4f} over {denom} pairs"


def test_clusters_match_oracle(e2e):
    fx, _, assignments, _ = e2e
    pairs, oracle_labels = oracle_dedup(fx.corpus, tau=0.7)
    got = dict(zip(assignments.column("doc_key").to_pylist(),
                   assignments.column("cluster_id").to_pylist()))
    # compare partitions restricted to docs the oracle clustered with
    # high-margin pairs (exclude docs only reachable through borderline
    # J in [0.6, 0.8) pairs, where sampling error legitimately differs)
    borderline = {k for (u, v), (j, kind) in pairs.items()
                  if kind == "near" and j < 0.8 for k in (u, v)}
    mismatch = 0
    compared = 0
    for (u, v), (j, kind) in pairs.items():
        if u in borderline or v in borderline:
            continue
        compared += 1
        if got.get(u) != got.get(v):
            mismatch += 1
    assert compared > 50
    assert mismatch / compared <= 0.01, f"{mismatch}/{compared} oracle pairs split"


def test_negatives_not_clustered(e2e):
    fx, _, assignments, _ = e2e
    pairs, oracle_labels = oracle_dedup(fx.corpus, tau=0.55)
    # docs the 0.55-tau oracle says are fully isolated must be singletons
    clustered_keys = set(oracle_labels)
    got = {}
    for i in range(assignments.num_rows):
        dk = assignments.column("doc_key")[i].as_py()
        cl = assignments.column("cluster_id")[i].as_py()
        got.setdefault(cl, []).append(dk)
    for cl, members in got.items():
        if len(members) < 2:
            continue
        # every multi-member engine cluster should contain at least one
        # oracle-known relation (no hallucinated giant clusters)
        known = [m for m in members if m in clustered_keys]
        assert len(known) >= len(members) - 1, (
            f"cluster {cl} has {len(members)} members, "
            f"only {len(known)} known to oracle")


def test_determinism_two_runs(ray_session, small_fixture):
    import ray
    cfg = DedupConfig()
    outs = []
    for _ in range(2):
        ds = ray.data.from_arrow(small_fixture.corpus)
        res = dedup_pipeline(ds, cfg)
        t = collect_table(res.assignments)
        idx = pa.compute.sort_indices(
            t, sort_keys=[("doc_key", "ascending")])
        outs.append(t.take(idx).select(["doc_key", "cluster_id", "content_sha256"]))
    assert outs[0].equals(outs[1])


def test_sig16_recall_and_pair_parity(ray_session, small_fixture, e2e):
    """sig_value_bytes=2 (16-bit OPH): recall gate holds and the verified
    pair set matches the 32-bit run's (truncation only ADDS 2^-16/slot
    false matches — it can't lose a true signature agreement)."""
    import ray
    fx, _, _, edges32 = e2e
    ds = ray.data.from_arrow(fx.corpus)
    res = dedup_pipeline(ds, DedupConfig(sig_value_bytes=2))
    edges16 = collect_table(res.edges)
    found = set(zip(edges16.column("u").to_pylist(),
                    edges16.column("v").to_pylist()))
    from nise_ray.ops.components import UnionFind
    uf = UnionFind()
    for u, v in found:
        uf.union(u, v)
    denom = hit = 0
    for u, v, kind, jv in _truth_keys(fx):
        if kind == "exact" or (kind in ("near_high", "whitespace")
                               and jv is not None and jv >= 0.8):
            denom += 1
            if (u, v) in found or (u in uf.parent and v in uf.parent
                                   and uf.find(u) == uf.find(v)):
                hit += 1
    assert hit / denom >= 0.99, f"sig16 recall {hit/denom:.4f}"
    pairs32 = set(zip(edges32.column("u").to_pylist(),
                      edges32.column("v").to_pylist()))
    # every 32-bit pair above tau must survive (est is monotone non-
    # decreasing under truncation); tiny additions are allowed
    assert pairs32 <= found
    assert len(found) - len(pairs32) <= max(2, len(pairs32) // 100)


def test_substring_stage_finds_planted_blocks(ray_session, small_fixture):
    import ray
    fx = small_fixture
    ds = ray.data.from_arrow(fx.corpus)
    sp = substring_pairs(ds, DedupConfig())
    t = collect_table(sp)
    found = set(zip(t.column("u").to_pylist(), t.column("v").to_pylist()))
    # the planted substring family must be fully pairwise-connected
    want = [(u, v) for u, v, kind, _ in _truth_keys(fx) if kind == "substring"]
    assert want
    missing = [p for p in want if p not in found]
    assert not missing, f"substring pairs missed: {missing}"
