import numpy as np

from nise_ray.ops.components import UnionFind


def _bfs_components(edges, nodes):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    label = {}
    for s in nodes:
        if s in label:
            continue
        stack, comp = [s], [s]
        seen = {s}
        while stack:
            x = stack.pop()
            for y in adj.get(x, []):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
                    comp.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    return label


def test_union_find_matches_bfs_on_random_graphs():
    rng = np.random.Generator(np.random.PCG64(13))
    for trial in range(20):
        n = int(rng.integers(5, 200))
        m = int(rng.integers(1, 3 * n))
        edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2))
                 if a != b]
        uf = UnionFind()
        for u, v in edges:
            uf.union(u, v)
        nodes = sorted({x for e in edges for x in e})
        expect = _bfs_components(edges, nodes)
        for x in nodes:
            assert uf.find(x) == expect[x]


def test_union_find_label_is_min():
    uf = UnionFind()
    uf.union(10, 5)
    uf.union(5, 99)
    uf.union(1000, 99)
    assert uf.find(1000) == 5
    t = uf.labels()
    d = dict(zip(t.column("doc_key").to_pylist(), t.column("cluster_id").to_pylist()))
    assert set(d.values()) == {5}


def test_distributed_cc_giant_component_bounded(ray_session):
    """Planted 200k-node single near-dup component (random-attachment
    tree): the two-star rounds must converge within the round cap, label
    every node with the global min, and never inflate the per-round edge
    set beyond ~2x the input edge count — the bound hash-to-min lacked
    (its member lists grow with component size and concentrate on the
    min-node's partition)."""
    import pyarrow as pa

    import ray
    from nise_ray.config import DedupConfig
    from nise_ray.ops.components import distributed_components
    from nise_ray.util import collect_table

    rng = np.random.Generator(np.random.PCG64(7))
    n = 200_000
    base = 1000
    child = np.arange(1, n, dtype=np.uint64)
    parent = (rng.random(n - 1) * child).astype(np.uint64)
    edges = pa.table({"u": pa.array(parent + base, pa.uint64()),
                      "v": pa.array(child + base, pa.uint64())})
    cfg = DedupConfig()
    stats = {}
    labels = collect_table(distributed_components(
        ray.data.from_arrow(edges), cfg, stats=stats))
    assert labels.num_rows == n
    cl = labels.column("cluster_id").to_numpy(zero_copy_only=False)
    assert (cl == base).all()
    e = n - 1
    assert stats["cc_rounds"] <= cfg.cc_max_rounds
    # large-star emits <= E edges, small-star <= E + one per group:
    # per-round rows stay linear in the input edge count
    assert stats["cc_max_round_rows"] <= 2 * e + n


def test_kcore_peeling_crafted(ray_session):
    """Planted graph where degree alone overcounts: a hub with k leaf
    neighbors must NOT survive k-core peeling (its neighbors die first),
    while a (k+1)-clique must. Kernel-checked through the public op on
    crafted docs."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.graph import kcore_docs

    # identical texts => J = 1.0 edges inside each group; distinct
    # vocab across groups => no cross edges
    clique = ["alpha beta gamma delta"] * 4          # 4-clique: 3-core
    # leaf-leaf J = 3/9 < 0.5 (three unique tokens each); leaf-hub
    # J = 3/6 = 0.5 -> hub has degree 3 but its neighbors have degree 1
    hub = (["u%da u%db u%dc common_one common_two common_three"
            % (i, i, i) for i in range(3)] +
           ["common_one common_two common_three"])
    texts = clique + hub
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        core = kcore_docs(d, k=3, tau=0.5)
    ids = core.column("doc_id").to_pylist()
    assert set(ids) >= {0, 1, 2, 3}          # the clique survives
    assert all(core.column("core_degree").to_pylist()[i] == 3
               for i, x in enumerate(ids) if x in (0, 1, 2, 3))
    assert 7 not in ids                       # hub dies with its leaves
