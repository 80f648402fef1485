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
