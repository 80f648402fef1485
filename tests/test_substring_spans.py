"""Substring span reporting: the winnowing stage must emit actionable
byte spans (in the normalized text) that cover a planted shared block."""

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.util import collect_table


def _rand_text(rng: np.random.Generator, n_words: int) -> str:
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    out = []
    for i in range(n_words):
        out.append(words[rng.integers(0, len(words))] + str(rng.integers(0, 1000)))
        if (i + 1) % 8 == 0:
            out.append("\n")
    return " ".join(out)


def test_substring_spans_cover_planted_block(ray_session):
    import ray

    from nise_ray.ops.normalize import normalize_text
    from nise_ray.pipeline import substring_pairs

    rng = np.random.Generator(np.random.PCG64(7))
    cfg = DedupConfig()
    block = _rand_text(rng, 60)  # ~400 normalized chars >> guarantee length
    docs = {
        "a": _rand_text(rng, 40) + "\n" + block + "\n" + _rand_text(rng, 40),
        "b": _rand_text(rng, 80) + "\n" + block + "\n" + _rand_text(rng, 20),
        "c": _rand_text(rng, 100),  # unrelated
    }
    corpus = pa.table({
        "repo": pa.array(["r"] * 3, pa.string()),
        "path": pa.array(list(docs), pa.string()),
        "commit": pa.array([""] * 3, pa.string()),
        "lang": pa.array(["python"] * 3, pa.string()),
        "content": pa.array(list(docs.values()), pa.string()),
    })
    sp = substring_pairs(ray.data.from_arrow(corpus), cfg)
    t = collect_table(sp)
    assert t.num_rows == 1, f"expected exactly one pair, got {t.num_rows}"

    from nise_ray.hashing import doc_key as doc_key_fn
    keys = {doc_key_fn("r", p, ""): p for p in docs}
    u = t.column("u")[0].as_py()
    v = t.column("v")[0].as_py()
    assert {keys[u], keys[v]} == {"a", "b"}
    spans = {keys[t.column("u")[0].as_py()]:
             (t.column("u_start")[0].as_py(), t.column("u_end")[0].as_py()),
             keys[t.column("v")[0].as_py()]:
             (t.column("v_start")[0].as_py(), t.column("v_end")[0].as_py())}

    slack = cfg.winnow_k + cfg.winnow_window  # anchor granularity
    block_n = normalize_text(block)
    for name in ("a", "b"):
        norm = normalize_text(docs[name])
        b0 = norm.find(block_n)
        assert b0 >= 0
        start, end = spans[name]
        # span must lie within the planted block (modulo anchor slack) ...
        assert start >= b0 - slack and end <= b0 + len(block_n) + slack, (
            f"{name}: span [{start},{end}) vs block [{b0},{b0 + len(block_n)})")
        # ... and cover most of it
        assert start <= b0 + slack and end >= b0 + len(block_n) - slack, (
            f"{name}: span [{start},{end}) does not cover block "
            f"[{b0},{b0 + len(block_n)})")
    assert t.column("n_shared_fps")[0].as_py() >= 2


def test_substring_driver_vs_distributed_parity(ray_session):
    """The sha-identity redesign: pairs ride the fp exchange as content
    hashes and translate back to doc_keys either on the driver (gated)
    or through the two keyed translate passes — both paths must emit
    identical spans, including with exact-duplicate docs present."""
    import ray

    from nise_ray.pipeline import substring_pairs

    rng = np.random.Generator(np.random.PCG64(13))
    cfg_driver = DedupConfig()
    block = _rand_text(rng, 60)
    base = {
        "a": _rand_text(rng, 40) + "\n" + block + "\n" + _rand_text(rng, 40),
        "b": _rand_text(rng, 80) + "\n" + block + "\n" + _rand_text(rng, 20),
        "c": _rand_text(rng, 100),
        "d": _rand_text(rng, 30) + "\n" + block,
    }
    paths, texts = [], []
    for p, t in base.items():
        paths.append(p)
        texts.append(t)
    # exact duplicates of 'a' under different paths: they must collapse
    # to the min-doc_key representative in BOTH paths
    for i in range(3):
        paths.append(f"a_copy{i}")
        texts.append(base["a"])
    corpus = pa.table({
        "repo": pa.array(["r"] * len(paths), pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array([""] * len(paths), pa.string()),
        "lang": pa.array(["python"] * len(paths), pa.string()),
        "content": pa.array(texts, pa.string()),
    })

    def run(cfg):
        ds = ray.data.from_arrow(corpus).repartition(3)
        t = collect_table(substring_pairs(ds, cfg))
        return t.sort_by([("u", "ascending"), ("v", "ascending")])

    got_driver = run(DedupConfig())
    got_dist = run(DedupConfig(driver_docs_max=0))
    assert got_driver.num_rows > 0
    assert got_driver.equals(got_dist), (
        f"driver:\n{got_driver.to_pydict()}\n"
        f"distributed:\n{got_dist.to_pydict()}")
    # representative identity: every u/v is the MIN doc_key of its
    # exact-dup group
    from nise_ray.hashing import doc_key as doc_key_fn
    a_keys = [doc_key_fn("r", p, "") for p in
              ["a", "a_copy0", "a_copy1", "a_copy2"]]
    rep = min(a_keys)
    endpoints = set(got_driver.column("u").to_pylist()) \
        | set(got_driver.column("v").to_pylist())
    assert rep in endpoints
    assert not (set(a_keys) - {rep}) & endpoints


def test_suffix_array_matches_sorted_suffixes():
    from nise_ray.ops.suffixarray import suffix_array
    rng = np.random.Generator(np.random.PCG64(11))
    for trial in range(5):
        n = int(rng.integers(2, 200))
        codes = rng.integers(97, 100, n)  # small alphabet -> many repeats
        codes = np.append(codes, 0x110000).astype(np.int64)
        sa = suffix_array(codes)
        ref = sorted(range(len(codes)), key=lambda i: list(codes[i:]))
        assert list(sa) == ref


def test_sa_block_pairs_planted_and_negative():
    from nise_ray.ops.suffixarray import sa_block_pairs
    block = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
    t1 = "aaa " * 30 + block + " bbb" * 10
    t2 = "ccc " * 50 + block + " ddd" * 5
    t3 = "unrelated text " * 20
    t4 = "eee " * 40 + block + " fff" * 7
    out = sa_block_pairs([t1, t2, t3, t4], np.array([10, 20, 30, 40]), 100)
    d = out.to_pydict()
    pairs = set(zip(d["u"], d["v"]))
    # all three sharers pair up (run-based all-pairs, not just adjacent)
    assert {(10, 20), (10, 40), (20, 40)} <= pairs
    assert not any(30 in p for p in pairs)
    texts = {10: t1, 20: t2, 40: t4}
    for u, v, us, vs in zip(d["u"], d["v"], d["u_start"], d["v_start"]):
        assert texts[u][us:us + 100] == texts[v][vs:vs + 100]
    # 99 shared chars is below the guarantee
    o2 = sa_block_pairs(["pad " * 30 + "z" * 99, "z" * 99 + " tail" * 30],
                        np.array([1, 2]), 100)
    assert o2.num_rows == 0


def test_substring_pairs_sa_matches_gram_bruteforce(ray_session):
    from nise_ray.ops.suffixarray import substring_pairs_sa_exact
    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    got = substring_pairs_sa_exact(SF)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    grams = {}
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        for i in range(len(txt) - 99):
            grams.setdefault(txt[i:i + 100], set()).add(did)
    expect = set()
    for docs in grams.values():
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                expect.add((ds[i], ds[j]))
    assert set(zip(got.column("u").to_pylist(),
                   got.column("v").to_pylist())) == expect
    assert len(expect) > 0, "fixture has no substring pairs"


def test_substring_pairs_sa_scale_gate(ray_session):
    import pytest

    from nise_ray.ops.suffixarray import substring_pairs_sa_exact
    with pytest.raises(ValueError, match="max_docs"):
        substring_pairs_sa_exact("/root/testdata/sf0.001", max_docs=10)


def test_sa_global_survives_cross_block_clones(ray_session):
    """The winnowing-co-located SA op must find clone pairs regardless
    of partitioning: planted 150-char shared runs between docs placed
    far apart, per-block SA (tiny batch) misses the cross-block pairs,
    substring_pairs_sa_global recovers EXACTLY the whole-corpus SA
    result (false-positive winnowing candidates removed by the per-pair
    SA verify)."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.suffixarray import (
        substring_pairs_sa,
        substring_pairs_sa_exact,
        substring_pairs_sa_global,
    )

    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]

    def rand_text(n):
        return " ".join(rng.choice(words, n).tolist())

    n_docs = 60
    texts = [rand_text(40) for _ in range(n_docs)]
    # plant shared 150-char runs between far-apart docs (different SA
    # blocks at batch_size=8): (3, 57), (10, 44), (20, 51)
    for a, b in [(3, 57), (10, 44), (20, 51)]:
        run = rand_text(40)[:150]
        texts[a] = texts[a] + " " + run
        texts[b] = run + " " + texts[b]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        exact = substring_pairs_sa_exact(d, min_len=100)
        glob = substring_pairs_sa_global(d, min_len=100)
        blocky = substring_pairs_sa(d, min_len=100, batch_size=8,
                                    normalize=False).select(["u", "v"])
    want = set(zip(exact.column("u").to_pylist(),
                   exact.column("v").to_pylist()))
    got = set(zip(glob.column("u").to_pylist(),
                  glob.column("v").to_pylist()))
    part = set(zip(blocky.column("u").to_pylist(),
                   blocky.column("v").to_pylist()))
    assert {(3, 57), (10, 44), (20, 51)} <= want
    assert got == want                      # global == whole-corpus SA
    assert part <= want and part != want    # per-block provably missed
