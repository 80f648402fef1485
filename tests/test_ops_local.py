"""Ray-free unit tests: every stage callable operates on plain pyarrow
tables, so operator logic is testable without a cluster."""

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64
from nise_ray.ops.exact import exact_edge_gen
from nise_ray.ops.lsh import explode_bands, make_pair_gen, sig_matrix
from nise_ray.ops.normalize import (
    TokenHasher,
    normalize_text,
    shingle_hashes,
    tokenize,
)
from nise_ray.ops.sign import Signer
from nise_ray.ops.substring import make_substring_pair_gen, winnow_fingerprints

CFG = DedupConfig()


def _corpus_table(contents, repos=None):
    n = len(contents)
    return pa.table({
        "repo": pa.array(repos or [f"r{i}" for i in range(n)], pa.string()),
        "path": pa.array([f"p{i}.py" for i in range(n)], pa.string()),
        "commit": pa.array(["c" * 8] * n, pa.string()),
        "lang": pa.array(["python"] * n, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def test_normalize_golden():
    # runs of blank chars collapse to one space; newlines are preserved
    # (a run adjacent to \n keeps its single space — pinned contract)
    assert normalize_text("a  \t b\r\n  c  ") == "a b \n c"
    assert tokenize("def foo_bar(x1, y):") == ["def", "foo_bar", "x1", "y"]
    # NFC: decomposed é -> composed
    assert normalize_text("é") == "é"


def test_shingles_set_semantics():
    h = TokenHasher()
    toks = ["a", "b", "c", "d", "e", "a", "b", "c", "d", "e"]
    sh = shingle_hashes(h.hash_tokens(toks), 5)
    # 6 windows but window 0 == window 5 => unique < 6
    assert 1 <= len(sh) <= 6
    assert (np.sort(sh) == sh).all()


def test_signer_sha_and_determinism():
    import hashlib
    t = _corpus_table(["def f(x):\n    return x + 1", ""])
    out1 = Signer(CFG)(t)
    out2 = Signer(CFG)(t)
    assert out1.equals(out2)
    # engine-internal digest is fixed_size_binary(32); hex only at outputs
    expect = hashlib.sha256(t.column("content")[0].as_py().encode()).digest()
    assert out1.column("content_sha256")[0].as_py() == expect
    assert out1.schema.field("content_sha256").type == pa.binary(32)
    assert out1.column("n_shingles")[1].as_py() == 0
    assert "content" not in out1.column_names


def test_exact_edge_gen_star():
    g = pa.table({"content_sha256": pa.array(["s"] * 4),
                  "doc_key": pa.array([9, 3, 7, 5], pa.uint64())})
    e = exact_edge_gen(g)
    assert e.column("u").to_pylist() == [3, 3, 3]
    assert sorted(e.column("v").to_pylist()) == [5, 7, 9]
    assert set(e.column("src").to_pylist()) == {"exact"}


def test_pair_gen_dedupes_sha_and_verifies():
    base = " ".join(f"w{i}" for i in range(300))
    near = base.replace("w10 ", "wX ")
    t = _corpus_table([base, base, near])
    signed = Signer(CFG)(t)
    ex = explode_bands(signed, CFG)
    # treat the whole exploded set keyed by one band as a single bucket
    bk = ex.column("bkey").to_numpy(zero_copy_only=False)
    from collections import Counter
    hot = [k for k, c in Counter(bk.tolist()).items() if c >= 2]
    pg = make_pair_gen(CFG)
    found = False
    for k in hot:
        g = ex.filter(pa.array(bk == k))
        e = pg(g)
        if e.num_rows:
            found = True
            assert (np.array(e.column("est").to_pylist()) >= CFG.tau).all()
            u = e.column("u").to_pylist()
            v = e.column("v").to_pylist()
            assert all(a < b for a, b in zip(u, v))
    assert found  # near pair (J ~ 0.97) must surface in some band


def test_pair_gen_bucket_cap_star():
    cfg = DedupConfig(bucket_cap=10)
    rng = np.random.Generator(np.random.PCG64(1))
    m = 35
    sig = rng.integers(0, 100, 128, dtype=np.uint64).astype("<u4")
    rows = {
        "bkey": pa.array([1] * m, pa.uint64()),
        "band_key": pa.array([1] * m, pa.uint64()),
        "doc_key": pa.array(np.arange(m, dtype=np.uint64) + 1, pa.uint64()),
        "sha64": pa.array(np.arange(m, dtype=np.uint64), pa.uint64()),
        "minhash": pa.array([sig.tobytes()] * m, pa.binary(512)),
    }
    e = make_pair_gen(cfg)(pa.table(rows))
    # all sigs identical => within-chunk cliques + star edges, all est=1.0
    pairs = set(zip(e.column("u").to_pylist(), e.column("v").to_pylist()))
    # connectivity: union-find over emitted pairs must give one component
    from nise_ray.ops.components import UnionFind
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    roots = {uf.find(i) for i in range(1, m + 1)}
    assert roots == {1}
    # far fewer than full clique
    assert len(pairs) < m * (m - 1) // 2


def test_winnowing_guarantee():
    cfg = CFG
    rng = np.random.Generator(np.random.PCG64(2))
    def rand_text(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))
    shared = rand_text(cfg.substring_min_len)  # exactly the guarantee length
    a = rand_text(400) + shared + rand_text(300)
    b = rand_text(250) + shared + rand_text(500)
    fa = winnow_fingerprints(a, cfg.winnow_k, cfg.winnow_window)
    fb = winnow_fingerprints(b, cfg.winnow_k, cfg.winnow_window)
    assert len(np.intersect1d(fa, fb)) >= 1
    c = rand_text(900)
    fc = winnow_fingerprints(c, cfg.winnow_k, cfg.winnow_window)
    assert len(np.intersect1d(fa, fc)) == 0


def test_substring_pair_gen_cap():
    cfg = DedupConfig(bucket_cap=5)
    m = 20
    g = pa.table({
        "fp": pa.array([7] * m, pa.uint64()),
        "doc_key": pa.array(np.arange(m, dtype=np.uint64) + 100, pa.uint64()),
        "sha64": pa.array(np.arange(m, dtype=np.uint64), pa.uint64()),
    })
    e = make_substring_pair_gen(cfg)(g)
    assert e.num_rows == m - 1  # star
    assert set(e.column("u").to_pylist()) == {100}


def test_sig_matrix_roundtrip():
    sigs = np.arange(256, dtype="<u4").reshape(2, 128)
    col = pa.array([sigs[0].tobytes(), sigs[1].tobytes()], pa.binary(512))
    m = sig_matrix(col, 128)
    assert (m == sigs).all()
    # sliced column (non-zero offset)
    m2 = sig_matrix(col.slice(1), 128)
    assert (m2 == sigs[1:]).all()


def test_batched_tokenize_shingle_parity():
    """The sign stage's batched Arrow kernels must be bit-identical to the
    per-row reference (tokenize(normalize_text) + shingle_hashes),
    including non-ASCII rows, empty rows and whitespace-only rows."""
    from nise_ray.ops.normalize import batch_shingle_hashes, batch_token_hashes
    texts = [
        "def foo(x):\n    return x+1\n", "", "   \t\n  ", "café naive",
        "a_b9 Zéßİ end", "éclair x",  # decomposed é -> NFC composes
        "🦀 rust_code fn main()", "İstanbul Iı", "short",
        "a b c d e f g h i j k", "same same same same same same",
    ]
    arr = pa.array(texts, pa.string())
    h1, h2 = TokenHasher(), TokenHasher()
    w = CFG.shingle_w
    ref_tok, ref_sh = [], []
    for s in texts:
        toks = tokenize(normalize_text(s))
        ref_tok.append(len(toks))
        ref_sh.append(shingle_hashes(h1.hash_tokens(toks), w))
    flat_h, offs, ntok = batch_token_hashes(arr, h2)
    sh_flat, sh_offs = batch_shingle_hashes(flat_h, offs, w)
    assert np.array_equal(np.array(ref_tok), ntok)
    for i in range(len(texts)):
        assert np.array_equal(ref_sh[i], sh_flat[sh_offs[i]:sh_offs[i + 1]])


def test_signer_batched_matches_custom_normalizer_path():
    """Signer's fast path (default normalizer) and the per-row fallback
    (custom normalizer set to the same function) must agree exactly."""
    import dataclasses
    t = _corpus_table(["def f(x):\n  return x", "a b c d e f g", "", "café x"])
    fast = Signer(CFG)(t)
    slow_cfg = dataclasses.replace(CFG, custom_normalizer=normalize_text)
    slow = Signer(slow_cfg)(t)
    for col in ("doc_key", "content_sha256", "sha64", "n_bytes", "n_tokens",
                "n_shingles", "minhash", "simhash"):
        assert fast.column(col).equals(slow.column(col)), col
