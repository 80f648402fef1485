"""Sequence packing (distributed ordered prefix scan), winsorization
and grouped heavy hitters vs direct numpy/Python references."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts, langs=None, multi_file=False):
    n = len(texts)
    langs = langs if langs is not None else ["en"] * n
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s0"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    if multi_file:
        d = tmp_path / "documents.parquet"
        d.mkdir()
        # shuffled round-robin shards: global doc_id order crosses
        # every file, so the sort output spans multiple blocks and the
        # cross-block offset path must do real work
        rng = np.random.Generator(np.random.PCG64(7))
        perm = rng.permutation(n)
        for i in range(4):
            part = np.sort(perm[i::4])
            pq.write_table(t.take(pa.array(part)), str(d / f"p{i}.parquet"))
    else:
        pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _ntok(text: str) -> int:
    import re
    return len(re.findall(r"[A-Za-z0-9_]+", text))


def test_packed_docs_multiblock(ray_session, tmp_path):
    """Packing over 4 shuffled shards equals the serial exclusive
    cumsum — exercises cross-block offsets, straddling docs, and
    zero-token docs."""
    from nise_ray.ops.packing import packed_docs
    rng = np.random.Generator(np.random.PCG64(11))
    texts = []
    for i in range(997):
        k = int(rng.integers(0, 40))
        texts.append(" ".join(f"w{j}" for j in range(k)) if k else "!!!")
    sf = _write_docs(tmp_path, texts, multi_file=True)
    cap = 64
    got = packed_docs(sf, capacity=cap).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    nt = np.array([_ntok(t) for t in texts], np.int64)
    excl = np.cumsum(nt) - nt
    assert len(got) == 997
    np.testing.assert_array_equal(got["n_tokens"].to_numpy(), nt)
    np.testing.assert_array_equal(got["bin_id"].to_numpy(), excl // cap)
    np.testing.assert_array_equal(got["start_off"].to_numpy(), excl % cap)


def test_packed_docs_empty(ray_session, tmp_path):
    from nise_ray.ops.packing import packed_docs
    sf = _write_docs(tmp_path, [])
    assert packed_docs(sf).count() == 0


def test_winsorized_matches_numpy(ray_session, tmp_path):
    """Per-lang clamp bounds equal numpy interpolated quantiles
    (rounded 4dp), clamped values equal greatest(lo, least(hi, x))."""
    from nise_ray.ops.analytics2 import winsorized_doc_lengths
    rng = np.random.Generator(np.random.PCG64(5))
    n = 400
    langs = [["en", "de", "fr"][i % 3] for i in range(n)]
    texts = ["x" * int(rng.integers(1, 5000)) for _ in range(n)]
    sf = _write_docs(tmp_path, texts, langs=langs)
    got = winsorized_doc_lengths(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    chars = np.array([len(t) for t in texts], np.float64)
    for lang in ("en", "de", "fr"):
        m = np.array([la == lang for la in langs])
        lo = round(float(np.quantile(chars[m], 0.05,
                                     method="linear")), 4)
        hi = round(float(np.quantile(chars[m], 0.95,
                                     method="linear")), 4)
        sub = got[got["lang"] == lang]
        ref = np.maximum(lo, np.minimum(hi, chars[m]))
        np.testing.assert_allclose(
            sub.sort_values("doc_id")["w_chars"].to_numpy(), ref,
            rtol=0, atol=5e-10)


def test_top_tokens_per_lang_brute(ray_session, tmp_path):
    """Grouped top-k equals a per-lang Counter with (count desc, token
    asc) tie-break."""
    from collections import Counter

    from nise_ray.ops.textstats import top_tokens_per_lang
    rng = np.random.Generator(np.random.PCG64(17))
    vocab = [f"t{i:02d}" for i in range(30)]
    langs, texts = [], []
    for i in range(300):
        lang = ["en", "de"][i % 2]
        words = [vocab[int(rng.integers(0, 30))]
                 for _ in range(int(rng.integers(0, 25)))]
        langs.append(lang)
        texts.append(" ".join(words))
    sf = _write_docs(tmp_path, texts, langs=langs)
    got = top_tokens_per_lang(sf, k=5).to_pandas() \
        .sort_values(["lang", "rnk"]).reset_index(drop=True)
    for lang in ("en", "de"):
        c = Counter()
        for la, tx in zip(langs, texts):
            if la == lang:
                c.update(tx.split())
        ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        sub = got[got["lang"] == lang]
        assert list(sub["token"]) == [t for t, _ in ref]
        assert list(sub["n"]) == [n for _, n in ref]
        assert list(sub["rnk"]) == [1, 2, 3, 4, 5]
