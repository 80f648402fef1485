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
