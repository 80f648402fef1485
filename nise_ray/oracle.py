"""Brute-force exact oracle — the stand-in reference (SURVEY §6).

Computes, in plain Python/numpy over a pyarrow corpus table (small tiers
only), the EXACT near-dup ground truth under the pinned semantics:

  * exact pairs: identical `content` bytes
  * near pairs:  true token-5-shingle Jaccard >= tau over unique contents
                 (tuple-of-token sets — independent of the engine's hashed
                 shingle representation)
  * clusters:    connected components over (exact ∪ near) pairs,
                 label = min doc_key

An inverted shingle index prunes the O(n^2) loop: pairs sharing no shingle
have J = 0 and can never clear tau.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import pyarrow as pa

from nise_ray.hashing import doc_key as doc_key_fn
from nise_ray.ops.components import UnionFind
from nise_ray.ops.normalize import normalize_text, tokenize


def oracle_dedup(corpus: pa.Table, tau: float = 0.7, w: int = 5):
    """Returns (pairs, labels):
    pairs  : dict[(u_key, v_key)] -> (jaccard, kind)  with u < v
    labels : dict[doc_key] -> cluster_id  for every clustered doc
    """
    repo = corpus.column("repo").to_pylist()
    path = corpus.column("path").to_pylist()
    commit = corpus.column("commit").to_pylist()
    content = corpus.column("content").to_pylist()
    n = corpus.num_rows
    keys = [doc_key_fn(repo[i], path[i], commit[i]) for i in range(n)]

    # ---- exact groups ---------------------------------------------------
    by_content: dict[str, list[int]] = defaultdict(list)
    for i in range(n):
        by_content[content[i]].append(i)

    pairs: dict[tuple[int, int], tuple[float, str]] = {}
    uf = UnionFind()
    for members in by_content.values():
        if len(members) > 1:
            ks = sorted(keys[i] for i in members)
            for a, b in itertools.combinations(ks, 2):
                pairs[(a, b)] = (1.0, "exact")
            for b in ks[1:]:
                uf.union(ks[0], b)

    # ---- near pairs over unique contents -------------------------------
    uniq = list(by_content.keys())
    shingle_sets = []
    for text in uniq:
        toks = tokenize(normalize_text(text))
        shingle_sets.append({tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)})

    index: dict[tuple, list[int]] = defaultdict(list)
    for ui, ss in enumerate(shingle_sets):
        for sh in ss:
            index[sh].append(ui)

    candidates: set[tuple[int, int]] = set()
    for postings in index.values():
        if 1 < len(postings) <= 200:
            for a, b in itertools.combinations(postings, 2):
                candidates.add((a, b))
        elif len(postings) > 200:  # ubiquitous shingle: star to first
            for b in postings[1:]:
                candidates.add((postings[0], b))

    for ua, ub in candidates:
        sa, sb = shingle_sets[ua], shingle_sets[ub]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= tau:
            # expand to all (doc, doc) pairs across the two content groups
            ka = sorted(keys[i] for i in by_content[uniq[ua]])
            kb = sorted(keys[i] for i in by_content[uniq[ub]])
            for x in ka:
                for y in kb:
                    u, v = min(x, y), max(x, y)
                    if (u, v) not in pairs:
                        pairs[(u, v)] = (j, "near")
                    uf.union(u, v)

    labels = {}
    for node in list(uf.parent):
        labels[node] = uf.find(node)
    return pairs, labels
