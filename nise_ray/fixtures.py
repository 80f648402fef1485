"""Deterministic synthetic source-code corpus with planted duplicate
families (FIXTURES.md contract). Seed-driven, pure numpy/python — no wall
clock, no platform-dependent hashing. Used by tests and the bench harness.

Families (FIXTURES.md §2):
  exact        — byte-identical clones (incl. one boilerplate file cloned
                 into ~5% of repos: the giant-bucket skew case)
  near_high    — contiguous-block token edits, measured true token-5-shingle
                 Jaccard >= 0.8 (recall-gate denominator with exact)
  near_border  — heavier edits, J in ~[0.5, 0.8) (report-only)
  whitespace   — whitespace/comment-only edits (normalize to near-identical)
  substring    — a shared >= 200-char block inside otherwise-unrelated files
  negatives    — independent base files
  degenerate   — empty file, 1-token file, big file, non-ASCII identifiers

Truth tables: truth_pairs (u/v doc triples, kind, true_jaccard with the
family-closure semantics) and truth_clusters (family min doc). True Jaccard
is measured with an independent plain-Python token-tuple implementation —
NOT the engine's hashed shingles — so truth stays implementation-agnostic.
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np
import pyarrow as pa

from nise_ray.ops.normalize import normalize_text, tokenize

_KEYWORDS = {
    "python": ["def", "return", "if", "else", "for", "in", "class", "import"],
    "java": ["public", "void", "return", "if", "else", "for", "class", "import"],
    "cpp": ["int", "return", "if", "else", "for", "class", "include", "void"],
    "go": ["func", "return", "if", "else", "for", "type", "import", "var"],
    "js": ["function", "return", "if", "else", "for", "const", "let", "var"],
}
_LANG_EXT = {"python": "py", "java": "java", "cpp": "cc", "go": "go", "js": "js"}
_LANGS = list(_KEYWORDS)
_SYLLABLES = ["get", "set", "run", "load", "parse", "emit", "calc", "node",
              "item", "data", "ctx", "conf", "util", "map", "hash", "tree",
              "pack", "sync", "read", "write"]


def _identifiers(rng: np.random.Generator, n: int) -> list[str]:
    out = []
    for _ in range(n):
        k = rng.integers(2, 4)
        out.append("_".join(_SYLLABLES[i] for i in rng.integers(0, len(_SYLLABLES), k)))
    return out


def _gen_file(rng: np.random.Generator, lang: str, vocab: list[str],
              n_lines: int | None = None) -> str:
    kw = _KEYWORDS[lang]
    if n_lines is None:
        n_lines = int(rng.integers(20, 400))
    lines = []
    for _ in range(n_lines):
        shape = rng.integers(0, 4)
        a, b, c = (vocab[i] for i in rng.integers(0, len(vocab), 3))
        k = kw[rng.integers(0, len(kw))]
        lit = int(rng.integers(0, 1000))
        if shape == 0:
            lines.append(f"{k} {a}({b}, {c}):")
        elif shape == 1:
            lines.append(f"    {a} = {b}.{c}({lit})")
        elif shape == 2:
            lines.append(f"    {k} {a} {b} {lit}")
        else:
            lines.append(f"    {a}_{b} += {c}[{lit}]")
    return "\n".join(lines)


def _mutate_block(rng: np.random.Generator, text: str, frac: float,
                  vocab: list[str]) -> str:
    """Edit a contiguous block of ~frac of the lines (like a rewritten
    function) — keeps shingle damage localized so true J stays high."""
    lines = text.split("\n")
    n = len(lines)
    span = max(1, int(n * frac))
    start = int(rng.integers(0, max(1, n - span)))
    for i in range(start, min(n, start + span)):
        a, b = (vocab[j] for j in rng.integers(0, len(vocab), 2))
        lines[i] = f"    {a} = {b}({int(rng.integers(0, 1000))})"
    return "\n".join(lines)


def true_jaccard(a: str, b: str, w: int = 5) -> float:
    """Independent token-w-shingle Jaccard (plain python sets of tuples)."""
    ta, tb = tokenize(normalize_text(a)), tokenize(normalize_text(b))
    sa = {tuple(ta[i:i + w]) for i in range(len(ta) - w + 1)}
    sb = {tuple(tb[i:i + w]) for i in range(len(tb) - w + 1)}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@dataclasses.dataclass
class Fixture:
    corpus: pa.Table
    truth_pairs: pa.Table
    truth_clusters: pa.Table


def gen_corpus(seed: int = 42, n_base: int = 120, max_lines: int = 400,
               boilerplate_copies: int | None = None) -> Fixture:
    """Generate a corpus with ~2.5x n_base rows and full truth tables."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _identifiers(rng, 400)

    rows: list[dict] = []
    families: list[tuple[str, list[int], float | None]] = []  # kind, members(row idx), jmin
    counter = itertools.count()

    def add_row(content: str, lang: str | None = None, repo: str | None = None) -> int:
        i = next(counter)
        lang = lang or _LANGS[int(rng.integers(0, len(_LANGS)))]
        # Zipf-ish repo popularity
        repo = repo or f"org{int(rng.integers(0, 37)) % 37}/repo{int(rng.zipf(1.6)) % 101}"
        commit = "".join(f"{b:02x}" for b in rng.integers(0, 256, 20, dtype=np.uint8))
        path = f"src/m{int(rng.integers(0, 50))}/f{i}.{_LANG_EXT[lang]}"
        rows.append({"repo": repo, "path": path, "commit": commit,
                     "lang": lang, "content": content})
        return i

    # --- base files ------------------------------------------------------
    base_idx = []
    base_lang = []
    for _ in range(n_base):
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        n_lines = int(rng.integers(20, max_lines))
        content = _gen_file(rng, lang, vocab, n_lines)
        base_idx.append(add_row(content, lang))
        base_lang.append(lang)

    def base_content(j: int) -> str:
        return rows[base_idx[j]]["content"]

    n_pool = len(base_idx)
    used = set()

    def pick_base() -> int:
        while True:
            j = int(rng.integers(0, n_pool))
            if j not in used:
                used.add(j)
                return j

    # --- exact clone families -------------------------------------------
    for _ in range(max(3, n_base // 12)):
        j = pick_base()
        k = int(rng.integers(2, 6))
        members = [base_idx[j]]
        for _ in range(k):
            members.append(add_row(base_content(j), base_lang[j]))
        families.append(("exact", members, 1.0))

    # --- boilerplate: one file cloned into ~5% of repos (skew) ----------
    j = pick_base()
    n_boiler = boilerplate_copies if boilerplate_copies is not None else max(6, n_base // 8)
    members = [base_idx[j]]
    for t in range(n_boiler):
        members.append(add_row(base_content(j), base_lang[j], repo=f"org{t % 37}/repoB{t}"))
    families.append(("exact", members, 1.0))

    # --- near-dup families (measured true J decides the kind) -----------
    for _ in range(max(6, n_base // 6)):
        j = pick_base()
        k = int(rng.integers(1, 4))
        members = [base_idx[j]]
        jmin = 1.0
        for _ in range(k):
            frac = float(rng.uniform(0.02, 0.25))
            mutated = _mutate_block(rng, base_content(j), frac, vocab)
            jv = true_jaccard(base_content(j), mutated)
            jmin = min(jmin, jv)
            members.append(add_row(mutated, base_lang[j]))
        kind = "near_high" if jmin >= 0.8 else ("near_border" if jmin >= 0.5 else "near_low")
        families.append((kind, members, jmin))

    # --- whitespace/comment-only edits ----------------------------------
    for _ in range(max(3, n_base // 15)):
        j = pick_base()
        ws = base_content(j).replace("    ", "\t ").replace(" = ", "  =  ")
        members = [base_idx[j], add_row(ws, base_lang[j])]
        families.append(("whitespace", members, true_jaccard(base_content(j), ws)))

    # --- substring families (shared block in unrelated files) -----------
    shared_block = _gen_file(rng, "python", vocab, 12)  # >= 200 normalized chars
    sub_members = []
    for _ in range(4):
        j = pick_base()
        body = base_content(j)
        cut = len(body) // 2
        sub_members.append(add_row(body[:cut] + "\n" + shared_block + "\n" + body[cut:],
                                   base_lang[j]))
    families.append(("substring", sub_members, None))

    # --- degenerate rows -------------------------------------------------
    add_row("", "python")
    add_row("x", "python")
    add_row(_gen_file(rng, "cpp", vocab, 4000), "cpp")   # big file
    add_row("def функция_обработки(данные):\n    return данные + 1", "python")

    # --- build tables ----------------------------------------------------
    corpus = pa.table({
        "repo": pa.array([r["repo"] for r in rows], pa.string()),
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "commit": pa.array([r["commit"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "content": pa.array([r["content"] for r in rows], pa.string()),
    })

    tp: dict[str, list] = {"u_repo": [], "u_path": [], "u_commit": [],
                           "v_repo": [], "v_path": [], "v_commit": [],
                           "kind": [], "true_jaccard": []}
    tc: dict[str, list] = {"repo": [], "path": [], "commit": [], "family_id": []}
    for fam_id, (kind, members, _) in enumerate(families):
        for a, b in itertools.combinations(sorted(members), 2):
            ra, rb = rows[a], rows[b]
            jv = (1.0 if kind == "exact"
                  else None if kind == "substring"
                  else true_jaccard(ra["content"], rb["content"]))
            tp["u_repo"].append(ra["repo"]); tp["u_path"].append(ra["path"])
            tp["u_commit"].append(ra["commit"])
            tp["v_repo"].append(rb["repo"]); tp["v_path"].append(rb["path"])
            tp["v_commit"].append(rb["commit"])
            tp["kind"].append(kind); tp["true_jaccard"].append(jv)
        for m in members:
            tc["repo"].append(rows[m]["repo"]); tc["path"].append(rows[m]["path"])
            tc["commit"].append(rows[m]["commit"]); tc["family_id"].append(fam_id)

    return Fixture(corpus=corpus,
                   truth_pairs=pa.table(tp),
                   truth_clusters=pa.table(tc))


def gen_bench_corpus(seed: int = 42, n_files: int = 100_000) -> pa.Table:
    """Bulk corpus generator for throughput benches (no truth tables).

    Vectorized construction: a pool of pre-rendered source lines, files as
    bulk-sampled line index slices, plus planted exact clones (5%), one
    boilerplate file cloned into 2% of rows (skew case) and near-dup
    mutations (10%). Orders of magnitude faster than gen_corpus because
    the RNG is called in bulk, not per line.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _identifiers(rng, 400)
    kw = [k for ks in _KEYWORDS.values() for k in ks]

    # --- line pool -------------------------------------------------------
    pool_n = 60_000
    shape = rng.integers(0, 4, pool_n)
    a_i = rng.integers(0, len(vocab), pool_n)
    b_i = rng.integers(0, len(vocab), pool_n)
    c_i = rng.integers(0, len(vocab), pool_n)
    k_i = rng.integers(0, len(kw), pool_n)
    lit = rng.integers(0, 1000, pool_n)
    pool = []
    for s, ai, bi, ci, ki, li in zip(shape, a_i, b_i, c_i, k_i, lit):
        a, b, c, k = vocab[ai], vocab[bi], vocab[ci], kw[ki]
        if s == 0:
            pool.append(f"{k} {a}({b}, {c}):")
        elif s == 1:
            pool.append(f"    {a} = {b}.{c}({li})")
        elif s == 2:
            pool.append(f"    {k} {a} {b} {li}")
        else:
            pool.append(f"    {a}_{b} += {c}[{li}]")

    # --- base files ------------------------------------------------------
    lengths = rng.integers(30, 250, n_files)
    total = int(lengths.sum())
    line_idx = rng.integers(0, pool_n, total)
    offs = np.zeros(n_files + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    contents: list[str] = [
        "\n".join([pool[j] for j in line_idx[offs[i]:offs[i + 1]]])
        for i in range(n_files)
    ]

    # --- planted structure ----------------------------------------------
    n_exact = n_files // 20
    src = rng.integers(0, n_files, n_exact)
    dst = rng.integers(0, n_files, n_exact)
    for s, d in zip(src, dst):
        if s != d:
            contents[d] = contents[s]
    boiler = contents[int(rng.integers(0, n_files))]
    for d in rng.integers(0, n_files, n_files // 50):
        contents[d] = boiler
    n_near = n_files // 10
    nsrc = rng.integers(0, n_files, n_near)
    ndst = rng.integers(0, n_files, n_near)
    repl = rng.integers(0, pool_n, n_near)
    for s, d, r in zip(nsrc, ndst, repl):
        if s == d:
            continue
        lines = contents[s].split("\n")
        cut = max(1, len(lines) // 20)
        start = int(r) % max(1, len(lines) - cut)
        lines[start:start + cut] = [pool[(int(r) + t) % pool_n] for t in range(cut)]
        contents[d] = "\n".join(lines)

    langs = np.array(_LANGS)[rng.integers(0, len(_LANGS), n_files)]
    repo_ids = rng.zipf(1.4, n_files) % 500
    commits = rng.integers(0, 2**63, n_files)
    return pa.table({
        "repo": pa.array([f"org{r % 37}/repo{r}" for r in repo_ids], pa.string()),
        "path": pa.array([f"src/m{i % 97}/f{i}.{_LANG_EXT[l]}"
                          for i, l in enumerate(langs)], pa.string()),
        "commit": pa.array([f"{c:016x}" for c in commits], pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def write_fixture(fx: Fixture, out_dir: str, rows_per_file: int = 25_000) -> list[str]:
    """Write the corpus as multiple parquet files (partition-level resume +
    scaling need >1 input file) plus the truth tables. Returns file list."""
    import os

    import pyarrow.parquet as pq
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    n = fx.corpus.num_rows
    paths = []
    for i, s0 in enumerate(range(0, n, rows_per_file)):
        p = os.path.join(corpus_dir, f"corpus-{i:04d}.parquet")
        pq.write_table(fx.corpus.slice(s0, rows_per_file), p)
        paths.append(p)
    pq.write_table(fx.truth_pairs, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(fx.truth_clusters, os.path.join(out_dir, "truth_clusters.parquet"))
    return paths
