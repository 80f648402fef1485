"""Duplicate-40-gram coverage (nise_ray/ops/ngramcov.py): kernel edge
cases, a brute-force Python oracle on planted micro-corpora, DuckDB
parity at sf0.001, and broadcast/exchange mode parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

ORACLE_SQL = """
WITH pos AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS p,
         substr(text, CAST(u.i + 1 AS BIGINT), {g}) AS gram
  FROM documents, unnest(range(0, length(text) - {gm1})) AS u(i)
  WHERE length(text) >= {g}),
dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
dp AS (SELECT p.doc_id, p.p FROM pos p JOIN dup USING (gram)),
runs AS (SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= {g}
              THEN 0 ELSE 1 END AS new_run FROM dp),
grp AS (SELECT doc_id, p, sum(new_run) OVER (PARTITION BY doc_id ORDER BY p
        ROWS UNBOUNDED PRECEDING) AS g FROM runs),
cov AS (SELECT doc_id, CAST(sum(mx - mn + {g}) AS BIGINT) AS covered
        FROM (SELECT doc_id, g, min(p) AS mn, max(p) AS mx
              FROM grp GROUP BY doc_id, g)
        GROUP BY doc_id)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_chars,
       CASE WHEN length(d.text) = 0 THEN 0.0
            ELSE coalesce(c.covered, 0) / CAST(length(d.text) AS DOUBLE)
       END AS dup_cov
FROM documents d LEFT JOIN cov c USING (doc_id)
"""


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _brute_coverage(texts: list[str], g: int) -> list[int]:
    """Reference implementation: exact gram strings, per-doc interval
    union, plain Python."""
    from collections import Counter
    counts = Counter(t[i:i + g] for t in texts
                     for i in range(len(t) - g + 1))
    out = []
    for t in texts:
        dup_pos = [i for i in range(len(t) - g + 1)
                   if counts[t[i:i + g]] >= 2]
        covered, run_start, prev = 0, None, None
        for p in dup_pos:
            if run_start is None:
                run_start = prev = p
            elif p - prev > g:
                covered += prev + g - run_start
                run_start = prev = p
            else:
                prev = p
        if run_start is not None:
            covered += prev + g - run_start
        out.append(covered)
    return out


def test_gram_hash_kernel_matches_strings():
    """128-bit rolling hashes agree with gram-string identity on a
    repetition-heavy corpus (equal grams -> equal hash pair; unequal
    grams -> unequal pair at this scale)."""
    from nise_ray.ops.ngramcov import (_PowCache, _flat_ascii,
                                       _gram_hashes, _positions)
    rng = np.random.default_rng(7)
    words = ["def", "return", "x", "foo(", ")", "import", "os"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
             for _ in range(50)]
    g = 8
    b = pa.table({"text": pa.array(texts)})
    data, off = _flat_ascii(b.column("text"))
    row, intra, gstart = _positions(off, g)
    pows = _PowCache().tables(int(off[-1]) + 1)
    h1, h2 = _gram_hashes(data, off, gstart, g, pows)
    grams = [texts[r][i:i + g] for r, i in zip(row, intra)]
    seen = {}
    for gr, a, c in zip(grams, h1, h2):
        key = (int(a), int(c))
        assert seen.setdefault(key, gr) == gr  # no collisions
    assert len({(int(a), int(c)) for a, c in zip(h1, h2)}) == \
        len(set(grams))


def test_positions_and_slice_offsets():
    from nise_ray.ops.ngramcov import _flat_ascii, _positions
    b = pa.table({"text": pa.array(["abcdefgh", "xy", "", "abcd"])})
    data, off = _flat_ascii(b.column("text"))
    row, intra, gstart = _positions(off, 4)
    assert row.tolist() == [0, 0, 0, 0, 0, 3]
    assert intra.tolist() == [0, 1, 2, 3, 4, 0]
    # sliced (nonzero-offset) arrays resolve the same byte windows
    b2 = b.slice(3, 1)
    data2, off2 = _flat_ascii(b2.column("text"))
    _r2, _i2, gs2 = _positions(off2, 4)
    assert bytes(data2[gs2[0]:gs2[0] + 4]) == b"abcd"


def test_planted_micro_corpus(ray_session):
    """Engine matches the brute-force oracle on a corpus with planted
    exact duplicates, overlapping repeats, and short docs — run through
    a temp parquet so both modes exercise the full pipeline."""
    import tempfile
    import os
    import ray

    import pyarrow.parquet as pq

    from nise_ray.ops.ngramcov import dup_ngram_coverage
    from nise_ray.util import collect_table

    g = 12
    boiler = "LICENSE Apache 2.0 all rights reserved!"
    rng = np.random.default_rng(3)
    uniq = ["".join(rng.choice(list("abcdefghij "), 60)) for _ in range(6)]
    texts = ([boiler + u for u in uniq[:3]] +      # shared dup prefix
             [uniq[3], uniq[3]] +                  # whole-doc exact dup
             ["ab" * 30] +                         # self-repeating doc
             ["short", ""] +                       # < g chars
             [uniq[4] + boiler])                   # dup suffix
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)}),
            os.path.join(d, "documents.parquet"))
        eng = {}
        for mode in ("broadcast", "exchange"):
            t = collect_table(dup_ngram_coverage(d, gram_chars=g,
                                                 mode=mode)).to_pandas()
            eng[mode] = _sorted(t)
        assert eng["broadcast"].equals(eng["exchange"])
        got = eng["broadcast"].set_index("doc_id")
        expect = _brute_coverage(texts, g)
        for i, t in enumerate(texts):
            assert got.loc[i, "n_chars"] == len(t)
            assert got.loc[i, "covered_chars"] == expect[i], i
        # planted semantics sanity
        assert got.loc[3, "dup_cov"] == 1.0          # exact dup pair
        assert got.loc[5, "dup_cov"] == 1.0          # self-repeat
        assert got.loc[6, "covered_chars"] == 0      # shorter than g
        assert got.loc[7, "dup_cov"] == 0.0          # empty doc


def test_sf0001_matches_duckdb(ray_session):
    from nise_ray.ops.ngramcov import dup_ngram_coverage
    from nise_ray.util import collect_table

    eng = _sorted(collect_table(dup_ngram_coverage(SF)).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ora = _sorted(con.execute(ORACLE_SQL.format(g=40, gm1=39)).df())
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)
    assert (eng["covered_chars"] <= eng["n_chars"]).all()
    assert eng["dup_cov"].between(0.0, 1.0).all()


def test_non_ascii_rejected():
    from nise_ray.ops.ngramcov import _flat_ascii
    b = pa.table({"text": pa.array(["café latte"])})
    with pytest.raises(ValueError, match="ASCII"):
        _flat_ascii(b.column("text"))
