"""Benchmark decontamination — DuckDB parity at sf0.001 plus a planted
contamination check (the driver's oracle re-checks at sf0.01)."""

import re

import duckdb
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[A-Za-z0-9_]+")

_ORACLE = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS ts
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(ts, i + 1, i + 5), ' ') AS gram
      FROM toks, UNNEST(range(greatest(len(ts) - 4, 0))) AS u(i)),
    e AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
    SELECT g.doc_id AS doc_id, count(*) AS n_shared
    FROM g JOIN e USING (gram)
    WHERE g.doc_id >= 20
    GROUP BY g.doc_id ORDER BY g.doc_id
"""


def test_decontaminate_matches_duckdb(ray_session):
    from nise_ray.ops.decontam import decontaminate
    got = decontaminate(SF, eval_max=20, w=5)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(_ORACLE).fetchall()
    have = list(zip(got.column("doc_id").to_pylist(),
                    got.column("n_shared").to_pylist()))
    assert have == [tuple(r) for r in want]
    assert len(have) > 0, "fixture produced no contamination"
    # eval docs themselves are never reported
    assert all(i >= 20 for i, _ in have)


def test_decontaminate_planted(ray_session, tmp_path):
    """A doc that literally embeds an eval doc's text must be flagged with
    the exact distinct-gram count; an unrelated doc must not be."""
    import pyarrow as pa
    from nise_ray.ops.decontam import decontaminate
    ev = "alpha beta gamma delta epsilon zeta eta theta"
    clean = "one two three four five six seven eight nine ten"
    dirty = "prefix words here " + ev + " suffix words there"
    t = pa.table({
        "doc_id": pa.array([0, 100, 101], pa.int64()),
        "text": pa.array([ev, dirty, clean], pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = decontaminate(str(tmp_path), eval_max=20, w=5)
    toks = _TOK.findall(ev)
    ev_grams = {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}
    assert got.column("doc_id").to_pylist() == [100]
    assert got.column("n_shared").to_pylist() == [len(ev_grams)]
