"""Corpus ingest / output sinks.

Input contract (BASELINE.json input_hint): a Parquet table with columns
(repo, path, commit, lang, content) — all strings. Unexpected columns are
projected away at the READ (column pruning, nothing else leaves storage);
missing required columns are a hard error.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]
REQUIRED_COLUMNS = ["repo", "path", "commit", "content"]


def read_corpus(path: str | list[str], **read_kwargs) -> "ray.data.Dataset":
    """ray.data.read_parquet with schema validation + column pruning."""
    sample = path[0] if isinstance(path, list) else path
    try:
        schema = pq.ParquetDataset(sample).schema
        names = set(schema.names)
        missing = [c for c in REQUIRED_COLUMNS if c not in names]
        if missing:
            raise ValueError(f"corpus at {sample} missing required columns {missing}")
        cols = [c for c in CORPUS_COLUMNS if c in names]
        if "doc_id" in names:
            # honor the passthrough-column contract on file reads too:
            # doc_id (when present) rides through the sign stage so
            # downstream queries can key on the source table vectorized
            cols.append("doc_id")
    except (OSError, pa.ArrowInvalid):
        cols = CORPUS_COLUMNS
    return ray.data.read_parquet(path, columns=cols, **read_kwargs)


def corpus_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """Adapt the driver's `documents` table (doc_id, text, lang, source,
    n_chars) to the corpus schema — used by bench + entry smoke paths.

    `doc_id` rides along as a PASSTHROUGH column: the sign stage preserves
    any column outside the 5-column corpus contract, so downstream queries
    (cluster sizes, pair mapping) recover the documents key vectorized —
    never by driver-side path parsing."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])

    def adapt(b: pa.Table) -> pa.Table:
        doc_id = b.column("doc_id")
        return pa.table({
            "repo": b.column("source"),
            "path": pa.compute.binary_join_element_wise(
                pa.array(["doc"] * b.num_rows),
                pa.compute.cast(doc_id, pa.string()), ""),
            "commit": pa.array([""] * b.num_rows, pa.string()),
            "lang": b.column("lang"),
            "content": b.column("text"),
            "doc_id": pa.compute.cast(doc_id, pa.int64()),
        })

    return ds.map_batches(adapt, batch_format="pyarrow")


def filter_corpus(ds: "ray.data.Dataset", lang: str | None = None,
                  repo_prefix: str | None = None) -> "ray.data.Dataset":
    """Optional user predicate filters (SURVEY §3.2), pushed through a
    vectorized Arrow compute mask — no row iteration."""
    if lang is None and repo_prefix is None:
        return ds

    def apply(b: pa.Table) -> pa.Table:
        mask = None
        if lang is not None:
            m = pa.compute.equal(b.column("lang"), lang)
            mask = m if mask is None else pa.compute.and_(mask, m)
        if repo_prefix is not None:
            m = pa.compute.starts_with(b.column("repo"), pattern=repo_prefix)
            mask = m if mask is None else pa.compute.and_(mask, m)
        return b.filter(mask)

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def write_assignments(ds: "ray.data.Dataset", out_dir: str) -> None:
    ds.select_columns([
        "repo", "path", "commit", "doc_key", "content_sha256", "cluster_id",
    ]).write_parquet(out_dir)


def read_corpus_jsonl(path: str | list[str], **read_kwargs
                      ) -> "ray.data.Dataset":
    """JSONL ingest for the same 5-column corpus contract — the landing
    format most crawl/export tooling emits before parquet conversion.
    ray.data.read_json streams line-delimited JSON per block; the
    validation projector enforces the contract per batch (JSON has no
    file-level schema to check up front) and projects extra keys away.
    Use parquet for anything persistent: JSON pays ~4x the scan bytes
    and loses row-group pruning — this reader exists so a pipeline can
    consume landing data without a separate conversion job."""
    ds = ray.data.read_json(path, **read_kwargs)

    def validate(b: pa.Table) -> pa.Table:
        names = set(b.column_names)
        missing = [c for c in REQUIRED_COLUMNS if c not in names]
        if missing:
            raise ValueError(
                f"jsonl corpus missing required columns {missing}")
        cols = [c for c in CORPUS_COLUMNS if c in names]
        if "doc_id" in names:
            cols.append("doc_id")
        out = b.select(cols)
        if "lang" not in names:
            out = out.append_column(
                "lang", pa.array([""] * b.num_rows, pa.string()))
        for c in REQUIRED_COLUMNS:
            if not pa.types.is_string(out.schema.field(c).type):
                out = out.set_column(
                    out.schema.get_field_index(c), c,
                    out.column(c).cast(pa.string()))
        return out

    validate.__name__ = "ValidateJsonlCorpus"
    return ds.map_batches(validate, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_corpus_csv(path: str | list[str], **read_kwargs
                    ) -> "ray.data.Dataset":
    """CSV ingest for the corpus contract (header row required). Same
    per-batch validation/projection as the JSONL reader; same advice —
    convert to parquet for anything that will be read twice."""
    ds = ray.data.read_csv(path, **read_kwargs)

    def validate(b: pa.Table) -> pa.Table:
        names = set(b.column_names)
        missing = [c for c in REQUIRED_COLUMNS if c not in names]
        if missing:
            raise ValueError(
                f"csv corpus missing required columns {missing}")
        cols = [c for c in CORPUS_COLUMNS if c in names]
        if "doc_id" in names:
            cols.append("doc_id")
        out = b.select(cols)
        if "lang" not in names:
            out = out.append_column(
                "lang", pa.array([""] * b.num_rows, pa.string()))
        for c in REQUIRED_COLUMNS:
            f = out.schema.field(c)
            if not pa.types.is_string(f.type):
                out = out.set_column(
                    out.schema.get_field_index(c), c,
                    out.column(c).cast(pa.string()))
        # CSV renders empty strings as nulls — restore the contract
        for c in REQUIRED_COLUMNS + ["lang"]:
            col = out.column(c)
            if col.null_count:
                out = out.set_column(
                    out.schema.get_field_index(c), c,
                    pa.compute.fill_null(col, ""))
        return out

    validate.__name__ = "ValidateCsvCorpus"
    return ds.map_batches(validate, batch_format="pyarrow",
                          zero_copy_batch=True)
