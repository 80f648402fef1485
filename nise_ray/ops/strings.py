"""Regex string kernels: field extraction + payload scrubbing.

The PII-scrub / field-parse primitive every log- or web-corpus
pipeline needs before training-data export: pull a typed field out of
a semi-structured string column with a capture group, and mask the
raw digits behind a placeholder token. Both kernels run as ONE
stateless zero-copy `map_batches` over Arrow — no exchange, no
per-row Python — using pyarrow.compute's RE2 engine, the same regex
dialect DuckDB's regexp_* functions use, so the oracle comparison is
bit-exact by construction (identical pattern, identical engine
semantics: leftmost, non-overlapping, 'g' replacement).

At 100 TB this is the cheapest stage shape in the engine: embarrassingly
parallel, column-pruned at the read, output row-for-row with the input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

# RE2 patterns shared verbatim with the oracle SQL (keep in sync with
# __ray_entry__.oracle_sql: scrub_event_props).
_K_FIELD = r'"k": (?P<k>\d+)'
_DIGITS = r"\d+"


def scrub_event_props(sf_dir: str,
                      placeholder: str = "<NUM>") -> "ray.data.Dataset":
    """For every event: extract the integer `k` field from the JSON-ish
    `props` payload via a regex capture group (typed BIGINT, NULL when
    absent), and emit a scrubbed copy of the payload with every digit
    run replaced by `placeholder` — (event_id, k_val, props_masked)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "props"])

    def scrub(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if batch.num_rows == 0:
            k_val = pa.array([], pa.int64())
        else:
            # extract_regex yields a struct of named groups (null struct
            # on non-match); flatten group 'k' and cast — digits-only by
            # the pattern, so the cast cannot fail on matched rows.
            hit = pc.extract_regex(props, _K_FIELD)
            k_val = pc.struct_field(hit, "k").cast(pa.int64())
        masked = pc.replace_substring_regex(props, pattern=_DIGITS,
                                            replacement=placeholder)
        return pa.table({"event_id": batch.column("event_id"),
                         "k_val": k_val,
                         "props_masked": masked})

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True)
