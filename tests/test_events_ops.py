import numpy as np
import pyarrow.parquet as pq

from nise_ray.util import collect_table

SF = "/root/testdata/sf0.001"


def test_windowed_event_counts(ray_session):
    from nise_ray.ops.events import MICROS_PER_HOUR, windowed_event_counts
    t = collect_table(windowed_event_counts(SF, hours=1))
    raw = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"])
    assert t.column("n_events").to_pylist()
    assert sum(t.column("n_events").to_pylist()) == raw.num_rows
    # window starts are hour-aligned
    ws = t.column("window_start").cast("int64").to_numpy(zero_copy_only=False)
    assert (ws % MICROS_PER_HOUR == 0).all()


def test_user_event_stats(ray_session):
    from nise_ray.ops.events import user_event_stats
    t = collect_table(user_event_stats(SF))
    raw = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    assert sum(t.column("n_events").to_pylist()) == raw.num_rows
    total = sum(t.column("total_value").to_pylist())
    expect = raw.column("value").to_numpy().sum()
    assert abs(total - expect) < 1.0


def test_top_docs_by_len(ray_session):
    from nise_ray.ops.events import top_docs_by_len
    t = top_docs_by_len(SF, k=10)
    assert t.num_rows == 10
    lens = t.column("n_chars").to_pylist()
    assert lens == sorted(lens, reverse=True)
    raw = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    assert lens[0] == max(raw.column("n_chars").to_pylist())
