"""The three verification strategies must produce identical edge sets."""

import pyarrow as pa
import pytest

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_pipeline
from nise_ray.util import collect_table


def _edges(fx, cfg):
    import ray
    res = dedup_pipeline(ray.data.from_arrow(fx.corpus), cfg)
    t = collect_table(res.edges)
    return set(zip(t.column("u").to_pylist(), t.column("v").to_pylist(),
                   t.column("src").to_pylist()))


def test_verify_modes_agree(ray_session, small_fixture):
    base = _edges(small_fixture, DedupConfig())           # auto -> broadcast
    carry = _edges(small_fixture, DedupConfig(verify_mode="carry"))
    join = _edges(small_fixture, DedupConfig(verify_mode="join"))
    assert base == carry
    assert base == join


def test_auto_resolves_to_join_at_scale(ray_session, small_fixture):
    """Beyond the broadcast gate, auto must pick the fully distributed
    join path (never the wide carried-sig exchange) and produce the
    identical edge set. Forced via a low gate."""
    import ray
    from nise_ray.pipeline import dedup_pipeline as dp
    base = dp(ray.data.from_arrow(small_fixture.corpus), DedupConfig())
    assert base.stats["verify_mode_resolved"] == "broadcast"
    scaled = dp(ray.data.from_arrow(small_fixture.corpus),
                DedupConfig(broadcast_label_max=1))
    assert scaled.stats["verify_mode_resolved"] == "join"

    def edge_set(res):
        t = collect_table(res.edges)
        return set(zip(t.column("u").to_pylist(), t.column("v").to_pylist()))

    assert edge_set(base) == edge_set(scaled)


def test_join_mode_distributed_distinct(ray_session, small_fixture):
    # force the fully distributed plan: join verify + shuffle distinct
    cfg = DedupConfig(verify_mode="join", driver_pairs_max=0,
                      driver_cc_max_edges=0)
    base = _edges(small_fixture, DedupConfig())
    dist = _edges(small_fixture, cfg)
    assert base == dist


def test_join_mode_oversized_partition_request(ray_session, small_fixture):
    """A USER-PINNED partition count beyond the cluster's aggregator CPU
    budget must fail loudly: honoring it deadlocks the aggregator pool
    (verified — a 512-partition pin on 8 CPUs hangs forever), while
    silently clamping breaks the pinned-plan manifest invariant (resume
    on a differently-sized cluster would execute a different plan).
    Engine-chosen data-sized counts (shuffle_partitions=0) are still
    clamped to a schedulable value — that path stays deadlock-free."""
    cfg = DedupConfig(verify_mode="join", shuffle_partitions=320)
    with pytest.raises(ValueError, match="schedulable"):
        _edges(small_fixture, cfg)
    # a schedulable pin is honored verbatim
    import ray
    from nise_ray.pipeline import dedup_pipeline as dp
    res = dp(ray.data.from_arrow(small_fixture.corpus),
             DedupConfig(verify_mode="join", shuffle_partitions=10))
    assert res.stats["shuffle_partitions_resolved"] == 10
