"""nise_ray — a Ray-Data-native near-duplicate detection & clustering engine.

Built from scratch against the functional spec in BASELINE.json (north_rule /
north_star / input_hint); the reference checkout is empty (SURVEY.md §0), so
there are no reference file:line citations — the authoritative contract is
the pinned configuration in :mod:`nise_ray.config` plus the brute-force
oracle in :mod:`nise_ray.oracle`.

Public surface:
    read_corpus / corpus_from_documents      (nise_ray.io)
    DedupConfig                              (nise_ray.config)
    dedup_pipeline / DedupResult             (nise_ray.pipeline)
"""

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_delta, dedup_pipeline

__all__ = ["DedupConfig", "dedup_pipeline", "dedup_delta"]
__version__ = "0.1.0"
