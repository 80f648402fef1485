"""Pinned dedup configuration — the determinism contract (SURVEY.md §9, v2).

Config v2 changes vs the v1 sketch in SURVEY.md §9 (both are OUR contract;
the reference tree is empty so "identical config" is self-defined — see
SURVEY.md §0):

* ``minhash_hash_family``: ``h_i(x) = splitmix64(x XOR seed_i) >> 32`` —
  splitmix64's finalizer is a bijection on uint64, so each ``h_i`` is a true
  permutation (better-founded than the truncated modular family) and runs as
  pure vectorized numpy uint64 arithmetic with well-defined wraparound.
* ``shingle_hash``: per-token blake2b-8 (platform-stable, cached per unique
  token) folded across the w-token window with a polynomial accumulator and
  splitmix64 finalizer — vectorized, no per-shingle Python hashing.
* ``doc_key``: ``blake2b64(repo \\x00 path \\x00 commit)`` instead of a
  global lexicographic rank — a rank needs a global sort of 10^12 rows; a
  keyed hash is deterministic, shuffle-free and collision-safe enough
  (~64-bit) for cluster labeling, and the string triple is carried to every
  output so truth comparison stays implementation-independent.
* ``band_key``: polynomial fold of the band's r uint32 values, salted with
  ``splitmix64(band_id)``, finalized with splitmix64 (was blake2b-8).

Everything else (normalization, tokenizer, w=5, K=128, b×r=16×8, τ=0.7,
SimHash 64-bit with 4×16-bit Manku blocks and k=3, winnowing-based substring
stage with guarantee length 100, bucket cap M=1000) matches the v1 pin.
Changing any field below is a config-version bump recorded in every manifest.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

CONFIG_VERSION = 5


@dataclasses.dataclass(frozen=True)
class DedupConfig:
    """Frozen pipeline configuration; serialized into every run manifest."""

    seed: int = 42

    # --- shingling -------------------------------------------------------
    shingle_w: int = 5            # tokens per shingle
    min_shingles: int = 1         # docs below this bypass LSH (exact path only)

    # --- MinHash / LSH ---------------------------------------------------
    minhash_k: int = 128          # signature length, = bands * rows
    minhash_mode: str = "oph"     # "oph" (one-permutation, O(M)) | "kperm"
    sig_value_bytes: int = 4      # stored bytes per signature slot: 4
                                  # (uint32) or 2 (uint16 — high 16 bits;
                                  # truncation commutes with min, so this
                                  # IS 16-bit OPH/MinHash; halves sig-map
                                  # broadcast + join/carry shuffle volume
                                  # at +2^-16/slot false-match rate)
    bands: int = 16
    rows_per_band: int = 8
    tau: float = 0.7              # verify threshold on estimated Jaccard

    # --- skew handling (north-rule R13) ---------------------------------
    bucket_cap: int = 1000        # max bucket members for full pairwise gen
    salt_shards: int = 1          # >1 => two-phase salted band shuffle

    # --- SimHash ---------------------------------------------------------
    simhash_enabled: bool = True
    simhash_bits: int = 64
    simhash_blocks: int = 4       # Manku block tables: 4 x 16 bits
    simhash_hamming_k: int = 3

    # --- substring (winnowing) stage -------------------------------------
    substring_enabled: bool = True
    winnow_k: int = 64            # k-gram length (normalized chars)
    winnow_window: int = 37       # guarantee length t = k + w - 1 = 100
    substring_min_len: int = 100

    # --- execution -------------------------------------------------------
    batch_size: int = 1024        # rows per map_batches call in sign stage
                                  # (~6 MB content per batch; the batched
                                  # tokenize/dictionary-encode kernels
                                  # amortize better on larger batches)
    sign_concurrency: int | None = None   # explicit actor-pool size; None = task path
                                          # with per-worker signer cache (default)
    driver_cc_max_edges: int = 5_000_000  # <= this: driver union-find, else distributed
    driver_pairs_max: int = 20_000_000    # <= this: driver-side distinct+verify
                                          # (numpy), else distributed shuffle
    driver_docs_max: int = 250_000        # corpus-size gate for the driver
                                          # fast path — keyed on the ALREADY-
                                          # KNOWN doc count so no materialize+
                                          # count barrier on the candidate
                                          # union is ever needed. Measured
                                          # crossover at 32 CPUs: driver
                                          # wins at 100k docs (7.5 s vs
                                          # 8.9 s), the distributed distinct
                                          # + broadcast-verify wins at 1M
                                          # (44.6 s vs 69.7 s) AND scales
                                          # 0.92 from 8->32 CPUs vs the
                                          # driver path's 0.44 — the driver
                                          # collect is a serial Amdahl term
    cc_max_rounds: int = 24               # distributed hash-to-min round cap
    broadcast_label_max: int = 5_000_000  # label-map broadcast threshold
    shuffle_partitions: int = 0           # 0 = let Ray Data decide
    explode_batch_size: int = 32768       # docs bundled per explode task
                                          # feeding a hash exchange. The
                                          # shuffle map pays a fixed
                                          # put+RPC per (input block x
                                          # partition); 4k-doc sign blocks
                                          # made the 1M-file exchange move
                                          # ~10k tiny objects (measured:
                                          # bundling 8 blocks per explode
                                          # task cut the candidate-exchange
                                          # CPU 110->24 s at 8 CPUs and
                                          # 157->113 s at 32, wall 34->23
                                          # and 9.6->7.6). Result-invariant
                                          # (pair set identical).
    sign_chunk_files: int = 0             # files per sign checkpoint chunk
                                          # (0 = auto: max(8, n_files/16))

    # --- verification strategy -------------------------------------------
    # "auto": narrow exchange + broadcast sig map while the corpus fits
    #         broadcast_label_max, else the fully distributed signature
    #         hash join (the scale path — never the wide carried-sig
    #         exchange); non-unified plans verify inline ("carry")
    # "carry": always carry sigs through the exchange (distributed-safe
    #          but ~10x the shuffle volume of the narrow modes)
    # "join": narrow exchange + two-sided distributed signature hash join
    #         (no broadcast, no driver state — the 10^12-file setting)
    verify_mode: str = "auto"

    # --- stage toggles ----------------------------------------------------
    exact_enabled: bool = True
    minhash_enabled: bool = True

    # --- extension hook (SURVEY §3.9) ------------------------------------
    # pure function str -> str replacing the default normalizer; the hash
    # of its SOURCE is folded into config_hash so a changed hook is a
    # changed config (manifest-recorded, resume-guarded)
    custom_normalizer: "object | None" = None

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.minhash_k:
            raise ValueError("minhash_k must equal bands * rows_per_band")
        if self.simhash_bits != 64 or self.simhash_blocks != 4:
            raise ValueError("only 64-bit / 4-block SimHash is implemented")
        if self.sig_value_bytes not in (2, 4):
            raise ValueError("sig_value_bytes must be 2 or 4")

    def config_hash(self) -> str:
        """Stable hash of the full config + version, recorded in manifests."""
        blob = json.dumps(self.to_dict(), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def to_dict(self) -> dict:
        d = {"config_version": CONFIG_VERSION, **dataclasses.asdict(self)}
        fn = d.pop("custom_normalizer", None)
        if fn is not None:
            import inspect
            try:
                src = inspect.getsource(fn)
            except (OSError, TypeError):
                src = repr(fn)
            d["custom_normalizer_src_sha"] = hashlib.sha256(
                src.encode()).hexdigest()[:16]
        else:
            d["custom_normalizer_src_sha"] = None
        return d
