"""Run configuration for the entity-resolution pipeline.

The reference drives its processor chain from a YAML config +
per-request query params (``semanticizer/config.py``; SURVEY.md S3/M11).
Here the whole run is parameterized by one frozen dataclass that is
snapshotted into every checkpoint manifest (lineage), so a resumed run can
verify it is continuing the same logical job.

All randomness in the engine derives from ``seed`` — MinHash permutations,
salting, generator perturbations — so reruns are byte-deterministic.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class NormalizeConfig:
    """Text-normalization flags (reference: ``wpm/utils.py::normalize``).

    The reference folds dashes to spaces, strips accents via NFKD, lowercases
    and collapses whitespace; each step is a config flag. Same semantics here.
    """

    dash_to_space: bool = True
    strip_accents: bool = True
    lowercase: bool = True
    collapse_whitespace: bool = True


@dataclass(frozen=True)
class AnchorConfig:
    """Anchor matching / sense expansion (reference: ``processors/semanticize.py``)."""

    max_ngram: int = 5  # longest anchor in words
    # reference ``Semanticizer.semanticize``: drop labels whose
    # keyphraseness/linkProbability is below threshold
    min_link_probability: float = 0.0
    # reference config ``sense_probability_threshold``
    min_sense_probability: float = 0.0
    # keep top-1 candidate per (conv, sense): the "unique" filter
    unique_per_sense: bool = False


@dataclass(frozen=True)
class BlockingConfig:
    """Stage-1 blocking: MinHash-LSH over char shingles + anchor keys."""

    shingle_k: int = 5  # char n-gram size for shingles
    num_hashes: int = 128  # MinHash signature length
    num_bands: int = 16  # LSH bands (rows per band = num_hashes // num_bands)
    # conversations whose concatenated normalized text is shorter than this
    # still get at least one shingle (the padded text itself)
    # cap on the text snippet carried into scoring. 256 = the scorer's
    # LEV_CAP (the edit metrics never read further); the MinHash signature
    # covers the full text regardless. A larger head only inflates the
    # conv-keyed exchange: at 4000 the profile sort moved ~15× more bytes
    # for identical scores
    max_profile_chars: int = 256
    # anchor-derived blocking: each conversation also emits its top-K rarest
    # matched anchors as blocking keys (complements LSH for short texts)
    anchor_keys_per_conv: int = 4
    # anchor keys shared by more conversations than this are DROPPED (not
    # salted): a non-discriminative anchor is noise, and exact pair coverage
    # of such blocks is quadratic blow-up for near-zero precision. Dropped
    # key count is logged by the blocking stage (no silent loss of the
    # configured semantics; LSH still covers near-dup pairs)
    anchor_max_block_size: int = 32
    # hot-key handling: blocks larger than this get salted into sub-blocks
    max_block_size: int = 64
    # absolute guard: a (possibly salted) block never generates more pairs
    # than this; overflow is counted and logged, never silent
    max_pairs_per_block: int = 4096

    def __post_init__(self) -> None:
        if self.num_hashes < self.num_bands:
            # rows-per-band would floor to 0 → every band hash identical →
            # one bucket per band (silent quadratic pair blowup downstream)
            raise ValueError(
                f"num_hashes ({self.num_hashes}) must be >= num_bands "
                f"({self.num_bands})"
            )


@dataclass(frozen=True)
class ScoringConfig:
    """Stage-2 pairwise scoring weights + match threshold.

    Linear model over pair features (reference analog: the sklearn
    re-scorer ``processors/learning.py``, replaced by explicit weights —
    SURVEY.md F5/St2). Weights can be refit from labeled pairs offline.
    """

    weights: dict[str, float] = field(
        default_factory=lambda: {
            "jaccard_est": 1.0,
            "jaro_winkler": 1.0,
            "lev_ratio": 1.0,
            "anchor_overlap": 0.5,
            # F3 context feature (sense co-occurrence relatedness); with no
            # relatedness artifact it degrades to a weighted label overlap
            "ctx_relatedness": 0.5,
            "len_ratio": 0.25,
        }
    )
    bias: float = 0.0
    threshold: float = 0.55  # score >= threshold → is_match
    # Edit-distance metric revision. v2 = UTF-8 BYTE-level Levenshtein
    # (cap counted in bytes); v1 was character-level. Scores differ on
    # non-ASCII text, so this field participates in config_hash and
    # invalidates checkpointed edge artifacts scored under v1 (see README
    # "Compatibility notes").
    lev_metric_version: int = 2
    # scorer side-state path gate: at or below this many profile rows the
    # per-conv side table is broadcast (one ray.put, zero-copy numpy); above
    # it scoring takes the conv-keyed scatter/gather (no driver
    # materialization, no whole-dataset broadcast — the 10^12-turn path).
    # ~1.3 KB/conv → the default caps the broadcast at ~130 MB.
    side_broadcast_gate: int = 100_000


@dataclass(frozen=True)
class ClusterConfig:
    """Stage-3 transitive clustering (distributed min-label propagation)."""

    max_rounds: int = 50
    # partition-local union-find contraction before the first global round
    local_contract: bool = True
    # after contraction the edge count is KNOWN (counted, not assumed): at
    # or below this many edges the components finish on the driver (exact
    # union-find, no per-round shuffles); above it, distributed min-label
    # rounds run. ~2M edges ≈ 100 MB — driver-safe; a 10^12-turn run with
    # more surviving match edges takes the distributed path automatically.
    driver_edge_threshold: int = 2_000_000


@dataclass(frozen=True)
class EngineConfig:
    seed: int = 42
    normalize: NormalizeConfig = field(default_factory=NormalizeConfig)
    anchor: AnchorConfig = field(default_factory=AnchorConfig)
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    # execution knobs
    batch_size: int = 4096
    # max actors per stateful pool (pools autoscale from 1 and are further
    # capped at session CPUs − 2, so results and small sessions are
    # unaffected; the cap only binds on very wide machines)
    actor_concurrency: int = 30

    def config_hash(self) -> str:
        """Stable hash of the full config, recorded in lineage manifests."""
        blob = json.dumps(dataclasses.asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


DEFAULT_CONFIG = EngineConfig()
