"""Stage T8: score candidate pairs → match edges.

Feature set (north_rule stage 2; reference analogs in SURVEY.md F1–F3/F5):

- ``jaccard_est``    MinHash signature agreement (full-text near-dup signal)
- ``jaro_winkler``   on profile text heads (prefix-weighted edit similarity)
- ``lev_ratio``      banded Levenshtein ratio on text heads
- ``anchor_overlap`` commonness-weighted overlap of the two conversations'
                     top anchors (the reference's anchor/concept features
                     recast as a pair feature): Σ_shared w / Σ_union w
- ``len_ratio``      min/max of total char counts

``score = Σ w_f · f + bias``; ``is_match = score ≥ threshold`` — the linear
scorer with explicit weights replaces the reference's pickled sklearn model
(``processors/learning.py``; SURVEY.md F5/St2). Weights live in config /
a JSON sidecar and can be refit offline (``fit_weights``).

Shape: deduplicated pairs carry only ids through the quadratic stage; the
per-conv profile+summary side is attached just before scoring. Two
strategies (``attach_profiles``):

- ``broadcast`` (default): the side table is ``ray.put`` once and each
  scorer actor builds a conv→profile dict in ``__init__`` — zero shuffle,
  right whenever the side fits in worker memory (profiles are ~2 KB/conv;
  at 10^12 turns the side table itself must be sharded → use shuffle).
- ``shuffle``: a conv-keyed scatter/gather over ``groupby`` (uniform-schema
  union — deliberately NOT ``Dataset.join``, which in ray 2.49 mishandles
  empty partitions inside composed plans): pairs melt to (conv, pair_id)
  rows, pick up their profile in a conv-keyed group, and reassemble in a
  pair_id-keyed group. Two shuffles, fully streaming, no driver state.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig, ScoringConfig
from ..functions.minhash import estimate_jaccard
from ..functions.strings import batch_levenshtein_ratio, jaro_winkler, levenshtein_ratio

EDGE_SCHEMA = pa.schema(
    [
        ("conv_a", pa.string()),
        ("conv_b", pa.string()),
        ("block_id", pa.string()),
        ("jaccard_est", pa.float64()),
        ("jaro_winkler", pa.float64()),
        ("lev_ratio", pa.float64()),
        ("anchor_overlap", pa.float64()),
        ("len_ratio", pa.float64()),
        ("score", pa.float64()),
        ("is_match", pa.bool_()),
    ]
)

FEATURE_NAMES = ["jaccard_est", "jaro_winkler", "lev_ratio", "anchor_overlap", "len_ratio"]

# Edit-metric caps: Jaro is O(n²) pure Python (~0.5 ms at 64 chars, ~30 ms
# at 256), so it runs on a short prefix — the full-text signal comes from
# the MinHash Jaccard estimate; Levenshtein's inner loop is numpy-vectorized
# so it affords a longer window.
LEV_CAP = 256
JW_CAP = 64


SIDE_COLS = ["sig", "text_head", "n_chars", "anchor_labels", "anchor_weights"]


def build_side_table(
    profiles: rd.Dataset, summaries: rd.Dataset | None, num_partitions: int = 16
) -> pa.Table:
    """Profiles ⟕ anchor summaries on conv_id → small per-conv side table
    (materialized pa.Table — one short row per conversation)."""
    import pandas as _pd

    pdf = profiles.select_columns(["conv_id", "sig", "text_head", "n_chars"]).to_pandas()
    if pdf.empty:  # empty datasets lose their schema through to_pandas
        pdf = _pd.DataFrame(
            {"conv_id": [], "sig": [], "text_head": [], "n_chars": []}
        )
    if summaries is not None:
        sdf = (
            summaries.select_columns(["conv_id", "anchor_labels", "anchor_weights"])
            .to_pandas()
        )
        pdf = pdf.merge(sdf, on="conv_id", how="left")
        # left-miss → empty lists
        pdf["anchor_labels"] = pdf["anchor_labels"].apply(
            lambda v: list(v) if isinstance(v, (list, np.ndarray)) else []
        )
        pdf["anchor_weights"] = pdf["anchor_weights"].apply(
            lambda v: list(v) if isinstance(v, (list, np.ndarray)) else []
        )
    else:
        pdf["anchor_labels"] = [[] for _ in range(len(pdf))]
        pdf["anchor_weights"] = [[] for _ in range(len(pdf))]
    return pa.Table.from_pandas(pdf[["conv_id"] + SIDE_COLS], preserve_index=False)


def attach_profiles(pairs: rd.Dataset, side: Any, num_partitions: int = 16) -> rd.Dataset:
    """Attach both endpoints' profiles to pair rows (broadcast strategy).

    ``side``: pa.Table or ray ObjectRef of one (``ray.put`` once on the
    driver; each attach actor reads it once in ``__init__``).
    """
    import ray

    side_ref = side if isinstance(side, ray.ObjectRef) else ray.put(side)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        # stateless task: the broadcast side table comes zero-copy from the
        # local object store; attachment is two vectorized pandas merges
        table: pa.Table = ray.get(side_ref)
        side_df = table.to_pandas()
        out = batch[["conv_a", "conv_b", "block_id"]]
        for sfx, key in (("_a", "conv_a"), ("_b", "conv_b")):
            renamed = side_df.rename(
                columns={c: c + sfx for c in SIDE_COLS}
            )
            out = out.merge(
                renamed, left_on=key, right_on="conv_id", how="left"
            ).drop(columns=["conv_id"])
        return out

    return pairs.map_batches(attach, batch_format="pandas", batch_size=8192)


def _anchor_overlap(la, wa, lb, wb) -> float:
    if la is None or lb is None or len(la) == 0 or len(lb) == 0:
        return 0.0
    da = dict(zip(la, wa))
    db = dict(zip(lb, wb))
    shared = set(da) & set(db)
    union_w = sum(da.values()) + sum(db.values())
    if union_w <= 0:
        return 0.0
    shared_w = sum(da[k] + db[k] for k in shared)
    return shared_w / union_w


def score_pairs(joined: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """Joined pair rows → edge rows with features + linear score."""
    scfg = cfg.scoring

    def score_batch(batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        sig_a = batch["sig_a"].to_numpy()
        sig_b = batch["sig_b"].to_numpy()
        head_a = batch["text_head_a"].to_numpy()
        head_b = batch["text_head_b"].to_numpy()
        chars_a = batch["n_chars_a"].to_numpy().astype(np.float64)
        chars_b = batch["n_chars_b"].to_numpy().astype(np.float64)
        al_a = batch["anchor_labels_a"].to_numpy()
        aw_a = batch["anchor_weights_a"].to_numpy()
        al_b = batch["anchor_labels_b"].to_numpy()
        aw_b = batch["anchor_weights_b"].to_numpy()

        jac = np.empty(n)
        jw = np.empty(n)
        ao = np.empty(n)
        for i in range(n):
            jac[i] = estimate_jaccard(
                np.frombuffer(sig_a[i], dtype=np.uint64),
                np.frombuffer(sig_b[i], dtype=np.uint64),
            )
            jw[i] = jaro_winkler(head_a[i] or "", head_b[i] or "", cap=JW_CAP)
            ao[i] = _anchor_overlap(al_a[i], aw_a[i], al_b[i], aw_b[i])
        lv = batch_levenshtein_ratio(head_a, head_b, cap=LEV_CAP)
        lo = np.minimum(chars_a, chars_b)
        hi = np.maximum(chars_a, chars_b)
        lr = np.where(hi > 0, lo / np.where(hi > 0, hi, 1.0), 1.0)

        feats = {
            "jaccard_est": jac,
            "jaro_winkler": jw,
            "lev_ratio": lv,
            "anchor_overlap": ao,
            "len_ratio": lr,
        }
        score = np.full(n, scfg.bias, dtype=np.float64)
        wsum = sum(scfg.weights.values()) or 1.0
        for name, w in scfg.weights.items():
            score += (w / wsum) * feats[name]
        return pa.table(
            {
                "conv_a": pa.array(batch["conv_a"].to_numpy(), pa.string()),
                "conv_b": pa.array(batch["conv_b"].to_numpy(), pa.string()),
                "block_id": pa.array(batch["block_id"].to_numpy(), pa.string()),
                "jaccard_est": pa.array(jac),
                "jaro_winkler": pa.array(jw),
                "lev_ratio": pa.array(lv),
                "anchor_overlap": pa.array(ao),
                "len_ratio": pa.array(lr),
                "score": pa.array(score),
                "is_match": pa.array(score >= scfg.threshold),
            }
        )

    return joined.map_batches(score_batch, batch_format="pandas", batch_size=4096)


def fit_weights(
    features: pd.DataFrame, labels: np.ndarray, iters: int = 500, lr: float = 0.5,
    seed: int = 42,
) -> tuple[dict[str, float], float, float]:
    """Offline logistic fit on labeled pair features (reference A4/F5 analog).

    Deterministic (fixed iteration count, no stochasticity). Returns
    (weights, bias, suggested_threshold) where the weights are scaled for
    the normalized linear scorer and the threshold maximizes F1 on the
    training set.
    """
    X = features[FEATURE_NAMES].to_numpy(dtype=np.float64)
    y = labels.astype(np.float64)
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * g.mean()
    # convert to the normalized-sum form used by score_pairs
    raw = dict(zip(FEATURE_NAMES, w))
    # threshold sweep on the raw logistic score mapped through the same form
    wsum = sum(abs(v) for v in raw.values()) or 1.0
    weights = {k: v for k, v in raw.items()}
    norm = sum(weights.values()) or 1.0
    scores = X @ (np.array([weights[k] for k in FEATURE_NAMES]) / norm) + b
    best_t, best_f1 = 0.5, -1.0
    for t in np.unique(np.round(scores, 4)):
        pred = scores >= t
        tp = float((pred & (y > 0)).sum())
        fp = float((pred & (y == 0)).sum())
        fn = float((~pred & (y > 0)).sum())
        f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
        if f1 > best_f1:
            best_f1, best_t = f1, float(t)
    return weights, float(b), best_t


def make_scoring_config(weights: dict[str, float], bias: float, threshold: float) -> ScoringConfig:
    return ScoringConfig(weights=weights, bias=bias, threshold=threshold)
