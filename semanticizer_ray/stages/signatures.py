"""Stage T5 (+T3 fold-in): per-conversation profiles in ONE pass.

The logical entity-resolution record is one CONVERSATION; the physical input
is one row per TURN. This stage folds turns into conversation profiles with
a mergeable aggregation so the conv-keyed shuffle moves kilobytes per
conversation, never raw full texts:

1. actor-pool ``map_batches``: per turn, char-k-shingle hashes of
   ``norm_text`` AND (when an anchor dictionary is supplied) anchor mention
   counts from the in-actor dictionary — the matcher rides in the same
   actor, so the text is read, normalized and scanned exactly once.
   Partials combine WITHIN the batch per conv (input is written sorted by
   (conv_id, turn_idx), so most conversations collapse to one partial row
   before the shuffle);
2. ONE ``sorted_grouped_agg(conv_id)``: elementwise-min of partial
   signatures (MinHash mergeability, ``np.minimum.reduceat``), ordered
   concat of truncated text heads, count sums, anchor-count dict merge →
   top-M weighted anchors + K-rarest anchor blocking keys per conversation.

Determinism: the conversation shingle set is the UNION of per-turn shingle
sets (never shingles across turn boundaries), so results are invariant to
batch boundaries and block order.

Profile schema:
    conv_id:string, sig:binary (num_hashes × uint64), text_head:string,
    n_turns:int64, n_chars:int64,
    anchor_labels:list<string>, anchor_weights:list<double>,
    block_keys:list<string>    (anchor-derived "A:" keys; empty w/o dict)
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import sorted_grouped_agg
from ..functions.minhash import (
    hash_params,
    minhash_from_shingle_groups,
    shingle_hashes_multi,
)
from ..functions.normalize import normalize_text

PROFILE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("sig", pa.binary()),
        ("text_head", pa.string()),
        ("n_turns", pa.int64()),
        ("n_chars", pa.int64()),
        ("anchor_labels", pa.list_(pa.string())),
        ("anchor_weights", pa.list_(pa.float64())),
        ("block_keys", pa.list_(pa.string())),
    ]
)

TOP_M_ANCHORS = 16


# Per-worker-process state cache for the stateless partials tasks: Ray
# reuses warm worker processes across tasks, so the hash family + anchor
# dictionary build once per (worker, config) instead of paying actor-pool
# startup (~0.5 s/actor × pool size dominated the stage wall time). The
# broadcast dict table itself comes zero-copy from the object store.
#
# CRITICAL pickling detail: closures shipped to Ray tasks are serialized BY
# VALUE with a synthetic globals namespace, so a closure that references
# this dict DIRECTLY gets a fresh empty dict on every task (measured: 135
# cold dictionary builds for 135 tasks — ~200 core-s of pure setup waste at
# the 100k tier). Access MUST go through ``_worker_state()``, a module-level
# function that cloudpickle serializes BY REFERENCE, so tasks resolve the
# worker's real imported module and its one persistent dict.
_WORKER_STATE: dict = {}


def _worker_state(state_key, cfg, dict_source) -> "_TurnPartials":
    st = _WORKER_STATE.get(state_key)
    if st is None:
        import os as _os

        if _os.environ.get("GRAFT_DEBUG_COLD") == "1":
            print(f"[cold-partials] pid={_os.getpid()}")
        st = _TurnPartials(cfg, dict_source)
        _WORKER_STATE.clear()
        _WORKER_STATE[state_key] = st
    return st


def _conv_anchor_lists(matcher, sorted_texts, conv_sorted) -> list[list[tuple]]:
    """Per-conversation anchor lists [(label, count, lp, link_doc), ...]
    from conv-grouped normalized texts, byte-equivalent to folding the
    scalar ``count_labels_normtext`` per turn and merging per conv
    (counts sum; lp/link_doc and list position come from the label's FIRST
    occurrence in turn order — here literally the first candidate hit,
    since candidates are generated in that exact order)."""
    n = len(sorted_texts)
    if n == 0:
        return []
    conv_sorted = np.asarray(conv_sorted, dtype=object)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = conv_sorted[1:] != conv_sorted[:-1]
    conv_idx = np.cumsum(change) - 1
    out: list[list[tuple]] = [[] for _ in range(int(conv_idx[-1]) + 1)]
    slot_e, label_e, lp_e, ld_e = matcher.candidate_entries_batch(sorted_texts)
    if len(label_e) == 0:
        return out
    codes, uniq_labels = pd.factorize(label_e)
    uniq_labels = np.asarray(uniq_labels, dtype=object)
    v = np.int64(len(uniq_labels))
    combined = conv_idx[slot_e].astype(np.int64) * v + codes
    uniq, first_idx, cnts = np.unique(combined, return_index=True, return_counts=True)
    conv_u = uniq // v
    ord2 = np.lexsort((first_idx, conv_u))  # within conv: first-seen order
    lab_u = uniq_labels[(uniq % v)[ord2]]
    cnt_u = cnts[ord2]
    lp_u = lp_e[first_idx[ord2]]
    ld_u = ld_e[first_idx[ord2]]
    for k, cu in enumerate(conv_u[ord2]):
        out[int(cu)].append(
            (lab_u[k], int(cnt_u[k]), float(lp_u[k]), int(ld_u[k]))
        )
    return out


class _TurnPartials:
    """Per-batch partial profiles; the seeded hash family and (optionally)
    the anchor dictionary are loaded once per WORKER (SURVEY.md St1)."""

    def __init__(self, cfg: EngineConfig, dict_source: Any = None):
        self.cfg = cfg
        self.a, self.b = hash_params(cfg.blocking.num_hashes, cfg.seed)
        self.k = cfg.blocking.shingle_k
        self.cap = cfg.blocking.max_profile_chars
        self.matcher = None
        if dict_source is not None:
            from .mentions import AnchorMatcher

            self.matcher = AnchorMatcher(dict_source, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = np.asarray(batch["conv_id"].to_pylist(), dtype=object)
        tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)
        texts = batch["norm_text"].to_pylist()
        order = np.lexsort((tidx, conv))
        out = {
            "conv_id": [], "text_head": [], "n_turns": [],
            "n_chars": [], "min_turn": [], "anchors": [],
        }
        n = len(order)
        # batched shingle hashing: ONE encode + windowing pass for the whole
        # batch (the per-turn shingle_hashes call paid ~5 numpy-call setups
        # per ~150-char turn — 46% of this stage's profile)
        sorted_texts = [texts[o] or "" for o in order]
        turn_hashes = shingle_hashes_multi(sorted_texts, self.k)
        # batched anchor counting: one hash probe for the whole batch's
        # n-grams instead of a dict get per n-gram per turn (the scalar
        # loop was ~half this stage's CPU); per-conv lists come back in
        # the scalar path's first-seen order (parity-tested)
        anchors_by_conv = (
            _conv_anchor_lists(self.matcher, sorted_texts, conv[order])
            if self.matcher is not None
            else None
        )
        conv_shingles: list[np.ndarray] = []
        i = 0
        ci = 0
        with np.errstate(over="ignore"):
            while i < n:
                j = i
                cid = conv[order[i]]
                heads: list[str] = []
                n_chars = 0
                head_len = 0
                while j < n and conv[order[j]] == cid:
                    t = sorted_texts[j]
                    n_chars += len(t)
                    if head_len < self.cap:
                        heads.append(t[: self.cap - head_len])
                        head_len += len(heads[-1]) + 1
                    j += 1
                # conv shingle set = union of its turns' raw window hashes
                # (same set as unioning per-turn deduped sets)
                conv_shingles.append(
                    np.unique(np.concatenate(turn_hashes[i:j]))
                    if j > i + 1
                    else np.unique(turn_hashes[i])
                )
                out["conv_id"].append(cid)
                out["text_head"].append(" ".join(heads))
                out["n_turns"].append(j - i)
                out["n_chars"].append(n_chars)
                out["min_turn"].append(int(tidx[order[i]]))
                out["anchors"].append(
                    anchors_by_conv[ci] if anchors_by_conv is not None else []
                )
                ci += 1
                i = j
        # batched signatures: one chunked reduceat instead of a per-conv loop
        sig_mat = minhash_from_shingle_groups(conv_shingles, self.a, self.b)
        sigs = [sig_mat[r].tobytes() for r in range(len(conv_shingles))]
        anchor_type = pa.list_(
            pa.struct(
                [("label", pa.string()), ("cnt", pa.int64()),
                 ("lp", pa.float64()), ("ld", pa.int64())]
            )
        )
        return pa.table(
            {
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "sig": pa.array(sigs, pa.binary()),
                "text_head": pa.array(out["text_head"], pa.string()),
                "n_turns": pa.array(out["n_turns"], pa.int64()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
                "min_turn": pa.array(out["min_turn"], pa.int64()),
                "anchors": pa.array(
                    [
                        [
                            {"label": l, "cnt": c, "lp": lp, "ld": ld}
                            for l, c, lp, ld in row
                        ]
                        for row in out["anchors"]
                    ],
                    anchor_type,
                ),
            }
        )


def conv_profiles(
    normalized: rd.Dataset,
    cfg: EngineConfig,
    dict_source: Any = None,
    batch_size: int | None = None,
) -> rd.Dataset:
    """Turn-level normalized transcripts → one profile row per conversation
    (module docstring). ``dict_source``: anchor dict (table / ObjectRef /
    path) — when given, anchor summaries + blocking keys are produced in
    the same pass."""
    cap = cfg.blocking.max_profile_chars
    num_hashes = cfg.blocking.num_hashes
    k_keys = cfg.blocking.anchor_keys_per_conv
    ncfg = cfg.normalize

    import ray

    if dict_source is not None and not isinstance(dict_source, ray.ObjectRef):
        dict_source = ray.put(dict_source)
    state_key = (cfg.config_hash(), dict_source.hex() if dict_source is not None else None)

    def partials_fn(batch: pa.Table) -> pa.Table:
        # stateless task + per-worker state cache; MUST go through the
        # module-level accessor (see _WORKER_STATE pickling note)
        return _worker_state(state_key, cfg, dict_source)(batch)

    partials = normalized.map_batches(
        partials_fn,
        batch_format="pyarrow",
        batch_size=batch_size or cfg.batch_size,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized merge of per-(conv, batch) partials (associative +
        commutative + idempotent → sorted_grouped_agg contract): reduceat
        signature min, ordered head concat, count sums, anchor-dict merge +
        top-M / K-rarest selection per conv."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype="str"),
                    "sig": pd.Series(dtype="object"),
                    "text_head": pd.Series(dtype="str"),
                    "n_turns": pd.Series(dtype="int64"),
                    "n_chars": pd.Series(dtype="int64"),
                    "min_turn": pd.Series(dtype="int64"),
                    "anchors": pd.Series(dtype="object"),
                }
            )
        df = df.sort_values(["conv_id", "min_turn"], kind="stable")
        conv = df["conv_id"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], conv[1:] != conv[:-1])))
        mat = np.frombuffer(b"".join(df["sig"].to_numpy()), dtype=np.uint64).reshape(
            len(df), num_hashes
        )
        sig_min = np.minimum.reduceat(mat, starts, axis=0)
        g = df.groupby("conv_id", sort=False)
        heads = g["text_head"].agg(" ".join).str.slice(0, cap)
        n_turns = g["n_turns"].sum()
        n_chars = g["n_chars"].sum()
        min_turn = g["min_turn"].min()
        # anchor merge: single-partial fast path, dict-merge otherwise
        anchors_col = df["anchors"].to_numpy()
        bounds = np.append(starts, len(df))
        merged_anchors = []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo == 1:
                merged_anchors.append(anchors_col[lo])
                continue
            acc: dict[str, list] = {}
            for row in anchors_col[lo:hi]:
                for a in row:
                    lab = a["label"]
                    if lab in acc:
                        acc[lab][1] += a["cnt"]
                    else:
                        acc[lab] = [lab, a["cnt"], a["lp"], a["ld"]]
            merged_anchors.append(
                [
                    {"label": v[0], "cnt": v[1], "lp": v[2], "ld": v[3]}
                    for v in acc.values()
                ]
            )
        keys = conv[starts]
        return pd.DataFrame(
            {
                "conv_id": keys,
                "sig": [sig_min[i].tobytes() for i in range(len(starts))],
                "text_head": heads.loc[keys].to_numpy(),
                "n_turns": n_turns.loc[keys].to_numpy(),
                "n_chars": n_chars.loc[keys].to_numpy(),
                "min_turn": min_turn.loc[keys].to_numpy(),
                "anchors": merged_anchors,
            }
        )

    # NOT count-gated: the driver-combine fast path was measured SLOWER
    # here (25.4 s vs 17.6 s at the 50k tier) — converting the anchors
    # list<struct> column to driver-side Python objects costs more than
    # the distributed conv-keyed sort it would save
    agg = sorted_grouped_agg(partials, "conv_id", combine, pre_combine=False)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        """Anchor summary per conv: top-M by weight (cnt·lp), K-rarest (by
        global link_doc) → blocking keys."""
        out_labels, out_weights, out_keys = [], [], []
        for row in df["anchors"].to_numpy() if len(df) else []:
            row = list(row) if row is not None else []
            if not row:
                out_labels.append([])
                out_weights.append([])
                out_keys.append([])
                continue
            weighted = sorted(
                ((a["cnt"] * a["lp"], a["label"]) for a in row),
                key=lambda t: (-t[0], t[1]),
            )[:TOP_M_ANCHORS]
            rare = sorted(((a["ld"], a["label"]) for a in row))[:k_keys]
            out_labels.append([lab for _w, lab in weighted])
            out_weights.append([float(w) for w, _lab in weighted])
            out_keys.append(sorted({f"A:{normalize_text(l, ncfg)}" for _ld, l in rare}))
        base = {
            "conv_id": df["conv_id"] if len(df) else pd.Series(dtype="str"),
            "sig": df["sig"] if len(df) else pd.Series(dtype="object"),
            "text_head": df["text_head"] if len(df) else pd.Series(dtype="str"),
            "n_turns": df["n_turns"] if len(df) else pd.Series(dtype="int64"),
            "n_chars": df["n_chars"] if len(df) else pd.Series(dtype="int64"),
        }
        out = pd.DataFrame(base)
        out["anchor_labels"] = pd.Series(out_labels, index=out.index, dtype="object")
        out["anchor_weights"] = pd.Series(out_weights, index=out.index, dtype="object")
        out["block_keys"] = pd.Series(out_keys, index=out.index, dtype="object")
        return out

    return agg.map_batches(finalize, batch_format="pandas")
