"""Stage T8: score candidate pairs → match edges.

Feature set (north_rule stage 2; reference analogs in SURVEY.md F1–F3/F5):

- ``jaccard_est``    MinHash signature agreement (full-text near-dup signal)
- ``jaro_winkler``   on profile text heads (prefix-weighted edit similarity)
- ``lev_ratio``      banded Levenshtein ratio on text heads
- ``anchor_overlap`` commonness-weighted overlap of the two conversations'
                     top anchors (the reference's anchor/concept features
                     recast as a pair feature): Σ_shared w / Σ_union w
- ``ctx_relatedness`` F3 context feature (SURVEY.md F3; the reference's
                     ContextFeaturesProcessor per OAIR'13): anchor-weighted
                     mean Milne–Witten relatedness between the two
                     conversations' top anchor SENSES over the offline
                     co-occurrence artifact (``state/relatedness.py``).
                     Same-label/same-sense pairs count 1.0, so with no
                     artifact the feature degrades to a weighted overlap
- ``len_ratio``      min/max of total char counts

``score = Σ w_f · f + bias``; ``is_match = score ≥ threshold`` — the linear
scorer with explicit weights replaces the reference's pickled sklearn model
(``processors/learning.py``; SURVEY.md F5/St2). Weights live in config /
a JSON sidecar and can be refit offline (``fit_weights``).

Shape: deduplicated pairs carry only ids through the quadratic stage; the
per-conv side rides as a BROADCAST of all-numpy arrays (``ray.put`` once,
zero-copy per worker — ``build_side_state``) and scoring is one fused
stateless ``map_batches`` (``score_pairs_fused``). At 10^12-turn scale the
side table itself shards: ``score_pairs_scatter`` packs it into hash
buckets of bounded size (built off-driver, refs only) and the pair stream
takes ONE skinny sorted exchange on (bucket_a, bucket_b), each group
reading just its two bucket states — a fragment-replicate join
(deliberately NOT ``Dataset.join``, which in ray 2.49 mishandles empty
partitions inside composed plans).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig, ScoringConfig
from ..functions.minhash import estimate_jaccard
from ..functions.strings import (
    batch_jaro_winkler,
    batch_levenshtein_ratio,
    jaro_winkler,
    levenshtein_ratio,
)

EDGE_SCHEMA = pa.schema(
    [
        ("conv_a", pa.string()),
        ("conv_b", pa.string()),
        ("block_id", pa.string()),
        ("jaccard_est", pa.float64()),
        ("jaro_winkler", pa.float64()),
        ("lev_ratio", pa.float64()),
        ("anchor_overlap", pa.float64()),
        ("ctx_relatedness", pa.float64()),
        ("len_ratio", pa.float64()),
        ("score", pa.float64()),
        ("is_match", pa.bool_()),
    ]
)

FEATURE_NAMES = [
    "jaccard_est",
    "jaro_winkler",
    "lev_ratio",
    "anchor_overlap",
    "ctx_relatedness",
    "len_ratio",
]

# Per-worker-process caches. Pickling contract (same as signatures.py's
# _WORKER_STATE note): task closures are pickled BY VALUE with synthetic
# globals, so these dicts MUST be reached through the module-level accessor
# functions below (pickled by reference → resolve to the worker's real
# module), never referenced directly inside a closure.
_SIDE_CACHE: dict = {}
# per-worker-process cache for the (small) relatedness pack
_REL_CACHE: dict = {}


def _get_side_state(ref):
    """Worker-side fetch-and-cache of the broadcast side state."""
    import ray

    key = ("side_state", ref.hex())
    st = _SIDE_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _SIDE_CACHE.clear()
        _SIDE_CACHE[key] = st
    return st, key


def _get_rel_pack(rel_ref):
    """Worker-side fetch-and-cache of the packed RelatednessState."""
    if rel_ref is None:
        return None
    import ray

    key = ("rel", rel_ref.hex())
    pack = _REL_CACHE.get(key)
    if pack is None:
        pack = ray.get(rel_ref)
        _REL_CACHE.clear()
        _REL_CACHE[key] = pack
    return pack

# Edit-metric caps: both metrics are O(cap²) per pair (the batch kernels
# amortize numpy overhead but not the DP work itself), and ~97% of LSH
# candidate pairs fall in the cascade band at bench scale — the caps ARE
# the scoring cost. 256 is deliberate: a 128-char window drops e2e
# pairwise F1 from 1.00 to 0.84 on the planted-truth fixture (dup pairs
# that diverge late in the head), so the 4× cheaper DP is not worth it.
LEV_CAP = 256
JW_CAP = 64


SIDE_COLS = ["sig", "text_head", "n_chars", "anchor_labels", "anchor_weights"]


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


# score cascade band: pairs whose signature Jaccard estimate falls OUTSIDE
# (CASCADE_LO, CASCADE_HI) skip the O(n²) edit metrics and use the Jaccard
# estimate as the jw/lev value — part of the DEFINED scoring semantics
# (pipeline and every oracle share it via compute_pair_features). Decisions
# are unaffected at the default weights:
# Low side is conservative (0.08): proxying jw=lev=jac there caps the score
# at ~0.23 < the 0.55 threshold AND real edit similarity for such disjoint
# shingle sets cannot plausibly rescue a pair; high side 0.90 floors the
# score at ~0.72 > threshold (match either way).
CASCADE_LO = 0.08
CASCADE_HI = 0.90


def _ctx_relatedness_scalar(la, wa, lb, wb, relatedness) -> float:
    """Scalar twin of the vectorized ctx kernel in ``_feature_arrays``:
    anchor-weighted mean relatedness over the cross product of the two
    top-anchor lists. Equal labels count 1.0; otherwise the Milne–Witten
    relatedness of the labels' majority senses (0.0 with no artifact)."""
    if la is None or lb is None or len(la) == 0 or len(lb) == 0:
        return 0.0
    sa = sb = None
    if relatedness is not None:
        sa = [relatedness.sense_of_hash(_label_hash64(x)) for x in la]
        sb = [relatedness.sense_of_hash(_label_hash64(y)) for y in lb]
    num = 0.0
    den = 0.0
    for i, (x, wx) in enumerate(zip(la, wa)):
        for j, (y, wy) in enumerate(zip(lb, wb)):
            w = wx * wy
            if w <= 0:
                continue
            den += w
            if x == y:
                num += w
            elif relatedness is not None:
                num += w * relatedness.rel_of(sa[i], sb[j])
    return num / den if den > 0 else 0.0


def compute_pair_features(
    sig_a: bytes,
    sig_b: bytes,
    head_a: str,
    head_b: str,
    n_chars_a: float,
    n_chars_b: float,
    anchor_labels_a,
    anchor_weights_a,
    anchor_labels_b,
    anchor_weights_b,
    relatedness=None,
) -> dict[str, float]:
    """Per-pair feature vector — the single definition shared by the
    pipeline (vectorized over batches) and the driver-side test oracles.
    ``relatedness``: optional ``RelatednessState`` for the F3 context
    feature (None → same-label overlap only)."""
    jac = estimate_jaccard(
        np.frombuffer(sig_a, dtype=np.uint64), np.frombuffer(sig_b, dtype=np.uint64)
    )
    if CASCADE_LO < jac < CASCADE_HI:
        jw = jaro_winkler(head_a or "", head_b or "", cap=JW_CAP)
        lv = levenshtein_ratio(head_a or "", head_b or "", cap=LEV_CAP)
    else:
        jw = lv = jac
    hi = max(n_chars_a, n_chars_b, 1.0)
    return {
        "jaccard_est": jac,
        "jaro_winkler": jw,
        "lev_ratio": lv,
        "anchor_overlap": _anchor_overlap(
            anchor_labels_a, anchor_weights_a, anchor_labels_b, anchor_weights_b
        ),
        "ctx_relatedness": _ctx_relatedness_scalar(
            anchor_labels_a,
            anchor_weights_a,
            anchor_labels_b,
            anchor_weights_b,
            relatedness,
        ),
        "len_ratio": min(n_chars_a, n_chars_b) / hi,
    }


MAX_SIDE_ANCHORS = 16


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def _label_hash64(s: str) -> int:
    # anchor labels repeat heavily across conversations (a vocabulary, not
    # free text) — memoizing saves ~1 md5 per label occurrence
    import hashlib as _hl

    return int.from_bytes(_hl.md5(s.encode()).digest()[:8], "little", signed=True) or 1


def _anchor_matrices(labels: list, weights: list) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-width label-hash/weight matrices (n, MAX_SIDE_ANCHORS); 0 pads.

    The single construction shared by the broadcast side state and the
    scatter-path side rows — anchor overlap must be computed on identical
    matrices for the two paths to produce byte-identical edges."""
    n = len(labels)
    a_hash = np.zeros((n, MAX_SIDE_ANCHORS), dtype=np.int64)
    a_w = np.zeros((n, MAX_SIDE_ANCHORS), dtype=np.float64)
    for row in range(n):
        ls = labels[row] or []
        ws = weights[row] or []
        for k, (lab, w) in enumerate(zip(ls, ws)):
            if k >= MAX_SIDE_ANCHORS:
                break
            a_hash[row, k] = _label_hash64(lab)
            a_w[row, k] = w
    return a_hash, a_w


def _sense_indices(ah: np.ndarray, rel_pack) -> np.ndarray:
    """Label-hash matrix → sense indices (-1 = unknown). Pure function of
    the rows, so callers hoist it to once PER CONVERSATION (worker-cached on
    the side state) instead of once per pair side — the per-pair batch
    version paid two (n, M) double-searchsorted passes per 4096 pairs."""
    label_hash, label_sense, senses, _pair_keys, _pair_rel = rel_pack
    pos = np.searchsorted(label_hash, ah)
    pos = np.minimum(pos, len(label_hash) - 1)
    known = (label_hash[pos] == ah) & (ah != 0)
    sidx = np.searchsorted(senses, label_sense[pos])
    return np.where(known, sidx, -1)


def _ctx_relatedness_batch(
    ah_a: np.ndarray,
    aw_a: np.ndarray,
    ah_b: np.ndarray,
    aw_b: np.ndarray,
    rel_pack,
    heq: np.ndarray | None = None,
    sa: np.ndarray | None = None,
    sb: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized F3 kernel over the fixed-width anchor matrices. Twin of
    ``_ctx_relatedness_scalar`` — identical float ops, parity-tested.
    ``heq``/``sa``/``sb``: optional precomputed label-equality cube and
    per-row sense indices (the hot path shares heq with the anchor-overlap
    kernel and hoists sense lookup per conversation)."""
    n = len(ah_a)
    # rel matrix per pair: 1.0 on equal label hashes (padding 0 never equal)
    if heq is None:
        heq = (ah_a[:, :, None] == ah_b[:, None, :]) & (ah_a[:, :, None] != 0)
    rel_mat = heq.astype(np.float64)
    if rel_pack is not None and len(rel_pack[0]):
        _label_hash, _label_sense, senses, pair_keys, pair_rel = rel_pack
        v = len(senses)
        if sa is None:
            sa = _sense_indices(ah_a, rel_pack)  # (n, M)
        if sb is None:
            sb = _sense_indices(ah_b, rel_pack)
        lo = np.minimum(sa[:, :, None], sb[:, None, :]).astype(np.int64)
        hi = np.maximum(sa[:, :, None], sb[:, None, :]).astype(np.int64)
        valid = lo >= 0
        same = (sa[:, :, None] == sb[:, None, :]) & valid
        key = np.where(valid, lo * v + hi, 0)
        if len(pair_keys):
            ppos = np.minimum(np.searchsorted(pair_keys, key), len(pair_keys) - 1)
            found = valid & (pair_keys[ppos] == key)
            looked = np.where(found, pair_rel[ppos], 0.0)
        else:
            looked = np.zeros_like(rel_mat)
        rel_mat = np.maximum(rel_mat, np.where(same, 1.0, looked))
    num = (aw_a[:, :, None] * aw_b[:, None, :] * rel_mat).sum(axis=(1, 2))
    den = aw_a.sum(axis=1) * aw_b.sum(axis=1)
    return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)


def _feature_arrays(
    sig_a: np.ndarray,
    sig_b: np.ndarray,
    heads_a: np.ndarray,
    heads_b: np.ndarray,
    chars_a: np.ndarray,
    chars_b: np.ndarray,
    ah_a: np.ndarray,
    aw_a: np.ndarray,
    ah_b: np.ndarray,
    aw_b: np.ndarray,
    rel_pack=None,
    sidx_a: np.ndarray | None = None,
    sidx_b: np.ndarray | None = None,
) -> tuple[np.ndarray, ...]:
    """Vectorized per-pair features over aligned row arrays — the ONE
    scoring kernel shared by the broadcast (``score_pairs_fused``) and
    scatter/gather (``score_pairs_scatter``) paths: identical float ops →
    byte-identical edges (asserted by the parity test).
    ``sidx_a``/``sidx_b``: optional pre-gathered sense indices for the F3
    kernel (hoisted per conversation by the hot paths)."""
    n = len(chars_a)
    if n == 0:
        e = np.empty(0)
        return e, e, e, e, e, e
    jac = (sig_a == sig_b).mean(axis=1)
    # anchor overlap on fixed-width hash matrices: match[i,j,k] ⇔
    # hash j of a == hash k of b (0 = padding, never matches)
    match = (ah_a[:, :, None] == ah_b[:, None, :]) & (ah_a[:, :, None] != 0)
    shared = (aw_a[:, :, None] * match).sum(axis=(1, 2)) + (
        aw_b[:, None, :] * match
    ).sum(axis=(1, 2))
    union = aw_a.sum(axis=1) + aw_b.sum(axis=1)
    ao = np.where(union > 0, shared / np.where(union > 0, union, 1.0), 0.0)
    ctx = _ctx_relatedness_batch(
        ah_a, aw_a, ah_b, aw_b, rel_pack, heq=match, sa=sidx_a, sb=sidx_b
    )
    hi = np.maximum(np.maximum(chars_a, chars_b), 1.0)
    lr = np.minimum(chars_a, chars_b) / hi
    jw = jac.copy()
    lv = jac.copy()
    band = np.flatnonzero((jac > CASCADE_LO) & (jac < CASCADE_HI))
    if len(band):
        # heads stay fixed-width U arrays end-to-end: the batch kernels
        # view the UCS4 buffer directly (an object-array round-trip here
        # measured ~30 ms/batch of pure string materialization)
        ha = heads_a[band]
        hb = heads_b[band]
        jw[band] = batch_jaro_winkler(ha, hb, cap=JW_CAP)
        lv[band] = batch_levenshtein_ratio(ha, hb, cap=LEV_CAP)
    return jac, jw, lv, ao, ctx, lr


def _edges_table(
    conv_a, conv_b, block_id, feats: tuple[np.ndarray, ...], scfg: ScoringConfig
) -> pa.Table:
    jac, jw, lv, ao, ctx, lr = feats
    wsum = sum(scfg.weights.values()) or 1.0
    score_v = np.full(len(jac), scfg.bias, dtype=np.float64)
    for name, arr in (
        ("jaccard_est", jac),
        ("jaro_winkler", jw),
        ("lev_ratio", lv),
        ("anchor_overlap", ao),
        ("ctx_relatedness", ctx),
        ("len_ratio", lr),
    ):
        score_v += (scfg.weights[name] / wsum) * arr
    return pa.table(
        {
            "conv_a": conv_a,
            "conv_b": conv_b,
            "block_id": block_id,
            "jaccard_est": pa.array(jac),
            "jaro_winkler": pa.array(jw),
            "lev_ratio": pa.array(lv),
            "anchor_overlap": pa.array(ao),
            "ctx_relatedness": pa.array(ctx),
            "len_ratio": pa.array(lr),
            "score": pa.array(score_v),
            "is_match": pa.array(score_v >= scfg.threshold),
        }
    )


def build_side_state(profiles: rd.Dataset):
    """Broadcast state for the fused scorer — ALL numpy so every worker
    reads it ZERO-COPY from the object store (lists/dicts would be
    re-pickled per worker, which dominated the old attach stage):

    (conv_ids sorted S-array, sig_mat uint64[n,H], heads U-array,
     chars f8[n], anchor_hash int64[n,M], anchor_w f8[n,M])

    Row lookup is a vectorized ``np.searchsorted``; anchor overlap works on
    fixed-width label-hash matrices. Both the per-row packing AND the final
    concat+sort pack run OFF-driver (the single-bucket case of the scatter
    path's ``build_bucket_states`` — the identical ``_pack_side_table``
    code, so the two scoring paths stay byte-identical). The driver-side
    pack this replaces measured 9 s of serial time at the 100k-conv tier —
    pure non-scaling floor."""
    return build_bucket_states(profiles, 1)[0]


def score_pairs_fused(
    pairs: rd.Dataset, side_state, cfg: EngineConfig, rel_ref=None
) -> rd.Dataset:
    """Deduplicated pairs + broadcast side state → scored edges, one fused
    stateless stage. Vectorized throughout: Jaccard = row equality over the
    signature matrix, anchor overlap = broadcast hash-matrix intersection,
    cascade gates the O(n²) edit metrics to contested pairs only.
    ``rel_ref``: optional ObjectRef of a packed ``RelatednessState`` (F3)."""
    import ray

    scfg = cfg.scoring
    sidx_ref = None
    if rel_ref is not None:
        sidx_ref = (
            ray.remote(num_cpus=1)(_compute_sidx_task)
            .options(name="compute_sidx")
            .remote(side_state, rel_ref)
        )

    def score(batch: pa.Table) -> pa.Table:
        import os as _os
        import time as _time

        dbg = _os.environ.get("GRAFT_DEBUG_COLD") == "1"
        t0 = _time.perf_counter()
        st, key = _get_side_state(side_state)
        t1 = _time.perf_counter()
        rel_pack = _get_rel_pack(rel_ref)
        sidx = _sidx_from_ref(sidx_ref)
        # same kernel as the bucketed scatter path (one state for both
        # sides) — incl. the id-width guard before the fixed-width cast and
        # the membership check (ADVICE r2)
        t2 = _time.perf_counter()
        out = _gather_and_score(
            st, st, batch["conv_a"], batch["conv_b"], batch["block_id"],
            rel_pack, scfg, sidx_full_a=sidx, sidx_full_b=sidx,
        )
        if dbg:
            t3 = _time.perf_counter()
            print(
                f"[score-dbg] pid={_os.getpid()} n={batch.num_rows} "
                f"state={t1-t0:.3f}s prep={t2-t1:.3f}s kernel={t3-t2:.3f}s"
            )
        return out

    # 4096-row batches: kernels amortize fully by ~2k rows, and ~2× more
    # tasks keeps all cores busy through the final wave (8192 left a third
    # of a 32-core node idle during the last task wave at bench scale)
    return pairs.map_batches(score, batch_format="pyarrow", batch_size=4096)


# fixed-width side-payload layout: id bytes and UCS4 head chars per row.
# The width caps exist so every encode/pack step is a numpy buffer op —
# the old string-column pack (np.asarray(100k python strings, "U"/"S"))
# measured ~9 s of single-thread time at the 100k-conv tier, a pure
# non-scaling floor. Ids wider than MAX_ID_BYTES raise (same contract as
# the scorer's id-width guard).
MAX_ID_BYTES = 64
HEAD_CHARS = max(LEV_CAP, JW_CAP)


def _ascii_ids(ids: list, what: str) -> np.ndarray:
    """Encode ids to a fixed-width S-array, naming the offender on failure.

    The fixed-width side-state layout requires ASCII conv ids (they become
    numpy 'S' buffers); a non-ASCII id would otherwise surface as a raw
    UnicodeEncodeError deep in a Ray worker with no column context."""
    try:
        return np.asarray(ids, dtype="S")
    except UnicodeEncodeError:
        bad = next((i for i in ids if isinstance(i, str) and not i.isascii()), None)
        raise ValueError(
            f"{what} must be ASCII for the fixed-width scoring state "
            f"(offending id: {bad!r}). Re-key the input or hex-encode ids "
            "upstream."
        ) from None


def _fixed_binary(buf: bytes, n: int, width: int) -> pa.Array:
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), n, [None, pa.py_buffer(buf)]
    )


def _fixed_view(tbl: pa.Table, col: str, dtype, width_bytes: int) -> np.ndarray:
    """Zero-copy numpy view of a fixed_size_binary column (no nulls)."""
    c = tbl[col].combine_chunks()
    n = len(c)
    count = n * width_bytes // np.dtype(dtype).itemsize
    return np.frombuffer(
        c.buffers()[1], dtype=dtype, count=count, offset=c.offset * width_bytes
    )


def build_side_rows(profiles: rd.Dataset) -> rd.Dataset:
    """Per-conv compact payload rows (one short row per conversation; every
    payload column pre-encoded to fixed-width binary IN the workers): the
    distributed precursor of both the broadcast side state and the bucketed
    scatter states — one construction, so the two scoring paths stay
    byte-identical. ``ckey`` stays a plain string column for bucket
    hashing; ``ckeyw`` is its fixed-width encoding for the packed state."""
    import pyarrow.compute as pc

    def shrink(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["conv_id"].to_pylist()
        ids_s = _ascii_ids(ids, "conv_id")
        if n and ids_s.dtype.itemsize > MAX_ID_BYTES:
            raise ValueError(
                f"conv_id wider than {MAX_ID_BYTES} bytes "
                f"({ids_s.dtype.itemsize}) — raise MAX_ID_BYTES"
            )
        ids_w = ids_s.astype(f"S{MAX_ID_BYTES}")
        head = pc.utf8_slice_codeunits(batch["text_head"], 0, HEAD_CHARS)
        head_u = np.asarray(head.to_pylist(), dtype=f"U{HEAD_CHARS}")
        ah, aw = _anchor_matrices(
            batch["anchor_labels"].to_pylist(), batch["anchor_weights"].to_pylist()
        )
        sig = batch["sig"].combine_chunks()
        # n==0 never reaches this UDF (ray 2.49 skips zero-row blocks) and
        # zero-row parts are filtered before the pack concat, so the
        # placeholder width can't poison a schema merge
        sig_width = len(sig[0].as_py()) if n else 8
        return pa.table(
            {
                "ckey": batch["conv_id"],
                "ckeyw": _fixed_binary(ids_w.tobytes(), n, MAX_ID_BYTES),
                "sig": _fixed_binary(b"".join(sig.to_pylist()), n, sig_width),
                "head": _fixed_binary(head_u.tobytes(), n, HEAD_CHARS * 4),
                "n_chars": pc.cast(batch["n_chars"], pa.float64()),
                "ah": _fixed_binary(ah.tobytes(), n, 8 * MAX_SIDE_ANCHORS),
                "aw": _fixed_binary(aw.tobytes(), n, 8 * MAX_SIDE_ANCHORS),
            }
        )

    return profiles.select_columns(["conv_id"] + SIDE_COLS).map_batches(
        shrink, batch_format="pyarrow"
    )


def _pack_side_table(tbl: pa.Table):
    """Side-payload rows (``build_side_rows`` schema) → the all-numpy state
    tuple used by the scoring kernel: (conv_ids sorted S-array, sig_mat
    uint64[n,H], heads U-array, chars f8[n], anchor_hash int64[n,M],
    anchor_w f8[n,M]). Every column is a zero-copy buffer view + one
    argsort + one gather — no per-row python work (see the layout note
    above ``MAX_ID_BYTES``)."""
    n = tbl.num_rows
    if n == 0:
        return (
            np.empty(0, dtype="S1"),
            np.empty((0, 0), dtype=np.uint64),
            np.empty(0, dtype="U1"),
            np.empty(0),
            np.empty((0, MAX_SIDE_ANCHORS), dtype=np.int64),
            np.empty((0, MAX_SIDE_ANCHORS), dtype=np.float64),
        )
    convs = _fixed_view(tbl, "ckeyw", f"S{MAX_ID_BYTES}", MAX_ID_BYTES)
    order = np.argsort(convs)
    convs = convs[order]
    sig_width = tbl.schema.field("sig").type.byte_width
    sig_mat = _fixed_view(tbl, "sig", np.uint64, sig_width).reshape(n, -1)[order]
    heads = _fixed_view(tbl, "head", f"U{HEAD_CHARS}", HEAD_CHARS * 4)[order]
    chars = tbl["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
    a_hash = _fixed_view(tbl, "ah", np.int64, 8 * MAX_SIDE_ANCHORS).reshape(
        n, MAX_SIDE_ANCHORS
    )[order]
    a_w = _fixed_view(tbl, "aw", np.float64, 8 * MAX_SIDE_ANCHORS).reshape(
        n, MAX_SIDE_ANCHORS
    )[order]
    return convs, sig_mat, heads, chars, a_hash, a_w


def _sidx_for_state(state, state_key, rel_pack, rel_key) -> np.ndarray | None:
    """Per-conversation sense indices for a side state, computed once per
    worker per (state, relatedness) pair and cached — the F3 lookup is a
    pure function of the state's anchor-hash matrix, so recomputing it per
    pair batch (two double-searchsorted passes over (n, M)) was waste."""
    if rel_pack is None or not len(rel_pack[0]):
        return None
    key = ("sidx", state_key, rel_key)
    sidx = _SIDX_CACHE.get(key)
    if sidx is None:
        sidx = _sense_indices(state[4], rel_pack)
        if len(_SIDX_CACHE) >= _BUCKET_CACHE_MAX:
            _SIDX_CACHE.clear()
        _SIDX_CACHE[key] = sidx
    return sidx


def _sidx_from_ref(ref) -> np.ndarray | None:
    """Worker fetch-and-cache of a PRE-COMPUTED broadcast sense-index matrix
    (one remote task computes it; every worker reads zero-copy — computing
    it per worker measured ~20 core-s at the 100k tier / 32 CPUs)."""
    if ref is None:
        return None
    import ray

    key = ("sidx-ref", ref.hex())
    sidx = _SIDX_CACHE.get(key)
    if sidx is None:
        sidx = ray.get(ref)
        if len(_SIDX_CACHE) >= _BUCKET_CACHE_MAX:
            _SIDX_CACHE.clear()
        _SIDX_CACHE[key] = sidx
    return sidx


def _compute_sidx_task(state, rel_pack) -> np.ndarray | None:
    if rel_pack is None or not len(rel_pack[0]):
        return None
    return _sense_indices(state[4], rel_pack)


_SIDX_CACHE: dict = {}


def _gather_and_score(
    st_a, st_b, conv_a, conv_b, block_id, rel_pack, scfg: ScoringConfig,
    sidx_full_a: np.ndarray | None = None,
    sidx_full_b: np.ndarray | None = None,
) -> pa.Table:
    """Look pair endpoints up in their (possibly distinct) side states and
    run the ONE vectorized feature kernel — shared by the broadcast and
    bucketed-scatter paths, so both produce byte-identical edges.
    ``sidx_full_*``: optional per-conv sense-index matrices aligned with the
    states' rows (``_sidx_for_state``); gathered here alongside the payload.

    ``conv_a``/``conv_b``/``block_id``: aligned Arrow arrays. A pair id
    wider than a state's fixed-width id dtype raises BEFORE the cast (a
    truncation that prefix-collides with a real id would silently score the
    wrong profile); an id absent from its state raises (pairs derive from
    profiles — a miss is a pipeline bug)."""
    n = len(conv_a)

    def lookup(state, col, side: str) -> np.ndarray:
        convs = state[0]
        nat = _ascii_ids(col.to_pylist(), f"conv_{side}")
        if n and len(convs):
            width = convs.dtype.itemsize
            if nat.dtype.itemsize > width:
                raise ValueError(
                    f"score_pairs: pair conv_{side} wider than the profile "
                    f"side table's id width ({nat.dtype.itemsize} > {width} "
                    "bytes) — id set mismatch between pairs and profiles"
                )
        arr = nat.astype(convs.dtype) if len(convs) else nat
        idx = np.searchsorted(convs, arr)
        idx = np.minimum(idx, max(len(convs) - 1, 0))
        if len(convs) == 0 or not np.array_equal(convs[idx], arr):
            n_miss = n if len(convs) == 0 else int((convs[idx] != arr).sum())
            raise ValueError(
                f"score_pairs: {n_miss} conv_{side} ids have no profile row "
                "in the side table"
            )
        return idx

    if n:
        ia = lookup(st_a, conv_a, "a")
        ib = lookup(st_b, conv_b, "b")
        _, sa_sig, sa_heads, sa_chars, sa_ah, sa_aw = st_a
        _, sb_sig, sb_heads, sb_chars, sb_ah, sb_aw = st_b
        feats = _feature_arrays(
            sa_sig[ia], sb_sig[ib], sa_heads[ia], sb_heads[ib],
            sa_chars[ia], sb_chars[ib],
            sa_ah[ia], sa_aw[ia], sb_ah[ib], sb_aw[ib],
            rel_pack=rel_pack,
            sidx_a=None if sidx_full_a is None else sidx_full_a[ia],
            sidx_b=None if sidx_full_b is None else sidx_full_b[ib],
        )
    else:
        e = np.empty(0)
        feats = (e, e, e, e, e, e)
    return _edges_table(conv_a, conv_b, block_id, feats, scfg)


# per-worker cache of fetched bucket states (plasma reads are zero-copy on
# the owning node; the cache just skips repeated deserialization bookkeeping)
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 16


def _get_bucket_state(ref):
    import ray

    key = ref.hex()
    st = _BUCKET_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        if len(_BUCKET_CACHE) >= _BUCKET_CACHE_MAX:
            _BUCKET_CACHE.clear()
        _BUCKET_CACHE[key] = st
    return st


def _bucket_of_ids(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic (process-stable) hash bucket per conv id — must be the
    same function on the side-split and pair-tag sides, so it delegates to
    the ONE routing hash (``pairs.bucket_of_block_keys``)."""
    from .pairs import bucket_of_block_keys

    return bucket_of_block_keys(ids, num_buckets).astype(np.int64)


def _default_num_buckets(n_profiles: int) -> int:
    """Scatter-path bucket count: ~4096 profiles per packed state, capped
    so bucket-pair fan-out stays bounded. ONE definition — the side-split
    and every caller must agree."""
    return int(min(64, max(4, n_profiles // 4096 + 1)))


def build_bucket_states(profiles: rd.Dataset, num_buckets: int) -> list:
    """Shard the compact per-conv side payload into ``num_buckets`` packed
    numpy states, built entirely OFF-driver: the side-row blocks stream as
    Arrow refs into split tasks (one per block, ``num_buckets`` outputs
    each), and one pack task per bucket concatenates its slices and
    ``ray.put``s the packed state from the worker. The driver only ever
    holds object refs. This is the sanctioned raw-Ray escape hatch (a
    shared partitioned broadcast index — Dataset can't express "random
    access by shard" downstream).

    Returns a list of ``num_buckets`` ObjectRefs of state tuples."""
    import ray

    block_refs = build_side_rows(profiles).to_arrow_refs()

    @ray.remote
    def split(tbl) -> list:
        # ray 2.49 skips zero-row blocks past the shrink UDF, so an EMPTY
        # upstream pandas block (sorted_grouped_agg's interior pass emits
        # one whenever a sorted block holds only edge keys) reaches here
        # unconverted and with the UN-shrunk schema. Zero rows contribute
        # nothing to any bucket — send a None sentinel; pack filters.
        n = tbl.num_rows if isinstance(tbl, pa.Table) else len(tbl)
        if n == 0:
            return [None] * num_buckets if num_buckets > 1 else None
        if not isinstance(tbl, pa.Table):  # non-empty leaks must be loud
            raise TypeError(
                f"side-row block is {type(tbl).__name__}, not pyarrow.Table"
            )
        b = _bucket_of_ids(np.asarray(tbl["ckey"].to_pylist(), dtype=object), num_buckets)
        out = []
        for i in range(num_buckets):
            out.append(tbl.filter(pa.array(b == i)))
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def pack(*parts):
        live = [p for p in parts if p is not None and p.num_rows]
        if not live:  # _pack_side_table's n==0 path needs no schema
            return _pack_side_table(pa.table({}))
        return _pack_side_table(pa.concat_tables(live, promote_options="default"))

    split_refs = [
        split.options(num_returns=num_buckets).remote(r) for r in block_refs
    ]
    if num_buckets == 1:
        split_refs = [[r] for r in split_refs]
    return [
        pack.remote(*[sr[i] for sr in split_refs]) for i in range(num_buckets)
    ]


def score_pairs_scatter(
    pairs: rd.Dataset,
    profiles: rd.Dataset,
    cfg: EngineConfig,
    rel_ref=None,
    num_buckets: int | None = None,
    states: list | None = None,
) -> rd.Dataset:
    """Scored edges WITHOUT any whole-dataset broadcast — the 10^12-turn
    plan, shaped as a fragment-replicate join:

    1. the compact per-conv payload shards into ``num_buckets`` packed
       states (``build_bucket_states`` — built off-driver, refs only);
    2. pair rows tag themselves with (bucket_a, bucket_b) = hash of each
       endpoint and take ONE skinny sorted exchange on that composite key
       (ids + block_id only — ~60 bytes/pair; the old design shipped the
       full A-payload through a second exchange, ~1.7 KB/pair);
    3. each complete (bucket_a, bucket_b) group fetches its TWO bucket
       states (zero-copy plasma reads, worker-cached) and runs the same
       vectorized kernel as the broadcast path (``_gather_and_score``).

    Partitioning assumptions, documented: each scoring task holds exactly
    two bucket states in memory — size a bucket to fit (num_buckets ≈
    n_convs/4096 by default, so ~7 MB/bucket at the defaults); a bucket
    state is read by up to 2·num_buckets−1 tasks, so cross-node traffic is
    O(num_buckets · total_payload) — the classic fragment-replicate trade
    of replicated small reads for not shuffling the quadratic side.

    Byte-identical to ``score_pairs_fused`` (same packed rows, same kernel
    — asserted by the parity test). Requires deduplicated pairs."""
    from ..functions.groupagg import sorted_apply_exact

    scfg = cfg.scoring
    if states is not None:
        num_buckets = len(states)
    else:
        if num_buckets is None:
            num_buckets = _default_num_buckets(profiles.count())
        states = build_bucket_states(profiles, num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        ba = _bucket_of_ids(np.asarray(batch["conv_a"].to_pylist(), dtype=object), num_buckets)
        bb = _bucket_of_ids(np.asarray(batch["conv_b"].to_pylist(), dtype=object), num_buckets)
        return pa.table(
            {
                "bucket_a": pa.array(ba, pa.int64()),
                "bucket_b": pa.array(bb, pa.int64()),
                "conv_a": batch["conv_a"],
                "conv_b": batch["conv_b"],
                "block_id": batch["block_id"],
            }
        )

    def score_groups(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return EDGE_SCHEMA.empty_table()
        rel_pack = _get_rel_pack(rel_ref)
        rel_key = None if rel_ref is None else rel_ref.hex()
        out: list[pa.Table] = []
        for (ba, bb), g in df.groupby(["bucket_a", "bucket_b"], sort=True):
            st_a = _get_bucket_state(states[int(ba)])
            st_b = st_a if bb == ba else _get_bucket_state(states[int(bb)])
            sidx_a = _sidx_for_state(st_a, states[int(ba)].hex(), rel_pack, rel_key)
            sidx_b = (
                sidx_a
                if bb == ba
                else _sidx_for_state(st_b, states[int(bb)].hex(), rel_pack, rel_key)
            )
            out.append(
                _gather_and_score(
                    st_a, st_b,
                    pa.array(g["conv_a"].to_numpy(), pa.string()),
                    pa.array(g["conv_b"].to_numpy(), pa.string()),
                    pa.array(g["block_id"].to_numpy(), pa.string()),
                    rel_pack, scfg,
                    sidx_full_a=sidx_a, sidx_full_b=sidx_b,
                )
            )
        return pa.concat_tables(out)

    tagged = pairs.map_batches(tag, batch_format="pyarrow")
    return sorted_apply_exact(tagged, ["bucket_a", "bucket_b"], score_groups)


def prepare_side_state(profiles: rd.Dataset, cfg: EngineConfig):
    """Kick off the (gated) side-state build EARLY so the pack tasks overlap
    the pair stage's sorted exchanges — the build depends only on profiles,
    which are materialized before pair generation starts, and its final
    concat+sort pack is one task (~2-5 s at the 100k tier) that otherwise
    sits on the critical path. Returns an opaque handle for
    ``score_pairs(..., prepared=...)``."""
    n = profiles.count()
    if n <= cfg.scoring.side_broadcast_gate:
        return ("broadcast", build_side_state(profiles))
    num_buckets = _default_num_buckets(n)
    return ("scatter", build_bucket_states(profiles, num_buckets), num_buckets)


def score_pairs(
    pairs: rd.Dataset,
    profiles: rd.Dataset,
    cfg: EngineConfig,
    relatedness=None,
    prepared=None,
) -> rd.Dataset:
    """Gated scorer: at or below ``scoring.side_broadcast_gate`` profile rows
    the whole side table broadcasts (one ``ray.put``, zero-copy numpy reads —
    fastest at small/medium scale); above it the bucketed fragment-replicate
    scatter runs so no driver materialization or whole-dataset broadcast ever
    happens (the 10^12-turn path). Both produce byte-identical edges.

    ``relatedness``: optional ``RelatednessState`` (or pre-put ObjectRef of
    its pack) for the F3 context feature. Unlike the per-record side table,
    this is vocabulary-sized statistical metadata — broadcast on BOTH paths
    (one ``ray.put``), like the anchor dictionary itself."""
    import os
    import time

    import ray

    t0 = time.perf_counter()
    rel_ref = None
    if relatedness is not None:
        if isinstance(relatedness, ray.ObjectRef):
            rel_ref = relatedness
        else:
            rel_ref = ray.put(relatedness.pack())
    # even row-count blocks for the scoring map: the dedup sort's range
    # partitions skew up to ~770× in rows (measured 66..50,933 per block at
    # the 100k tier), and map task count == block count, so one fat block
    # was the whole stage's critical path. Row-targeted repartition is
    # scale-safe (pure streaming split/merge, no count, no shuffle).
    pairs = pairs.repartition(target_num_rows_per_block=8192)
    if prepared is None:
        prepared = prepare_side_state(profiles, cfg)
    if prepared[0] == "broadcast":
        state = prepared[1]
        if os.environ.get("GRAFT_TIMING") == "1":
            ray.wait([state], fetch_local=False)
            print(f"[scoring-timing] side_state build: {time.perf_counter() - t0:.2f}s")
        return score_pairs_fused(pairs, state, cfg, rel_ref)
    return score_pairs_scatter(
        pairs, profiles, cfg, rel_ref, states=prepared[1]
    )


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
