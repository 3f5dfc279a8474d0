"""Stage T5: per-conversation profiles — MinHash signature + scoring snippet.

The logical entity-resolution record is one CONVERSATION; the physical input
is one row per TURN. This stage folds turns into conversation profiles with
a mergeable aggregation so the conv-keyed shuffle moves kilobytes per
conversation, never raw full texts:

1. stateless ``map_batches``: per turn, char-k-shingle hashes of
   ``norm_text``; combined WITHIN the batch per conv (input is written
   sorted by (conv_id, turn_idx), so most conversations collapse to a
   single partial row before the shuffle);
2. ``groupby(conv_id).map_groups``: elementwise-min of partial signatures
   (MinHash mergeability), ordered concat of truncated text heads, count
   sums.

Determinism: the conversation shingle set is defined as the UNION of
per-turn shingle sets (never shingles across turn boundaries), so the
result is invariant to batch boundaries and block order.

Profile schema:
    conv_id:string, sig:binary (num_hashes × uint64), text_head:string,
    n_turns:int64, n_chars:int64
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import sorted_grouped_agg
from ..functions.minhash import hash_params, shingle_hashes

PROFILE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("sig", pa.binary()),
        ("text_head", pa.string()),
        ("n_turns", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)


class _TurnPartials:
    """Stateless-per-batch but holds the seeded hash family (compiled once
    per actor — SURVEY.md St-pattern)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.a, self.b = hash_params(cfg.blocking.num_hashes, cfg.seed)
        self.k = cfg.blocking.shingle_k
        self.cap = cfg.blocking.max_profile_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = np.asarray(batch["conv_id"].to_pylist(), dtype=object)
        tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)
        texts = batch["norm_text"].to_pylist()
        order = np.lexsort((tidx, conv))
        out_conv: list[str] = []
        out_sig: list[bytes] = []
        out_head: list[str] = []
        out_turns: list[int] = []
        out_chars: list[int] = []
        out_min_turn: list[int] = []
        i = 0
        n = len(order)
        with np.errstate(over="ignore"):
            while i < n:
                j = i
                cid = conv[order[i]]
                sh_parts = []
                heads: list[str] = []
                n_chars = 0
                head_len = 0
                while j < n and conv[order[j]] == cid:
                    t = texts[order[j]] or ""
                    n_chars += len(t)
                    sh_parts.append(shingle_hashes(t, self.k))
                    if head_len < self.cap:
                        heads.append(t[: self.cap - head_len])
                        head_len += len(heads[-1]) + 1
                    j += 1
                sh = np.unique(np.concatenate(sh_parts))
                sig = np.full(len(self.a), np.iinfo(np.uint64).max, dtype=np.uint64)
                CHUNK = 16384
                for lo in range(0, len(sh), CHUNK):
                    part = sh[lo : lo + CHUNK]
                    vals = self.a[:, None] * part[None, :] + self.b[:, None]
                    np.minimum(sig, vals.min(axis=1), out=sig)
                out_conv.append(cid)
                out_sig.append(sig.tobytes())
                out_head.append(" ".join(heads))
                out_turns.append(j - i)
                out_chars.append(n_chars)
                out_min_turn.append(int(tidx[order[i]]))
                i = j
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "sig": pa.array(out_sig, pa.binary()),
                "text_head": pa.array(out_head, pa.string()),
                "n_turns": pa.array(out_turns, pa.int64()),
                "n_chars": pa.array(out_chars, pa.int64()),
                "min_turn": pa.array(out_min_turn, pa.int64()),
            }
        )


def conv_profiles(
    normalized: rd.Dataset, cfg: EngineConfig, batch_size: int | None = None
) -> rd.Dataset:
    """Turn-level normalized transcripts → one profile row per conversation."""
    cap = cfg.blocking.max_profile_chars
    num_hashes = cfg.blocking.num_hashes

    partials = normalized.map_batches(
        _TurnPartials,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=batch_size or max(cfg.batch_size, 8192),
        # autoscaling pool: min 1 actor so the pool can never reserve every
        # CPU and starve the downstream shuffle (ray_guide §actor pools)
        concurrency=(1, cfg.actor_concurrency),
        num_cpus=1,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized merge of per-(conv, batch) partials: elementwise-min
        signatures via ``np.minimum.reduceat`` over group boundaries, ordered
        head concat, count sums. Associative+commutative → composable
        (sorted_grouped_agg contract)."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype="str"),
                    "sig": pd.Series(dtype="object"),
                    "text_head": pd.Series(dtype="str"),
                    "n_turns": pd.Series(dtype="int64"),
                    "n_chars": pd.Series(dtype="int64"),
                    "min_turn": pd.Series(dtype="int64"),
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
        return pd.DataFrame(
            {
                "conv_id": conv[starts],
                "sig": [sig_min[i].tobytes() for i in range(len(starts))],
                "text_head": heads.loc[conv[starts]].to_numpy(),
                "n_turns": n_turns.loc[conv[starts]].to_numpy(),
                "n_chars": n_chars.loc[conv[starts]].to_numpy(),
                "min_turn": min_turn.loc[conv[starts]].to_numpy(),
            }
        )

    out = sorted_grouped_agg(partials, "conv_id", combine, pre_combine=False)
    return out.map_batches(
        lambda df: df.drop(columns=["min_turn"]), batch_format="pandas"
    )
