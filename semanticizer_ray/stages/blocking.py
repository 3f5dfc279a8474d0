"""Stage T6: blocking keys per conversation — LSH bands + anchor keys.

Two complementary key families (SURVEY.md T6; north_rule stage 1):

- ``L{band}:{hash}`` from the MinHash signature's LSH bands: near-duplicate
  conversations (high shingle Jaccard) collide on ≥1 band with high
  probability.
- ``A:{norm_label}`` from the conversation's K rarest matched anchors
  (smallest global ``link_doc``): catches heavily perturbed duplicates that
  fall below the LSH threshold but still mention the same rare entities.
  Rarity comes from the anchor dictionary (carried on mention rows), so no
  extra census shuffle is needed; common anchors (huge blocks) are never
  chosen because K picks the rarest.

Also emits the per-conversation anchor SUMMARY (top-M anchors with
commonness weights) consumed by stage-2 scoring's anchor-overlap feature —
computed in the same conv-keyed groupby, so stage 1 costs exactly one
mention shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.minhash import band_hashes
from ..functions.normalize import normalize_text

ANCHOR_SUMMARY_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("anchor_labels", pa.list_(pa.string())),
        ("anchor_weights", pa.list_(pa.float64())),
        ("block_keys", pa.list_(pa.string())),
    ]
)

TOP_M_ANCHORS = 16


def lsh_block_keys(profiles: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """Profiles → (conv_id, block_key) rows, one per LSH band."""
    num_bands = cfg.blocking.num_bands

    def explode(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        sigs = batch["sig"].to_pylist()
        out_conv: list[str] = []
        out_key: list[str] = []
        for cid, sb in zip(convs, sigs):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for band, h in enumerate(band_hashes(sig, num_bands)):
                out_conv.append(cid)
                out_key.append(f"L{band}:{h:x}")
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "block_key": pa.array(out_key, pa.string()),
            }
        )

    return profiles.map_batches(explode, batch_format="pyarrow")


def anchor_summaries(mentions: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """Mentions → per-conv anchor summary + anchor block keys (one shuffle).

    Input needs columns: conv_id, label, link_probability, label_link_doc.
    """
    k_keys = cfg.blocking.anchor_keys_per_conv
    ncfg = cfg.normalize

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby(["conv_id", "label"], sort=False)
            .agg(
                cnt=("label", "size"),
                link_probability=("link_probability", "first"),
                label_link_doc=("label_link_doc", "first"),
            )
            .reset_index()
        )
        return g

    partials = mentions.map_batches(partial, batch_format="pandas", batch_size=65536)

    def summarize(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.groupby("label", sort=False)
            .agg(
                cnt=("cnt", "sum"),
                link_probability=("link_probability", "first"),
                label_link_doc=("label_link_doc", "first"),
            )
            .reset_index()
        )
        g["w"] = g["cnt"] * g["link_probability"]
        top = g.sort_values(["w", "label"], ascending=[False, True]).head(TOP_M_ANCHORS)
        rare = g.sort_values(["label_link_doc", "label"]).head(k_keys)
        keys = [f"A:{normalize_text(l, ncfg)}" for l in rare["label"]]
        return pd.DataFrame(
            {
                "conv_id": [group["conv_id"].iloc[0]],
                "anchor_labels": [list(top["label"])],
                "anchor_weights": [list(top["w"].astype(float))],
                "block_keys": [sorted(set(keys))],
            }
        )

    return partials.groupby("conv_id").map_groups(summarize, batch_format="pandas")


def anchor_block_keys(summaries: rd.Dataset) -> rd.Dataset:
    """(conv_id, block_key) rows from summaries' ``block_keys`` lists."""

    def explode(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        keylists = batch["block_keys"].to_pylist()
        out_conv, out_key = [], []
        for cid, keys in zip(convs, keylists):
            for k in keys or []:
                out_conv.append(cid)
                out_key.append(k)
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "block_key": pa.array(out_key, pa.string()),
            }
        )

    return summaries.map_batches(explode, batch_format="pyarrow")
