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
from ..functions.groupagg import grouped_count, sorted_apply_exact, sorted_grouped_agg
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

    def label_combine(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized (conv, label) count combine; handles raw mention rows
        (no cnt column) and partials alike — composable."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype="str"),
                    "label": pd.Series(dtype="str"),
                    "cnt": pd.Series(dtype="int64"),
                    "link_probability": pd.Series(dtype="float64"),
                    "label_link_doc": pd.Series(dtype="int64"),
                }
            )
        if "cnt" not in df.columns:
            df = df.assign(cnt=1)
        return (
            df.groupby(["conv_id", "label"], sort=False)
            .agg(
                cnt=("cnt", "sum"),
                link_probability=("link_probability", "first"),
                label_link_doc=("label_link_doc", "first"),
            )
            .reset_index()
        )

    per_label = sorted_grouped_agg(
        mentions.select_columns(
            ["conv_id", "label", "link_probability", "label_link_doc"]
        ),
        ["conv_id", "label"],
        label_combine,
    )

    def summarize_block(df: pd.DataFrame) -> pd.DataFrame:
        """Complete conv groups → one summary row each (vectorized: top-M /
        K-rarest selection via global sorts + groupby.head)."""
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype="str"),
                    "anchor_labels": pd.Series(dtype="object"),
                    "anchor_weights": pd.Series(dtype="object"),
                    "block_keys": pd.Series(dtype="object"),
                }
            )
        df = df.assign(w=df["cnt"] * df["link_probability"])
        top = (
            df.sort_values(["conv_id", "w", "label"], ascending=[True, False, True])
            .groupby("conv_id", sort=False)
            .head(TOP_M_ANCHORS)
        )
        tops = top.groupby("conv_id", sort=False).agg(
            anchor_labels=("label", list), anchor_weights=("w", list)
        )
        rare = (
            df.sort_values(["conv_id", "label_link_doc", "label"])
            .groupby("conv_id", sort=False)
            .head(k_keys)
        )
        rare = rare.assign(
            bk=[f"A:{normalize_text(l, ncfg)}" for l in rare["label"]]
        )
        keys = rare.groupby("conv_id", sort=False)["bk"].agg(
            lambda s: sorted(set(s))
        )
        out = tops.join(keys.rename("block_keys")).reset_index()
        return out

    return sorted_apply_exact(per_label, "conv_id", summarize_block)


def anchor_block_keys(
    summaries: rd.Dataset, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """(conv_id, block_key) rows from summaries' ``block_keys`` lists.

    Keys whose block would exceed ``anchor_max_block_size`` conversations
    are dropped (with a logged census) — see BlockingConfig for rationale.
    """

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

    keys = summaries.map_batches(explode, batch_format="pyarrow")
    if cfg is None:
        return keys
    cap = cfg.blocking.anchor_max_block_size
    keys = keys.materialize()
    counts = grouped_count(keys, "block_key")
    import pandas as pd_  # local alias; avoids shadowing

    hot = counts.map_batches(
        lambda df: df[df["n"] > cap], batch_format="pandas"
    ).to_pandas()
    if hot.empty or "block_key" not in hot.columns:
        return keys
    import ray

    print(
        f"[blocking] dropping {len(hot)} anchor keys above cap {cap} "
        f"(max block {int(hot['n'].max())})"
    )
    drop_ref = ray.put(set(hot["block_key"]))

    def drop_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _ray

        drop = _ray.get(drop_ref)
        mask = [k not in drop for k in batch["block_key"].to_pylist()]
        return batch.filter(pa.array(mask))

    return keys.map_batches(drop_hot, batch_format="pyarrow")
