"""Stage T6: blocking keys per conversation — LSH bands + anchor keys.

Two complementary key families (SURVEY.md T6; north_rule stage 1), both
derived from the profile rows produced by ``stages.signatures`` (which
computes signatures AND anchor summaries in one pass):

- ``L{band}:{hash}`` from the MinHash signature's LSH bands: near-duplicate
  conversations (high shingle Jaccard) collide on ≥1 band with high
  probability.
- ``A:{norm_label}`` from the conversation's K rarest matched anchors
  (smallest global ``link_doc``): catches heavily perturbed duplicates that
  fall below the LSH threshold but still mention the same rare entities.
  Keys whose block would exceed ``anchor_max_block_size`` conversations are
  DROPPED with a logged census — a non-discriminative anchor is noise, and
  exact pair coverage of such blocks is quadratic blow-up for near-zero
  precision (BlockingConfig rationale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.minhash import band_hashes


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


def block_keys(
    profiles: rd.Dataset, cfg: EngineConfig, include_anchors: bool = True
) -> rd.Dataset:
    """BOTH key families in ONE explode pass — the pipeline's default.

    ``lsh_block_keys(p).union(anchor_block_keys(p))`` reads the profile
    blocks twice and doubles the block count of the downstream block-key
    sort (146 sub-MB blocks at the 100k-conv tier); range-exchange overhead
    grows with block count at every CPU count, so the fused explode halves
    a pure fixed cost. Output is row-identical to the union up to row
    order (pair generation is order-invariant: it re-sorts by key)."""
    num_bands = cfg.blocking.num_bands

    def explode(batch: pa.Table) -> pa.Table:
        convs = batch["conv_id"].to_pylist()
        sigs = batch["sig"].to_pylist()
        keylists = (
            batch["block_keys"].to_pylist() if include_anchors else [None] * len(convs)
        )
        out_conv: list[str] = []
        out_key: list[str] = []
        for cid, sb, akeys in zip(convs, sigs, keylists):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for band, h in enumerate(band_hashes(sig, num_bands)):
                out_conv.append(cid)
                out_key.append(f"L{band}:{h:x}")
            for k in akeys or []:
                out_conv.append(cid)
                out_key.append(k)
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "block_key": pa.array(out_key, pa.string()),
            }
        )

    return profiles.map_batches(explode, batch_format="pyarrow")


def anchor_block_keys(
    profiles: rd.Dataset, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """(conv_id, block_key) rows from profiles' ``block_keys`` lists, with
    the over-cap drop census described in the module docstring."""

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

    # the over-cap drop happens inside candidate_pairs' single key census
    # ("A:"-prefixed keys above anchor_max_block_size are dropped there, not
    # salted) — one census pass covers both key families
    return profiles.map_batches(explode, batch_format="pyarrow")
