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

The explode is fully vectorized: band hashes fold over the signature MATRIX
(``batch_band_hashes``), key strings render through a nibble lookup table
into one byte buffer (no per-row f-strings), conv ids repeat via Arrow
``take``, and anchor-key lists flatten with ``pc.list_parent_indices`` —
zero per-row Python in the only stage between profiles and the big sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import EngineConfig
from ..functions.minhash import batch_band_hashes

_HEXD = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)

_EMPTY_KEYS = pa.table(
    {"conv_id": pa.array([], pa.string()), "block_key": pa.array([], pa.string())}
)


def offsets32(count: int, width: int) -> np.ndarray:
    """int32 Arrow offsets for ``count`` fixed-``width`` values, or a loud
    error: count*width beyond int32 would wrap silently inside
    ``from_buffers`` and build a corrupt array with negative offsets. A
    batch that large is a batching bug — split it, don't widen the type."""
    total = count * width
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"fixed-width payload of {total} bytes ({count} x {width}) "
            "overflows int32 utf8/binary offsets; reduce the batch size"
        )
    return np.arange(count + 1, dtype=np.int32) * width


def sig_matrix(sig: pa.Array | pa.ChunkedArray, n: int) -> np.ndarray:
    """Uniform-width binary signature column → zero-copy uint64[n, H] view.

    Reads the values buffer directly through the offsets (one slice + one
    ``view``); falls back to a single join for non-contiguous edge cases.
    """
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    if n == 0:
        return np.empty((0, 0), dtype=np.uint64)
    if sig.null_count:
        # a null signature would read as zero-width and (all-null) slip
        # through as an (n, 0) matrix → identical all-zero band keys for
        # every row downstream; same caller bug as a ragged column
        raise ValueError(
            f"sig_matrix: signature column has {sig.null_count} nulls; "
            "signatures are non-nullable by construction"
        )
    try:
        off_dt = np.int64 if pa.types.is_large_binary(sig.type) else np.int32
        offs = np.frombuffer(sig.buffers()[1], dtype=off_dt)
        o = offs[sig.offset : sig.offset + n + 1]
        widths = np.diff(o)
        w = int(widths[0])
        if w == 0 or not (widths == w).all() or w % 8:
            raise ValueError("non-uniform signature widths")
        data = np.frombuffer(sig.buffers()[2], dtype=np.uint8)
        return data[int(o[0]) : int(o[0]) + n * w].view(np.uint64).reshape(n, -1)
    except (ValueError, TypeError):
        # slow path: non-contiguous buffers (slices, offsets). Signatures
        # are uniform-width by construction (num_hashes × 8 bytes); a
        # genuinely ragged column is a caller bug — fail loudly instead of
        # letting reshape(n, -1) silently mis-align rows into wrong bands.
        rows = [r or b"" for r in sig.to_pylist()]
        widths = {len(r) for r in rows}
        if len(widths) > 1 or (rows and len(rows[0]) % 8):
            raise ValueError(
                "sig_matrix: signature widths must be one uniform multiple "
                f"of 8 bytes, got byte widths {sorted(widths)}"
            ) from None
        w = len(rows[0]) if rows else 0
        if w == 0:
            # n > 0 here (n == 0 returned above): zero-width signatures are
            # the all-null / empty-sig caller bug — fail like the ragged case
            raise ValueError(
                "sig_matrix: zero-width signatures for a non-empty batch"
            ) from None
        return np.frombuffer(b"".join(rows), dtype=np.uint64).reshape(n, w // 8)


def band_key_array(bh: np.ndarray) -> pa.Array:
    """uint64[n, num_bands] band hashes → ``L{band}:{hash}`` utf8 keys,
    row-major (all of conv 0's bands first), built as ONE byte buffer +
    arithmetic offsets — no per-key Python. Band index is zero-padded and
    the hash fixed at 16 hex digits so every key has one width."""
    n, nb = bh.shape
    if n == 0 or nb == 0:
        return pa.array([], pa.string())
    pad = max(2, len(str(nb - 1)))
    keylen = 1 + pad + 1 + 16
    out = np.empty((n, nb, keylen), dtype=np.uint8)
    out[..., 0] = ord("L")
    digits = (
        np.frombuffer(
            "".join(f"{i:0{pad}d}" for i in range(nb)).encode(), dtype=np.uint8
        ).reshape(nb, pad)
    )
    out[..., 1 : 1 + pad] = digits
    out[..., 1 + pad] = ord(":")
    be = np.ascontiguousarray(bh.astype(">u8")).view(np.uint8).reshape(n, nb, 8)
    hexpart = out[..., 2 + pad :]
    hexpart[..., 0::2] = _HEXD[be >> 4]
    hexpart[..., 1::2] = _HEXD[be & 0x0F]
    offsets = offsets32(n * nb, keylen)
    return pa.Array.from_buffers(
        pa.utf8(), n * nb, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())]
    )


def hex64_array(vals: np.ndarray) -> pa.Array:
    """uint64[n] → 16-digit lowercase hex utf8 column, one buffer write."""
    n = len(vals)
    if n == 0:
        return pa.array([], pa.string())
    be = np.ascontiguousarray(vals.astype(">u8")).view(np.uint8).reshape(n, 8)
    chars = np.empty((n, 16), dtype=np.uint8)
    chars[:, 0::2] = _HEXD[be >> 4]
    chars[:, 1::2] = _HEXD[be & 0x0F]
    offsets = offsets32(n, 16)
    return pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(chars.tobytes())]
    )


_UNHEX = np.zeros(256, dtype=np.uint64)
for _i, _c in enumerate(b"0123456789abcdef"):
    _UNHEX[_c] = _i
for _i, _c in enumerate(b"0123456789ABCDEF"):
    _UNHEX[_c] = _i


def parse_hex64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Fixed-16-digit hex utf8 column → uint64[n], via a nibble lookup over
    the raw values buffer (falls back to per-row ``int(s, 16)`` for
    non-uniform widths)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        off_dt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=off_dt)
        o = offs[col.offset : col.offset + n + 1]
        if not (np.diff(o) == 16).all():
            raise ValueError("non-uniform hex widths")
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        mat = data[int(o[0]) : int(o[0]) + 16 * n].reshape(n, 16)
        nib = _UNHEX[mat]
        vals = np.zeros(n, dtype=np.uint64)
        for i in range(16):
            vals = (vals << np.uint64(4)) | nib[:, i]
        return vals
    except (ValueError, TypeError):
        return np.array([int(s, 16) for s in col.to_pylist()], dtype=np.uint64)


def _lsh_parts(batch: pa.Table, num_bands: int) -> tuple[pa.Array, pa.Array]:
    n = batch.num_rows
    conv = batch["conv_id"].combine_chunks()
    bh = batch_band_hashes(sig_matrix(batch["sig"], n), num_bands)
    keys = band_key_array(bh)
    idx = np.repeat(np.arange(n, dtype=np.int64), bh.shape[1] if n else 0)
    return conv.take(pa.array(idx)), keys


def _anchor_parts(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    lst = batch["block_keys"].combine_chunks()
    conv = batch["conv_id"].combine_chunks().take(pc.list_parent_indices(lst))
    keys = pc.list_flatten(lst)
    if not pa.types.is_string(keys.type):  # all-empty lists infer list<null>
        keys = keys.cast(pa.string())
    return conv, keys


def lsh_block_keys(profiles: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """Profiles → (conv_id, block_key) rows, one per LSH band."""
    num_bands = cfg.blocking.num_bands

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_KEYS
        conv, keys = _lsh_parts(batch, num_bands)
        return pa.table({"conv_id": conv, "block_key": keys})

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
        if batch.num_rows == 0:
            return _EMPTY_KEYS
        conv, keys = _lsh_parts(batch, num_bands)
        if include_anchors:
            a_conv, a_keys = _anchor_parts(batch)
            conv = pa.concat_arrays([conv, a_conv])
            keys = pa.concat_arrays([keys, a_keys])
        return pa.table({"conv_id": conv, "block_key": keys})

    return profiles.map_batches(explode, batch_format="pyarrow")


def anchor_block_keys(
    profiles: rd.Dataset, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """(conv_id, block_key) rows from profiles' ``block_keys`` lists, with
    the over-cap drop census described in the module docstring."""

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_KEYS
        conv, keys = _anchor_parts(batch)
        return pa.table({"conv_id": conv, "block_key": keys})

    # the over-cap drop happens inside candidate_pairs' single key census
    # ("A:"-prefixed keys above anchor_max_block_size are dropped there, not
    # salted) — one census pass covers both key families
    return profiles.map_batches(explode, batch_format="pyarrow")
