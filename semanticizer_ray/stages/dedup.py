"""Deduplication operators over document tables (SURVEY.md U2/U3 + extensions).

First-class training-data-pipeline dedup, each over a table with
(id_col:int64, text_col:string) — the testdata ``documents`` shape:

- ``exact_dedup``        content-hash → hash-keyed groupby → keep min id.
  Scale shape: the shuffle moves (hash, id) only; the winning row set is
  re-joined by id via broadcast of winner ids (small) or a second pass.
- ``minhash_dedup``      shingle→minhash→band→bucket groupby → candidate
  pairs → verified Jaccard ≥ τ edges → connected components → keep one doc
  per component. Reuses the ER engine's T5–T9 machinery on documents.
- ``simhash_dedup``      64-bit SimHash over token hashes; duplicates =
  same simhash value (Hamming-0 buckets; Hamming≤k via band rotation is a
  documented extension).
- ``ngram_jaccard``      exact word-n-gram Jaccard for one candidate pair
  (verification primitive used by minhash_dedup).
- ``ngram_jaccard_pairs`` EXACT distributed n-gram Jaccard similarity join
  (inverted-index plan: postings → gram-keyed pair emit → (src, dst)
  intersection count) — the oracle-checkable baseline minhash approximates.
- ``embedding_dedup``    cosine near-dup over an embedding column: LSH by
  random-hyperplane sign bucket → within-bucket exact cosine ≥ τ pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import group_starts, sorted_apply_exact, sorted_grouped_agg
from ..functions.vectors import vec_matrix
from ..functions.minhash import (
    batch_band_hashes,
    hash_params,
    minhash_from_shingle_groups,
    shingle_hashes_multi,
)
from .blocking import _HEXD, band_key_array, hex64_array, offsets32, parse_hex64

# Int doc ids ride the string clustering machinery (T9) zero-padded so
# lexicographic min == numeric min. 20 digits covers the full non-negative
# int64 range (max 19 digits — 12 was not enough for ids ≥ 10^12, ADVICE
# r2); negative ids are rejected (a "-" breaks the ordering invariant).
_ID_PAD = 20


def _ids_to_str(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized int64 → zero-padded string column."""
    import pyarrow.compute as pc

    if len(col) and pc.min(col).as_py() < 0:
        raise ValueError("dedup: doc ids must be non-negative int64")
    return pc.utf8_lpad(pc.cast(col, pa.string()), _ID_PAD, "0")


def _str_to_ids(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized zero-padded string → int64 column."""
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())


def content_fp64(texts: list) -> np.ndarray:
    """64-bit content fingerprint per text: little-endian signed int64 from
    the first 8 md5 bytes. THE shared basis of every exact-verify dedup mode
    (minhash/simhash) — the oracle-equivalence proofs require all sites to
    hash identically, so this is the only place the basis is defined.
    Per-text Python loop (no vectorized md5 exists); runs once per DOC."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5((t or "").encode("utf-8")).digest()[:8],
                "little",
                signed=True,
            )
            for t in texts
        ),
        dtype=np.int64,
        count=len(texts),
    )


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep the min-id row per distinct text. Output: (id_col, text_col).

    Scale shape: the hash-keyed exchange moves (hash, id) ONLY — at corpus
    scale the text never rides the shuffle; winners come back as a
    count-gated semi-join (broadcast of winner ids under the row gate,
    sort-merge above it) against the pruned original columns."""
    from ..functions.joins import join

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {"h": pa.array(hashes, pa.string()), id_col: batch[id_col]}
        )

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df.groupby("h", sort=False)[id_col].min().reset_index()

    winners = sorted_grouped_agg(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        "h",
        keep_min,
        driver_gate=100_000,
    ).map_batches(lambda df: df[[id_col]], batch_format="pandas")

    return join(
        ds.select_columns([id_col, text_col]), winners, on=id_col, how="semi"
    )


class _DocSignatures:
    """Per-doc MinHash signature + LSH band keys (actor: hash family once)."""

    def __init__(self, cfg: EngineConfig, id_col: str, text_col: str):
        self.a, self.b = hash_params(cfg.blocking.num_hashes, cfg.seed)
        self.k = cfg.blocking.shingle_k
        self.bands = cfg.blocking.num_bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        # batched shingling + minhash — the same kernels as the ER profile
        # pass (one windowing pass over the concatenated buffer, C/reduceat
        # fold); min is duplicate-invariant so the non-deduped window hashes
        # give signatures identical to the scalar path (parity-tested)
        groups = shingle_hashes_multi(texts, self.k)
        sig_mat = minhash_from_shingle_groups(groups, self.a, self.b)
        bh = batch_band_hashes(sig_mat, self.bands)
        nb = bh.shape[1]
        keys = band_key_array(bh)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), nb))
        doc = batch[self.id_col].combine_chunks().take(idx)
        # per-band signature rows share the doc's bytes: ONE buffer +
        # arithmetic offsets, no per-row tobytes
        w = sig_mat.shape[1] * 8
        rep = np.repeat(sig_mat, nb, axis=0)
        offsets = offsets32(n * nb, w)
        sig_col = pa.Array.from_buffers(
            pa.binary(),
            n * nb,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(rep.tobytes())],
        )
        # 64-bit content fingerprint (shared content_fp64 basis): rides
        # each band row so exact-verify mode never ships text.
        content = content_fp64(texts)
        return pa.table(
            {
                "doc": doc,
                "bucket": keys,
                "sig": sig_col,
                "content": pa.array(np.repeat(content, nb)),
            }
        )


def minhash_dedup(
    ds: rd.Dataset,
    cfg: EngineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    max_bucket: int = 256,
    exact_verify: bool = False,
) -> rd.Dataset:
    """Near-dup clusters: (doc_id, dup_group) with dup_group = min doc id.

    Bucket groupby carries the signature so pair verification happens
    in-group (estimated Jaccard on full signatures); oversized degenerate
    buckets are truncated at ``max_bucket`` members (counted, not silent —
    emitted as ``bucket_overflow`` on the pair rows).

    ``exact_verify=True`` replaces the signature-Jaccard pair check with
    64-bit content-fingerprint equality (same md5 basis as
    ``exact_dedup``): identical texts always share every band bucket, so
    the LSH candidates cover every exact-dup pair, and in-bucket
    verification emits a STAR to each content run's min id (O(n) pairs —
    degenerate buckets are NOT truncated in this mode), so the verified
    components equal the exact-text groups unconditionally: an
    SQL-checkable mode that still exercises the full
    signature/LSH/cluster machinery.
    """
    sig_rows = ds.map_batches(
        _DocSignatures,
        fn_constructor_args=(cfg, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, cfg.actor_concurrency),
        num_cpus=1,
    )

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        src, dst, overs = [], [], []
        if len(df):
            df = df.drop_duplicates(["bucket", "doc"]).sort_values(["bucket", "doc"])
            buckets = df["bucket"].to_numpy()
            ids = df["doc"].to_numpy()
            sig_col = df["sig"].to_numpy()
            content = df["content"].to_numpy()
            starts = np.append(group_starts(buckets), len(df))
            for gi in range(len(starts) - 1):
                lo, hi = starts[gi], starts[gi + 1]
                if exact_verify:
                    # content-equality connectivity is a STAR to each
                    # content run's min id: O(n) pairs, so degenerate
                    # buckets need NO truncation and the verified
                    # components equal the exact-text groups even when a
                    # text has more than max_bucket duplicates
                    if hi - lo < 2:
                        continue
                    order = np.argsort(content[lo:hi], kind="stable")
                    cs = content[lo:hi][order]
                    si = ids[lo:hi][order].astype(np.int64, copy=False)
                    runs = np.append(group_starts(cs), hi - lo)
                    lens = np.diff(runs)
                    # star edges member→run-min, emitted as three gathers:
                    # dst = each run's head repeated, src = everything
                    # that is not a run head
                    if (lens > 1).any():
                        dst_a = np.repeat(si[runs[:-1]], lens - 1)
                        head = np.zeros(hi - lo, dtype=bool)
                        head[runs[:-1]] = True
                        src.append(si[~head])
                        dst.append(dst_a)
                        overs.append(np.zeros(len(dst_a), dtype=np.int64))
                    continue
                over = max(0, (hi - lo) - max_bucket)
                hi = min(hi, lo + max_bucket)
                n = hi - lo
                if n < 2:
                    continue
                iu, ju = np.triu_indices(n, k=1)
                # full-signature Jaccard for every in-bucket pair, one
                # matmul-free vectorized comparison per bucket
                sigs = np.frombuffer(
                    b"".join(sig_col[lo:hi]), dtype=np.uint64
                ).reshape(n, -1)
                eq = (sigs[iu] == sigs[ju]).mean(axis=1)
                keep = eq >= jaccard_threshold
                if keep.any():
                    # iu < ju and the bucket is doc-sorted → src < dst
                    bi = ids[lo:hi].astype(np.int64, copy=False)
                    src.append(bi[iu[keep]])
                    dst.append(bi[ju[keep]])
                    overs.append(np.full(int(keep.sum()), over, dtype=np.int64))
        return pd.DataFrame(
            {
                "src": pd.Series(
                    np.concatenate(src) if src else [], dtype="int64"
                ),
                "dst": pd.Series(
                    np.concatenate(dst) if dst else [], dtype="int64"
                ),
                "bucket_overflow": pd.Series(
                    np.concatenate(overs) if overs else [], dtype="int64"
                ),
            }
        )

    edges = sorted_apply_exact(sig_rows, "bucket", bucket_pairs_block)

    # connected components over int ids via the string machinery (T9)
    def to_str(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_a": _ids_to_str(batch["src"]),
                "conv_b": _ids_to_str(batch["dst"]),
            }
        )

    from .clustering import cluster_edges

    all_nodes = ds.map_batches(
        lambda t: pa.table({"conv_id": _ids_to_str(t[id_col])}),
        batch_format="pyarrow",
    )
    comp = cluster_edges(edges.map_batches(to_str, batch_format="pyarrow"), all_nodes, cfg)

    def back_to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: _str_to_ids(batch["conv_id"]),
                "dup_group": _str_to_ids(batch["cluster_id"]),
            }
        )

    return comp.map_batches(back_to_int, batch_format="pyarrow")


_SH_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_content: bool = False,
) -> rd.Dataset:
    """Adds ``simhash``: 64-bit SimHash (hex) over word-token hashes.

    Vectorized: every word in the batch is hashed with ONE C-speed
    ``pd.util.hash_array`` call (deterministic — fixed default hash key),
    then per-doc bit votes are a single numpy reduction; no per-word Python
    loop (the round-1 per-word md5 kernel was the suite's slowest).

    ``with_content=True`` also emits the 64-bit md5 content fingerprint
    (same basis as ``exact_dedup``) used by the exact-verify dedup mode."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        words_per_doc = [(t or "").lower().split() for t in texts]
        lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
        flat = [w for ws in words_per_doc for w in ws]
        hv = (
            pd.util.hash_array(np.asarray(flat, dtype=object))
            if flat
            else np.empty(0, dtype=np.uint64)
        )
        offs = np.concatenate([[0], np.cumsum(lens)])
        out = np.zeros(n, dtype=np.uint64)
        nz = np.flatnonzero(lens > 0)
        if len(nz):
            # per-doc bit votes in ONE reduceat over the flat (words, 64)
            # bit matrix (empty docs are excluded, so consecutive reduceat
            # offsets are strictly increasing and segments are exact)
            bits = ((hv[:, None] >> _SH_SHIFTS) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bits, offs[nz], axis=0)  # (len(nz), 64)
            val_bits = (2 * ones > lens[nz][:, None]).astype(np.uint64)
            out[nz] = (val_bits << _SH_SHIFTS).sum(axis=1, dtype=np.uint64)
        cols = {id_col: batch[id_col], "simhash": hex64_array(out)}
        if with_content:
            cols["content"] = pa.array(content_fp64(texts))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_hamming_pairs(
    sim_rows: rd.Dataset,
    hamming_k: int,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    max_bucket: int = 512,
) -> rd.Dataset:
    """(id, simhash hex) rows → (src, dst, hamming) pairs with Hamming
    distance ≤ k, via band rotation: the 64 bits split into ``k + 1`` bands,
    so any two values within distance k agree exactly on ≥ 1 band
    (pigeonhole) — each band is an LSH bucket key, verified in-bucket with a
    vectorized XOR popcount. Oversized buckets truncate at ``max_bucket``
    (counted in ``bucket_overflow`` — no silent loss)."""
    nb = hamming_k + 1
    # band bit boundaries (as even as 64//nb allows)
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    offsets = np.cumsum([0] + widths[:-1])
    masks = [(1 << w) - 1 for w in widths]

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = parse_hex64(batch[sim_col])
        # band-bit matrix (n, nb) → fixed-width keys via the shared
        # vectorized renderer; no per-row f-strings
        bb = np.empty((n, nb), dtype=np.uint64)
        for band in range(nb):
            bb[:, band] = (vals >> np.uint64(offsets[band])) & np.uint64(masks[band])
        keys = band_key_array(bb)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), nb))
        return pa.table(
            {
                "doc": batch[id_col].combine_chunks().take(idx),
                "bucket": keys,
                "sim": pa.array(np.repeat(vals, nb)),
            }
        )

    rows = sim_rows.map_batches(explode, batch_format="pyarrow")

    def verify_block(df: pd.DataFrame) -> pd.DataFrame:
        src, dst, ham, overs = [], [], [], []
        if len(df):
            df = df.drop_duplicates(["bucket", "doc"]).sort_values(["bucket", "doc"])
            buckets = df["bucket"].to_numpy()
            ids = df["doc"].to_numpy()
            sims = df["sim"].to_numpy().astype(np.uint64)
            starts = np.append(group_starts(buckets), len(df))
            for gi in range(len(starts) - 1):
                lo = starts[gi]
                over = max(0, (starts[gi + 1] - lo) - max_bucket)
                hi = min(starts[gi + 1], lo + max_bucket)
                m = hi - lo
                if m < 2:
                    continue
                iu, ju = np.triu_indices(m, k=1)
                x = np.bitwise_xor(sims[lo + iu], sims[lo + ju])
                d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                keep = d <= hamming_k
                if keep.any():
                    # iu < ju and the bucket is doc-sorted → src < dst
                    bi = ids[lo:hi].astype(np.int64, copy=False)
                    src.append(bi[iu[keep]])
                    dst.append(bi[ju[keep]])
                    ham.append(d[keep].astype(np.int64, copy=False))
                    overs.append(np.full(int(keep.sum()), over, dtype=np.int64))
        return pd.DataFrame(
            {
                "src": pd.Series(
                    np.concatenate(src) if src else [], dtype="int64"
                ),
                "dst": pd.Series(
                    np.concatenate(dst) if dst else [], dtype="int64"
                ),
                "hamming": pd.Series(
                    np.concatenate(ham) if ham else [], dtype="int64"
                ),
                "bucket_overflow": pd.Series(
                    np.concatenate(overs) if overs else [], dtype="int64"
                ),
            }
        )

    pairs = sorted_apply_exact(rows, "bucket", verify_block)

    # a pair can meet in several bands: dedup on the (src, dst) key
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.groupby(["src", "dst"], sort=False)
            .agg(hamming=("hamming", "min"), bucket_overflow=("bucket_overflow", "max"))
            .reset_index()
        )

    return sorted_grouped_agg(pairs, ["src", "dst"], dedup)


def simhash_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    hamming_k: int = 0,
    cfg: EngineConfig | None = None,
    exact_verify: bool = False,
) -> rd.Dataset:
    """SimHash duplicate groups: (doc_id, dup_group = min id in group).

    ``hamming_k`` = 0 groups exact simhash values; k > 0 links docs within
    Hamming distance k via ``simhash_hamming_pairs`` banding + connected
    components.

    ``exact_verify=True`` (same pattern as ``minhash_dedup``): the SimHash
    values still drive the grouped shuffle, but in-group connectivity is
    64-bit content-fingerprint equality instead of simhash equality.
    Identical texts always produce identical simhash values (the bit votes
    are a pure function of the token multiset), so every exact-dup pair
    lands in one simhash group and the verified components provably equal
    the exact-text groups — an SQL-oracle-checkable mode that exercises
    the full vectorized bit-vote + grouped-dedup machinery. (Plain
    simhash-equality grouping would NOT be SQL-checkable: distinct texts
    with the same token multiset — reordered words — share a simhash.)"""
    if exact_verify and hamming_k:
        raise ValueError(
            "simhash_dedup: exact_verify groups exact-text duplicates only "
            f"and would silently ignore hamming_k={hamming_k}; use one mode "
            "or the other"
        )
    if exact_verify:
        sh = simhash(ds, id_col, text_col, with_content=True)

        def exact_groups(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {id_col: pd.Series(dtype="int64"), "dup_group": pd.Series(dtype="int64")}
                )
            return pd.DataFrame(
                {
                    id_col: df[id_col],
                    # content runs never split across simhash groups, so the
                    # per-group min is the global exact-text group min
                    "dup_group": df.groupby(["simhash", "content"], sort=False)[
                        id_col
                    ].transform("min"),
                }
            )

        return sorted_apply_exact(sh, "simhash", exact_groups)

    sh = simhash(ds, id_col, text_col)

    if hamming_k > 0:
        from ..config import DEFAULT_CONFIG
        from .clustering import cluster_edges

        pairs = simhash_hamming_pairs(sh, hamming_k, id_col=id_col)

        def to_str(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "conv_a": _ids_to_str(batch["src"]),
                    "conv_b": _ids_to_str(batch["dst"]),
                }
            )

        all_nodes = ds.map_batches(
            lambda t: pa.table({"conv_id": _ids_to_str(t[id_col])}),
            batch_format="pyarrow",
        )
        comp = cluster_edges(
            pairs.map_batches(to_str, batch_format="pyarrow"),
            all_nodes,
            cfg or DEFAULT_CONFIG,
        )
        return comp.map_batches(
            lambda t: pa.table(
                {
                    id_col: _str_to_ids(t["conv_id"]),
                    "dup_group": _str_to_ids(t["cluster_id"]),
                }
            ),
            batch_format="pyarrow",
        )

    def keep_group_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"), "dup_group": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "dup_group": df.groupby("simhash", sort=False)[id_col].transform("min"),
            }
        )

    return sorted_apply_exact(sh, "simhash", keep_group_block)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard (verification primitive)."""

    def grams(t: str) -> set:
        ws = (t or "").lower().split()
        if len(ws) < n:
            return {tuple(ws)} if ws else set()
        return {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> rd.Dataset:
    """EXACT distributed word-n-gram Jaccard similarity join — the
    oracle-checkable baseline the MinHash/LSH path (``minhash_dedup``)
    approximates. Output: (src, dst, jaccard) for every doc pair with
    Jaccard ≥ ``threshold``, src < dst.

    Inverted-index plan, stated Ray-Data-first (the same plan the SQL
    oracle's self-join runs, so both sides compute the identical integer
    ratio and set membership can never diverge):

      1. ``map_batches``: per doc, the DISTINCT word-``n``-gram set (a doc
         shorter than ``n`` words contributes its whole joined text as one
         gram; an empty doc contributes nothing) + the doc's gram count —
         postings ``(gram, doc, ng)``.
      2. gram-keyed exchange (``sorted_apply_exact``): within each gram's
         posting list emit every doc pair (a < b) — one intersection
         contribution per shared gram.
      3. ``(src, dst)``-keyed exchange: the group size IS the intersection
         count ``i``; jaccard = i / (na + nb - i); keep ≥ threshold.

    Exactness is the contract, so the exchange key is the gram STRING (no
    hash-collision caveat) and no posting list is truncated. Scale notes:
    both exchanges move (short-string, int64, int64) rows only — the doc
    text never rides a shuffle past stage 1; the hazard is a hot gram (a
    stopword-like n-gram shared by a large doc fraction) whose posting
    list pairs quadratically — the same blow-up the equivalent SQL join
    pays. At corpus scale pre-filter stop-grams upstream or use
    ``minhash_dedup`` (the approximate route); an unbounded hot gram that
    straddles block edges is named loudly by the groupagg remainder census
    rather than serializing silently.
    """

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        texts = batch[text_col].to_pylist()
        grams_all: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        # per-DOC loop (tokenization + set-build are inherently per-doc,
        # same cost class as textstats' documented per-doc regex)
        for j, t in enumerate(texts):
            ws = (t or "").lower().split()
            if len(ws) >= n:
                gs = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
            else:
                gs = {" ".join(ws)} if ws else set()
            counts[j] = len(gs)
            grams_all.extend(gs)
        return pa.table(
            {
                "gram": pa.array(grams_all, pa.string()),
                "doc": pa.array(np.repeat(ids, counts), pa.int64()),
                "ng": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        src, dst, na, nb = [], [], [], []
        if len(df):
            # complete gram groups, but within-group doc order is
            # arbitrary after the exchange — sort so iu < ju ⇒ src < dst
            df = df.sort_values(["gram", "doc"], kind="stable")
            grams = df["gram"].to_numpy()
            docs = df["doc"].to_numpy()
            ng = df["ng"].to_numpy()
            starts = np.append(group_starts(grams), len(df))
            for gi in range(len(starts) - 1):
                lo, hi = starts[gi], starts[gi + 1]
                m = hi - lo
                if m < 2:
                    continue
                iu, ju = np.triu_indices(m, k=1)
                src.append(docs[lo:hi][iu])
                dst.append(docs[lo:hi][ju])
                na.append(ng[lo:hi][iu])
                nb.append(ng[lo:hi][ju])

        def cat(parts: list) -> np.ndarray:
            return np.concatenate(parts) if parts else np.array([], dtype=np.int64)

        return pd.DataFrame(
            {
                "src": pd.Series(cat(src), dtype="int64"),
                "dst": pd.Series(cat(dst), dtype="int64"),
                "na": pd.Series(cat(na), dtype="int64"),
                "nb": pd.Series(cat(nb), dtype="int64"),
            }
        )

    pairs = sorted_apply_exact(posts, "gram", pairs_block)

    def reduce_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="int64"),
                    "dst": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        df = df.sort_values(["src", "dst"], kind="stable")
        s = df["src"].to_numpy()
        d = df["dst"].to_numpy()
        na = df["na"].to_numpy()
        nb = df["nb"].to_numpy()
        starts = np.append(group_starts(s, d), len(df))
        heads = starts[:-1]
        inter = np.diff(starts)
        # identical IEEE int64/int64 division on both engine and oracle —
        # equal inputs give bit-equal jaccard, so threshold membership
        # cannot diverge platform-dependently
        jac = inter / (na[heads] + nb[heads] - inter)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "src": s[heads][keep],
                "dst": d[heads][keep],
                "jaccard": jac[keep],
            }
        )

    return sorted_apply_exact(pairs, ["src", "dst"], reduce_block)


def embedding_pairs_exact(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    num_blocks: int = 8,
) -> rd.Dataset:
    """EXACT all-pairs cosine ≥ τ similarity join — the brute-force baseline
    the LSH path (``embedding_dedup``) is measured against, distributed.

    Triangle (block-pair replication) plan: each row hashes to block
    ``b = id % B`` and is emitted once per unordered block pair
    ``(min(b, j), max(b, j))`` for j in 0..B-1 — B copies of each
    (id, vec) row — then ONE sorted exchange co-locates every block pair
    and the per-group kernel is a single (n_i × n_j) float64 matmul.
    Every row pair meets in exactly one group (the pair of their blocks),
    so the result is exact by construction, with no driver-side work:
    shuffle volume O(n·B), compute O(n²/B) spread over B(B+1)/2
    independent groups. Scale knob: B ≈ √(cluster cores) keeps per-group
    matmuls cache-sized while bounding replication.

    Output: (src, dst, cosine) with src < dst by id, one row per
    qualifying pair.
    """
    if num_blocks < 1:
        raise ValueError("num_blocks must be >= 1")
    B = num_blocks

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch[id_col].combine_chunks(), dtype=np.int64)
        blk = (ids % B).astype(np.int64)
        # group key for (row block b, partner block j) = min*B + max —
        # int64 keys keep the exchange sort cheap (no string render)
        j = np.tile(np.arange(B, dtype=np.int64), n)
        b = np.repeat(blk, B)
        gkey = np.minimum(b, j) * B + np.maximum(b, j)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), B))
        return pa.table(
            {
                "gkey": pa.array(gkey),
                "doc": pa.array(np.repeat(ids, B)),
                "blk": pa.array(b),
                "vec": batch[vec_col].combine_chunks().take(idx),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def cross_block(df: pd.DataFrame) -> pd.DataFrame:
        # per-group numpy arrays, concatenated once at the end — keeps the
        # O(n²/B) kernel fully vectorized even when many pairs qualify
        src, dst, cos = [], [], []
        if len(df):
            df = df.sort_values(["gkey", "blk", "doc"])
            gkeys = df["gkey"].to_numpy()
            ids = df["doc"].to_numpy()
            blks = df["blk"].to_numpy()
            vecs = df["vec"].to_numpy()
            starts = np.append(group_starts(gkeys), len(df))
            for gi in range(len(starts) - 1):
                lo, hi = starts[gi], starts[gi + 1]
                gk = int(gkeys[lo])
                bi, bj = gk // B, gk % B
                V = np.stack(list(vecs[lo:hi])).astype(np.float64, copy=False)
                norms = np.linalg.norm(V, axis=1)
                norms[norms == 0] = 1.0
                Vn = V / norms[:, None]
                if bi == bj:  # diagonal group: pairs within one block
                    m = hi - lo
                    if m < 2:
                        continue
                    C = Vn @ Vn.T
                    iu, ju = np.triu_indices(m, k=1)
                    keep = C[iu, ju] >= cosine_threshold
                    ia, ja = lo + iu[keep], lo + ju[keep]
                    cv = C[iu, ju][keep]
                else:  # off-diagonal: cross product of the two sides
                    side = blks[lo:hi] == bi
                    na = int(side.sum())
                    if na == 0 or na == hi - lo:
                        continue
                    A, Bn = Vn[side], Vn[~side]
                    C = A @ Bn.T
                    iu, ju = np.nonzero(C >= cosine_threshold)
                    ai = (lo + np.flatnonzero(side))[iu]
                    bj_idx = (lo + np.flatnonzero(~side))[ju]
                    # ia/ja already id values here; emit directly
                    src.append(np.minimum(ids[ai], ids[bj_idx]))
                    dst.append(np.maximum(ids[ai], ids[bj_idx]))
                    cos.append(C[iu, ju].astype(np.float64))
                    continue
                a, bidx = ids[ia], ids[ja]
                src.append(np.minimum(a, bidx))
                dst.append(np.maximum(a, bidx))
                cos.append(cv.astype(np.float64))
        return pd.DataFrame(
            {
                "src": pd.Series(
                    np.concatenate(src) if src else [], dtype="int64"
                ),
                "dst": pd.Series(
                    np.concatenate(dst) if dst else [], dtype="int64"
                ),
                "cosine": pd.Series(
                    np.concatenate(cos) if cos else [], dtype="float64"
                ),
            }
        )

    return sorted_apply_exact(rows, "gkey", cross_block)


def embedding_dedup(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 512,
) -> rd.Dataset:
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    Output: (src, dst, cosine) pairs with cosine ≥ threshold that share a
    sign-pattern bucket. Exact within-bucket verification (numpy matmul).
    """
    planes_holder: dict[str, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # fixed-dim embeddings: ONE flatten → reshape, no per-row lists
        # (also unwraps Ray tensor-extension columns; see functions/vectors)
        vecs = vec_matrix(batch[vec_col], n)
        if "p" not in planes_holder:
            rng = np.random.default_rng(seed)
            planes_holder["p"] = rng.standard_normal((vecs.shape[1], num_planes))
        p = planes_holder["p"]
        signs = (vecs @ p) > 0
        # sign pattern → np.packbits → hex chars via nibble lookup: one
        # fixed-width utf8 key per row, no per-row "".join over bits
        packed = np.packbits(signs, axis=1)
        hexchars = np.empty((n, packed.shape[1] * 2), dtype=np.uint8)
        hexchars[:, 0::2] = _HEXD[packed >> 4]
        hexchars[:, 1::2] = _HEXD[packed & 0x0F]
        offsets = offsets32(n, hexchars.shape[1])
        keys = pa.Array.from_buffers(
            pa.utf8(),
            n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexchars.tobytes())],
        )
        return pa.table(
            {
                "doc": batch[id_col],
                "bucket": keys,
                "vec": batch[vec_col],
            }
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow")

    def verify_block(df: pd.DataFrame) -> pd.DataFrame:
        src, dst, cos = [], [], []
        if len(df):
            df = df.drop_duplicates(["bucket", "doc"]).sort_values(["bucket", "doc"])
            buckets = df["bucket"].to_numpy()
            ids = df["doc"].to_numpy()
            vec_col = df["vec"].to_numpy()
            starts = np.append(group_starts(buckets), len(df))
            for gi in range(len(starts) - 1):
                lo, hi = starts[gi], min(starts[gi + 1], starts[gi] + max_bucket)
                n = hi - lo
                if n < 2:
                    continue
                V = np.stack(list(vec_col[lo:hi])).astype(np.float64, copy=False)
                norms = np.linalg.norm(V, axis=1)
                norms[norms == 0] = 1.0
                Vn = V / norms[:, None]
                C = Vn @ Vn.T
                iu, ju = np.triu_indices(n, k=1)
                cv = C[iu, ju]
                mask = cv >= cosine_threshold
                if mask.any():
                    # iu < ju and the bucket is doc-sorted → src < dst
                    bi = ids[lo:hi].astype(np.int64, copy=False)
                    src.append(bi[iu[mask]])
                    dst.append(bi[ju[mask]])
                    cos.append(cv[mask].astype(np.float64, copy=False))
        return pd.DataFrame(
            {
                "src": pd.Series(
                    np.concatenate(src) if src else [], dtype="int64"
                ),
                "dst": pd.Series(
                    np.concatenate(dst) if dst else [], dtype="int64"
                ),
                "cosine": pd.Series(
                    np.concatenate(cos) if cos else [], dtype="float64"
                ),
            }
        )

    return sorted_apply_exact(rows, "bucket", verify_block)
