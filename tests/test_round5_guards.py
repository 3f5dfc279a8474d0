"""Round-5 guard rails: loud failures for silent-corruption edge cases.

Covers the four ADVICE findings (int32 offset overflow, num_hashes <
num_bands, all-null signature columns, cosine-threshold margin) plus the
groupagg unbounded-remainder census and the self-upgrading multimodal
codec probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from semanticizer_ray.functions.minhash import band_hashes, batch_band_hashes
from semanticizer_ray.stages.blocking import offsets32, sig_matrix


def test_offsets32_small_and_overflow():
    offs = offsets32(3, 16)
    assert offs.dtype == np.int32
    assert list(offs) == [0, 16, 32, 48]
    # count*width past int32 must raise, never wrap into negative offsets
    with pytest.raises(ValueError, match="overflows int32"):
        offsets32(2**28, 16)  # 4 GiB of payload


def test_sig_matrix_rejects_nulls_and_zero_width():
    ok = pa.array([b"\x01" * 16, b"\x02" * 16], pa.binary())
    assert sig_matrix(ok, 2).shape == (2, 2)
    with pytest.raises(ValueError, match="null"):
        sig_matrix(pa.array([b"\x01" * 16, None], pa.binary()), 2)
    with pytest.raises(ValueError, match="zero-width"):
        sig_matrix(pa.array([b"", b""], pa.binary()), 2)
    # empty batch stays fine
    assert sig_matrix(pa.array([], pa.binary()), 0).shape == (0, 0)


def test_band_hashes_reject_fewer_hashes_than_bands():
    sig = np.arange(8, dtype=np.uint64)
    with pytest.raises(ValueError, match="num_bands"):
        band_hashes(sig, 16)
    with pytest.raises(ValueError, match="num_bands"):
        batch_band_hashes(sig.reshape(1, 8), 16)
    # an empty matrix passes through (no rows to mis-bucket)
    assert batch_band_hashes(np.empty((0, 0), dtype=np.uint64), 16).shape == (0, 16)


def test_blocking_config_validates_bands():
    from semanticizer_ray.config import BlockingConfig

    with pytest.raises(ValueError, match="num_bands"):
        BlockingConfig(num_hashes=8, num_bands=16)


def test_groupagg_remainder_census_fires_and_stays_exact(
    ray_session, monkeypatch, capsys
):
    import ray.data as rd

    from semanticizer_ray.functions import groupagg

    # shrink the gates so a 600-row degenerate key trips the census
    monkeypatch.setattr(groupagg, "REMAINDER_DRIVER_GATE", 20)
    monkeypatch.setattr(groupagg, "REMAINDER_CENSUS_FACTOR", 2)

    df = pd.DataFrame({"k": ["hot"] * 600 + ["a", "b"], "v": range(602)})
    ds = rd.from_pandas(df).repartition(8)

    def agg(block: pd.DataFrame) -> pd.DataFrame:
        if len(block) == 0:
            return pd.DataFrame({"k": pd.Series(dtype=object), "n": pd.Series(dtype="int64")})
        return block.groupby("k", sort=False).size().reset_index(name="n")

    got = (
        groupagg.sorted_apply_exact(ds, "k", agg)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    err = capsys.readouterr().err
    assert "WARNING: remainder holds" in err and "hot" in err
    want = df.groupby("k").size().reset_index(name="n").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_embedding_dup_pairs_exact_margin_guard(ray_session, tmp_path):
    """A pair whose cosine sits within float noise of the 0.4 gate must be
    REFUSED (platform/BLAS-dependent set membership), not silently emitted."""
    import pyarrow.parquet as pq

    from semanticizer_ray.pipelines.catalog import embedding_dup_pairs_exact

    d = tmp_path / "sf_margin"
    d.mkdir()
    # cosine(v0, v1) == 0.4 up to 1e-16: inside the ±1e-6 refusal band
    vecs = [[1.0, 0.0], [0.4, float(np.sqrt(0.84))], [-1.0, 0.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    with pytest.raises(ValueError, match="threshold gap"):
        embedding_dup_pairs_exact(str(d))


def test_decode_features_real_mode_probes_codecs(ray_session):
    """fake=False probes Pillow/soundfile at actor init; with neither
    installed (this sandbox) the decode raises naming the dependency."""
    import ray.data as rd

    from semanticizer_ray.stages.multimodal import (
        DecodeFeatures,
        decode_features,
        synth_media_table,
    )

    stage = DecodeFeatures(fake=False)
    if stage._pil is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            stage._decode(b"\x00" * 16, "image")
    else:  # a real deploy with Pillow: the stub self-upgrades
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (16, 16), 128).save(buf, format="PNG")
        feats = stage._decode(buf.getvalue(), "image")
        assert feats.shape == (8,)
    # fake mode plumbing unchanged either way
    out = decode_features(rd.from_arrow(synth_media_table(16)), fake=True).to_pandas()
    assert len(out) == 16 and out["features"].map(len).eq(8).all()


def test_knn_ingest_zero_copy_matches_listpath(ray_session):
    """The flatten→reshape fast path and the to_pylist fallback must agree
    (fixed-dim vs ragged list columns)."""
    from semanticizer_ray.stages.similarity import _ids_and_vecs

    tbl = pa.table(
        {
            "vec_id": pa.array([7, 8, 9], pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float32())
            ),
        }
    )
    ids, V = _ids_and_vecs(tbl, "vec_id", "embedding")
    assert list(ids) == [7, 8, 9]
    np.testing.assert_allclose(V, [[1, 2], [3, 4], [5, 6]])
    assert V.dtype == np.float64

def test_vec_matrix_tensor_extension_and_null_guard(ray_session):
    """rd.from_pandas with ndarray cells yields Ray's Arrow tensor-extension
    column; vec_matrix must unwrap its storage (found live in r5 verify).
    Null rows must raise loudly, never silently misalign a reshape."""
    import pandas as pd
    import ray.data as rd

    from semanticizer_ray.functions.vectors import vec_matrix

    V = np.arange(12, dtype=np.float64).reshape(4, 3)
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64), "embedding": list(V)})
    batch = rd.from_pandas(df).take_batch(4, batch_format="pyarrow")
    np.testing.assert_array_equal(vec_matrix(batch["embedding"], 4), V)

    nulled = pa.table(
        {"embedding": pa.array([[1.0, 2.0], None, [3.0, 4.0]], pa.list_(pa.float64()))}
    )
    with pytest.raises(ValueError, match="null"):
        vec_matrix(nulled["embedding"], 3)
