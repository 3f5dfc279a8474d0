"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with struct
metadata; decode / feature-extract stages are actor-pool ``map_batches``
with REAL Ray-side plumbing (schema, batch sizing, actor signature, output
layout) and STUBBED codecs — the sandbox has no image/audio libraries, so
the decode kernel is either a deterministic fake (for tests) or raises
``NotImplementedError`` with the library it would use.

At scale: binary rows are wide → callers should lower ``batch_size`` (a
batch × concurrency must fit the worker heap) and keep these stages in
``batch_format="pyarrow"`` (binary round-trips pandas as object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                            ("sample_rate", pa.int32()), ("n_frames", pa.int32())])),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    meta = [
        {"width": 64 + i % 32, "height": 48 + i % 32, "sample_rate": 16000, "n_frames": 10 + i % 5}
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types, pa.string()),
            "meta": pa.array(meta, MEDIA_SCHEMA.field("meta").type),
        }
    )


class DecodeFeatures:
    """Actor-pool decode + feature-extract stage.

    ``fake=True`` → deterministic digest-based feature vector (tests the
    full Ray plumbing). ``fake=False`` → probes the optional codec
    libraries ONCE per actor (``__init__``): if Pillow / soundfile are
    installed the decode is real (grayscale thumbnail column means for
    images, per-chunk RMS for audio), otherwise it raises
    ``NotImplementedError`` naming the dependency — so the stub
    self-upgrades on a real deploy with no code change.
    """

    def __init__(self, feature_dim: int = 8, fake: bool = True):
        self.dim = feature_dim
        self.fake = fake
        self._pil = self._sf = None
        if not fake:  # import probe once per actor, never per batch
            try:
                from PIL import Image  # type: ignore[import-not-found]

                self._pil = Image
            except ImportError:
                pass
            try:
                import soundfile  # type: ignore[import-not-found]

                self._sf = soundfile
            except ImportError:
                pass

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        import io

        if media_type == "image" and self._pil is not None:
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            px = np.asarray(img.resize((self.dim, self.dim)), dtype=np.float64)
            return px.mean(axis=0) / 255.0
        if media_type == "audio" and self._sf is not None:
            data, _rate = self._sf.read(io.BytesIO(payload), dtype="float64")
            mono = data.mean(axis=1) if data.ndim > 1 else data
            chunks = np.array_split(mono, self.dim)
            return np.array(
                [float(np.sqrt((c**2).mean())) if len(c) else 0.0 for c in chunks]
            )
        raise NotImplementedError(
            f"real {media_type} decode requires "
            + {"image": "Pillow", "audio": "soundfile", "video": "pyav"}[media_type]
            + "; not installed in this environment"
        )

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            return self._decode_real(payload, media_type)
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: self.dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float64) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, t).tolist()
            for p, t in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array(feats, pa.list_(pa.float64())),
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
            }
        )


def decode_features(
    ds: rd.Dataset, feature_dim: int = 8, fake: bool = True,
    batch_size: int = 256, concurrency: int = 4,
) -> rd.Dataset:
    """Run the decode/feature actor pool; small batches for wide rows."""
    return ds.map_batches(
        DecodeFeatures,
        fn_constructor_args=(feature_dim, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
