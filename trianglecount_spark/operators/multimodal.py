"""Multimodal column plumbing (images/audio/video as opaque binary).

The container has no codec libraries, so the DECODE step is stubbed —
either a clearly-marked NotImplementedError (``decode_image``) or a
deterministic fake decoder (``fake_image_features``) — but everything
Spark-side is real and tested: the schema, the Arrow batch shape, the
``mapInPandas`` signature, and the partitioning story (binary payloads
never shuffle through a groupBy — feature extraction is a narrow map).

Schema convention:
    media(media_id long, kind string, payload binary,
          meta map<string,string>)
with typed per-kind metadata in ``meta`` (width/height/sample_rate/...).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"

_REAL_DECODERS_AVAILABLE = False
try:  # gate optional codec libs behind an import-try (none in this container)
    import PIL.Image  # noqa: F401

    _REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


def decode_image(media: DataFrame, thumb: tuple[int, int] = (8, 8)) -> DataFrame:
    """Real image decode behind the OPTIONAL PIL dependency: image rows
    → ``media_id, width, height, ok, thumb`` where ``thumb`` is the
    RGB pixel grid of a ``thumb``-sized resize, row-major, scaled to
    [0, 1] float32 — the canonical pre-featurizer payload. Undecodable
    payloads yield ``ok=false`` with empty thumb (a curation pipeline
    filters, never crashes, on corrupt bytes).

    Raises NotImplementedError when PIL is absent (this container ships
    no codec libraries — the pytest uses importorskip and is green
    where PIL exists, cleanly skipped otherwise); the Arrow batch
    plumbing is identical to ``fake_image_features``, the always-tested
    path. Same narrow-map scale shape: binary payloads never shuffle.
    """
    if not _REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image decoding requires PIL/libvips, not present in this "
            "container; use fake_image_features for the plumbing path"
        )
    tw, th = thumb

    def run(it):
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "ok": [], "thumb": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = Image.open(io.BytesIO(bytes(b)))
                    img.load()
                    w, h = img.size
                    t = (
                        np.asarray(
                            img.convert("RGB").resize((tw, th)), dtype=np.float32
                        )
                        / 255.0
                    )
                    feats = t.ravel().tolist()
                    ok = True
                except Exception:
                    w = h = 0
                    feats = []
                    ok = False
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["ok"].append(ok)
                out["thumb"].append(feats)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(
        run,
        schema="media_id long, width int, height int, ok boolean, thumb array<float>",
    )


def fake_image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake 'decoder': payload bytes → feature vector in
    [0, 1), exercising the exact Arrow batch shape a real CNN/CLIP
    featurizer would use. ``media_id, kind, features``.

    feature[i] = u32le(sha256(payload) repeated, bytes 4i..4i+3) / 2³²
    — every arithmetic step (u32 assembly, division by a power of two,
    float32 cast) is exact-or-correctly-rounded and order-independent,
    so any engine with sha256 reproduces the values bit-for-bit (the
    driver gate's DuckDB oracle does)."""

    def run(it):
        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                h = hashlib.sha256(bytes(b)).digest()
                v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
                feats.append((v.astype(np.float64) / 2**32).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema="media_id long, kind string, features array<float>")


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for
    frames a real decoder would extract — metadata-driven (n_frames in
    ``meta``), so the expensive decode fan-out is an explode, planned and
    partitioned by Spark, not a driver loop."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.element_at("meta", "n_frames").cast("int"), F.lit(1)) - 1,
                    F.lit(0),
                ),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads + typed meta)."""
    ids = spark.range(0, n, 1)

    def gen(it):
        for pdf in it:
            rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ["image", "audio", "video"][mid % 3]
                payload = hashlib.sha256(f"{seed}:{mid}".encode()).digest() * (1 + mid % 4)
                meta = {"bytes": str(len(payload))}
                if kind == "image":
                    meta.update(width="64", height="48")
                elif kind == "audio":
                    meta.update(sample_rate="16000")
                else:
                    meta.update(n_frames=str(30 + mid))
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)
