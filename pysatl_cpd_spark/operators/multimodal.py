"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; all
heavy per-item work (decode, resize, feature-extract, frame-sample) runs as
Arrow-batched ``mapInPandas`` so payload bytes never inflate on the JVM side
beyond the Arrow batch. Image decode (``real_decode=True``) prefers Pillow
and falls back to the repo's pure-python PNG codec (operators/png.py), so
the real branch executes even in this container; audio/video decode and
non-PNG image formats remain env-gated NotImplementedError. ``fake_decode``
deterministically derives pseudo-pixels from the payload hash and stays the
default (and the SQL-oracle) path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "item_id long, kind string, payload binary, mime string, width int, "
    "height int, duration_s double"
)

FEATURE_SCHEMA = "item_id long, kind string, n_bytes long, sha string, feature array<float>"


def synthesize_media(
    spark, n_items: int = 64, seed: int = 42, real_png: bool = False
) -> DataFrame:
    """Deterministic fake media table with a *portable* payload construction:
    payload = ASCII bytes of a chained md5 hex string (block j =
    md5(f"{seed}:{i}:{j}")) truncated to n_bytes = 64 +
    (int(md5(f"{seed}:{i}:len")[:8], 16) % 1984). Pure md5/substr arithmetic a
    SQL oracle reproduces bit-for-bit, while the bytes still exercise the real
    binary-column plumbing (Arrow batches, mapInPandas).

    With ``real_png=True``, image items instead carry a REAL compressed PNG
    (deterministic gradient pixels seeded from md5) so the real-decode branch
    can run end-to-end in-sandbox; audio/video payloads are unchanged. The
    default (and the multimodal_features oracle) stays the md5-text payload.
    """

    def _h(tag: str) -> str:
        return hashlib.md5(tag.encode()).hexdigest()

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_items):
        kind = kinds[i % 3]
        n_bytes = 64 + int(_h(f"{seed}:{i}:len")[:8], 16) % 1984
        body = "".join(_h(f"{seed}:{i}:{j}") for j in range((n_bytes + 31) // 32))
        payload = body[:n_bytes].encode("ascii")
        png_dims = None
        if real_png and kind == "image":
            from pysatl_cpd_spark.operators.png import encode_png

            w0 = 4 + int(_h(f"{seed}:{i}:pw")[:2], 16) % 28
            h0 = 4 + int(_h(f"{seed}:{i}:ph")[:2], 16) % 28
            base = int(_h(f"{seed}:{i}:px")[:2], 16)
            yy, xx = np.mgrid[0:h0, 0:w0]
            pix = np.stack(
                [
                    (xx * 7 + base) % 256,
                    (yy * 11 + base) % 256,
                    (xx + yy + base) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            payload = encode_png(pix)
            png_dims = (w0, h0)  # metadata must describe the actual payload
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                png_dims[0]
                if png_dims
                else (16 + int(_h(f"{seed}:{i}:w")[:4], 16) % 496 if kind != "audio" else None),
                png_dims[1]
                if png_dims
                else (16 + int(_h(f"{seed}:{i}:h")[:4], 16) % 496 if kind != "audio" else None),
                0.5 + (int(_h(f"{seed}:{i}:d")[:4], 16) % 29500) / 1000.0
                if kind != "image"
                else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _try_real_decode(payload: bytes) -> np.ndarray:
    """Decode an image payload to a uint8 pixel array (h, w, ch). Prefers
    Pillow (the production decoder: every format, SIMD); falls back to the
    repo's pure-python PNG codec (operators/png.py) so the real-decode
    branch is executable in this container, where Pillow is absent. Raises
    NotImplementedError for formats neither path can handle."""
    pillow_err: Exception | None = None
    try:  # pragma: no cover - Pillow not in this container
        import io

        from PIL import Image, UnidentifiedImageError

        try:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except (UnidentifiedImageError, OSError, ValueError) as exc:
            # corrupt/non-image payload: fall through to the pure codec so
            # the error surface (NotImplementedError with a stable message)
            # is environment-independent — tests match on it in Pillow-
            # present environments too. ONLY the known decode errors are
            # caught (not a blanket Exception, which would swallow e.g.
            # MemoryError), and the original is chained into the fallback
            # error below so the root cause survives in logs.
            pillow_err = exc
    except ImportError:
        pass
    from pysatl_cpd_spark.operators.png import decode_png

    try:
        px = decode_png(payload)
        # normalize to RGB exactly like the Pillow path's convert("RGB"):
        # greyscale replicates, RGBA drops alpha — same payload must yield
        # the same pixel array on every executor regardless of which decode
        # path that executor has available
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        elif px.shape[2] == 4:
            px = px[:, :, :3]
        return px
    except ValueError as exc:
        raise NotImplementedError(
            f"real decode: payload is not a PNG this codec handles and "
            f"Pillow is unavailable ({exc})"
        ) from (pillow_err or exc)


def pixels_to_feature(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic feature from DECODED pixels: per-channel mean/std in
    [0, 1] followed by evenly-spaced luma samples, padded/truncated to
    ``dim`` float32s. Same pixels -> same feature on any executor."""
    px = pixels.astype(np.float32) / 255.0
    if px.ndim == 2:
        px = px[:, :, None]
    chans = [px[:, :, c] for c in range(px.shape[2])]
    head = []
    for c in chans:
        head.extend([float(c.mean()), float(c.std())])
    luma = px.mean(axis=2).ravel()
    idx = np.linspace(0, luma.size - 1, max(dim - len(head), 0)).astype(np.int64)
    vec = np.asarray(head + list(luma[idx]), dtype=np.float32)[:dim]
    if vec.size < dim:
        vec = np.pad(vec, (0, dim - vec.size))
    return vec


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: expand the sha1 of
    the payload into ``dim`` floats in [0, 1). Same payload → same feature on
    any executor."""
    digest = hashlib.sha1(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, dim: int = 16, real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves the
    payload bytes in columnar batches; each batch is processed vectorized-ish
    (hashing per item — the genuinely per-item part)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                shas.append(hashlib.sha256(data).hexdigest())
                if real_decode:
                    feats.append(pixels_to_feature(_try_real_decode(data), dim))
                else:
                    feats.append(fake_decode(data, dim))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "sha": shas,
                    "feature": feats,
                }
            )

    pruned = media.select("item_id", "kind", "payload")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "item_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "item_id long, frame_idx int, frame_ts double, frame binary"


def resize_thumbnails(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize plumbing: emit a per-item thumbnail payload with aspect-ratio
    scaled dimensions. The pixel resample itself is env-gated (no Pillow in
    this container) — the deterministic stand-in derives thumb bytes from the
    payload hash so schema/batching/partitioning are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, w, h, payload in zip(
                pdf["item_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                if w is None or h is None or pd.isna(w) or pd.isna(h):
                    continue
                # never upscale: a "thumbnail" larger than the source would
                # allocate unboundedly for large max_side
                scale = min(1.0, max_side / max(int(w), int(h), 1))
                tw, th = max(1, round(int(w) * scale)), max(1, round(int(h) * scale))
                seed = hashlib.sha256(bytes(payload)).digest()
                thumb = (seed * ((tw * th) // len(seed) + 1))[: tw * th]
                rows.append((int(item_id), tw, th, thumb))
            yield pd.DataFrame(rows, columns=["item_id", "width", "height", "thumb"])

    return media.select("item_id", "width", "height", "payload").mapInPandas(
        run, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video items: one output row per sampled
    frame at ``fps`` up to ``max_frames``, frame payload derived
    deterministically from (payload hash, frame index) — the real decoder
    slots in behind the same mapInPandas signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, kind, dur, payload in zip(
                pdf["item_id"], pdf["kind"], pdf["duration_s"], pdf["payload"]
            ):
                if kind != "video" or dur is None or pd.isna(dur):
                    continue
                n = min(max_frames, max(1, int(float(dur) * fps)))
                base = hashlib.sha256(bytes(payload)).digest()
                for i in range(n):
                    frame = hashlib.sha256(base + i.to_bytes(4, "big")).digest()
                    rows.append((int(item_id), i, i / fps, frame))
            yield pd.DataFrame(
                rows, columns=["item_id", "frame_idx", "frame_ts", "frame"]
            )

    return media.select("item_id", "kind", "duration_s", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )
