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
    """Raised for a real-container payload when no codec library is
    installed.  With PIL present `_decode_image` decodes the real
    container instead; the deterministic IMG1 fake decodes either way."""


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
    """bytes -> HxW uint8 grayscale array.

    Dispatch on the container: the deterministic IMG1 fake is always
    decodable (tests stay green with or without codec libraries), and
    any OTHER container goes to PIL when present — real JPEG/PNG/WebP
    payloads decode to grayscale via the actual codec.  Without PIL a
    non-IMG1 payload is a poison row (captured per-row by the callers,
    decoder.rs:138-143 discipline)."""
    if payload is None or len(payload) < 8:
        raise ValueError("payload too short to probe")
    if payload[:4] == b"IMG1":
        w, h = struct.unpack_from("<HH", payload, 4)
        body = np.frombuffer(payload, dtype=np.uint8, offset=8)
        if body.size != w * h:
            raise ValueError(f"truncated payload: {body.size} != {w * h}")
        return body.reshape(h, w)
    if _HAS_PIL:  # pragma: no cover - exercised when PIL is installed
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    raise DecodeStub(
        "non-IMG1 container and no codec library present (install PIL "
        "for real JPEG/PNG decode)"
    )


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


# ---------------------------------------------------------------------------
# Audio: fake PCM container ("AUD1" + <I sample_rate> + int16 samples) with
# REAL feature math — rms, peak, zero-crossing rate are the reference's own
# statistics (true_peak.rs:127-164, dsp.rs analogs); only the container
# parsing is the stand-in for a real decoder.
# ---------------------------------------------------------------------------

def fake_encode_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    s = np.asarray(samples)
    s16 = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    return b"AUD1" + struct.pack("<I", rate) + s16.tobytes()


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """bytes -> (float64 samples in [-1, 1], sample_rate).

    Dispatch on the container: the AUD1 fake for the synthetic
    fixtures, and REAL RIFF/WAVE PCM through the stdlib ``wave``
    module — an actual decode path that runs in CI with no optional
    dependency, mirroring the reference's decode-is-the-trusted-base
    principle (decoder.rs:38-162).  Anything else is a poison row."""
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short to probe")
    if payload[:4] == b"AUD1":
        (rate,) = struct.unpack_from("<I", payload, 4)
        body = np.frombuffer(payload, dtype="<i2", offset=8)
        return body.astype(np.float64) / 32767.0, rate
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
        elif width == 1:  # unsigned 8-bit PCM per the WAV spec
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 127.0
        else:
            raise ValueError(f"unsupported PCM sample width {width}")
        if n_ch > 1:  # downmix: mean over interleaved channels
            x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        return x, rate
    raise ValueError("not an AUD1 or RIFF/WAVE payload")


def audio_features(assets: DataFrame, kind: str = "audio") -> DataFrame:
    """assets -> (asset_id, n_samples, duration_s, rms, peak, zcr, error):
    one mapInPandas pass, vectorized numpy per payload, poison rows
    captured per-row.  rms/peak/zcr are the real statistics the reference
    computes over decoded frames — the fake is only the container."""

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    x, rate = _decode_audio(
                        bytes(payload) if payload is not None else None
                    )
                    if x.size == 0:
                        raise ValueError("empty audio payload")
                    zc = int(np.count_nonzero(np.diff(np.signbit(x))))
                    rows.append((
                        aid, int(x.size), float(x.size / rate),
                        float(np.sqrt(np.mean(x * x))),
                        float(np.abs(x).max()),
                        float(zc / max(x.size - 1, 1)), None,
                    ))
                except Exception as e:  # noqa: BLE001 - poison-row capture
                    rows.append((aid, None, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "duration_s", "rms",
                         "peak", "zcr", "error"],
            )

    return (
        assets.where(F.col("kind") == kind)
        .select("asset_id", "payload")
        .mapInPandas(
            run,
            schema="asset_id long, n_samples long, duration_s double, "
                   "rms double, peak double, zcr double, error string",
        )
    )


# ---------------------------------------------------------------------------
# Image near-dup: average-hash (aHash) perceptual fingerprint — downscale
# to 8x8 means, threshold at the mean, pack 64 bits — then reuse the
# SimHash pigeonhole banding for the hamming pair search.  A complete
# image-dedup pipeline on the multimodal table: decode happens ONCE per
# payload; everything after the 8-byte fingerprint is JVM-side.
# ---------------------------------------------------------------------------

def image_ahash(assets: DataFrame, kind: str = "image") -> DataFrame:
    """(asset_id, ahash long): 64-bit average-hash per decodable image;
    undecodable payloads are skipped (they are decode_features' errors)."""

    def run(batches):
        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = _decode_image(
                        bytes(payload) if payload is not None else None
                    )
                except Exception:  # noqa: BLE001
                    continue
                h, w = img.shape
                if h < 8 or w < 8:
                    continue
                # 8x8 region means, fully vectorized: two reduceat passes
                # sum the grid cells (exact integer sums), one divide by
                # the per-cell areas — identical values to per-cell
                # .mean() slicing, no per-image Python loop
                ys = (np.arange(9) * h // 8)
                xs = (np.arange(9) * w // 8)
                col_sums = np.add.reduceat(
                    img.astype(np.int64), xs[:-1], axis=1
                )
                cell_sums = np.add.reduceat(col_sums, ys[:-1], axis=0)
                areas = np.outer(np.diff(ys), np.diff(xs))
                cells = cell_sums / areas
                bits = (cells > cells.mean()).ravel()
                val = (
                    bits.astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)
                ).sum(dtype=np.uint64)
                ids.append(aid)
                hashes.append(np.int64(val.view(np.int64)))
            yield pd.DataFrame({"asset_id": ids, "simhash": hashes})

    return (
        assets.where(F.col("kind") == kind)
        .select("asset_id", "payload")
        .mapInPandas(run, schema="asset_id long, simhash long")
    )


def image_near_dups(assets: DataFrame, max_hamming: int = 5) -> DataFrame:
    """(id_a, id_b, hamming): visually near-identical image pairs via
    aHash + the same pigeonhole banding as text SimHash — complete recall
    for the advertised radius, no all-pairs stage."""
    from audio_quality_checker_spark.operators.dedup import (
        simhash_pairs_from_sigs,
    )

    sigs = image_ahash(assets)
    sigs.persist()
    sigs.count()  # eager: the bucket self-join references sigs twice
    return simhash_pairs_from_sigs(sigs, "asset_id", max_hamming)
