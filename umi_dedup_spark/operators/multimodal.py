"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata (training-data-pipeline surface).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested, and so are three codecs implemented in
pure numpy (no external media libraries in this container):

* images: binary PPM (P6) — parse, decode to (h, w, 3) uint8, resize
  (area/nearest box sampling), re-encode;
* audio: RIFF/WAVE PCM 16-bit mono/stereo — parse to float samples,
  windowed RMS-energy + zero-crossing feature vector;
* video: PPMV (header + concatenated P6 frames, this module's
  deterministic container) — parse, per-frame decode, frame sampling
  (``sample_frames``), mean-over-sampled-frames feature vector.

PIL is used for non-PPM images when importable (it is not baked into this
container); payloads no codec understands fall back to a deterministic
digest-projection feature, clearly flagged by ``decoded=False`` so a
caller can never mistake the fallback for a real decode.

Pattern: ``mapInPandas`` over batches of (id, media, meta) so one Python
worker invocation amortizes Arrow transfer across the whole batch, and
wide binary columns never pass through a shuffle — feature extraction is
a narrow map, only the (small) feature vectors shuffle afterwards.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha long, decoded boolean, "
    "feature array<float>"
)


def decode_available() -> bool:
    """True: the pure-numpy PPM/WAV codecs below are always present.
    (Retained for API compatibility; per-payload success is reported via
    the ``decoded`` output column.)"""
    return True


# ------------------------------------------------------------ PPM codec
def _parse_ppm_at(payload: bytes, offset: int) -> tuple[np.ndarray, int] | None:
    """Parse one binary PPM (P6) image starting at ``offset``; returns
    (image (h, w, 3) uint8, end offset) or None if not a valid P6 PPM."""
    if payload is None or payload[offset : offset + 2] != b"P6":
        return None
    try:
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
        # comments (# ... \n) allowed between tokens
        pos = offset + 2
        fields: list[int] = []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        need = w * h * 3
        if pos + need > len(payload):
            return None
        data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        return data.reshape(h, w, 3).copy(), pos + need
    except (ValueError, IndexError):
        return None


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Decode a binary PPM (P6) payload to an (h, w, 3) uint8 array.
    Returns None if the payload is not a valid P6 PPM."""
    if payload is None:
        return None
    parsed = _parse_ppm_at(bytes(payload), 0)
    return parsed[0] if parsed else None


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def resize_array(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Box-sample resize: each output pixel averages its source box
    (degenerates to nearest-neighbor on upscale). Pure numpy — one
    fancy-index gather + mean, no per-pixel Python."""
    h, w = img.shape[:2]
    # source boxes: integer edges of the |height| x |width| grid
    ys = (np.arange(height + 1) * h) // height
    xs = (np.arange(width + 1) * w) // width
    out = np.empty((height, width, img.shape[2]), dtype=np.float64)
    # cumulative-sum integral image -> box means in O(hw)
    integ = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    integ = np.pad(integ, ((1, 0), (1, 0), (0, 0)))
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    out = (
        integ[np.ix_(y1, x1)] - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)] + integ[np.ix_(y0, x0)]
    ) / area[:, :, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- PPMV codec
# Deterministic video container for this environment (no media libraries
# in the sandbox): "PPMV" + <u32 n_frames> + <u32 fps> + concatenated
# binary P6 PPM frames. The decode/sample/feature paths below are REAL
# parsers over it — swap decode_ppmv for a pyav/ffmpeg binding at
# deployment and every downstream operator is unchanged.
def encode_ppmv(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames as a PPMV payload."""
    body = b"".join(encode_ppm(f) for f in frames)
    return b"PPMV" + struct.pack("<II", len(frames), fps) + body


def decode_ppmv(payload: bytes) -> tuple[list[np.ndarray], int] | None:
    """Decode a PPMV payload to (frames, fps); None if not valid PPMV."""
    if payload is None or len(payload) < 12 or bytes(payload[:4]) != b"PPMV":
        return None
    raw = bytes(payload)
    n, fps = struct.unpack_from("<II", raw, 4)
    if fps <= 0 or n <= 0:
        return None
    pos = 12
    frames: list[np.ndarray] = []
    for _ in range(n):
        parsed = _parse_ppm_at(raw, pos)
        if parsed is None:
            return None
        frame, pos = parsed
        frames.append(frame)
    return frames, fps


# ------------------------------------------------------------ WAV codec
def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a RIFF/WAVE PCM-16 payload to (samples float64 in [-1, 1]
    mono-mixed, sample_rate). Returns None if not a valid PCM-16 WAV."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if fmt is None or data is None:
            return None
        audio_format, n_channels, sample_rate, _, _, bits = fmt
        if audio_format != 1 or bits != 16 or n_channels < 1:
            return None
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float64) / 32768.0
        if n_channels > 1:
            usable = (len(samples) // n_channels) * n_channels
            samples = samples[:usable].reshape(-1, n_channels).mean(axis=1)
        return samples, sample_rate
    except (struct.error, ValueError):
        return None


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono float samples in [-1, 1] as a PCM-16 WAV payload."""
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


# ----------------------------------------------------- feature kernels
def _image_features(img: np.ndarray, n_dims: int) -> np.ndarray:
    """Real image feature: per-channel mean/std + an (n_dims-6)-cell
    grayscale thumbnail, vectorized."""
    stats = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
    side = max(int(np.sqrt(max(n_dims - 6, 1))), 1)
    thumb = resize_array(img, side, side).mean(axis=2).ravel()
    out = np.concatenate([stats, thumb])[:n_dims]
    return np.pad(out, (0, n_dims - len(out))).astype(np.float32)


def _audio_features(samples: np.ndarray, rate: int, n_dims: int) -> np.ndarray:
    """Real audio feature: windowed RMS energy + zero-crossing rate."""
    k = max(n_dims // 2, 1)
    n = len(samples)
    if n == 0:
        return np.zeros(n_dims, dtype=np.float32)
    edges = (np.arange(k + 1) * n) // k
    rms = np.empty(k)
    zcr = np.empty(k)
    sq = np.concatenate([[0.0], np.cumsum(samples**2)])
    zc = np.concatenate([[0.0], np.cumsum(np.abs(np.diff(np.signbit(samples))).astype(float)), [0.0]])[: n + 1]
    for i in range(k):
        a, b = edges[i], max(edges[i + 1], edges[i] + 1)
        rms[i] = np.sqrt((sq[min(b, n)] - sq[a]) / max(min(b, n) - a, 1))
        zcr[i] = (zc[min(b, n)] - zc[a]) / max(min(b, n) - a, 1)
    out = np.concatenate([rms, zcr])[:n_dims]
    return np.pad(out, (0, n_dims - len(out))).astype(np.float32)


def _digest_features(payload: bytes, n_dims: int = 16) -> np.ndarray:
    """Deterministic fallback for payloads no codec understands: a seeded
    projection of the payload digest. NOT a decode — rows taking this path
    are flagged decoded=False."""
    if payload is None:
        return np.zeros(n_dims, dtype=np.float32)
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
    return rng.normal(size=n_dims).astype(np.float32)


def _decode_features(payload: bytes, kind: str, n_dims: int) -> tuple[bool, np.ndarray]:
    if kind == "image":
        img = decode_ppm(payload)
        if img is None:
            try:  # PIL for non-PPM formats, when present
                import io

                from PIL import Image

                img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            except Exception:
                img = None
        if img is not None:
            return True, _image_features(img, n_dims)
    elif kind == "audio":
        wav = decode_wav(payload)
        if wav is not None:
            return True, _audio_features(wav[0], wav[1], n_dims)
    elif kind == "video":
        vid = decode_ppmv(payload)
        if vid is not None:
            frames, _fps = vid
            step = max(len(frames) // 4, 1)  # sample <= ~4 frames
            sampled = frames[::step]
            feat = np.mean(
                [_image_features(f, n_dims) for f in sampled], axis=0
            )
            return True, feat.astype(np.float32)
    return False, _digest_features(payload, n_dims)


def extract_features(media: DataFrame, n_dims: int = 16) -> DataFrame:
    """Decode/feature-extract via mapInPandas (batch-at-a-time Arrow).
    ``decoded`` is True iff a real codec parsed the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded, feats = [], []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                ok, f = _decode_features(p, k, n_dims)
                decoded.append(ok)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha": [
                        int.from_bytes(
                            hashlib.blake2b(p or b"", digest_size=8).digest(),
                            "little",
                            signed=True,
                        )
                        for p in pdf["payload"]
                    ],
                    "decoded": decoded,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every decodable image payload to (width, height) — real
    pure-numpy PPM decode -> box-sample resize -> PPM re-encode. Payloads
    that fail to decode raise (a silent pass-through would corrupt the
    'all rows resized' contract); filter on extract_features().decoded
    first if the corpus may contain undecodable blobs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p in pdf["payload"]:
                img = decode_ppm(p)
                if img is None:
                    raise ValueError(
                        "resize_images: payload is not a decodable P6 PPM"
                    )
                out_payload.append(encode_ppm(resize_array(img, width, height)))
                out_w.append(width)
                out_h.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": pd.array(out_w, dtype="int32"),
                    "height": pd.array(out_h, dtype="int32"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts) rows from
    metadata — timestamp expansion is JVM-side; the per-frame decode path
    is ``sample_frames`` below."""
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms int, payload binary, "
    "width int, height int"
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode each PPMV video payload and emit every
    ``every_n``-th frame as a standalone P6 PPM image row (feedable to
    extract_features / resize_images). Undecodable video payloads are
    skipped (0 rows), mirroring extract_features' decoded=False contract.
    mapInPandas: wide binary in, wide binary out, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, tss, pays, ws, hs = [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                vid = decode_ppmv(p)
                if vid is None:
                    continue
                frames, fps = vid
                for i in range(0, len(frames), max(every_n, 1)):
                    f = frames[i]
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(i * 1000 // fps)
                    pays.append(encode_ppm(f))
                    hs.append(f.shape[0])
                    ws.append(f.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ts_ms": pd.array(tss, dtype="int32"),
                    "payload": pays,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: P6 PPM images and
    PCM-16 WAV audio (synthesized tones), plus opaque video blobs."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w = h = dur = None
        if kind == "image":
            w, h = int(rng.randint(4, 24)), int(rng.randint(4, 24))
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_ppm(img)
        elif kind == "audio":
            rate = 8000
            t = np.arange(int(rng.randint(400, 2000))) / rate
            freq = float(rng.randint(100, 1000))
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
        elif i % 6 == 5:
            # opaque blob: exercises the decoded=False fallback path
            dur = int(rng.randint(1000, 60000))
            payload = rng.bytes(64 + int(rng.randint(0, 64)))
        else:
            # real decodable PPMV video: 3-8 small frames
            fps = 10
            n_frames = int(rng.randint(3, 9))
            w, h = int(rng.randint(4, 12)), int(rng.randint(4, 12))
            frames = [
                rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            payload = encode_ppmv(frames, fps)
            dur = n_frames * 1000 // fps
            w = h = None
        rows.append((i, kind, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
