"""Multimodal column plumbing (north-star extension, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata
structs; all heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched pandas functions over ``mapInPandas`` —
the only sane shape for Python media libs inside Spark.

The decode step itself is STUBBED (this environment has no image/audio
libraries): ``decode_image_meta`` parses real header bytes for PNG/JPEG/GIF
dimensions JVM-feasible-but-done-in-pandas, and ``extract_features`` produces
a deterministic fake embedding. The Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested; swapping the stub for
Pillow/ffmpeg is a one-function change.

Scale notes: media rows are large and skew-prone — ``repartition`` by a hash
of the id before ``mapInPandas`` so a few giant files can't serialize one
task; batches stay bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, n_bytes long"
)
META_SCHEMA = (
    "media_id long, media_type string, n_bytes long, format string, "
    "width int, height int"
)
FEATURE_SCHEMA = "media_id long, feature array<float>"


def to_media_frame(
    df: DataFrame, id_col: str, payload_col: str, media_type: str
) -> DataFrame:
    """Wrap an arbitrary binary column as the canonical media frame."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
    )


def _sniff(payload: bytes | None) -> tuple[str, int, int]:
    """Header-only format/dimension sniffing for PNG/GIF/JPEG; anything else
    is 'unknown'. Real byte parsing — the deterministic part of decode."""
    if not payload:
        return ("empty", -1, -1)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"\xff\xd8":
        return ("jpeg", -1, -1)  # full scan needs a decoder — stubbed
    return ("unknown", -1, -1)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Per-item metadata extraction over mapInPandas (Arrow batches)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmt, w, h = [], [], []
            for payload in pdf["payload"]:
                f_, w_, h_ = _sniff(bytes(payload) if payload is not None else None)
                fmt.append(f_)
                w.append(w_)
                h.append(h_)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "format": fmt,
                    "width": w,
                    "height": h,
                }
            )

    return media.mapInPandas(run, META_SCHEMA)


def _be_int(col: F.Column, pos: int, nbytes: int) -> F.Column:
    """Big-endian unsigned int from a binary slice (1-based byte offset) as a
    pure JVM expression: slice → hex → base-16 conv."""
    return F.conv(F.hex(F.substring(col, pos, nbytes)), 16, 10).cast("int")


def _le_int(col: F.Column, pos: int, nbytes: int) -> F.Column:
    """Little-endian unsigned int: hex the slice, swap the byte pairs."""
    h = F.hex(F.substring(col, pos, nbytes))
    swapped = F.concat(*[
        F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))
    ])
    return F.conv(swapped, 16, 10).cast("int")


def decode_image_meta_expr(media: DataFrame) -> DataFrame:
    """``decode_image_meta`` as pure JVM expressions — NO Python stage.

    Header sniffing is fixed-offset byte math (magic compare + big/little
    endian field reads), which whole-stage codegen evaluates for free inside
    the scan stage; the mapInPandas twin exists as the drop-in template for
    real codecs (Pillow/ffmpeg), which genuinely need Python. Semantics are
    pinned identical to ``_sniff`` by a parity test."""
    p = F.col("payload")
    is_empty = p.isNull() | (F.length(p) == 0)
    is_png = (F.substring(p, 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n")) & (
        F.length(p) >= 24
    )
    is_gif = (
        (F.substring(p, 1, 6) == F.lit(b"GIF87a"))
        | (F.substring(p, 1, 6) == F.lit(b"GIF89a"))
    ) & (F.length(p) >= 10)
    is_jpeg = F.substring(p, 1, 2) == F.lit(b"\xff\xd8")
    fmt = (
        F.when(is_empty, "empty")
        .when(is_png, "png")
        .when(is_gif, "gif")
        .when(is_jpeg, "jpeg")
        .otherwise("unknown")
    )
    width = (
        F.when(is_empty, -1)
        .when(is_png, _be_int(p, 17, 4))
        .when(is_gif, _le_int(p, 7, 2))
        .otherwise(-1)
    )
    height = (
        F.when(is_empty, -1)
        .when(is_png, _be_int(p, 21, 4))
        .when(is_gif, _le_int(p, 9, 2))
        .otherwise(-1)
    )
    return media.select(
        "media_id", "media_type", "n_bytes",
        fmt.alias("format"), width.alias("width"), height.alias("height"),
    )


def decode_audio_meta_expr(media: DataFrame) -> DataFrame:
    """``decode_audio_meta`` (canonical PCM WAV header) as JVM expressions —
    the audio twin of ``decode_image_meta_expr``; parity-tested against
    ``_sniff_audio``."""
    p = F.col("payload")
    is_empty = p.isNull() | (F.length(p) == 0)
    is_wav = (
        (F.length(p) >= 44)
        & (F.substring(p, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(p, 9, 4) == F.lit(b"WAVE"))
        & (F.substring(p, 13, 4) == F.lit(b"fmt "))
        & (_le_int(p, 17, 4) == 16)
        & (F.substring(p, 37, 4) == F.lit(b"data"))
    )
    channels = _le_int(p, 23, 2)
    rate = _le_int(p, 25, 4)
    bits = _le_int(p, 35, 2)
    data_bytes = F.greatest(F.length(p) - 44, F.lit(0)).cast("double")
    bytes_per_ms = (
        rate.cast("double") * channels
        * F.greatest(F.floor(bits / 8), F.lit(1)) / 1000.0
    )
    dur = F.when(bytes_per_ms > 0, F.floor(data_bytes / bytes_per_ms)).otherwise(
        -1
    ).cast("long")
    pick = lambda c: F.when(is_empty | ~is_wav, F.lit(-1)).otherwise(c)  # noqa: E731
    return media.select(
        "media_id", "media_type", "n_bytes",
        F.when(is_empty, "empty").when(is_wav, "wav").otherwise("unknown")
        .alias("format"),
        pick(rate).alias("sample_rate"),
        pick(channels).alias("channels"),
        pick(bits).alias("bits_per_sample"),
        pick(dur).cast("long").alias("duration_ms"),
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor (STUB for a real model/codec):
    embedding[i] = byte-histogram moment i of the payload. Replace the body
    with a real encoder; the Spark plumbing (Arrow batch in, fixed-dim
    array<float> out) is the contract that stays.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    feats.append(np.zeros(dim, dtype="float32"))
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype("float32"))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [f.tolist() for f in feats]}
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize step (STUB for a real scaler): rewrites the PNG header's
    dimension bytes (real byte surgery — the part a codec-backed resize
    would also do) and leaves non-PNG payloads untouched; pixel resampling
    itself needs Pillow and is exactly one line to swap in. Same
    mapInPandas batch contract as ``decode_image_meta``."""
    import pandas as pd

    dims = struct.pack(">II", width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else None
                if b and b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
                    b = b[:16] + dims + b[24:]
                out.append(b)
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, width int, height int, "
    "frame_bytes binary"
)


def fake_frame_decoder(
    payload: bytes | None, every_n: int
) -> list[tuple[int, int, int, int, bytes]]:
    """Deterministic stand-in decoder for environments without a codec:
    treats every 256 payload bytes as one 'frame' at ~30 fps, samples every
    ``every_n``-th, and synthesizes the frame as an md5 of (payload, idx).
    Exercises the REAL plumbing — schema, one-to-many row expansion, Arrow
    batch shapes — with fully reproducible output; a real decoder (PyAV /
    ffmpeg) drops in with the same signature."""
    if not payload:
        return []
    total = len(payload) // 256
    out = []
    for i in range(0, total, max(every_n, 1)):
        fb = hashlib.md5(payload + i.to_bytes(4, "little")).digest()
        out.append((i, i * 33, 16, 16, fb))
    return out


def detect_frame_decoder():
    """Probe the runtime for a real video codec, preferring PyAV (in-process
    libav bindings) over imageio-ffmpeg (subprocess pipe). Returns a
    ``decoder(payload, every_n) -> [(idx, ts_ms, w, h, frame_bytes)]`` or
    ``None`` when no codec library is importable (this container ships
    neither — see SCALE.md 'environment limits')."""
    try:
        import av  # noqa: F401

        def av_decoder(payload, every_n):
            import io

            import av as _av

            if not payload:
                return []
            out = []
            with _av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else 0.0
                for i, frame in enumerate(container.decode(stream)):
                    if i % max(every_n, 1):
                        continue
                    ts_ms = (
                        int(frame.pts * tb * 1000)
                        if frame.pts is not None and tb
                        else i * 33
                    )
                    out.append(
                        (
                            i,
                            ts_ms,
                            frame.width,
                            frame.height,
                            frame.to_ndarray(format="rgb24").tobytes(),
                        )
                    )
            return out

        return av_decoder
    except ImportError:
        pass
    try:
        import imageio_ffmpeg  # noqa: F401

        def ffmpeg_decoder(payload, every_n):
            import os
            import tempfile

            import imageio_ffmpeg as _iio

            if not payload:
                return []
            # the ffmpeg CLI needs a seekable input for most containers
            with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
                f.write(payload)
                tmp = f.name
            try:
                gen = _iio.read_frames(tmp)
                meta = gen.__next__()
                w, h = meta["size"]
                fps = meta.get("fps") or 30.0
                out = []
                for i, frame in enumerate(gen):
                    if i % max(every_n, 1):
                        continue
                    out.append((i, int(i * 1000 / fps), w, h, bytes(frame)))
                return out
            finally:
                os.unlink(tmp)

        return ffmpeg_decoder
    except ImportError:
        return None


def decode_video_frames(
    media: DataFrame, every_n: int = 30, decoder=None
) -> DataFrame:
    """Frame sampling over the standard one-to-many mapInPandas contract:
    each media row expands to its sampled frames ``(media_id, frame_idx,
    ts_ms, width, height, frame_bytes)``.

    ``decoder(payload, every_n)`` supplies the codec; when omitted, the
    runtime is probed (``detect_frame_decoder``: PyAV, then imageio-ffmpeg)
    and, with no codec importable — this container ships none — the call
    honestly raises; pass ``fake_frame_decoder`` (deterministic synthetic
    frames) to run the plumbing end-to-end — which is what the tests pin:
    schema, empty-payload handling, batch fan-out, partition sizing. At
    scale the decode is the cost center: partitions must follow payload
    bytes (``spread`` on the media frame), and frame_bytes should be
    written column-sharded rather than carried through shuffles."""
    if decoder is None:
        decoder = detect_frame_decoder()
    if decoder is None:
        raise NotImplementedError(
            "video decode needs a codec library (pyav or imageio-ffmpeg), "
            "neither importable in this environment; pass "
            "decoder=fake_frame_decoder to exercise the plumbing"
        )
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, ws, hs, fbs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decoder(
                    bytes(payload) if payload is not None else None, every_n
                )
                for idx, ts, w, h, fb in frames:
                    ids.append(mid)
                    idxs.append(idx)
                    tss.append(ts)
                    ws.append(w)
                    hs.append(h)
                    fbs.append(fb)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frame_bytes": fbs,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, VIDEO_FRAMES_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "media_id long, media_type string, n_bytes long, format string, "
    "sample_rate int, channels int, bits_per_sample int, duration_ms long"
)


def _sniff_audio(payload: bytes | None) -> tuple[str, int, int, int, int]:
    """Header-only WAV (RIFF/WAVE fmt chunk) parse — real byte parsing, the
    deterministic half of audio decode; non-WAV payloads are 'unknown'.
    Returns (format, sample_rate, channels, bits_per_sample, duration_ms)."""
    if not payload:
        return ("empty", -1, -1, -1, -1)
    if (
        len(payload) >= 44
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and payload[12:16] == b"fmt "
        # canonical PCM header only: fmt chunk size 16 ⇒ data at offset 44.
        # WAVE_FORMAT_EXTENSIBLE (fmt size 40) would mis-count header bytes
        # as audio data, so it falls through to 'unknown' instead of lying.
        and struct.unpack("<I", payload[16:20])[0] == 16
        and payload[36:40] == b"data"
    ):
        channels, rate = struct.unpack("<HI", payload[22:28])
        bits = struct.unpack("<H", payload[34:36])[0]
        data_bytes = max(len(payload) - 44, 0)
        bytes_per_ms = rate * channels * max(bits // 8, 1) / 1000.0
        dur = int(data_bytes / bytes_per_ms) if bytes_per_ms else -1
        return ("wav", rate, channels, bits, dur)
    return ("unknown", -1, -1, -1, -1)


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """Audio metadata over the same mapInPandas contract as
    ``decode_image_meta``: WAV headers parsed for real (sample rate,
    channels, bit depth, duration); compressed formats (mp3/flac) would slot
    into ``_sniff_audio`` with a codec — the Spark plumbing is unchanged."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in
                    ("format", "sample_rate", "channels", "bits_per_sample",
                     "duration_ms")}
            for payload in pdf["payload"]:
                f_, r_, c_, b_, d_ = _sniff_audio(
                    bytes(payload) if payload is not None else None
                )
                cols["format"].append(f_)
                cols["sample_rate"].append(r_)
                cols["channels"].append(c_)
                cols["bits_per_sample"].append(b_)
                cols["duration_ms"].append(d_)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    **cols,
                }
            )

    return media.mapInPandas(run, AUDIO_META_SCHEMA)
