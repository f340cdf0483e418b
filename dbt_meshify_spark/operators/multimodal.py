"""Multimodal column plumbing (N5): opaque binary payloads + typed metadata.

Decode kernels are REAL for the codec-free container formats — PPM (P6)
images parse and nearest-neighbor-resample in numpy, PCM WAV audio parses
with the stdlib ``wave`` module — so decode → resize → feature runs end to
end on genuine media bytes. Library formats (JPEG/PNG/MP4...) stay gated
behind ``NotImplementedError`` (this container ships no codecs; swap in
PIL/libvips/PyAV at the marked seams) with a deterministic fake fallback
so the pipeline shape is exercised on any payload.

Scale notes:
- Payloads travel as parquet ``binary`` columns; never collect them. Feature
  extraction is ``mapInPandas`` (Arrow batches), sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs fits
  executor memory.
- Metadata (width/height/duration/codec) lives in a struct column so filters
  on it push down without touching payload bytes (parquet column pruning
  skips the blob pages entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, metadata
    derived from its length. Stands in for real blobs in tests; the plumbing
    downstream is payload-agnostic."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("fake").alias("format"),
            (F.length(text_col) % 1024).cast("int").alias("width"),
            (F.length(text_col) % 768).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6) bytes."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _parse_ppm(payload: bytes):
    """P6 header + raw RGB -> (h, w, 3) uint8 numpy array."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("malformed PPM header")
    w, h = int(m.group(1)), int(m.group(2))
    data = payload[m.end() : m.end() + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def _try_import_pil():
    """Optional-codec gate: PIL when installed, None otherwise. Resolved
    once per process (executor-side import cost is paid on first batch)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Decode an image payload to an (h, w, 3) uint8 array.

    REAL for PPM (P6) — header parse + numpy reshape, no codec needed.
    Library formats (JPEG/PNG/WebP/...) route through PIL WHEN INSTALLED
    (optional dependency — this container ships no codecs, so the
    try-import degrades to the documented gate); the mapInPandas
    harnesses around it are unchanged either way.
    """
    if payload[:2] == b"P6":
        return _parse_ppm(payload)
    pil = _try_import_pil()
    if pil is not None:
        import io

        import numpy as np

        with pil.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    raise NotImplementedError(
        "only PPM decodes without codecs; install PIL/libvips for JPEG/PNG"
    )


def resize_image(img, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3)
    — pure numpy index arithmetic, a REAL resize kernel."""
    import numpy as np

    rows = (np.arange(height) * img.shape[0]) // height
    cols = (np.arange(width) * img.shape[1]) // width
    return img[rows][:, cols]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass over binary payloads (Arrow-batched).

    PPM payloads take the REAL path: decode -> nearest-neighbor numpy
    resample -> re-encode. Anything else falls back to the deterministic
    byte-cycling stand-in (the codec gate), so the batch iteration, schema
    preservation, and metadata rewrite are exercised on every payload kind.
    """
    target = width * height

    def _resize_bytes(b: bytes | None) -> bytes:
        if not b:
            return b""
        if b[:2] == b"P6":
            try:
                return encode_ppm(resize_image(_parse_ppm(b), width, height))
            except ValueError:
                pass  # malformed header: fall through to the byte fallback
        reps = (target // len(b)) + 1
        return (b * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(_resize_bytes)
            out["meta"] = out["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_resize, schema=MEDIA_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_cross_rate", T.DoubleType(), True),
    ]
)


def _try_import_audioop():
    """Optional-codec gate for non-16-bit PCM widths and AIFF-C
    companding: stdlib ``audioop`` exists through Python 3.12 (removed in
    3.13), so it is gated exactly like PIL — resolved per process, decode
    degrades to ``NotImplementedError`` without it."""
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop  # noqa: PLC0415

        return audioop
    except ImportError:
        return None


def _try_import_aifc():
    """Optional-container gate: stdlib ``aifc`` (AIFF/AIFF-C), also
    removed in Python 3.13."""
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import aifc  # noqa: PLC0415

        return aifc
    except ImportError:
        return None


def _decode_aiff(payload: bytes):
    """AIFF / AIFF-C payload -> (int16 samples [n, ch], rate). 8/16-bit
    PCM decode gate-free (big-endian, 8-bit SIGNED per the AIFF spec);
    ulaw/alaw AIFF-C decompress through ``aifc``'s own audioop path —
    both stdlib modules are gated (removed in Python 3.13)."""
    import io

    import numpy as np

    aifc = _try_import_aifc()
    if aifc is None:
        raise NotImplementedError(
            "AIFF needs stdlib aifc (Python <= 3.12); install soundfile beyond"
        )
    try:
        af = aifc.open(io.BytesIO(payload))
    except Exception as ex:  # aifc raises its own Error on truncation
        raise ValueError(f"malformed AIFF: {ex}") from ex
    with af:
        comp = af.getcomptype()
        if comp not in (b"NONE", b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            raise NotImplementedError(f"AIFF-C compression {comp!r} is gated")
        if comp != b"NONE" and _try_import_audioop() is None:
            raise NotImplementedError("ulaw/alaw AIFF-C needs audioop")
        width = af.getsampwidth()
        rate = int(af.getframerate())
        nch = af.getnchannels()
        data = af.readframes(af.getnframes())
    if comp != b"NONE":
        # aifc already decompressed to NATIVE-endian 16-bit linear
        arr = np.frombuffer(data, dtype=np.int16)
    elif width == 2:
        arr = np.frombuffer(data, dtype=">i2").astype(np.int16)
    elif width == 1:
        arr = np.frombuffer(data, dtype=np.int8).astype(np.int16) * 256
    else:
        raise NotImplementedError("AIFF PCM wider than 16-bit is gated")
    return arr.reshape(-1, nch), rate


#: IMA/DVI ADPCM step-size table (89 entries) and index-adjust table —
#: the published constants of the IMA reference algorithm.
_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (nibble, state) -> new state.
    Shared verbatim by decode and the encoder's predictor tracking — the
    encoder MUST update through the same quantized path or the states
    drift and the stream decodes to noise."""
    step = _IMA_STEP_TABLE[index]
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    predictor = predictor - vpdiff if nibble & 8 else predictor + vpdiff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble]))
    return predictor, index


def _riff_chunks(payload: bytes):
    """Iterate (chunk_id, chunk_bytes) of a RIFF/WAVE payload."""
    import struct

    pos = 12  # past RIFF....WAVE
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        yield cid, payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _decode_ima_adpcm_wav(payload: bytes):
    """RIFF/WAVE IMA ADPCM (format tag 0x11, mono) -> (int16 [n, 1], rate).

    Pure-Python block decode, NO stdlib-codec gate (``audioop.adpcm2lin``
    is Intel/DVI ADPCM with continuous state — it ignores WAV IMA's
    per-block (predictor, index) headers and decodes block boundaries to
    noise, so it is the wrong tool here). Each block: 4-byte header
    (int16 predictor = sample 0, step index, reserved) then two samples
    per byte, low nibble first; a ``fact`` chunk truncates the final
    block's padding."""
    import struct

    import numpy as np

    fmt = data = None
    n_total = None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            (n_total,) = struct.unpack_from("<I", body, 0)
    if fmt is None or data is None:
        raise NotImplementedError("malformed ADPCM WAV (missing fmt/data)")
    tag, nch, rate, _br, block_align, _bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 0x11:
        raise NotImplementedError(f"not IMA ADPCM (fmt tag {tag})")
    if nch != 1:
        raise NotImplementedError("multi-channel IMA ADPCM not supported")
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        predictor = struct.unpack_from("<h", block, 0)[0]
        index = max(0, min(88, block[2]))
        out.append(predictor)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_step(nibble, predictor, index)
                out.append(predictor)
    if n_total is not None:
        out = out[:n_total]
    return np.asarray(out, dtype=np.int16).reshape(-1, 1), rate


def encode_ima_adpcm(
    samples, sample_rate: int = 8000, block_samples: int = 505
) -> bytes:
    """Mono int16 ndarray -> IMA ADPCM WAV bytes (fmt tag 0x11) — the
    encode twin of :func:`_decode_ima_adpcm_wav` for round-trip tests and
    mixed-codec corpora. ``block_samples`` must be odd (header sample +
    an even nibble count); the step index carries across blocks like
    reference encoders, and a ``fact`` chunk records the true sample
    count so decode drops final-block padding."""
    import struct

    import numpy as np

    if block_samples % 2 != 1:
        # a plain assert would vanish under python -O and surface as an
        # IndexError deep in the nibble packing instead
        raise ValueError("block_samples must be odd (header sample + pairs)")
    s = np.asarray(samples, dtype=np.int16)
    n = len(s)
    block_align = 4 + (block_samples - 1) // 2
    index = 0
    blocks = []
    for b0 in range(0, max(n, 1), block_samples):
        chunk = s[b0 : b0 + block_samples]
        if not len(chunk):
            break
        predictor = int(chunk[0])
        head = struct.pack("<hBB", predictor, index, 0)
        nibbles: list[int] = []
        for sample in chunk[1:]:
            step = _IMA_STEP_TABLE[index]
            diff = int(sample) - predictor
            nibble = 8 if diff < 0 else 0
            diff = abs(diff)
            tmp = step
            for bit in (4, 2, 1):
                if diff >= tmp:
                    nibble |= bit
                    diff -= tmp
                tmp >>= 1
            predictor, index = _ima_step(nibble, predictor, index)
            nibbles.append(nibble)
        nibbles += [0] * ((block_samples - 1) - len(nibbles))  # pad final
        body = bytes(
            (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(head + body)
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        sample_rate * block_align // block_samples,  # nominal byte rate
        block_align, 4, 2, block_samples,
    )
    fact = struct.pack("<I", n)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _wav_format_tag(payload: bytes) -> int | None:
    import struct

    for cid, body in _riff_chunks(payload):
        if cid == b"fmt " and len(body) >= 2:
            return struct.unpack_from("<H", body, 0)[0]
    return None


def decode_audio(payload: bytes):
    """Audio payload -> (samples int16 ndarray [n, channels], sample_rate).

    REAL decode paths, all stdlib:
    - RIFF/WAVE 16-bit PCM: ``wave`` alone, no gate (the baseline tier).
    - RIFF/WAVE 8-bit (unsigned, re-biased) / 24-bit / 32-bit PCM: width
      conversion through the ``audioop`` gate (``lin2lin``).
    - RIFF/WAVE IMA ADPCM (fmt tag 0x11, mono): pure-Python block decode,
      no gate (:func:`_decode_ima_adpcm_wav`).
    - FORM/AIFF and AIFF-C ulaw/alaw: the ``aifc`` gate
      (:func:`_decode_aiff`).
    Anything else — and every gated path when the stdlib codec modules are
    absent (both are removed in Python 3.13) — raises
    ``NotImplementedError``, which the Arrow harnesses surface as null
    feature rows, keeping mixed-media passes total."""
    import io
    import wave

    import numpy as np

    if payload[:4] == b"FORM":
        return _decode_aiff(payload)
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except wave.Error:
        # stdlib wave only reads PCM; route compressed RIFF by fmt tag
        if payload[:4] == b"RIFF" and _wav_format_tag(payload) == 0x11:
            return _decode_ima_adpcm_wav(payload)
        raise
    if width != 2:
        audioop = _try_import_audioop()
        if audioop is None:
            raise NotImplementedError(
                "non-16-bit PCM WAV needs audioop (Python <= 3.12)"
            )
        if width == 1:
            frames = audioop.bias(frames, 1, -128)  # WAV 8-bit is unsigned
        frames = audioop.lin2lin(frames, width, 2)
    arr = np.frombuffer(frames, dtype=np.int16).reshape(-1, nch)
    return arr, rate


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV payloads: sample rate,
    duration, RMS energy, zero-crossing rate — computed from the decoded
    PCM samples in numpy, Arrow-batched. Non-WAV payloads yield null
    features (the codec gate), keeping the pass total over mixed media.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "duration_ms",
                "rms", "zero_cross_rate",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                try:
                    samples, rate = decode_audio(payload or b"")
                    mono = samples.astype(np.float64).mean(axis=1)
                    n = len(mono)
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(int(n * 1000 / rate))
                    rows["rms"].append(
                        float(np.sqrt(np.mean(mono**2))) if n else 0.0
                    )
                    rows["zero_cross_rate"].append(
                        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        if n > 1
                        else 0.0
                    )
                except Exception:
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "rms", "zero_cross_rate"):
                        rows[k].append(None)
            yield pd.DataFrame(rows)

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_features, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64, stride: int = 2) -> DataFrame:
    """One-to-many frame sampling over video payloads (stub kernel).

    Emits every ``stride``-th fixed-size chunk of the payload as a 'frame' —
    the deterministic stand-in for a real keyframe decoder. The one-row-in /
    many-rows-out mapInPandas shape (batch explosion without driver
    involvement) is exactly what a production frame sampler uses; swap the
    chunker for an ffmpeg/PyAV call and nothing else changes.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                n_chunks = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_chunks, stride):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The stub 'feature' is a deterministic byte-histogram projection — a real
    model embedding drops in by replacing ``_featurize`` only; batch shape,
    schema, and partitioning stay identical.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            digest = payloads.map(
                lambda b: hashlib.md5(b or b"").hexdigest()
            )
            feats = []
            for b in payloads:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                hist = np.zeros(feature_dim, dtype=np.float32)
                if arr.size:
                    idx = arr % feature_dim
                    np.add.at(hist, idx, 1.0)
                    hist /= arr.size
                feats.append(hist.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "payload_digest": digest,
                    "feature": feats,
                }
            )

    from dbt_meshify_spark.operators.util import spread

    # Small local scans arrive as one split; spread so Arrow batches hit all
    # Python workers. No-op on a cluster where splits >= defaultParallelism.
    return spread(media).mapInPandas(_featurize, schema=FEATURE_SCHEMA)


# -- Y4M video (codec-free, real kernel like PPM/WAV) --------------------------


def encode_y4m(frames, fps: int = 25) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> YUV4MPEG2 (C420jpeg) bytes.

    Y4M is the uncompressed video interchange format (ffmpeg's codec-free
    pipe format): a text header, then per-frame raw 4:2:0 YUV planes — fully
    parseable with numpy, no codec.
    """
    import numpy as np

    h, w, _ = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()]
    for f in frames:
        r, g, b = (f[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def sub(p):
            return (
                p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            )

        out.append(b"FRAME\n")
        out.append(np.clip(y, 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(sub(u), 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(sub(v), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def _parse_y4m(payload: bytes):
    """Y4M bytes -> (width, height, fps, [Y-plane uint8 (h, w) arrays]).

    Chroma planes are skipped on purpose: sampling/feature kernels downstream
    work on luma (that's what perceptual hashes and keyframe detectors use).
    """
    import numpy as np

    nl = payload.index(b"\n")
    header = payload[:nl].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = fps = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
    ysize, csize = w * h, (w // 2) * (h // 2)
    frame_size = len(b"FRAME\n") + ysize + 2 * csize
    frames = []
    pos = nl + 1
    while pos + frame_size <= len(payload) + 1:
        fnl = payload.index(b"\n", pos)
        y0 = fnl + 1
        if y0 + ysize > len(payload):
            break
        frames.append(
            np.frombuffer(payload[y0 : y0 + ysize], dtype=np.uint8).reshape(h, w)
        )
        pos = y0 + ysize + 2 * csize
    return w, h, fps, frames


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL frame sampling for Y4M payloads: parse the stream, keep every
    ``stride``-th frame, emit each as a standalone grayscale PPM still
    (luma replicated to RGB) — the decode → sample → re-encode hop of a
    video curation pipeline, with the same one-row-in/many-out mapInPandas
    shape as the stub sampler. Non-Y4M payloads fall back to the chunk
    stub so mixed corpora never crash the batch.
    """
    import numpy as np

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                parsed = None
                if b[:9] == b"YUV4MPEG2":
                    # a malformed/truncated stream must not kill the whole
                    # Arrow batch — fall through to the chunk stub like any
                    # other undecodable payload (codec-gate posture)
                    try:
                        parsed = _parse_y4m(b)
                    except Exception:
                        parsed = None
                if parsed is not None:
                    _, _, _, ys = parsed
                    for i in range(0, len(ys), stride):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(
                            encode_ppm(np.repeat(ys[i][..., None], 3, axis=2))
                        )
                else:
                    for i in range(0, (len(b) + 63) // 64, stride):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(b[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_sample, schema=FRAME_SCHEMA)


def media_integrity_report(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Per-asset integrity audit of a multimodal column — the data-quality
    gate a media corpus runs BEFORE fingerprinting/training: flags null or
    empty payloads, payloads that fail their container's decode (truncated
    PPM/WAV/Y4M), and metadata that contradicts the decoded content
    (declared dims != actual). One Arrow-batched pass; payload bytes never
    shuffle (the report rows are scalars).

    ``status``: ``ok | null_payload | empty_payload | undecodable |
    meta_mismatch | unknown_format`` (first failing check wins, in that
    order). ``detected_format`` is sniffed from magic bytes independently
    of the metadata so a mislabeled asset surfaces even when it decodes.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("detected_format", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _sniff(b: bytes) -> str:
        if b[:2] == b"P6":
            return "ppm"
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return "wav"
        if b[:9] == b"YUV4MPEG2":
            return "y4m"
        if b[:2] == b"\xff\xd8":
            return "jpeg"
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return "png"
        return "unknown"

    def _check(b, meta) -> tuple[str, str, int]:
        if b is None:
            return ("null_payload", "none", 0)
        b = bytes(b)
        if not b:
            return ("empty_payload", "none", 0)
        fmt = _sniff(b)
        if fmt == "unknown":
            return ("unknown_format", fmt, len(b))
        try:
            if fmt == "ppm":
                img = _parse_ppm(b)
                w, h = img.shape[1], img.shape[0]
            elif fmt == "wav":
                samples, _rate = decode_audio(b)
                w = h = None
            else:
                w = h = None  # y4m/jpeg/png: existence checks only here
        except Exception:
            return ("undecodable", fmt, len(b))
        if meta is not None and w is not None:
            mw, mh = meta.get("width"), meta.get("height")
            if (mw is not None and mw != w) or (mh is not None and mh != h):
                return ("meta_mismatch", fmt, len(b))
        return ("ok", fmt, len(b))

    has_meta = meta_col in media.columns
    cols = [id_col, payload_col] + ([meta_col] if has_meta else [])

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r[meta_col] if has_meta else None
                status, fmt, nb = _check(r[payload_col], meta)
                rows.append((r[id_col], status, fmt, nb))
            yield pd.DataFrame(
                rows, columns=[id_col, "status", "detected_format", "n_bytes"]
            )

    return media.select(*cols).mapInPandas(_audit, out_schema)


def image_dhash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    out_col: str = "dhash",
) -> DataFrame:
    """64-bit perceptual difference hash (dHash) of image payloads — the
    standard near-duplicate fingerprint for images: decode, grayscale,
    nearest-neighbor resample to 9x8, then bit i = (pixel[r, c] >
    pixel[r, c+1]) over the 8x8 adjacent-column comparisons. Robust to
    re-encoding, scaling, and mild noise; pairs within a few bits are
    near-duplicates.

    REAL for PPM payloads (the repo's codec-free decode + resize kernels);
    other formats take the deterministic md5-derived stand-in so the
    plumbing stays exercised end-to-end (the established codec-gate
    posture). Arrow-batched mapInPandas, one pass, no shuffle — banding
    and verification live in ``dedup.hash64_candidate_pairs``.
    """
    import hashlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.LongType()),
        ]
    )

    def _dhash_bytes(b: bytes | None) -> int | None:
        import numpy as np

        if b is None:
            return None
        # bare Exception like the audio path: a degenerate-but-parseable
        # payload (0x0 PPM dims -> IndexError in the resample) must fall
        # to the md5 stand-in, never kill the Arrow batch
        try:
            img = decode_image(bytes(b))
            if img.shape[0] == 0 or img.shape[1] == 0:
                raise ValueError("zero-dimension image")
            gray = np.asarray(img, dtype=np.float64).mean(axis=2)
            small = _resample_gray(gray, 9, 8)
        except Exception:
            h = hashlib.md5(bytes(b)).digest()
            return int.from_bytes(h[:8], "big", signed=True)
        bits = (small[:, :-1] > small[:, 1:]).flatten()
        v = 0
        for i, bit in enumerate(bits):
            if bit:
                v |= 1 << i
        # fold into signed 64-bit (bit 63 is the long sign bit)
        if v >= 1 << 63:
            v -= 1 << 64
        return v

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [_dhash_bytes(b) for b in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_hash, out_schema)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (numpy; 2-D DCT = D @ img @ D.T)."""
    import numpy as np

    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (x + 0.5) * k / n)
    d[0] /= np.sqrt(2.0)
    return d


def image_phash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    out_col: str = "phash",
) -> DataFrame:
    """64-bit DCT perceptual hash (pHash) of image payloads — the
    frequency-domain sibling of :func:`image_dhash`: decode, grayscale,
    resample to 32x32, 2-D DCT-II (pure numpy matrix multiply — no scipy),
    keep the low-frequency 8x8 block, bit i = (coefficient > median of the
    63 AC coefficients). Brightness shifts land entirely in the dropped DC
    term and contrast scaling preserves every > comparison, so pHash is
    invariant where dHash (a spatial gradient sign) merely tends to be
    robust; blur/JPEG ringing average out in the low-frequency block.
    Pairs route through the same ``dedup.hash64_candidate_pairs`` banding.

    Same codec-gate posture as dHash: REAL for PPM (or PIL formats when
    installed), md5 stand-in for undecodable payloads, NULL for NULL.
    """
    import hashlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.LongType()),
        ]
    )

    def _phash_bytes(b: bytes | None) -> int | None:
        import numpy as np

        if b is None:
            return None
        try:
            img = decode_image(bytes(b))
            if img.shape[0] == 0 or img.shape[1] == 0:
                raise ValueError("zero-dimension image")
            gray = np.asarray(img, dtype=np.float64).mean(axis=2)
            small = _resample_gray(gray, 32, 32)
        except Exception:
            h = hashlib.md5(bytes(b)).digest()
            return int.from_bytes(h[:8], "big", signed=True)
        d = _dct_matrix(32)
        coeffs = (d @ small @ d.T)[:8, :8].flatten()
        ac = coeffs[1:]  # drop DC: brightness invariance
        med = np.median(ac)
        v = 0
        # bit 0 reserved for the (always-false) DC slot keeps 64 bits
        for i, c in enumerate(ac, start=1):
            if c > med:
                v |= 1 << i
        if v >= 1 << 63:
            v -= 1 << 64
        return v

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [_phash_bytes(b) for b in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_hash, out_schema)


def _resample_gray(gray, width: int, height: int):
    """Nearest-neighbor resample of a 2-D array (the grayscale twin of
    ``resize_image``)."""
    import numpy as np

    rows = (np.arange(height) * gray.shape[0]) // height
    cols = (np.arange(width) * gray.shape[1]) // width
    return gray[rows][:, cols]


def image_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints + the shared 64-bit
    pigeonhole banding (``dedup.hash64_candidate_pairs``) — one map-only
    hash pass over the payloads, one banding shuffle over (id, 8-byte
    hash) rows, hamming verify inside candidate buckets. The image bytes
    never shuffle. ``max_bucket_size`` bounds hot fingerprint buckets
    (blank frames collapse to one dHash value)."""
    from dbt_meshify_spark.operators.dedup import hash64_candidate_pairs

    hashed = image_dhash(media, id_col=id_col, payload_col=payload_col)
    return hash64_candidate_pairs(
        hashed,
        id_col,
        "dhash",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )


def image_phash_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Image near-duplicate pairs over pHash fingerprints — catches the
    brightness/contrast-edited and blurred copies dHash's spatial gradient
    can drop; run BOTH and union the pair sets for recall-critical dedup
    (each pass is one map-only hash + one banding shuffle)."""
    from dbt_meshify_spark.operators.dedup import hash64_candidate_pairs

    hashed = image_phash(media, id_col=id_col, payload_col=payload_col)
    return hash64_candidate_pairs(
        hashed,
        id_col,
        "phash",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )


def encode_wav(samples, sample_rate: int = 8000, sampwidth: int = 2) -> bytes:
    """Mono int16 ndarray -> PCM WAV bytes (stdlib ``wave``; the encode
    twin of ``decode_audio``). ``sampwidth`` widens the tier: 1 (unsigned
    8-bit, high byte re-biased), 2 (native int16), 3/4 (samples shifted
    into the high 16 bits — lossless round-trip through the decoder's
    ``lin2lin`` narrowing)."""
    import io
    import wave

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if sampwidth == 2:
        frames = s.tobytes()
    elif sampwidth == 1:
        frames = (((s.astype(np.int32) >> 8) + 128).astype(np.uint8)).tobytes()
    elif sampwidth == 4:
        frames = (s.astype(np.int32) << 16).astype("<i4").tobytes()
    elif sampwidth == 3:
        # int16 into the top 2 of 3 little-endian bytes per sample
        wide = (s.astype(np.int32) << 8).astype("<i4").tobytes()
        frames = bytes(
            b for i, b in enumerate(wide) if i % 4 != 3
        )
    else:
        raise ValueError(f"unsupported sampwidth {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sample_rate)
        wf.writeframes(frames)
    return buf.getvalue()


def encode_aiff(
    samples, sample_rate: int = 8000, comptype: bytes = b"NONE"
) -> bytes:
    """Mono int16 ndarray -> AIFF (or ulaw/alaw AIFF-C) bytes through the
    ``aifc`` gate — the test twin of :func:`_decode_aiff`."""
    import io

    import numpy as np

    aifc = _try_import_aifc()
    if aifc is None:
        raise NotImplementedError("AIFF encode needs stdlib aifc (<= 3.12)")
    s = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    buf.close = lambda: None  # aifc.close() closes the sink; keep the bytes
    with aifc.open(buf, "wb") as af:
        af.setnchannels(1)
        af.setsampwidth(2)
        af.setframerate(sample_rate)
        if comptype != b"NONE":
            af.setcomptype(comptype, b"")
        # aifc expects big-endian frames for NONE and native for compressed
        af.writeframes(
            s.astype(">i2").tobytes() if comptype == b"NONE" else s.tobytes()
        )
    return buf.getvalue()


def audio_fingerprint(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    out_col: str = "afp",
) -> DataFrame:
    """64-bit audio fingerprint over the REAL WAV kernel: the signal splits
    into 65 equal frames; bit i = (energy[i] > energy[i+1]) over the 64
    adjacent-frame energy comparisons — the energy-envelope analog of
    image dHash (robust to gain changes — comparisons are scale-invariant
    — and mild noise; sensitive to structure). Non-WAV payloads take the
    md5 stand-in behind the codec gate; NULL payloads yield NULL. One
    Arrow-batched pass, no shuffle; pairing is
    ``dedup.hash64_candidate_pairs`` like every 64-bit fingerprint here.
    """
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.LongType()),
        ]
    )

    def _fp_bytes(b: bytes | None) -> int | None:
        import numpy as np

        if b is None:
            return None
        try:
            samples, _rate = decode_audio(bytes(b))
        except Exception:
            h = hashlib.md5(bytes(b)).digest()
            return int.from_bytes(h[:8], "big", signed=True)
        mono = samples.astype(np.float64).mean(axis=1)
        if len(mono) < 130:  # need 65 frames of >= 2 samples
            h = hashlib.md5(bytes(b)).digest()
            return int.from_bytes(h[:8], "big", signed=True)
        n_frames = 65
        cut = (len(mono) // n_frames) * n_frames
        frames = mono[:cut].reshape(n_frames, -1)
        energy = (frames**2).mean(axis=1)
        bits = energy[:-1] > energy[1:]
        v = 0
        for i, bit in enumerate(bits):
            if bit:
                v |= 1 << i
        if v >= 1 << 63:
            v -= 1 << 64
        return v

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [_fp_bytes(b) for b in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_hash, out_schema)


def audio_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 8,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Audio near-duplicate pairs: energy-envelope fingerprints + the
    shared 64-bit pigeonhole banding — audio bytes never shuffle.
    ``max_bucket_size`` bounds hot fingerprint buckets (silence collapses
    to one envelope value)."""
    from dbt_meshify_spark.operators.dedup import hash64_candidate_pairs

    hashed = audio_fingerprint(media, id_col=id_col, payload_col=payload_col)
    return hash64_candidate_pairs(
        hashed,
        id_col,
        "afp",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )


def video_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    stride: int = 2,
    min_jaccard: float = 0.5,
    max_frame_df: int | None = 10_000,
) -> DataFrame:
    """Video near-duplicate pairs by SHARED-FRAME Jaccard: sample frames
    (the real Y4M kernel), dHash each sampled frame, and score video pairs
    by the Jaccard of their distinct frame-fingerprint sets — re-encoded,
    trimmed, or lightly-noised copies share most frame prints; unrelated
    footage shares none.

    The ``source_overlap`` inverted-index shape one modality over: the
    (video, frame-hash) distinct frame reduces each video to 8-byte keys
    (frames never shuffle), the pair join is keyed on the frame hash, and
    per-video frame counts broadcast back for the Jaccard denominator.
    Returns ``id_a, id_b, n_shared, jaccard``.

    ``max_frame_df`` (stop-frame cap, the ``ngram_jaccard_pairs``
    ``max_gram_df`` pattern one modality over): a frame hash shared by
    more videos than this — blank/title-card frames across a whole corpus
    — carries no discriminative signal and inflates the index join
    quadratically, so it is dropped and the Jaccard computed over the
    surviving-frame vocabulary on both sides of the denominator.
    """
    frames = sample_video_frames(
        media.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")),
        stride=stride,
    )
    hashed = image_dhash(
        frames.select(
            F.col("media_id").alias("__vid"),
            F.col("frame").alias("payload"),
        ),
        id_col="__vid",
        payload_col="payload",
    )
    # PIN the (video, frame-hash) table: it fans out to the df-cap count,
    # the per-video totals, and BOTH sides of the pair join — without a
    # checkpoint each consumer re-executes the synth/decode/dHash Python
    # chain (8 scans, 24 MapInPandas nodes observed), i.e. the corpus
    # would be re-decoded per branch at 100 TB. The pinned frame is tiny:
    # (id, 8-byte hash) distinct rows, frames-per-video bounded.
    fset = (
        hashed.filter(F.col("dhash").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_frame_df is not None:
        frame_df = fset.groupBy("dhash").agg(F.count("*").alias("__df"))
        fset = (
            fset.join(frame_df, "dhash")
            .filter(F.col("__df") <= max_frame_df)
            .select("__vid", "dhash")
        )
    per_video = fset.groupBy("__vid").agg(F.count("*").cast("long").alias("__n"))
    a = fset.select(F.col("__vid").alias("id_a"), "dhash")
    b = fset.select(F.col("__vid").alias("id_b"), "dhash")
    pairs = (
        a.join(b, "dhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    na = per_video.select(F.col("__vid").alias("id_a"), F.col("__n").alias("__na"))
    nb = per_video.select(F.col("__vid").alias("id_b"), F.col("__n").alias("__nb"))
    # per_video is one row PER VIDEO — corpus-scale, so unlike the bounded
    # per-source totals in source_overlap it must NOT be broadcast; the
    # pair frame is already hash-partitioned by id from the groupBy, and
    # AQE may still choose broadcast when the corpus is actually small
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("__na") + F.col("__nb") - F.col("n_shared")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )
