"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched ``mapInPandas``
operators with bounded batch sizes, partition-friendly layouts — while the
actual codec step is stubbed (image/audio libraries are not in this
container): ``decode=...`` hooks accept a real decoder; the default
``deterministic_fake_decode`` derives reproducible pseudo-features from the
bytes so the pipeline is testable end-to-end.

At 100 TB the rules encoded here: never collect binaries, keep them out of
shuffle keys, project them away before wide operations, and bound Arrow
batch memory via ``maxRecordsPerBatch`` (set in the session factory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "mean_luma double, feature_hash string"
)


# ---------------------------------------------------------------------------
# Real-codec seam (optional dependencies, probe-gated like
# plans/stores.py::_have_pytables): when Pillow / soundfile are
# installed, these decoders drop into the same decode= hooks the
# md5-replayable stubs fill; when absent, callers get an actionable
# error naming the install, never a bare ImportError from inside an
# Arrow task.
# ---------------------------------------------------------------------------


def _have_pillow() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _have_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def pillow_decode(payload: bytes) -> dict:
    """Real image decode for :func:`extract_image_features` (requires
    Pillow): true dimensions/channels, mean luma from the L-converted
    pixels, and a content hash of the decoded pixel array (so two
    encodings of the same pixels collide — unlike hashing the bytes).
    """
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    arr = np.asarray(img.convert("L"), dtype=np.float64)
    return {
        "width": img.width,
        "height": img.height,
        "n_channels": len(img.getbands()),
        "mean_luma": float(arr.mean() / 255.0),
        "feature_hash": hashlib.blake2b(
            arr.astype(np.uint8).tobytes(), digest_size=16
        ).hexdigest(),
    }


def pillow_resize(payload: bytes, w: int, h: int) -> bytes:
    """Real resize for :func:`resize_images` (requires Pillow):
    re-encodes in the source's own format (falling back to PNG for
    format-less in-memory images)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    fmt = img.format or "PNG"
    out = io.BytesIO()
    img.resize((w, h)).save(out, format=fmt)
    return out.getvalue()


def pillow_gray(payload: bytes, w: int = 9, h: int = 8) -> np.ndarray:
    """Real decode+grayscale+resize for the dHash thumbnail — the
    production drop-in for ``decode_gray=`` in :func:`perceptual_hash`
    / :func:`image_near_dup` (requires Pillow)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((w, h))
    return np.asarray(img, dtype=np.float64)


def soundfile_wave(payload: bytes) -> np.ndarray:
    """Real audio decode for ``decode_wave=`` in
    :func:`audio_energy_stats`: channel 0 as int16 PCM widened to
    int64 — INTEGER amplitudes, honoring the operator's exact-integer
    energy contract. Uses soundfile when installed (any libsndfile
    format); without it, 16-bit PCM WAV decodes through the stdlib
    ``wave`` fallback below, so the real-decoder path runs even in
    codec-less sandboxes."""
    import io

    try:
        import soundfile as sf
    except ImportError:
        return _stdlib_pcm16_wave(payload)

    data, _sr = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    return data[:, 0].astype(np.int64)


def _stdlib_pcm16_wave(payload: bytes) -> np.ndarray:
    """Pure-stdlib 16-bit PCM WAV decode (``wave`` + numpy): channel 0
    as int64, byte-identical to the soundfile path on the same file.
    Other sample widths / compressed formats need soundfile — raise the
    install hint rather than mis-decode."""
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                "stdlib WAV fallback handles 16-bit PCM only "
                f"(got sample width {w.getsampwidth()}); "
                "pip install soundfile for other formats"
            )
        n_channels = w.getnchannels()
        raw = w.readframes(w.getnframes())
    arr = np.frombuffer(raw, dtype="<i2").reshape(-1, n_channels)
    return arr[:, 0].astype(np.int64)


def deterministic_fake_decode(payload: bytes) -> dict:
    """Stand-in for a real image decode: derives stable pseudo-dimensions
    and statistics from the payload bytes. Replace with PIL/cv2 in prod."""
    digest = hashlib.blake2b(payload, digest_size=16).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(float)
    return {
        "width": 64 + int(digest[0]) % 192,
        "height": 64 + int(digest[1]) % 192,
        "n_channels": 3,
        "mean_luma": float(arr.mean() / 255.0),
        "feature_hash": digest.hex(),
    }


def extract_image_features(
    media: DataFrame,
    decode: Callable[[bytes], dict] = deterministic_fake_decode,
) -> DataFrame:
    """Per-image features via Arrow-batched ``mapInPandas``.

    The iterator contract keeps peak memory at one Arrow batch of binaries
    per task; the output drops the payload column so downstream stages
    never shuffle bytes.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FRAMES_SCHEMA = "media_id long, frame int, rms double"


def sample_audio_frames(
    media: DataFrame,
    n_frames: int = 4,
    decode: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Frame-sample audio payloads (UDTF-style: one row per frame).

    ``decode`` should return a 1-D float waveform; the default derives a
    deterministic fake waveform from the byte content. Real audio decode
    raises if the stub is used in production paths by mistake — pass your
    decoder explicitly.
    """

    def fake_decode(payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed % 2**32)
        return rng.standard_normal(1024)

    dec = decode or fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = dec(payload)
                chunks = np.array_split(wave, n_frames)
                for i, c in enumerate(chunks):
                    rows.append((int(mid), i, float(np.sqrt((c**2).mean()))))
            yield pd.DataFrame(rows, columns=["media_id", "frame", "rms"])

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        op, AUDIO_FRAMES_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("timestamp_s", T.DoubleType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_video_frames(
    media: DataFrame,
    n_frames: int = 4,
    decode: Callable[[bytes, int], list[tuple[float, bytes]]] | None = None,
) -> DataFrame:
    """Sample ``n_frames`` frames per video payload (UDTF-style: one
    output row per frame, carrying the frame bytes + its timestamp).

    ``decode(payload, n)`` must return ``[(timestamp_s, frame_bytes)]`` —
    a real deployment passes a PyAV/ffmpeg-backed callable; the default
    deterministic fake derives stable frames from the payload so the
    plumbing (schema, per-frame fan-out, binary column handling, batch
    iteration) is exercised end-to-end without codecs in the container.

    Scale notes: frames stay ``binary`` and are emitted row-per-frame so
    downstream feature extraction parallelizes past the per-video grain;
    the input payload is dropped in the same pass (a 100 GB/hour video
    column must never ride a shuffle), and Arrow batch memory stays
    bounded by ``maxRecordsPerBatch`` × frame size.
    """

    def fake_decode(payload: bytes, n: int) -> list[tuple[float, bytes]]:
        digest = hashlib.blake2b(payload, digest_size=16).digest()
        dur = 1.0 + digest[0] / 8.0  # fake duration, 1-33 s
        return [
            (
                round(i * dur / n, 6),
                hashlib.blake2b(payload + bytes([i]), digest_size=32).digest(),
            )
            for i in range(n)
        ]

    dec = decode or fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, (ts, frame) in enumerate(dec(payload, n_frames)):
                    rows.append((int(mid), i, float(ts), frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "timestamp_s", "frame"]
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        op, VIDEO_FRAMES_SCHEMA
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize pass-through: payload → payload with updated meta.

    Default resizer: :func:`pillow_resize` when Pillow is installed
    (probe-gated, same discipline as the HDF store); without it, a
    build-time NotImplementedError names the fix instead of a bare
    ImportError surfacing from inside an Arrow task. The plumbing
    (schema preservation, meta update, batch iteration) is also
    exercised by tests with an identity resizer.
    """
    if resize is None and not _have_pillow():
        raise NotImplementedError(
            "image resize requires Pillow (PIL)/cv2 — not installed here; "
            "pip install pillow or pass resize= explicitly"
        )
    rs = resize or pillow_resize

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [rs(p, width, height) for p in pdf["payload"]]
            pdf["meta"] = [
                {**(m or {}), "width": str(width), "height": str(height)}
                for m in pdf["meta"]
            ]
            yield pdf

    return media.mapInPandas(op, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash + banded Hamming join)
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "media_id long, phash long"


def deterministic_fake_gray(payload: bytes, w: int = 9, h: int = 8) -> np.ndarray:
    """Codec stub for the dHash thumbnail: a reproducible h×w grayscale
    derived from the payload bytes (same contract as
    ``deterministic_fake_decode`` — swap in a real decode+resize in prod)."""
    digest = hashlib.shake_256(payload).digest(w * h)  # arbitrary-width XOF
    return np.frombuffer(digest, dtype=np.uint8).reshape(h, w).astype(np.float64)


def md5_replayable_gray(payload: bytes, w: int = 9, h: int = 8) -> np.ndarray:
    """SQL-replayable codec stub for the dHash thumbnail: 'pixels' are
    the hex digits (0-15) of three chained md5 digests of the payload,
    so an ANSI-SQL oracle can reproduce the dHash bit-for-bit (md5 is
    in every engine; ``deterministic_fake_gray``'s shake_256 XOF is
    not). A payload ending in the ``0x01`` marker byte is a "variant":
    the marker is stripped before hashing and pixel (0,0) is
    brightened +16 — a reproducible small-edit stand-in that flips at
    most ONE dHash bit (pixel (0,0) participates only in bit (0,0)),
    giving the near-dup join genuine hamming-1 pairs to find. Same
    contract as the other stubs: swap in a real decode+grayscale+resize
    in production; everything downstream is codec-agnostic.
    """
    variant = payload.endswith(b"\x01")
    base = payload[:-1] if variant else payload
    hexcat = "".join(
        hashlib.md5(base + str(i).encode()).hexdigest() for i in range(3)
    )
    vals = [int(ch, 16) for ch in hexcat[: w * h]]
    g = np.array(vals, dtype=np.float64).reshape(h, w)
    if variant:
        g[0, 0] += 16.0
    return g


def md5_replayable_wave(payload: bytes, n_samples: int = 64) -> np.ndarray:
    """SQL-replayable codec stub for audio: 'samples' are integer
    amplitudes derived from the hex digits (0-15) of chained md5
    digests of the payload — ``2·d − 15`` (odd integers in [−15, 15]),
    so every downstream energy sum is EXACT integer arithmetic an
    ANSI-SQL oracle replays digit-for-digit. A payload ending in the
    ``0x02`` marker byte is a "silent" clip: the marker is stripped
    before hashing and amplitudes collapse to ±1 (digit parity), so
    every frame's energy is exactly the frame length — the
    reproducible stand-in for dead air / a broken decode. Swap in a
    real decoder (PCM floats) in production; the stats operator is
    codec-agnostic.
    """
    silent = payload.endswith(b"\x02")
    base = payload[:-1] if silent else payload
    hexcat = "".join(
        hashlib.md5(base + str(i).encode()).hexdigest()
        for i in range((n_samples + 31) // 32)
    )
    d = np.array([int(ch, 16) for ch in hexcat[:n_samples]], dtype=np.int64)
    if silent:
        return (d % 2) * 2 - 1
    return 2 * d - 15


AUDIO_ENERGY_SCHEMA = (
    "media_id long, n_frames int, total_energy long, min_frame_energy long, "
    "max_frame_energy long, silent_frames int, silence_ratio double"
)


def audio_energy_stats(
    media: DataFrame,
    n_frames: int = 4,
    silence_threshold: int = 64,
    decode_wave: Callable[[bytes], np.ndarray] = md5_replayable_wave,
) -> DataFrame:
    """Per-clip frame-energy statistics over audio payloads — the
    standard audio-curation screen (drop dead-air/broken clips, flag
    clipped ones) before a speech/audio training mix. One row per
    clip: ``(media_id, n_frames, total_energy, min_frame_energy,
    max_frame_energy, silent_frames, silence_ratio)`` where a frame is
    silent when its energy ``Σ a²`` ≤ ``silence_threshold``.

    Arrow-batched ``mapInPandas`` (same plumbing rules as
    :func:`perceptual_hash`: binaries stay inside the task, only
    fixed-width stats leave); with the default integer-amplitude codec
    stub every statistic is exact integer arithmetic except the one
    terminal ratio — fully SQL-replayable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = decode_wave(payload)
                energies = [
                    int((c.astype(np.int64) ** 2).sum())
                    for c in np.array_split(wave, n_frames)
                ]
                n_silent = sum(e <= silence_threshold for e in energies)
                rows.append(
                    (
                        int(mid),
                        n_frames,
                        int(sum(energies)),
                        min(energies),
                        max(energies),
                        n_silent,
                        n_silent / n_frames,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "total_energy",
                    "min_frame_energy",
                    "max_frame_energy",
                    "silent_frames",
                    "silence_ratio",
                ],
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        op, AUDIO_ENERGY_SCHEMA
    )


def perceptual_hash(
    media: DataFrame,
    decode_gray: Callable[[bytes], np.ndarray] = deterministic_fake_gray,
) -> DataFrame:
    """64-bit dHash per image: each bit compares horizontally adjacent
    pixels of the 9×8 grayscale thumbnail — robust to re-encoding,
    resizing, and small edits, which byte-level digests are blind to.

    Arrow-batched ``mapInPandas`` (bounded to one batch of binaries per
    task); output is (media_id, phash) — 8 bytes per image — so
    everything downstream shuffles hashes, never payloads.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = np.empty(len(pdf), dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                g = decode_gray(payload)
                bits = (g[:, 1:] > g[:, :-1]).flatten()  # 8x8 = 64 bits
                acc = np.uint64(0)
                for b in bits:
                    acc = (acc << np.uint64(1)) | np.uint64(bool(b))
                hashes[i] = acc.astype(np.int64)  # two's-complement view
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(),
                                "phash": hashes})

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, PHASH_SCHEMA
    )


def image_near_dup(
    media: DataFrame,
    max_hamming: int = 3,
    decode_gray: Callable[[bytes], np.ndarray] = deterministic_fake_gray,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs: (id_a, id_b, hamming ≤ max_hamming).

    Banded LSH on the 64-bit dHash: the hash splits into
    ``max_hamming + 1`` bands, and by pigeonhole any pair within
    ``max_hamming`` bit flips agrees on at least one whole band — so a
    band-value equi-join generates a complete candidate set, and the
    exact Hamming check (``bit_count(xor)``, JVM-side) filters it. No
    all-pairs comparison anywhere; join traffic is (band, 8-byte hash)
    rows, candidates cluster only where images actually collide.

    ``max_bucket_size`` prunes degenerate buckets (solid-color / blank
    images all share a dHash band) before the self-join — same valve and
    recall trade as the text twin, ``dedup._cap_band_buckets``; size it
    from ``dedup.band_bucket_stats`` over the banded frame.
    """
    from blueetl_spark.operators.dedup import _cap_band_buckets, hamming_distance

    n_bands = max_hamming + 1
    width = 64 // n_bands  # pigeonhole needs >= n_bands disjoint bands
    hashes = perceptual_hash(media, decode_gray)
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("phash", i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("val"),
                )
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select("media_id", "phash", "b.band", "b.val")
    bands = _cap_band_buckets(bands, ["band", "val"], max_bucket_size)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            hamming_distance(F.col("a.phash"), F.col("b.phash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair may collide in several bands
    )
    return pairs


def md5_replayable_frame_sigs(payload: bytes, n_frames: int = 8) -> np.ndarray:
    """SQL-replayable codec stub for video: per-frame 16-bit perceptual
    signatures with SCENE STRUCTURE — consecutive frames in one scene
    share a signature (hamming 0), scenes get independent md5-derived
    signatures (hamming ~8 across a cut), so a cut detector has real
    structure to find. Scene breaks are content-derived: break before
    frame ``i`` iff hex digit ``i`` of ``md5(payload ++ 'b')`` is < 4
    (~1/4 of positions); the scene's signature is the first 4 hex
    digits of ``md5(payload ++ 's' ++ scene_idx)``. Clips longer than
    32 frames chain break-digests exactly like ``md5_replayable_wave``
    (chunk k >= 1 appends ``str(k)`` to the seed; chunk 0 stays the
    plain digest so existing <= 32-frame oracles replay unchanged) —
    no IndexError at any ``n_frames``. Swap in a real decoder
    (per-frame dHash of sampled frames) in production — everything
    downstream consumes only the integer signature array.
    """
    bdigits = "".join(
        hashlib.md5(payload + b"b" + (str(k).encode() if k else b"")).hexdigest()
        for k in range((n_frames + 31) // 32)
    )
    scene = 0
    sigs = []
    for i in range(n_frames):
        if i > 0 and int(bdigits[i], 16) < 4:
            scene += 1
        sig_hex = hashlib.md5(payload + b"s" + str(scene).encode()).hexdigest()
        sigs.append(int(sig_hex[:4], 16))
    return np.array(sigs, dtype=np.int64)


VIDEO_SCENE_SCHEMA = (
    "media_id long, n_frames int, n_cuts int, first_cut int, "
    "sum_cut_hamming long"
)


def video_scene_cuts(
    media: DataFrame,
    n_frames: int = 8,
    hamming_thresh: int = 3,
    decode_sigs: Callable[[bytes, int], np.ndarray] = md5_replayable_frame_sigs,
) -> DataFrame:
    """Scene-cut detection over video payloads — the shot-boundary
    screen a video-curation pipeline runs before sampling training
    frames (sample once per scene, not n uniform frames of one static
    shot). A cut is a consecutive-frame signature pair with hamming
    distance > ``hamming_thresh``. One row per video: ``(media_id,
    n_frames, n_cuts, first_cut, sum_cut_hamming)`` with ``first_cut``
    the index of the first frame AFTER a cut (NULL if none).

    Same plumbing contract as the image/audio operators: Arrow-batched
    ``mapInPandas``, binaries never leave the task, fixed-width integer
    stats out — exact and SQL-replayable under the md5 codec stub.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sigs = decode_sigs(payload, n_frames)
                hams = [
                    int(bin(int(sigs[i - 1]) ^ int(sigs[i])).count("1"))
                    for i in range(1, len(sigs))
                ]
                cuts = [
                    (i + 1, h)
                    for i, h in enumerate(hams)
                    if h > hamming_thresh
                ]
                rows.append(
                    (
                        int(mid),
                        len(sigs),
                        len(cuts),
                        cuts[0][0] if cuts else None,
                        sum(h for _, h in cuts),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "n_cuts",
                    "first_cut",
                    "sum_cut_hamming",
                ],
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        op, VIDEO_SCENE_SCHEMA
    )
