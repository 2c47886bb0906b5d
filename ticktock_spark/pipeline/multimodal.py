"""Multimodal columns: opaque binary payloads + typed metadata.

Design: media (image/audio/video) travels as a `binary` column with a
`media_meta` struct (modality, format, width/height/duration, byte size).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas UDFs via mapInPandas — the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested. Codecs: binary netpbm
(P5/P6) decodes for real via a stdlib parser (no external library, so
that branch is tested in this container); other formats decode via PIL
when installed (feature-gated at call time) and otherwise raise
`NotImplementedError`; the deterministic fake engine remains the
oracle path.

At 100 TB: binaries stay columnar in parquet (never hit the driver),
maxPartitionBytes bounds batch memory, and mapInPandas streams
Arrow batches through Python with zero-copy where possible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Deterministically synthesize a binary payload + metadata from an
    existing column (container lacks real media files). The payload is
    the md5 digest bytes repeated — stable across runs and engines.
    ``modality='video'`` assigns a nonzero duration (100 ms per source
    character) so frame sampling has something to sample."""
    payload = F.to_binary(F.repeat(F.md5(F.col(text_col)), 4), F.lit("hex"))
    duration = (
        (F.length(F.col(text_col)) * 100).cast("long")
        if modality in ("video", "audio")
        else F.lit(0).cast("long")
    )
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit(modality).alias("modality"),
                F.lit("fake").alias("format"),
                (F.length(F.col(text_col)) % 64 + 16).cast("int").alias("width"),
                (F.length(F.col(text_col)) % 48 + 16).cast("int").alias("height"),
                duration.alias("duration_ms"),
                F.length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


DECODE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _pil():
    """Feature gate: the real image codec, if the deployment has one."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def decode_and_featurize(
    df: DataFrame, id_col: str = "doc_id", engine: str = "fake"
) -> DataFrame:
    """mapInPandas decode + feature-extraction plumbing.

    ``engine`` selects the codec:
      - ``"fake"`` (default, the oracle path): deterministic byte
        histograms of the payload — stable across runs and engines.
      - ``"real"``: decode actual pixels — binary netpbm payloads
        (P5/P6) via the stdlib parser, everything else via PIL
        (`_decode_real`). Raises ``NotImplementedError`` immediately if
        PIL is not installed.
      - ``"netpbm"``: stdlib-only real decode for binary netpbm (P5
        gray / P6 RGB) payloads — no external imaging library needed,
        so this REAL branch is exercisable in any environment; raises
        ``ValueError`` per non-netpbm payload. Bit-identical to PIL's
        ``convert("L")`` on the same payload (ITU-R 601-2 integer luma),
        pinned by test where Pillow exists.
      - ``"auto"``: real when PIL is importable, else fake.

    The Spark-side shape (schema, Arrow batching, partitioning) is
    identical for all engines, so a build verified on ``fake`` upgrades
    in place when the deployment ships an imaging library.
    """
    if engine == "auto":
        engine = "real" if _pil() is not None else "fake"
    if engine == "real" and _pil() is None:
        # fail fast on the driver, not per-task on the executors
        raise NotImplementedError(
            "engine='real' requires an imaging library (PIL) not present; "
            "install Pillow or use engine='fake'/'auto' "
            "(or engine='netpbm' for P5/P6 payloads)"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"]
            meta = pdf["media_meta"]
            if engine in ("real", "netpbm"):
                dec = _decode_real if engine == "real" else _decode_netpbm_strict
                decoded = [dec(bytes(b)) for b in payloads]
                out = pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "width": [d[0] for d in decoded],
                        "height": [d[1] for d in decoded],
                        "mean_byte": [d[2] for d in decoded],
                        "feature": [d[3] for d in decoded],
                    }
                )
            else:
                # vectorized byte moments (r11, guide §4.2): sum(b)
                # iterated per byte in Python and count() scanned the
                # payload 8 times; one bincount yields both, with exact
                # integer arithmetic (bit-identical to the loop forms,
                # parity pinned in tests/test_r11_opt.py — the feature
                # bins count the EXACT byte values 0,32,...,224, as
                # b.count(bytes([v])) did).
                import numpy as np

                means: list[float] = []
                feats: list[list[float]] = []
                for b in payloads:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    if len(arr):
                        hist = np.bincount(arr, minlength=256)
                        means.append(int(arr.sum(dtype=np.int64)) / len(arr))
                    else:
                        hist = np.zeros(256, dtype=np.int64)
                        means.append(0.0)
                    feats.append([float(hist[v]) for v in range(0, 256, 32)])
                out = pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "width": [m["width"] for m in meta],
                        "height": [m["height"] for m in meta],
                        "mean_byte": means,
                        "feature": feats,
                    }
                )
            yield out  # yield bound: row-local (one output row per payload)

    return df.mapInPandas(_batches, DECODE_OUT_SCHEMA)


def _netpbm_gray(payload: bytes) -> tuple[int, int, bytes] | None:
    """stdlib parse of BINARY netpbm (P5 grayscale, P6 RGB, maxval ≤
    255) → (width, height, gray pixel bytes row-major), or None if the
    payload is not binary netpbm. RGB collapses to gray with PIL's
    exact fixed-point ITU-R 601-2 luma from convert("L")
    (L = (19595*R + 38470*G + 7471*B) >> 16 — NOT the decimal
    (299R+587G+114B)//1000 approximation, which diverges by 1 on
    boundary pixels like RGB(100,0,150)), so results are bit-identical
    to the PIL branch on the same payload."""
    if not payload.startswith((b"P5", b"P6")):
        return None
    # header: magic, then 3 ASCII ints (width height maxval) separated by
    # whitespace; '#' starts a comment running to end-of-line
    pos, toks = 2, []
    n = len(payload)
    while len(toks) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n":
                pos += 1
            tok = payload[start:pos]
            if not tok.isdigit():
                return None  # malformed header (non-numeric token)
            toks.append(int(tok))
    if len(toks) < 3 or pos >= n:
        return None
    w, h, maxval = toks
    if maxval > 255 or w <= 0 or h <= 0:
        return None  # 16-bit samples / bad header: not ours, let PIL try
    pos += 1  # single whitespace byte after maxval precedes raster
    ch = 3 if payload.startswith(b"P6") else 1
    raster = payload[pos : pos + w * h * ch]
    if len(raster) < w * h * ch:
        return None
    if ch == 1:
        gray = bytes(raster)
    else:
        # vectorized luma (r11, guide §4.2): the per-pixel Python
        # generator was the kernel's hot loop on real rasters. Exact:
        # R*19595 + G*38470 + B*7471 <= 255*65536 < 2^32, so the uint32
        # arithmetic and >> 16 are bit-identical to the int expression
        # (parity pinned per-byte in tests/test_r11_opt.py).
        import numpy as np

        a = (
            np.frombuffer(raster, dtype=np.uint8)
            .reshape(-1, 3)
            .astype(np.uint32)
        )
        gray = (
            ((a[:, 0] * 19595 + a[:, 1] * 38470 + a[:, 2] * 7471) >> 16)
            .astype(np.uint8)
            .tobytes()
        )
    return w, h, gray


def _decode_netpbm(payload: bytes) -> tuple[int, int, float, list[float]] | None:
    """(width, height, mean gray, 8-bin gray histogram) via the stdlib
    netpbm parser, or None if the payload is not binary netpbm."""
    g = _netpbm_gray(payload)
    if g is None:
        return None
    w, h, gray = g
    # vectorized histogram/moments (r11, guide §4.2): the per-byte
    # Python loop dominated the decode at real raster sizes. All
    # arithmetic is exact integer (np.bincount counts; int64 dot for
    # sum(i*c) — bound 255·npix, far under 2^63), so mean and bins are
    # bit-identical to the loop form (parity pinned in
    # tests/test_r11_opt.py).
    import numpy as np

    hist256 = np.bincount(np.frombuffer(gray, dtype=np.uint8), minlength=256)
    npix = max(1, w * h)
    mean = int(np.dot(np.arange(256, dtype=np.int64), hist256)) / npix
    bins = [float(v) for v in hist256.reshape(8, 32).sum(axis=1)]
    return w, h, mean, bins


def _decode_netpbm_strict(payload: bytes) -> tuple[int, int, float, list[float]]:
    out = _decode_netpbm(payload)
    if out is None:
        raise ValueError(
            "engine='netpbm' requires binary netpbm (P5/P6, maxval<=255) payloads"
        )
    return out


def _decode_real(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Real image decode: (width, height, mean grayscale byte, 8-bin
    grayscale histogram). netpbm payloads decode via the stdlib parser
    (identical output to PIL); everything else goes through PIL.
    Executor-side twin of the driver-side gate in decode_and_featurize —
    imports PIL at call time so only tasks that take the real branch
    need it."""
    import io

    nb = _decode_netpbm(payload)
    if nb is not None:
        return nb
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "media decoding requires imaging/audio libraries not present; "
            "plug PIL.Image.open / av.open here in a full deployment"
        )
    with Image.open(io.BytesIO(payload)) as img:
        gray = img.convert("L")
        w, h = gray.size
        hist256 = gray.histogram()  # 256 bins
        n = max(1, w * h)
        mean = sum(i * c for i, c in enumerate(hist256)) / n
        bins = [float(sum(hist256[i : i + 32])) for i in range(0, 256, 32)]
        return w, h, mean, bins


FRAME_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(df: DataFrame, fps: float = 1.0, id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame at
    ``fps`` over the clip's `duration_ms` (always ≥ 1 frame), timestamps
    evenly spaced from 0. The frame "decode" is a deterministic fake
    (md5 of payload + frame index — a real build seeks the container via
    `_decode_real`). This is the row-expanding mapInPandas shape: output
    cardinality is data-dependent, which a pandas_udf can't express.
    """
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list = []
            idxs: list[int] = []
            tss: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload, meta in zip(pdf[id_col], pdf["media"], pdf["media_meta"]):
                dur = int(meta["duration_ms"])
                n = max(1, int(dur * fps / 1000.0))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(int(i * (dur / n)))
                    frames.append(
                        hashlib.md5(bytes(payload) + i.to_bytes(4, "big")).digest()
                    )
            # yield bound: frames-per-doc = dur*fps (metadata-bounded, not pair-product)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(_batches, FRAME_OUT_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrites metadata; payload transform stubbed (the
    fake payload is size-invariant)."""
    return df.withColumn(
        "media_meta",
        F.col("media_meta").withField("width", F.lit(width).cast("int")).withField(
            "height", F.lit(height).cast("int")
        ),
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("chunk", T.BinaryType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_windows(
    df: DataFrame, window_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Audio segmentation plumbing: one row per fixed ``window_ms``
    window over the clip's duration (last window truncated; always ≥ 1
    window for nonzero duration). The "resample" is a deterministic fake
    (md5 of payload + window index as the window's PCM chunk, its mean
    byte / 255 as a stand-in RMS — a real build decodes via
    `_decode_real` and windows actual samples). Same row-expanding
    mapInPandas shape as frame_sample: binaries stay in Arrow batches on
    the executors, output cardinality is duration-dependent.
    """
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list = []
            idxs: list[int] = []
            starts: list[int] = []
            ends: list[int] = []
            chunks: list[bytes] = []
            rmss: list[float] = []
            for doc_id, payload, meta in zip(
                pdf[id_col], pdf["media"], pdf["media_meta"]
            ):
                dur = int(meta["duration_ms"])
                if dur <= 0:
                    continue
                n = (dur + window_ms - 1) // window_ms
                for i in range(n):
                    chunk = hashlib.md5(
                        bytes(payload) + i.to_bytes(4, "big")
                    ).digest()
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(i * window_ms)
                    ends.append(min((i + 1) * window_ms, dur))
                    chunks.append(chunk)
                    rmss.append(sum(chunk) / len(chunk) / 255.0)
            # yield bound: windows-per-doc = dur/window_ms (metadata-bounded)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "chunk": chunks,
                    "rms": rmss,
                }
            )

    return df.mapInPandas(_batches, AUDIO_WINDOW_SCHEMA)


def _dhash64(gray: bytes, w: int, h: int) -> int:
    """64-bit difference hash (dHash) of a grayscale image: sample a
    9×8 grid by nearest-neighbor, emit one bit per horizontally adjacent
    sample pair (left > right). The standard perceptual hash for
    image near-dup — stable under resize, recompression, and small
    brightness shifts (monotone pixel transforms preserve every
    comparison). Returned as a SIGNED 64-bit value so it round-trips
    through a Spark/parquet BIGINT column."""
    bits = 0
    for r in range(8):
        y = (r * h) // 8
        row = [gray[y * w + (c * w) // 9] for c in range(9)]
        for c in range(8):
            bits = (bits << 1) | (1 if row[c] > row[c + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """(id, binary netpbm payload) → (id, width, height, dhash BIGINT)
    via the stdlib decoder — real pixel math, no imaging library.
    Non-netpbm / undecodable payloads are dropped (the strict-engine
    ValueError contract belongs to decode_and_featurize; a dedup sweep
    over a mixed corpus must not die on one junk blob)."""
    id_type = dict(df.select(id_col).dtypes)[id_col]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, hashes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                g = _netpbm_gray(bytes(payload))
                if g is None:
                    continue
                w, h, gray = g
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                hashes.append(_dhash64(gray, w, h))
            # yield bound: row-local (at most one output row per payload)
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "dhash": hashes}
            )

    return df.mapInPandas(
        _batches, f"{id_col} {id_type}, width int, height int, dhash long"
    )


def dhash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Image near-dup pairs by dHash Hamming distance ≤ ``max_hamming``,
    WITHOUT the all-pairs join: the 64-bit hash splits into four 16-bit
    bands; by pigeonhole, any pair within Hamming distance < 4 agrees on
    at least one whole band, so a band-key equi-join (the same
    hash-agg-bucket shape as MinHash LSH) has 100% recall for
    ``max_hamming`` ≤ 3 — raise the band count for looser thresholds.
    Candidates are then exact-filtered with bit_count(xor). Output:
    (id_a < id_b, hamming)."""
    if max_hamming >= 4:
        raise ValueError(
            "4 bands guarantee recall only for max_hamming <= 3; "
            "use more bands for looser thresholds"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col(hash_col), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(4)
        ]
    )
    b = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(bands).alias("bk")
    ).select(id_col, hash_col, "bk.band", "bk.key")
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"), "band", "key"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"), "band", "key"
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def scene_cuts(
    frames: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    idx_col: str = "frame_idx",
    frame_col: str = "frame",
) -> DataFrame:
    """Scene-change detection over sampled frames (frame_sample output):
    a cut is declared where the inter-frame signature distance exceeds
    ``threshold``, and frames are grouped into scenes by a running cut
    count — the shot-segmentation pass before per-scene frame selection
    in video training-data pipelines.

    The signature here is a deterministic JVM-side proxy (first 4 bytes
    of the frame payload as a [0,1) fraction via hex decode — exact on
    the fake-decode frames); a real build swaps in an Arrow-batched
    grayscale-histogram UDF, and everything downstream (the lag window,
    the cut rule, the running scene index) is unchanged.

    Scale shape: one exchange on the video id; two stacked ordered
    windows per video (lag + running sum) over per-video frame counts —
    bounded state, no Python in the default path.
    """
    from pyspark.sql import Window

    sig = (
        F.conv(F.substring(F.hex(F.col(frame_col)), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    w = Window.partitionBy(id_col).orderBy(idx_col)
    base = frames.withColumn("sig", sig).withColumn(
        "is_cut",
        F.when(
            F.lag("sig").over(w).isNotNull()
            & (F.abs(F.col("sig") - F.lag("sig").over(w)) > F.lit(float(threshold))),
            True,
        ).otherwise(False),
    )
    scene = F.sum(F.col("is_cut").cast("int")).over(
        Window.partitionBy(id_col).orderBy(idx_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    return base.withColumn("scene_idx", scene.cast("int"))
