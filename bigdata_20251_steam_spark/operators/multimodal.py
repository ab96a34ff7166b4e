"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:

- media rows are ``(id, payload binary, media_type string, meta struct)`` —
  the payload is never interpreted by Catalyst, only moved; metadata
  (byte length, magic bytes, declared type) is extracted with JVM
  built-ins so filtering/routing happens *before* any decode.
- decode / feature-extraction runs as ``mapInPandas`` — Arrow-batched
  iterator of pandas DataFrames, the only sane way to run a codec per row:
  one Python worker per partition, zero-copy binary transfer, batch-sized
  amortization of interpreter cost.  Partition sizing rule: payload bytes
  per partition (not row count) bounds worker memory — repartition by
  ``ceil(sum(n_bytes)/target)`` upstream.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_features`` ships a deterministic fake decoder behind the same
signature, and ``decode_real`` raises NotImplementedError with the
integration contract documented — the Spark-side plumbing (schema,
batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature extractor — fixed and explicit, as every
#: mapInPandas schema must be.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("decoder", StringType(), False),
    ]
)

FEATURE_DIM = 8


def to_media_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media table: text bytes as the opaque payload.

    With real media the payload comes from the storage layer (parquet
    binary column / object-store pointers); everything downstream is
    payload-agnostic.  Partitioning note: mapInPandas parallelism =
    partition count = concurrent Python decode workers, but each worker
    costs ~1s to fork+import — so do NOT blindly repartition small
    inputs (measured: identity mapInPandas 0.5s at 1 partition, 3.9s at
    32 on 5k rows).  At real scale, repartition upstream by payload
    bytes (ceil(sum(n_bytes)/target)) so decode cost, which dwarfs
    worker startup, spreads evenly.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata extraction without decoding: byte length + magic prefix.

    Pure JVM (hex + substring on the binary) — this is the cheap routing
    stage that decides which decoder pool a payload goes to.
    """
    return media.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.substring(F.hex(F.col("payload")), 1, 8).alias("magic_hex"),
    )


def _make_pixel_decoder():
    """Build the pure-Python PPM/BMP decoder as a NESTED function.

    Why a factory: cloudpickle serializes module-level functions by
    *reference* (workers would need the package importable), but nested
    functions by *value* — a factory-made function has a non-importable
    qualname, so capturing it inside a ``mapInPandas`` closure ships the
    actual bytecode to the Python workers.  Formats are decoded from the
    published specs (netpbm P3/P6; Windows BITMAPINFOHEADER 24-bit
    uncompressed) — no codec library involved.
    """

    def decode_image(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
        """bytes -> (width, height, row-major top-down [(r,g,b), ...]).

        Supports PPM P6 (binary) / P3 (ascii), maxval <= 255, with
        ``#`` comments; BMP with the 40-byte BITMAPINFOHEADER, 24 bpp,
        uncompressed (BI_RGB), bottom-up or top-down rows, 4-byte row
        padding, BGR byte order; and PNG (8-bit RGB / RGBA color types
        2 and 6, non-interlaced — the overwhelmingly common encoder
        output) via stdlib ``zlib`` inflate + the five scanline filters
        (None/Sub/Up/Average/Paeth) per the PNG spec; RGBA alpha is
        dropped (straight RGB channels).  Chunk CRCs are not verified —
        this is a decoder, not an integrity checker.  Raises ValueError
        on anything else — the router falls back to the fake decoder.
        """
        import struct
        import zlib

        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            pos = 8
            w = h = color_type = None
            idat = b""
            while pos + 8 <= len(b):
                ln = struct.unpack_from(">I", b, pos)[0]
                ctype = b[pos + 4 : pos + 8]
                data = b[pos + 8 : pos + 8 + ln]
                if ctype == b"IHDR":
                    if len(data) != 13:
                        raise ValueError("bad PNG IHDR length")
                    w, h, depth, color_type, comp, filt, interlace = (
                        struct.unpack(">IIBBBBB", data)
                    )
                    if (
                        depth != 8
                        or color_type not in (2, 6)
                        or comp != 0
                        or filt != 0
                        or interlace != 0
                    ):
                        raise ValueError(
                            "unsupported PNG (need 8-bit RGB/RGBA, "
                            "non-interlaced)"
                        )
                elif ctype == b"IDAT":
                    idat += data
                elif ctype == b"IEND":
                    break
                pos += 12 + ln  # length + type + data + crc
            if w is None or not idat or w <= 0 or h <= 0:
                raise ValueError("truncated PNG")
            raw = zlib.decompress(idat)
            ch = 3 if color_type == 2 else 4
            stride = w * ch
            if len(raw) != h * (stride + 1):
                raise ValueError("PNG pixel data length mismatch")
            px: list[tuple[int, int, int]] = []
            prev = bytearray(stride)
            rp = 0
            for _ in range(h):
                f = raw[rp]
                line = bytearray(raw[rp + 1 : rp + 1 + stride])
                rp += stride + 1
                if f == 1:  # Sub
                    for i in range(ch, stride):
                        line[i] = (line[i] + line[i - ch]) & 0xFF
                elif f == 2:  # Up
                    for i in range(stride):
                        line[i] = (line[i] + prev[i]) & 0xFF
                elif f == 3:  # Average
                    for i in range(stride):
                        a = line[i - ch] if i >= ch else 0
                        line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    for i in range(stride):
                        a = line[i - ch] if i >= ch else 0
                        up = prev[i]
                        c = prev[i - ch] if i >= ch else 0
                        p = a + up - c
                        pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                        pred = (
                            a
                            if pa <= pb and pa <= pc
                            else (up if pb <= pc else c)
                        )
                        line[i] = (line[i] + pred) & 0xFF
                elif f != 0:
                    raise ValueError(f"bad PNG scanline filter {f}")
                prev = line
                for k in range(0, stride, ch):
                    px.append((line[k], line[k + 1], line[k + 2]))
            return w, h, px
        if b[:2] in (b"P6", b"P3"):
            # tokenize the header: whitespace-separated ints, '#' comments
            toks: list[bytes] = []
            i = 2
            while len(toks) < 3:
                while i < len(b) and b[i : i + 1].isspace():
                    i += 1
                if i < len(b) and b[i : i + 1] == b"#":
                    while i < len(b) and b[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                if j == i:
                    raise ValueError("truncated PPM header")
                toks.append(b[i:j])
                i = j
            w, h, maxval = (int(t) for t in toks)
            if maxval > 255 or w <= 0 or h <= 0:
                raise ValueError("unsupported PPM (maxval > 255 or bad dims)")
            if b[:2] == b"P6":
                i += 1  # exactly one whitespace byte after maxval
                raw = b[i : i + w * h * 3]
                if len(raw) != w * h * 3:
                    raise ValueError("truncated PPM P6 pixel data")
                px = [
                    (raw[k], raw[k + 1], raw[k + 2])
                    for k in range(0, len(raw), 3)
                ]
            else:
                vals = b[i:].split()
                if len(vals) < w * h * 3:
                    raise ValueError("truncated PPM P3 pixel data")
                nums = [int(v) for v in vals[: w * h * 3]]
                px = [
                    (nums[k], nums[k + 1], nums[k + 2])
                    for k in range(0, w * h * 3, 3)
                ]
            return w, h, px
        if b[:2] == b"BM":
            if len(b) < 54:
                raise ValueError("truncated BMP header")
            pix_off = struct.unpack_from("<I", b, 10)[0]
            hdr_size = struct.unpack_from("<I", b, 14)[0]
            if hdr_size < 40:
                raise ValueError("BMP core-header variant unsupported")
            w, h_signed = struct.unpack_from("<ii", b, 18)
            bpp = struct.unpack_from("<H", b, 28)[0]
            compression = struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
                raise ValueError("only 24bpp uncompressed BMP supported")
            h = abs(h_signed)
            stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            if len(b) < pix_off + stride * h:
                raise ValueError("truncated BMP pixel data")
            rows = []
            for r in range(h):
                # positive height = bottom-up storage
                src = h - 1 - r if h_signed > 0 else r
                off = pix_off + src * stride
                rows.append(
                    [
                        (b[off + 3 * c + 2], b[off + 3 * c + 1], b[off + 3 * c])
                        for c in range(w)
                    ]
                )
            return w, h, [p for row in rows for p in row]
        raise ValueError("unsupported image payload (not PPM/BMP)")

    return decode_image


#: Pure-Python PPM/BMP pixel decoder — REAL decode evidence (no codec
#: libraries needed).  Factory-made so mapInPandas closures ship it by
#: value; also the unit under tests/test_multimodal.py golden-pixel tests.
decode_image = _make_pixel_decoder()


def decode_real(payload: bytes, media_type: str) -> list[float]:
    """Real decode: bytes -> FEATURE_DIM pixel-statistics feature vector.

    Executable for PPM (P3/P6), 24-bit BMP and 8-bit RGB/RGBA PNG via
    the pure-Python ``decode_image``; other media types are the
    integration point for heavyweight codecs (PIL for other image/*,
    ffmpeg/torchaudio for audio|video/*) which are not in this
    container.

    Feature layout: [width, height, n_pixels, mean_r, mean_g, mean_b,
    min_luma, max_luma] (luma = Rec.601 integer weights).
    """
    raw8 = bytes(payload)[:8]
    if raw8[:2] in (b"P6", b"P3", b"BM") or raw8 == b"\x89PNG\r\n\x1a\n":
        w, h, px = decode_image(payload)
        n = len(px)
        lumas = [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in px]
        return [
            float(w),
            float(h),
            float(n),
            float(sum(p[0] for p in px)) / n,
            float(sum(p[1] for p in px)) / n,
            float(sum(p[2] for p in px)) / n,
            float(min(lumas)),
            float(max(lumas)),
        ]
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; PPM/BMP/PNG "
        "decode natively, other formats need PIL/ffmpeg wired here"
    )


#: Output schema of resize/transcode-style payload->payload transforms.
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

#: Output schema of frame sampling: one row per sampled frame.
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Payload -> resized payload (image resize / audio resample shape).

    mapInPandas keeps payload bytes in Arrow buffers end to end; the fake
    transform truncates/pads to width*height bytes so schema, batching and
    row-count semantics (1:1) are real.  Wire PIL's ``Image.resize`` at the
    marked point for real images.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize needs PIL; not in this container"
                )
            out = [
                (bytes(p)[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Payload -> sampled frames (video frame extraction shape): 1:N fan-out.

    Demonstrates the generator-style mapInPandas contract (output rows !=
    input rows).  The fake sampler emits one 16-byte "frame" every
    ``every_n_bytes``; a real implementation dispatches to ffmpeg with the
    same (doc_id, frame_idx, frame) output schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling needs ffmpeg; not in this container"
                    )
                b = bytes(p)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[off : off + 16])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


def decode_features(
    media: DataFrame, fake: bool = True, route_magic: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each ``pdf`` is a pandas DataFrame whose ``payload``
    column holds raw bytes.  The iterator shape lets a real decoder hold
    per-partition state (model weights, codec contexts) across batches.

    Routing: payloads carrying a PPM/BMP magic are decoded FOR REAL
    (pure-Python ``decode_image`` → pixel-statistics features, decoder
    column ``"ppm-bmp-pixel"``), PNG payloads likewise through the
    stdlib-zlib PNG branch (decoder ``"png-pixel"``); everything else
    uses the deterministic fake (``fake=True``, decoder
    ``"fake-moments"``) or raises (``fake=False``) at the
    heavyweight-codec integration point.

    ``route_magic=False`` disables magic-byte dispatch entirely and runs
    the fake byte-statistics decoder on every payload.  Use it when the
    payload column is known to be non-image data (e.g. text re-encoded
    as bytes): a text document that happens to START with ``P6``/``P3``/
    ``BM``/PNG magic would otherwise be routed into the pixel decoder
    and either raise or produce pixel features where byte statistics
    were expected.
    """

    dim = FEATURE_DIM
    pixel_decode = decode_image  # factory-made => cloudpickled by VALUE

    # The closure must be SELF-CONTAINED: cloudpickle serializes nested
    # functions by value but module-level functions by *reference*, so a
    # worker-side call to a module helper would require the engine package
    # on every worker's import path — which an external driver launching
    # from another cwd does not guarantee (observed: ModuleNotFoundError
    # in the Python worker).  Hence the decode logic lives inline and
    # decode_image is captured as a by-value-picklable nested function.
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * dim
            n = len(payload)
            return [
                float(n),
                float(payload[0]),
                float(payload[-1]),
                float(sum(payload) % 997),
                float(min(payload)),
                float(max(payload)),
                float(payload[n // 2]),
                float(n % 251),
            ]

        def pixel_features(payload: bytes) -> list[float]:
            w, h, px = pixel_decode(payload)
            n = len(px)
            lumas = [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in px]
            return [
                float(w),
                float(h),
                float(n),
                float(sum(p[0] for p in px)) / n,
                float(sum(p[1] for p in px)) / n,
                float(sum(p[2] for p in px)) / n,
                float(min(lumas)),
                float(max(lumas)),
            ]

        for pdf in batches:
            payloads = pdf["payload"]
            feats, names = [], []
            for p in payloads:
                raw = bytes(p)
                if route_magic and raw[:8] == b"\x89PNG\r\n\x1a\n":
                    feats.append(pixel_features(raw))
                    names.append("png-pixel")
                elif route_magic and raw[:2] in (b"P6", b"P3", b"BM"):
                    feats.append(pixel_features(raw))
                    names.append("ppm-bmp-pixel")
                elif fake or not route_magic:
                    feats.append(fake_decode(raw))
                    names.append("fake-moments")
                else:
                    raise NotImplementedError(
                        "no codec for this payload in this environment; "
                        "wire decode_real() and ship the package to workers "
                        "(spark.submit.pyFiles) for the real path"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "feature": feats,
                    "decoder": names,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
