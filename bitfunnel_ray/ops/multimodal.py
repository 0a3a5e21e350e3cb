"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Real codecs are AUTO-DETECTED per actor: Pillow (``backend="pil"``) for
image decode/resize, PyAV (``backend="av"``) for video frame sampling
and audio features — each imported once in ``__init__``, never per
batch.  When neither library is in the environment the honest ``stub``
backend raises and the deterministic ``fake`` backend keeps the full
Ray-side contract testable: schema, actor signature, batch sizing, and
output layout are identical across backends.

Batch-size guidance: binary payload rows are wide — size ``batch_size``
so batch_bytes × concurrency fits the worker heap (e.g. 32 rows of 4 MB
images per batch, not 4096).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.uint64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _resolve_image_backend(backend: str) -> str:
    """``auto`` → ``pil`` when Pillow imports, else a clear error naming
    the alternatives.  Resolution happens ONCE per actor (``__init__``),
    never per batch."""
    if backend != "auto":
        return backend
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError as exc:
        raise ImportError(
            "backend='auto' found no image codec (Pillow not installed); "
            "install pillow, or use backend='fake' for deterministic "
            "plumbing tests"
        ) from exc


def _resolve_video_backend(backend: str) -> str:
    """``auto`` → ``av`` when PyAV imports, else a clear error naming the
    alternatives — the video/audio twin of ``_resolve_image_backend``
    (same once-per-actor resolution discipline)."""
    if backend != "auto":
        return backend
    try:
        import av  # noqa: F401

        return "av"
    except ImportError as exc:
        raise ImportError(
            "backend='auto' found no video/audio codec (PyAV not "
            "installed); install av, or use backend='fake' for "
            "deterministic plumbing tests"
        ) from exc


class DecodeFeatures:
    """Actor stage: binary payload → fixed-dim feature vector.

    ``backend="stub"`` raises NotImplementedError (the honest default);
    ``backend="fake"`` produces a deterministic hash-derived vector so the
    downstream plumbing (ANN, dedup) is testable end-to-end;
    ``backend="pil"`` decodes real images with Pillow (loaded once here)
    and emits a mean-pooled luminance vector; ``backend="av"`` decodes
    real AUDIO payloads with PyAV (loaded once here) and emits dim-bucket
    mean-absolute-amplitude features of the mono waveform;
    ``backend="auto"`` picks ``pil`` when Pillow is importable and errors
    clearly otherwise (pass ``"av"`` explicitly for audio columns).
    A real deployment swaps in its model the same way.
    """

    def __init__(self, backend: str = "stub", dim: int = 16):
        backend = _resolve_image_backend(backend)
        self.backend = backend
        self.dim = dim
        if backend not in ("stub", "fake", "pil", "av"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pil":
            import PIL.Image as _Image  # once per actor

            self._Image = _Image
        elif backend == "av":
            import av as _av  # once per actor

            self._av = _av

    def _decode_stub(self, payloads):
        raise NotImplementedError(
            "no image/audio codec in this environment; use backend='fake' "
            "for deterministic plumbing tests"
        )

    def _decode_fake(self, payloads) -> np.ndarray:
        from bitfunnel_ray.functions.hashing import murmur64a

        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            h = murmur64a(bytes(p or b""))
            seeds = np.arange(self.dim, dtype=np.uint64) + np.uint64(h)
            vals = (seeds * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(11)
            out[i] = (vals.astype(np.float64) / float(1 << 53) - 0.5).astype(np.float32)
        return out

    def _decode_pil(self, payloads) -> np.ndarray:
        import io

        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            img = self._Image.open(io.BytesIO(bytes(p or b"")))
            # dim-pixel luminance strip: a real (if minimal) content
            # feature — resize does the mean pooling
            strip = img.convert("L").resize((self.dim, 1))
            v = np.asarray(strip, dtype=np.float32).ravel()[: self.dim]
            out[i] = v / 255.0 - 0.5
        return out

    def _decode_av_audio(self, payloads) -> np.ndarray:
        """Mono waveform → ``dim`` bucket mean-|amplitude| features — the
        minimal real audio content feature (PyAV decodes+resamples; the
        resampler is built once per actor call-site, not per payload).

        Per-ROW error isolation: web-crawled media routinely contains
        null/empty/truncated payloads, and av.open raises on them — an
        unguarded decode would kill the whole map task for one bad row.
        Undecodable rows emit the all-zero vector (same shape contract as
        an empty decode); downstream filters drop them by norm."""
        import io

        out = np.zeros((len(payloads), self.dim), dtype=np.float32)
        resampler = self._av.AudioResampler(format="flt", layout="mono")
        for i, p in enumerate(payloads):
            try:
                with self._av.open(io.BytesIO(bytes(p or b""))) as container:
                    chunks = []
                    for frame in container.decode(audio=0):
                        for rf in resampler.resample(frame):
                            chunks.append(
                                rf.to_ndarray().ravel().astype(np.float32)
                            )
            except Exception:  # corrupt/empty payload — av raises varied types
                continue
            if not chunks:
                continue
            wave = np.abs(np.concatenate(chunks))
            # dim equal-width buckets over the waveform, mean per bucket
            edges = np.linspace(0, len(wave), self.dim + 1).astype(np.int64)
            for j in range(self.dim):
                seg = wave[edges[j] : edges[j + 1]]
                out[i, j] = float(seg.mean()) if len(seg) else 0.0
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        if self.backend == "fake":
            feats = self._decode_fake(payloads)
        elif self.backend == "pil":
            feats = self._decode_pil(payloads)
        elif self.backend == "av":
            feats = self._decode_av_audio(payloads)
        else:
            feats = self._decode_stub(payloads)
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                # zero-copy list<float32> from the contiguous (n, dim)
                # feature matrix: arange offsets + raveled values
                "features": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, feats.size + 1, feats.shape[1] or 1, dtype=np.int32)[
                            : len(feats) + 1
                        ]
                    ),
                    pa.array(feats.ravel(), pa.float32()),
                ),
            }
        )


def extract_features(
    media: "ray.data.Dataset",
    backend: str = "stub",
    dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    # resolve driver-side so a missing codec raises the clear ImportError
    # here, not as an ActorDiedError from the pool constructor
    backend = _resolve_image_backend(backend)
    # callable-class actor pool: decode state loads once per actor
    return media.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"backend": backend, "dim": dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def html_to_media(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Adapter: treat the corpus ``html`` binary column as media payloads
    (exercises the binary-column path on the standard test corpus)."""

    def f(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "media_id": t["doc_id"].cast(pa.uint64()),
                "media_type": pa.array(["image"] * n, pa.string()),
                "payload": t["html"].cast(pa.large_binary()),
                "width": pa.array(np.zeros(n, np.int32)),
                "height": pa.array(np.zeros(n, np.int32)),
                "duration_ms": pa.array(np.zeros(n, np.int32)),
            },
            schema=MEDIA_SCHEMA,
        )

    return corpus.select_columns(["doc_id", "html"]).map_batches(f, batch_format="pyarrow")


_MAGIC = (
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
    (b"<htm", "html"),
    (b"<HTM", "html"),
)


def binary_stats_batch(t: pa.Table, *, col: str = "html") -> pa.Table:
    """Per-blob statistics over an opaque binary column, computed WITHOUT
    any media codec: size, Shannon byte entropy (bits/byte), distinct
    byte count, and a magic-byte format sniff.  Fully vectorized over
    variable-length blobs: the column's flat byte buffer is viewed once,
    per-row byte histograms come from ONE ``bincount`` over
    (row << 8 | byte) keys, and entropies reduce per row with
    ``add.reduceat`` — no per-row python."""
    arr = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    n = len(arr)
    empty_like = {
        "doc_id": t["doc_id"].cast(pa.int64()),
        "n_bytes": pa.array(np.zeros(n, np.int64), pa.int64()),
        "entropy_bits": pa.array(np.zeros(n, np.float64), pa.float64()),
        "n_distinct_bytes": pa.array(np.zeros(n, np.int64), pa.int64()),
        "sniff": pa.array(["empty"] * n, pa.string()),
    }
    if n == 0 or arr.nbytes == 0:
        return pa.table(empty_like)
    # large_binary uses 64-bit offsets; binary uses 32-bit
    off_width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_width)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = data[offsets[0] : offsets[-1]]
    # one histogram for the whole batch: key = row * 256 + byte
    hist = np.bincount((row_of << np.int64(8)) | flat, minlength=n * 256)
    hist = hist.reshape(n, 256).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = hist / np.maximum(lens[:, None], 1)
        ent = -np.nansum(np.where(p > 0, p * np.log2(p), 0.0), axis=1)
    distinct = (hist > 0).sum(axis=1).astype(np.int64)
    heads = [
        bytes(data[offsets[i] : min(offsets[i] + 4, offsets[i + 1])])
        for i in range(n)
    ]  # n small slices (metadata-sized), not a byte scan
    sniff = []
    for h in heads:
        tag = "unknown" if h else "empty"
        for magic, name in _MAGIC:
            if h[: len(magic)] == magic:
                tag = name
                break
        sniff.append(tag)
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_bytes": pa.array(lens, pa.int64()),
            "entropy_bits": pa.array(ent, pa.float64()),
            "n_distinct_bytes": pa.array(distinct, pa.int64()),
            "sniff": pa.array(sniff, pa.string()),
        }
    )


def binary_stats(ds: "ray.data.Dataset", col: str = "html") -> "ray.data.Dataset":
    """Map-only binary-column profiling (size / entropy / distinct bytes /
    magic sniff) — the codec-free half of multimodal ingest QA: route
    blobs by sniffed type, drop zero-entropy padding, flag
    truncated/corrupt payloads by entropy outliers."""
    from functools import partial

    return ds.select_columns(["doc_id", col]).map_batches(
        partial(binary_stats_batch, col=col), batch_format="pyarrow"
    )


class ResizeImages:
    """Actor stage: image payload → resized payload (+ updated metadata).

    ``backend="stub"`` raises (no codec in this container);
    ``backend="fake"`` emits a deterministic payload whose length scales
    with target_w × target_h so memory-profile plumbing (batch sizing,
    spill behavior) is exercised realistically.  A real deployment loads
    PIL/turbojpeg once here in ``__init__`` and swaps ``_resize_fake``.

    Batch sizing matters more than anywhere else in the pipeline: output
    rows are ~target_w*target_h*bytes_per_px/compression wide; pick
    ``batch_size`` so in-flight batches × concurrency fit the heap.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224, backend: str = "stub"):
        backend = _resolve_image_backend(backend)
        if backend not in ("stub", "fake", "pil"):
            raise ValueError(f"unknown backend {backend!r}")
        self.target_w, self.target_h = int(target_w), int(target_h)
        self.backend = backend
        if backend == "pil":
            import PIL.Image as _Image  # once per actor

            self._Image = _Image

    def _resize_fake(self, payload: bytes) -> bytes:
        # deterministic pseudo-resample: tile/truncate the source bytes to
        # the target pixel count (1 byte/px stand-in)
        n = self.target_w * self.target_h
        src = bytes(payload or b"\x00")
        reps = -(-n // len(src))
        return (src * reps)[:n]

    def _resize_pil(self, payload: bytes) -> bytes:
        import io

        img = self._Image.open(io.BytesIO(bytes(payload or b"")))
        buf = io.BytesIO()
        img.resize((self.target_w, self.target_h)).save(buf, format="PNG")
        return buf.getvalue()

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "no image codec in this environment; use backend='fake'"
            )
        fn = self._resize_pil if self.backend == "pil" else self._resize_fake
        out = [fn(p) for p in t["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array([self.target_w] * len(t), pa.int32()),
                "height": pa.array([self.target_h] * len(t), pa.int32()),
                "duration_ms": t["duration_ms"],
            }
        )


def resize_images(
    media: "ray.data.Dataset",
    target_w: int = 224,
    target_h: int = 224,
    backend: str = "stub",
    concurrency: int = 2,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    backend = _resolve_image_backend(backend)  # clear error driver-side
    return media.map_batches(
        ResizeImages,
        fn_constructor_kwargs={
            "target_w": target_w,
            "target_h": target_h,
            "backend": backend,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class SampleFrames:
    """Actor stage: one video row → ``n_frames`` frame rows (the flat-map
    expansion every video pipeline needs; output schema carries
    frame_idx + timestamp so downstream stages are order-independent).

    ``backend="fake"`` slices the payload into n deterministic chunks (a
    stand-in for keyframe extraction); ``"av"`` does REAL evenly-spaced
    frame extraction with PyAV (container opened per row, codec loaded
    once per actor; frames re-encode to PNG via Pillow — any env with
    PyAV has it); ``"auto"`` picks ``av`` when PyAV imports and errors
    clearly otherwise; ``"stub"`` raises.
    """

    def __init__(self, n_frames: int = 4, backend: str = "stub"):
        backend = _resolve_video_backend(backend)
        if backend not in ("stub", "fake", "av"):
            raise ValueError(f"unknown backend {backend!r}")
        self.n_frames = int(n_frames)
        self.backend = backend
        if backend == "av":
            import av as _av  # once per actor
            import PIL.Image as _Image

            self._av = _av
            self._Image = _Image

    def _rows_av(self, payload: bytes, dur_ms: int):
        """Evenly-spaced real frames: seek to k/n of the duration, decode
        the next frame, PNG-encode.  Returns [(frame_idx, ts_ms, bytes)].

        Per-ROW error isolation (see ``_decode_av_audio``): a corrupt or
        empty payload yields NO frame rows for that video instead of
        killing the whole map task — the flat-map contract already allows
        fewer than n_frames rows per input."""
        import io

        rows = []
        try:
            with self._av.open(io.BytesIO(bytes(payload or b""))) as container:
                vs = container.streams.video[0]
                tb = float(vs.time_base) if vs.time_base else 0.0
                dur_s = (
                    float(vs.duration * vs.time_base)
                    if vs.duration and vs.time_base
                    else float(dur_ms or 0) / 1000.0
                )
                for k in range(self.n_frames):
                    t_s = dur_s * k / max(self.n_frames, 1)
                    if tb:
                        container.seek(int(t_s / tb), stream=vs, backward=True)
                    frame = next(container.decode(vs), None)
                    if frame is None:
                        break
                    buf = io.BytesIO()
                    self._Image.fromarray(
                        frame.to_ndarray(format="rgb24")
                    ).save(buf, format="PNG")
                    ts = (
                        int(frame.time * 1000)
                        if frame.time is not None
                        else int(t_s * 1000)
                    )
                    rows.append((k, ts, buf.getvalue()))
        except Exception:  # corrupt/empty/truncated payload — keep any
            pass  # frames decoded before the error; the row set may be short
        return rows

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.backend == "stub":
            raise NotImplementedError(
                "no video codec in this environment; use backend='fake'"
            )
        ids, types, fidx, ts, payloads = [], [], [], [], []
        for mid, mtype, payload, dur in zip(
            t["media_id"].to_pylist(),
            t["media_type"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            if self.backend == "av":
                for k, t_ms, png in self._rows_av(payload, dur):
                    ids.append(mid)
                    types.append(mtype)
                    fidx.append(k)
                    ts.append(t_ms)
                    payloads.append(png)
                continue
            src = bytes(payload or b"\x00")
            step = max(1, len(src) // self.n_frames)
            for k in range(self.n_frames):
                ids.append(mid)
                types.append(mtype)
                fidx.append(k)
                ts.append(int((dur or 0) * k / max(self.n_frames, 1)))
                payloads.append(src[k * step : (k + 1) * step] or b"\x00")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.uint64()),
                "media_type": pa.array(types, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        )


def sample_frames(
    media: "ray.data.Dataset",
    n_frames: int = 4,
    backend: str = "stub",
    concurrency: int = 2,
    batch_size: int = 16,
) -> "ray.data.Dataset":
    """Frame sampling as an actor-pool flat expansion: each input batch
    of B video rows yields B × n_frames frame rows — batch_size is the
    backpressure knob (frames are wide; keep B small)."""
    backend = _resolve_video_backend(backend)  # clear error driver-side
    return media.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames, "backend": backend},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
