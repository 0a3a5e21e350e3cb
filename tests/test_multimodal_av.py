"""PyAV auto-backend for video frame sampling + audio features —
mirrors the r4 PIL pattern: auto-detected once per actor, a clear
driver-side ImportError when absent, the deterministic ``fake`` backend
stays the CI path.  Real-decode tests skip when PyAV is not installed
(this container has no codec)."""

import numpy as np
import pyarrow as pa
import pytest

from bitfunnel_ray.ops import multimodal as mm

try:
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False


def _video_table(payload: bytes, dur_ms: int = 2000) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([7], pa.uint64()),
            "media_type": pa.array(["video"]),
            "payload": pa.array([payload], pa.large_binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "duration_ms": pa.array([dur_ms], pa.int32()),
        }
    )


def test_auto_resolution_errors_clearly_without_av():
    if HAVE_AV:
        pytest.skip("PyAV installed — auto resolves, nothing to assert")
    with pytest.raises(ImportError, match="PyAV|av"):
        mm._resolve_video_backend("auto")
    # explicit backends pass through untouched
    assert mm._resolve_video_backend("fake") == "fake"
    assert mm._resolve_video_backend("stub") == "stub"


def test_av_backend_requires_library():
    if HAVE_AV:
        pytest.skip("PyAV installed")
    with pytest.raises(ImportError):
        mm.SampleFrames(backend="av")


def test_fake_backend_remains_deterministic():
    t = _video_table(b"0123456789abcdef")
    a = mm.SampleFrames(n_frames=4, backend="fake")(t)
    b = mm.SampleFrames(n_frames=4, backend="fake")(t)
    assert a.equals(b)
    assert a["frame_idx"].to_pylist() == [0, 1, 2, 3]


@pytest.mark.skipif(not HAVE_AV, reason="PyAV not installed in this container")
def test_av_real_frame_sample():
    """Synthesize a tiny mpeg4 clip in-memory with PyAV, then sample real
    evenly-spaced frames through the actor stage."""
    import io

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 32, 32
        stream.pix_fmt = "yuv420p"
        for i in range(20):
            img = np.full((32, 32, 3), i * 12, np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    out = mm.SampleFrames(n_frames=4, backend="av")(_video_table(buf.getvalue()))
    assert len(out) == 4
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3]
    # PNG-encoded real frames
    assert all(p[:4] == b"\x89PNG" for p in out["payload"].to_pylist())
    assert sorted(out["ts_ms"].to_pylist()) == out["ts_ms"].to_pylist()


@pytest.mark.skipif(not HAVE_AV, reason="PyAV not installed in this container")
def test_av_real_audio_features():
    import io

    buf = io.BytesIO()
    sr = 8000
    with av.open(buf, mode="w", format="wav") as container:
        stream = container.add_stream("pcm_s16le", rate=sr)
        wave = (np.sin(np.linspace(0, 440 * 2 * np.pi, sr)) * 20000).astype(np.int16)
        frame = av.AudioFrame.from_ndarray(wave[None, :], format="s16", layout="mono")
        frame.sample_rate = sr
        for packet in stream.encode(frame):
            container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.uint64()),
            "media_type": pa.array(["audio"]),
            "payload": pa.array([buf.getvalue()], pa.large_binary()),
        }
    )
    out = mm.DecodeFeatures(backend="av", dim=8)(t)
    feats = np.asarray(out["features"].to_pylist()[0], np.float32)
    assert feats.shape == (8,)
    assert (feats > 0).all()  # a real sine has nonzero mean |amplitude|
