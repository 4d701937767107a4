"""Native (C++) feature-frontend tests."""

import numpy as np
import pytest

from pytorch_hmm_tpu.native import NativeFramer, native_available


@pytest.fixture(scope="module")
def audio():
    return np.random.default_rng(0).normal(size=(16000,)).astype(np.float32)


def test_framer_shapes(audio):
    f = NativeFramer(n_mels=40)
    f.push(audio)
    frames = f.pop()
    # 1 s @ 10 ms hop with a 25 ms window → (16000 - 400) // 160 + 1.
    assert frames.shape == ((16000 - 400) // 160 + 1, 40)
    assert np.isfinite(frames).all()


def test_framer_streaming_matches_batch(audio):
    """Chunked pushes must produce the same frames as one big push."""
    f1 = NativeFramer()
    f1.push(audio)
    batch = f1.pop()

    f2 = NativeFramer()
    out = []
    for i in range(0, len(audio), 777):
        f2.push(audio[i:i + 777])
        got = f2.pop()
        if len(got):
            out.append(got)
    streamed = np.concatenate(out)
    n = min(len(batch), len(streamed))
    np.testing.assert_allclose(streamed[:n], batch[:n], atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_matches_numpy_fallback(audio, monkeypatch):
    fn = NativeFramer()
    assert fn.is_native
    fn.push(audio)
    native_frames = fn.pop()

    import pytorch_hmm_tpu.native as nat

    monkeypatch.setenv("PYTORCH_HMM_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_lib_tried", False)
    fp = NativeFramer()
    assert not fp.is_native
    fp.push(audio)
    numpy_frames = fp.pop()

    n = min(len(native_frames), len(numpy_frames))
    assert n > 50
    np.testing.assert_allclose(
        native_frames[:n], numpy_frames[:n], atol=1e-2
    )


def test_framer_validates_config():
    with pytest.raises(ValueError, match="power of two"):
        NativeFramer(n_fft=500)
    with pytest.raises(ValueError, match="frame_len"):
        NativeFramer(n_fft=256, frame_len=400)


def test_framer_feeds_streaming_processor(audio):
    """End-to-end: raw PCM → native frontend → streaming decoder."""
    from flax import nnx

    from pytorch_hmm_tpu.streaming import StreamingHMMProcessor

    framer = NativeFramer(n_mels=24)
    proc = StreamingHMMProcessor(
        num_states=5, feature_dim=24, chunk_size=20, lookahead_frames=0,
        max_delay_frames=120, use_beam_search=False, rngs=nnx.Rngs(0),
    )
    framer.push(audio[:8000])
    frames = framer.pop()
    decoded = 0
    for i in range(0, len(frames) - 19, 20):
        r = proc.process_chunk(frames[i:i + 20])
        if r.decoded_states is not None:
            decoded += len(np.asarray(r.decoded_states))
    assert decoded > 0
