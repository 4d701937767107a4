"""On-device PCM frontend must match the native/NumPy framer.

The DeviceFramer computes the identical feature math (pre-emphasis,
Hann, zero-padded rFFT power, mel bank, log floor) as a matmul DFT on
the JAX device; windows land on the same global frame grid
(frame j = samples [j*hop, j*hop+frame_len)). VERDICT r3 item 4.
"""

import numpy as np
import pytest

from pytorch_hmm_tpu.frontend import (
    DeviceFramer,
    device_frames,
    framing_tables,
    make_pcm_decode_step,
)
from pytorch_hmm_tpu.native import NativeFramer


@pytest.fixture(scope="module")
def pcm():
    rng = np.random.default_rng(3)
    return rng.standard_normal(16000 * 4).astype(np.float32)  # 4 s


def test_device_framer_matches_native_stream(pcm):
    nat = NativeFramer(n_mels=80)
    dev = DeviceFramer(n_mels=80, chunk_frames=160)

    nat.push(pcm)
    ref = nat.pop()

    # Stream in uneven pieces to exercise the pending buffer.
    got = []
    for piece in np.array_split(pcm, 7):
        dev.push(piece)
        got.append(dev.pop())
    got = np.concatenate(got)

    n = min(len(ref), len(got))
    assert n >= 300
    np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-3)


def test_device_framer_chunk_boundaries_are_seamless(pcm):
    # One big pop == many small pops (the tail carry is exact).
    a = DeviceFramer(chunk_frames=160)
    b = DeviceFramer(chunk_frames=160)
    a.push(pcm[: 160 * 160 * 2])
    one = a.pop()
    b.push(pcm[: 160 * 160])
    first = b.pop()
    b.push(pcm[160 * 160 : 160 * 160 * 2])
    second = b.pop()
    np.testing.assert_array_equal(one, np.concatenate([first, second]))


def test_device_frames_pure_fn_shapes():
    import jax.numpy as jnp

    tables = framing_tables()
    lag = tables["lag"]
    tail = jnp.zeros((lag * 160 + 1,), jnp.float32)
    chunk = jnp.ones((160 * 160,), jnp.float32)
    new_tail, feats = device_frames(tail, chunk, tables)
    assert feats.shape == (160, 80)
    assert new_tail.shape == tail.shape


def test_pcm_decode_step_runs_and_matches_feature_path():
    import jax.numpy as jnp
    from flax import nnx

    from pytorch_hmm_tpu.streaming import StreamingHMMProcessor, _beam_step, _emit

    proc = StreamingHMMProcessor(
        num_states=12, feature_dim=80, chunk_size=160,
        use_beam_search=True, rngs=nnx.Rngs(0),
    )
    step, carry = make_pcm_decode_step(proc, chunk_frames=160)

    rng = np.random.default_rng(0)
    pcm = rng.standard_normal(160 * 160 * 2).astype(np.float32)

    # Reference: frame on device separately (the DeviceFramer drops the
    # lag pre-stream windows — the documented frame grid), then run the
    # same beam step on the exact frames it emits. The fused step must
    # land on the SAME grid: its first chunk yields n_valid = F - lag
    # states for global frames 0..F-lag-1.
    framer = DeviceFramer(chunk_frames=160)
    lag = framer.tables["lag"]
    w = (
        proc.emission_hidden.kernel[...], proc.emission_hidden.bias[...],
        proc.emission_out.kernel[...], proc.emission_out.bias[...],
    )
    log_a = jnp.log(proc.get_transition_matrix() + 1e-8)
    beam = (proc._beam_scores, proc._beam_states,
            proc._beam_paths, proc._beam_len)

    for k in range(2):
        chunk = jnp.asarray(pcm[k * 160 * 160 : (k + 1) * 160 * 160])
        carry, states, conf, n_valid = step(carry, chunk)
        expect_valid = 160 - (lag if k == 0 else 0)
        assert int(n_valid) == expect_valid

        framer.push(np.asarray(chunk))
        feats = jnp.asarray(framer.pop())          # (expect_valid, 80)
        assert feats.shape[0] == expect_valid
        feats = jnp.pad(feats, ((0, 192 - expect_valid), (0, 0)))
        lo = _emit(feats, *w)
        beam, ref_states, ref_conf = _beam_step(
            log_a, lo, jnp.int32(expect_valid), beam
        )
        np.testing.assert_array_equal(
            np.asarray(states)[:expect_valid],
            np.asarray(ref_states)[:expect_valid],
        )
        np.testing.assert_allclose(
            np.asarray(conf)[:expect_valid],
            np.asarray(ref_conf)[:expect_valid], rtol=1e-5, atol=1e-5,
        )
