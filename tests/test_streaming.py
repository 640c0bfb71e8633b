"""FRVSRStream: exact frame-by-frame serving of the causal FRVSR recurrence.

The clip forward is an nn.scan of the same _FRVSRStep the stream applies per
push with the identical params["steps"] tree — so streaming output k must
equal the whole-clip forward's frame k (runner/streaming.py contract)."""
import jax
import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    models as nets,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
    FRVSRStream,
)


def _net_and_clip(T=4, hw=8, seed=0):
    net = nets.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=1, is_prediction=True)
    rng = np.random.default_rng(seed)
    clip = rng.standard_normal((1, T, hw, hw, 1)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), clip)
    return net, variables, clip


def test_stream_matches_clip_forward_exactly():
    net, variables, clip = _net_and_clip()
    sr_clip = np.asarray(net.apply(variables, clip))

    stream = FRVSRStream(net, variables)
    for t in range(clip.shape[1]):
        sr_t = np.asarray(stream.push(clip[:, t]))
        np.testing.assert_allclose(sr_t, sr_clip[:, t], atol=1e-6, rtol=1e-6)


def test_stream_reset_restarts_the_sequence():
    net, variables, clip = _net_and_clip()
    stream = FRVSRStream(net, variables)
    first = np.asarray(stream.push(clip[:, 0]))
    stream.push(clip[:, 1])
    stream.reset()
    again = np.asarray(stream.push(clip[:, 0]))
    np.testing.assert_array_equal(first, again)


def test_stream_run_pipelined_yields_every_frame_in_order():
    net, variables, clip = _net_and_clip(T=5)
    sr_clip = np.asarray(net.apply(variables, clip))
    stream = FRVSRStream(net, variables)
    frames = list(stream.run(clip, lookahead=2))
    assert len(frames) == clip.shape[1]
    for t, f in enumerate(frames):
        np.testing.assert_allclose(f, sr_clip[:, t], atol=1e-6, rtol=1e-6)


def test_stream_compute_dtype_bf16_close_to_f32():
    net, variables, clip = _net_and_clip()
    stream32 = FRVSRStream(net, variables)
    stream16 = FRVSRStream(net, variables, compute_dtype="bfloat16")
    s32 = np.asarray(stream32.push(clip[:, 0]))
    s16 = np.asarray(stream16.push(clip[:, 0]))
    assert s16.dtype == np.float32  # outputs come back f32
    np.testing.assert_allclose(s16, s32, atol=0.05)


def test_stream_rejects_wrong_rank_and_wrong_net():
    net, variables, clip = _net_and_clip()
    stream = FRVSRStream(net, variables)
    with pytest.raises(ValueError, match="one \\(B, h, w, C\\) frame"):
        stream.push(clip)  # whole clip, rank 5
    other = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    with pytest.raises(TypeError, match="causal"):
        FRVSRStream(other, variables)
