"""Feature-space op tests against brute-force loop oracles mirroring the
reference implementations (kw_utils.splicing, kw_nn_utils.prepareBatch,
orcus_util.apply_time_delay)."""

import numpy as np

from nnacousticmodeling_tpu.ops import (
    splice_flat, splice_utts, window_batch, apply_time_delay,
    log_softmax, ref_logsum,
)


def _splice_loop_oracle(data, shifts):
    # direct transcription of the reference algorithm's semantics
    n, m = data.shape
    out = np.zeros((n, m * len(shifts)), dtype=np.float32)
    for idx in range(n):
        for wi, w in enumerate(shifts):
            w = min(max(w + idx, 0), n - 1)
            out[idx, wi * m:(wi + 1) * m] = data[w]
    return out


def test_splice_flat_matches_loop_oracle(rng):
    x = rng.standard_normal((17, 3)).astype(np.float32)
    shifts = list(range(-5, 6))
    np.testing.assert_array_equal(splice_flat(x, shifts), _splice_loop_oracle(x, shifts))


def test_splice_flat_crosses_utt_boundaries(rng):
    # the reference splices the concatenated corpus; verify we do too
    x = rng.standard_normal((6, 2)).astype(np.float32)
    out = splice_flat(x, [-1, 0, 1])
    # frame 3 (start of hypothetical utt 2) sees frame 2 from "utt 1"
    np.testing.assert_array_equal(out[3, :2], x[2])


def test_splice_utts_clamps_at_boundaries(rng):
    x = rng.standard_normal((6, 2)).astype(np.float32)
    offsets = np.array([0, 3, 6])
    out = splice_utts(x, offsets, [-1, 0, 1])
    # frame 3 starts utt 2: left context clamps to itself, not frame 2
    np.testing.assert_array_equal(out[3, :2], x[3])
    np.testing.assert_array_equal(out[2, 4:], x[2])  # right edge of utt 1
    # interior frames match flat splice
    np.testing.assert_array_equal(out[1], splice_flat(x, [-1, 0, 1])[1])


def test_window_batch_matches_splice(rng):
    x = rng.standard_normal((30, 4)).astype(np.float32)
    full = splice_flat(x, range(-2, 3))
    win = window_batch(x, 10, 20, winlen=5)
    np.testing.assert_array_equal(win, full[10:20])


def test_time_delay_positive(rng):
    x = rng.standard_normal((7, 2)).astype(np.float32)
    y = np.arange(7, dtype=np.int32)
    offsets = np.array([0, 3, 7])
    x_, y_, offsets_ = apply_time_delay(x, y, offsets, 2)
    np.testing.assert_array_equal(offsets_, [0, 5, 11])
    # inputs edge-padded right within each utterance
    np.testing.assert_array_equal(x_[0:3], x[0:3])
    np.testing.assert_array_equal(x_[3], x[2])
    np.testing.assert_array_equal(x_[4], x[2])
    # targets edge-padded left
    np.testing.assert_array_equal(y_[0:5], [0, 0, 0, 1, 2])
    np.testing.assert_array_equal(y_[5:11], [3, 3, 3, 4, 5, 6])


def test_time_delay_negative_whole_dataset(rng):
    x = rng.standard_normal((5, 2)).astype(np.float32)
    y = np.arange(5, dtype=np.int32)
    offsets = np.array([0, 5])
    x_, y_, offsets_ = apply_time_delay(x, y, offsets, -2)
    assert x_.shape[0] == 7 and y_.shape[0] == 7
    np.testing.assert_array_equal(x_[5], x[4])
    np.testing.assert_array_equal(y_[:3], [0, 0, 0])
    assert offsets_[-1] == 5


def test_time_delay_zero_is_identity(rng):
    x = rng.standard_normal((4, 2)).astype(np.float32)
    y = np.arange(4, dtype=np.int32)
    offsets = np.array([0, 4])
    x_, y_, o_ = apply_time_delay(x, y, offsets, 0)
    assert x_ is x and y_ is y and o_ is offsets


def test_log_softmax_matches_ref_logsum(rng):
    y = rng.standard_normal((6, 11)).astype(np.float32) * 5
    ours = np.asarray(log_softmax(y, axis=1))
    ref = y - ref_logsum(y, axis=1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(ours).sum(axis=1), 1.0, rtol=1e-4)


def test_stopwatch():
    from nnacousticmodeling_tpu.utils.profiling import Stopwatch
    sw = Stopwatch()
    with sw("a"):
        pass
    with sw("a"):
        pass
    with sw("b"):
        pass
    assert sw.counts["a"] == 2 and sw.counts["b"] == 1
    assert "a:" in sw.report()


def test_distributed_helpers_importable():
    from nnacousticmodeling_tpu.parallel.distributed import (
        local_batch_slice, pod_mesh)
    s = local_batch_slice(16)   # single process: full slice
    assert s == slice(0, 16)
    mesh = pod_mesh({"data": 8})
    assert mesh.devices.shape == (8,)
