"""Benchmark: flagship acoustic pipeline throughput on one TPU chip.

Workload (the reference's eval pipeline, re-architected TPU-native):
LSTM 4x1024 posterior forward over a synthetic TIMIT-like corpus
(40-dim features, ~400-frame utterances, 100 frames/audio-second)
followed by the full 1909-pdf triphone-HMM Viterbi decode on the
regenerated kaldiTri1909-format image — end to end, in-graph, no file
IPC.

Metric: audio-seconds decoded per wall-clock second per chip.

Baseline (``vs_baseline``): the same model + decode run the way the
reference architecture runs it on this same machine — per-timestep
time-synchronous forward loop (evaluateModelForTest.py:52-93) with a
host->device transfer per step, posteriors written as .lab files, and
the native PhoneRecog binary invoked via subprocess (the reference's
process boundary). Measured on a subset and scaled per audio-second;
vs_baseline = ours / reference_style (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path


def log(msg):
    print(f"[bench +{time.time() - T_START:.1f}s] {msg}", file=sys.stderr)


T_START = time.time()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compilation cache: makes driver re-runs skip the slow
# tunnel-side compile when the program is unchanged
try:
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(tempfile.gettempdir()) / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

CACHE = Path(tempfile.gettempdir()) / "nnam_tpu_bench"
PHONERECOG = "/root/reference/recog/PhoneRecog"

NUM_UTTS = 128
FRAMES_PER_UTT = 400          # ~4 s of audio at 100 fps
DIM = 40
BUCKET = 512
BATCH = 128
BASELINE_UTTS = 2
BASELINE_MAX_FRAMES = 120   # per-timestep loop measured on a slice and
                            # scaled per audio-second (tunnel dispatch is
                            # the baseline's bottleneck by design)


def get_image():
    from nnacousticmodeling_tpu.decoder.image import load_image, save_image
    from nnacousticmodeling_tpu.decoder.graph import build_timit_image
    CACHE.mkdir(exist_ok=True)
    f = CACHE / "timit1909.img"
    if f.exists():
        return load_image(str(f))
    img = build_timit_image()
    save_image(str(f), img)
    return img


def make_data(rng):
    lengths = rng.integers(int(FRAMES_PER_UTT * 0.8),
                           int(FRAMES_PER_UTT * 1.2), NUM_UTTS)
    x = rng.standard_normal((int(lengths.sum()), DIM)).astype(np.float32)
    offsets = np.zeros(NUM_UTTS + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return x, offsets, lengths


def main():
    t_setup = time.time()
    from nnacousticmodeling_tpu.models import get_network
    from nnacousticmodeling_tpu.decoder.viterbi import ViterbiDecoder
    from nnacousticmodeling_tpu.ops.numerics import log_softmax
    from nnacousticmodeling_tpu.io import save_bin

    platform = jax.devices()[0].platform
    log(f"platform={platform}")
    rng = np.random.default_rng(0)
    img = get_image()
    x, offsets, lengths = make_data(rng)
    total_audio_s = float(lengths.sum()) / 100.0

    log("image + data ready")
    net = get_network("lstm", layers=4, units=[1024], num_classes=1909)
    params = net.init(jax.random.PRNGKey(0), DIM)
    log("params init")

    dec = ViterbiDecoder(img, pip=20.0, lmw=1.0)

    # forward and decode as two cached jitted programs (one fused
    # program compiles pathologically slowly on the remote-compile
    # tunnel); posteriors stay on device between the two.
    @jax.jit
    def forward(p, xs):
        logits, _ = net.apply_sequence(p, xs)
        return log_softmax(logits, axis=-1)

    # pack utterances into fixed (BATCH, BUCKET, DIM) buckets
    batches = []
    for beg in range(0, NUM_UTTS, BATCH):
        ids = np.arange(beg, min(beg + BATCH, NUM_UTTS))
        xb = np.zeros((BATCH, BUCKET, DIM), dtype=np.float32)
        for row, u in enumerate(ids):
            xb[row, :lengths[u]] = x[offsets[u]:offsets[u + 1]]
        batches.append((jnp.asarray(xb),
                        jnp.asarray([int(lengths[u]) for u in ids],
                                    dtype=jnp.int32)))

    def run_ours():
        results = []
        for xb, lens in batches:
            lp = forward(params, xb)
            results.extend(dec.decode_batch(lp, lens))
        return results

    # warmup (compile both stages)
    log("warmup forward+decode...")
    run_ours()
    log("warmup done; timing...")
    t0 = time.time()
    results = run_ours()
    ours_elapsed = time.time() - t0
    ours_tput = total_audio_s / ours_elapsed
    log(f"ours: {ours_tput:.1f} audio-s/s ({ours_elapsed:.2f}s for {total_audio_s:.0f} audio-s)")
    assert len(results) == NUM_UTTS and all(len(r.segments) > 0 for r in results)

    # ---- reference-style baseline on a subset -------------------------
    # per-timestep loop with a host->device transfer per step (the
    # Chainer predict loop), .lab file IPC, native decoder subprocess
    base_ids = list(range(BASELINE_UTTS))
    base_audio_s = float(sum(min(int(lengths[u]), BASELINE_MAX_FRAMES)
                             for u in base_ids)) / 100.0

    @jax.jit
    def step_fn(p, state, x_t):
        return net.step(p, state, x_t)

    def run_baseline(workdir):
        tmax = min(max(int(lengths[u]) for u in base_ids), BASELINE_MAX_FRAMES)
        xb = np.zeros((len(base_ids), tmax, DIM), dtype=np.float32)
        for row, u in enumerate(base_ids):
            l = min(int(lengths[u]), tmax)
            xb[row, :l] = x[offsets[u]:offsets[u] + l]
        state = net.init_state(len(base_ids))
        outs = np.zeros((len(base_ids), tmax, 1909), dtype=np.float32)
        for t in range(tmax):
            x_t = jnp.asarray(xb[:, t, :])          # host->device per step
            state, y = step_fn(params, state, x_t)
            y = np.asarray(y)                        # device->host per step
            y = y - y.max(1, keepdims=True)
            y = y - np.log(np.exp(y).sum(1, keepdims=True))
            outs[:, t, :] = y
        scp_lines = []
        for row, u in enumerate(base_ids):
            lab = Path(workdir) / f"utt{u}.lab"
            save_bin(str(lab), outs[row, :min(int(lengths[u]), tmax)])
            scp_lines.append(str(lab))
        scp = Path(workdir) / "bench.scp"
        scp.write_text("\n".join(scp_lines) + "\n")
        out_mlf = Path(workdir) / "bench.mlf"
        r = subprocess.run([PHONERECOG, str(scp), str(CACHE / "timit1909.img"),
                            str(out_mlf), "-20", "1"],
                           capture_output=True, timeout=600)
        assert r.returncode == 0, r.stderr

    log("baseline warmup...")
    with tempfile.TemporaryDirectory() as wd:
        run_baseline(wd)          # warmup (compiles step_fn)
    log("baseline timing...")
    with tempfile.TemporaryDirectory() as wd:
        t0 = time.time()
        run_baseline(wd)
        base_elapsed = time.time() - t0
    base_tput = base_audio_s / base_elapsed
    log(f"baseline: {base_tput:.2f} audio-s/s")

    print(json.dumps({
        "metric": f"audio_seconds_per_s_per_chip[{platform}]",
        "value": round(ours_tput, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(ours_tput / base_tput, 2),
    }))


if __name__ == "__main__":
    main()
