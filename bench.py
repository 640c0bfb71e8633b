"""Benchmark: flagship RefineNet x4 inference throughput (frames/sec/chip).

Protocol (BASELINE.md): the paper's eval setting — batch 1, one full cardiac
cycle (30 frames) plus 6 warm-up frames each side, 64×64 LR → 256×256 SR,
final fused stage output, flagship net (features [64,64,64], 3 stages,
positional encoding).

Baseline: the PyTorch reference model timed on this host's CPU under the
identical protocol (measured once, cached in BENCH_BASELINE.json — the repo
publishes no numbers, SURVEY.md §6).  ``vs_baseline`` = ours / reference-CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / "BENCH_BASELINE.json"

CORE_T, U, LR_HW, BATCH = 30, 6, 64, 1
CFG = dict(
    in_channels=1,
    out_channels=1,
    num_features=[64, 64, 64],
    upscale_factor=4,
    num_stages=3,
    update_memory=True,
    num_updated_frames=U,
    refine_window_size=5,
    positional_encoding=True,
)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    T = CORE_T + 2 * U
    lr = rng.standard_normal((BATCH, T, LR_HW, LR_HW, 1)).astype(np.float32)
    pos = rng.uniform(-1, 1, (BATCH, T, 1)).astype(np.float32)
    return lr, pos


def bench_jax(iters: int = 10, warmup: int = 2) -> dict:
    import jax

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )

    model = RefineNet(**CFG)
    lr, pos = _inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr, pos)

    import jax.numpy as jnp

    @jax.jit
    def forward(v, lr, pos):
        out = model.apply(v, lr, pos)[-1]
        # reduce to a scalar so timing fetches force real device completion
        # (block_until_ready alone does not sync on remote/axon backends)
        return out, jnp.sum(out)

    lr_d, pos_d = jax.device_put(lr), jax.device_put(pos)
    _, chk = forward(variables, lr_d, pos_d)
    float(chk)
    for _ in range(warmup):
        float(forward(variables, lr_d, pos_d)[1])

    # Latency protocol: one clip per host round-trip (fetch every result).
    # Includes the host<->device round-trip (~33 ms through the axon tunnel —
    # perf_probe 'null'), so it UNDERSTATES on-chip speed on tunneled runs.
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(forward(variables, lr_d, pos_d)[1])
        times.append(time.perf_counter() - t0)
    lat_sec = float(np.median(times))

    # Throughput protocol (the serving metric): dispatch `pipeline` clips
    # back-to-back and fetch once — device execution is in-order, so the
    # final scalar syncs the whole pipeline and the round-trip amortizes.
    # Best of 3 windows: the sustained rate, robust to within-process jitter.
    pipeline = 16
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(pipeline):
            _, chk = forward(variables, lr_d, pos_d)
        float(chk)
        windows.append((time.perf_counter() - t0) / pipeline)
    thr_sec = min(windows)

    return {
        "frames_per_sec": BATCH * CORE_T / thr_sec,
        "sec_per_clip_pipelined": thr_sec,
        "latency_frames_per_sec": BATCH * CORE_T / lat_sec,
        "sec_per_clip_latency": lat_sec,
        "pipeline_depth": pipeline,
        "device": str(jax.devices()[0]),
    }


def bench_train(iters: int = 6, warmup: int = 2) -> dict:
    """Training-protocol step time: batch 16, 32x32 LR patches, 7+2x6 frames,
    full flagship net, L1 stage-discounted loss, Adam (BASELINE.md row
    'Train protocol')."""
    import jax
    import jax.numpy as jnp
    import optax

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )

    model = RefineNet(**CFG)
    rng = np.random.default_rng(0)
    B, TC, HW = 16, 7, 32
    T = TC + 2 * U
    lr = rng.standard_normal((B, T, HW, HW, 1)).astype(np.float32)
    pos = rng.uniform(-1, 1, (B, T, 1)).astype(np.float32)
    hr = rng.standard_normal((B, TC, HW * 4, HW * 4, 1)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lr, pos)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p):
        outs = model.apply({"params": p}, lr, pos)
        n_stages = len(outs) // 3
        return sum(
            (0.5 ** (n_stages - i // 3 - 1)) * jnp.mean(jnp.abs(o - hr))
            for i, o in enumerate(outs)
        )

    @jax.jit
    def train_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = train_step(params, opt_state)
    float(loss)
    for _ in range(warmup):
        params, opt_state, loss = train_step(params, opt_state)
    float(loss)
    # steps chain through params (donated) — dispatch all, fetch once, so the
    # host round-trip (~33 ms on the tunnel, perf_probe 'null') amortizes the
    # way the real trainer's device-side log accumulation does
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state)
    float(loss)
    sec = (time.perf_counter() - t0) / iters
    return {"steps_per_sec": 1.0 / sec, "sec_per_step": sec, "batch": B}


def bench_torch_reference(iters: int = 2) -> dict | None:
    """Time the PyTorch reference on CPU under the same protocol (cached)."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())
    try:
        import sys

        sys.path.insert(0, str(REPO / "tests"))
        from reference_loader import load_reference_refine_net, reference_available

        if not reference_available():
            return None
        import torch

        torch.manual_seed(0)
        rn = load_reference_refine_net()
        net = rn.RefineNet(**CFG)
        net.eval()
        lr, pos = _inputs()
        T = lr.shape[1]
        t_inputs = [torch.from_numpy(lr[:, t].transpose(0, 3, 1, 2)).contiguous() for t in range(T)]
        t_pos = torch.from_numpy(pos)
        with torch.no_grad():
            net(t_inputs, t_pos)  # warmup
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                net(t_inputs, t_pos)
                times.append(time.perf_counter() - t0)
        sec = float(min(times))
        result = {
            "frames_per_sec": BATCH * CORE_T / sec,
            "sec_per_clip": sec,
            "device": "cpu (pytorch reference)",
        }
        BASELINE_CACHE.write_text(json.dumps(result))
        return result
    except Exception:
        return None


def main():
    import os

    ours = bench_jax()
    # The train-step benchmark doubles compile time; opt in with
    # EVSR_BENCH_TRAIN=1 (last measured: 3.45-3.6 steps/sec @ batch 16, v5e —
    # PERF_NOTES.md).
    if os.environ.get("EVSR_BENCH_TRAIN") == "1":
        try:
            train = bench_train()
        except Exception as e:  # keep the headline metric robust
            train = {"error": str(e)[:200]}
    else:
        train = {
            "steps_per_sec": 3.5,
            "batch": 16,
            "note": "cached measurement; set EVSR_BENCH_TRAIN=1 to remeasure",
            "measured_at_commit": "636f152 (round 2 HEAD; 3.45 measured, "
            "3.45-3.6 across runs, fetch-amortized protocol)",
        }
    baseline = bench_torch_reference()
    vs = ours["frames_per_sec"] / baseline["frames_per_sec"] if baseline else None
    print(
        json.dumps(
            {
                "metric": "refine_net_x4_sr_frames_per_sec",
                "value": round(ours["frames_per_sec"], 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "detail": {
                    "ours": ours,
                    "train": train,
                    "baseline": baseline,
                    # honesty: the measured baseline is the PyTorch reference
                    # on this host's CPU.  BASELINE.md's target is ">=2x DGX-1
                    # V100 fps/chip", but no V100 number is published anywhere
                    # (SURVEY.md §6); clearing it is an inference from the
                    # CPU measurement, not a V100 measurement.
                    "baseline_kind": "reference-cpu",
                    "v100_target_note": (
                        "BASELINE target is vs unpublished DGX-1 V100 fps; "
                        "vs_baseline here is vs the reference on host CPU"
                    ),
                    "protocol": f"batch {BATCH}, {CORE_T}+2x{U} frames, {LR_HW}x{LR_HW} LR, x4, fp32",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
