"""On-chip perf decomposition for the flagship RefineNet (PERF_NOTES.md).

Times isolated pieces of the x4 inference protocol in ONE process (run-to-run
variance through the tunnel is ±20%, so cross-process comparisons lie):

* conv_chain   — N sequentially-dependent gate-shaped convs (the LSTM's
                 serial spine without gates): the sequential-conv ceiling
* conv_batched — identical conv work with the time axis folded into batch:
                 the MXU ceiling for these shapes
* lstm         — one direction of the real 3-layer ConvLSTM scan over T
* refine       — the window-conv refine block on full-T features
* out          — the PixelShuffle out-block over the core frames
* full         — the whole eval forward (final fused output only)

Each row reports median wall time and achieved TFLOP/s.  Usage:

    python -m <pkg>.tools.perf_probe [--probes conv_chain,lstm,...] [--bf16]
        [--t 42] [--hw 64] [--iters 8] [--device cuda:0]

``--device cpu`` pins the CPU backend BEFORE jax initializes (the
JAX_PLATFORMS env var is ignored under the axon sitecustomize, and default
backend init hangs forever when the TPU tunnel is down) — for smoke-driving
probes off-chip; numbers are only meaningful on the chip.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, iters, *args):
    import jax.numpy as jnp

    # sync by fetching a scalar (block_until_ready is a no-op on axon)
    def run():
        out = fn(*args)
        return float(jnp.sum(out) if hasattr(out, "dtype") else out)

    run()  # compile
    run()  # warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def probe_null(T, HW, dtype, iters):
    """Host-fetch round-trip floor: time fetching a scalar from a trivial op.
    Probes measuring less than ~2x this number are latency-floored lies."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8), dtype)

    @jax.jit
    def f(x):
        return jnp.sum(x * 1.0001)

    sec = _timeit(f, iters, x)
    return {"sec": sec, "note": "scalar fetch round-trip"}


def _repeat(body, x, reps):
    """Chain `body` reps times inside one jitted graph so per-run work
    amortizes the host round-trip (out feeds in → no DCE, no overlap)."""
    import jax

    def step(carry, _):
        return body(carry), ()

    out, _ = jax.lax.scan(step, x, None, length=reps)
    return out


def probe_conv_chain(T, HW, dtype, iters, feats=64):
    """N chained convs: out_t depends on out_{t-1} (sequential spine)."""
    import jax
    import jax.numpy as jnp

    cin, cout = 2 * feats, 4 * feats
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (3, 3, cin, cout), dtype) * 0.01
    x0 = jax.random.normal(k, (1, HW, HW, cin), dtype)

    steps = 2 * T * 10  # both directions' worth, x10 to clear the fetch floor

    @jax.jit
    def chain(x, w):
        def body(carry, _):
            y = jax.lax.conv_general_dilated(
                carry, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # feed back a cin-shaped slice to keep the dependency
            return y[..., :cin] * 0.5, ()

        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    sec = _timeit(chain, iters, x0, w)
    flops = steps * HW * HW * 9 * cin * cout * 2
    return {"sec": sec, "tflops": flops / sec / 1e12, "steps": steps}


def probe_conv_batched(T, HW, dtype, iters, feats=64):
    """Same conv volume, time folded into batch (no serial dependency)."""
    import jax
    import jax.numpy as jnp

    cin, cout = 2 * feats, 4 * feats
    k = jax.random.PRNGKey(0)
    B = 2 * T
    w = jax.random.normal(k, (3, 3, cin, cout), dtype) * 0.01
    x = jax.random.normal(k, (B, HW, HW, cin), dtype)

    reps = 10

    @jax.jit
    def f(x, w):
        def body(c):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y[..., :cin] * 0.5

        return _repeat(body, x, reps)

    sec = _timeit(f, iters, x, w)
    flops = reps * B * HW * HW * 9 * cin * cout * 2
    return {"sec": sec, "tflops": flops / sec / 1e12}


def probe_lstm(T, HW, dtype, iters, feats=64):
    import jax
    import jax.numpy as jnp

    from ..models.refine_net import ConvLSTM

    model = ConvLSTM(feats, (feats, feats, feats))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, T, HW, HW, feats)), dtype)
    variables = jax.tree.map(lambda a: a.astype(dtype), model.init(jax.random.PRNGKey(0), x))
    reps = 6
    f = jax.jit(lambda v, x: _repeat(lambda c: model.apply(v, c) * 0.5, x, reps))
    sec = _timeit(f, iters, variables, x)
    # per step: 3 layers of conv(2F -> 4F, 3x3)
    flops = reps * T * 3 * HW * HW * 9 * (2 * feats) * (4 * feats) * 2
    return {"sec": sec, "tflops": flops / sec / 1e12, "note": "one direction, one stage"}


def probe_refine(T, HW, dtype, iters, feats=64, window=5):
    import jax
    import jax.numpy as jnp

    from ..models.refine_net import RefineBlock

    model = RefineBlock(feats, window, min(6, max(0, (T - window) // 2)), True)
    rng = np.random.default_rng(0)
    fwd = jnp.asarray(rng.standard_normal((1, T, HW, HW, feats)), dtype)
    bwd = jnp.asarray(rng.standard_normal((1, T, HW, HW, feats)), dtype)
    pos = jnp.asarray(rng.standard_normal((1, T, 1)), dtype)
    variables = jax.tree.map(
        lambda a: a.astype(dtype), model.init(jax.random.PRNGKey(0), fwd, bwd, pos)
    )
    reps = 6
    K = T - window + 1

    def body(v, a, b, p):
        import jax.numpy as jnp

        def once(carry):
            a_, b_ = carry
            out = model.apply(v, a_, b_, p)  # (B, K, H, W, F)
            pad = jnp.pad(out, ((0, 0), (0, T - K), (0, 0), (0, 0), (0, 0)))
            return (a_ + 1e-6 * pad, b_)

        return _repeat(once, (a, b), reps)[0]

    f = jax.jit(body)
    sec = _timeit(f, iters, variables, fwd, bwd, pos)
    C = 2 * feats + 1
    flops = reps * K * HW * HW * (window * 9 * C * C + 9 * C * feats) * 2
    return {"sec": sec, "tflops": flops / sec / 1e12}


def probe_refine2d(T, HW, dtype, iters, feats=64, window=5):
    """Alternative lowering of the window conv: 5 shifted batched 2D convs
    summed (instead of one NDHWC 3D conv) — same math, MXU-native shapes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C = 2 * feats + 1
    K = T - window + 1
    feats_in = jnp.asarray(rng.standard_normal((1, T, HW, HW, C)), dtype)
    k3d = jnp.asarray(rng.standard_normal((window, 3, 3, C, C)) * 0.01, dtype)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, feats)) * 0.01, dtype)
    reps = 6

    def once(x):
        B, T_, H, W, C_ = x.shape
        folded = x.reshape(B * T_, H, W, C_)
        acc = None
        for d in range(window):
            y = jax.lax.conv_general_dilated(
                folded, k3d[d], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(B, T_, H, W, C_)
            piece = y[:, d : d + K]
            acc = piece if acc is None else acc + piece
        out = jax.lax.conv_general_dilated(
            acc.reshape(B * K, H, W, C_), k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(B, K, H, W, feats)
        pad = jnp.pad(out, ((0, 0), (0, T_ - K), (0, 0), (0, 0), (0, 0)), mode="constant")
        return x + 1e-6 * jnp.pad(pad, ((0, 0), (0, 0), (0, 0), (0, 0), (0, C_ - feats)))

    f = jax.jit(lambda x: _repeat(once, x, reps))
    sec = _timeit(f, iters, feats_in)
    flops = reps * HW * HW * 9 * C * 2 * (window * T * C + K * feats)
    return {"sec": sec, "tflops": flops / sec / 1e12, "note": "5x shifted 2D convs"}


def probe_refine_pad(T, HW, dtype, iters, feats=64, window=5, pad_to=136):
    """The refine convs carry C = 2F+1 = 129 channels (128 + the pos code) —
    one past the 128-lane boundary.  Measures the identical math with C
    zero-padded to `pad_to` (extra kernel rows zero → outputs unchanged)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C = pad_to
    K = T - window + 1
    feats_in = jnp.asarray(rng.standard_normal((1, T, HW, HW, C)), dtype)
    k3d = jnp.asarray(rng.standard_normal((window, 3, 3, C, C)) * 0.01, dtype)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, feats)) * 0.01, dtype)
    reps = 6

    def once(x):
        B, T_, H, W, C_ = x.shape
        y = jax.lax.conv_general_dilated(
            x, k3d, (1, 1, 1),
            [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # (B, K, H, W, C)
        out = jax.lax.conv_general_dilated(
            y.reshape(B * K, H, W, C_), k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(B, K, H, W, feats)
        pad = jnp.pad(out, ((0, 0), (0, T_ - K), (0, 0), (0, 0), (0, C_ - feats)))
        return x + 1e-6 * pad

    f = jax.jit(lambda x: _repeat(once, x, reps))
    sec = _timeit(f, iters, feats_in)
    # report rate normalized by the REAL (129-ch) work for comparability
    C_real = 2 * feats + 1
    flops = reps * K * HW * HW * (window * 9 * C_real * C_real + 9 * C_real * feats) * 2
    return {"sec": sec, "tflops_real_work": flops / sec / 1e12, "padded_C": pad_to}


def probe_out(T, HW, dtype, iters, feats=64, core=30, factor=4):
    import jax
    import jax.numpy as jnp

    from ..models.common import UpsampleBlock

    model = UpsampleBlock(feats, 1, factor)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((core, HW, HW, feats)), dtype)
    variables = jax.tree.map(lambda a: a.astype(dtype), model.init(jax.random.PRNGKey(0), x))
    reps = 6

    def body(v, x):
        def once(c):
            out = model.apply(v, c)  # (core, 4HW, 4HW, 1)
            return c + 1e-6 * out[:, ::factor, ::factor, :]

        return _repeat(once, x, reps)

    f = jax.jit(body)
    sec = _timeit(f, iters, variables, x)
    # two PS2 convs (F->4F at HW, F->4F at 2HW) + final conv at 4HW
    flops = reps * core * 2 * 9 * (
        HW * HW * feats * 4 * feats
        + 4 * HW * HW * feats * 4 * feats
        + 16 * HW * HW * feats * 1
    )
    return {"sec": sec, "tflops": flops / sec / 1e12}


def probe_out_split(T, HW, dtype, iters, feats=64, core=30, factor=4):
    """Decompose the x4 out-block cost: conv1@1x, +PS, conv2@2x, +PS,
    conv3@4x (64→1 — the MXU-lane-starved one), and conv3 algebraically
    folded to LR space (2x2 kernel over the 16·64 pre-shuffle channels →
    16 phase-channels; identical math modulo kernel re-layout, N=16 instead
    of N=1 at 1/16 the rows)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pixel_shuffle import pixel_shuffle

    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.standard_normal((3, 3, feats, 4 * feats)) * 0.01, dtype)
    k3 = jnp.asarray(rng.standard_normal((3, 3, feats, 1)) * 0.01, dtype)
    k3lr = jnp.asarray(
        rng.standard_normal((2, 2, feats * factor * factor, factor * factor)) * 0.01, dtype
    )
    x1 = jnp.asarray(rng.standard_normal((core, HW, HW, feats)), dtype)
    x2 = jnp.asarray(rng.standard_normal((core, 2 * HW, 2 * HW, feats)), dtype)
    x3 = jnp.asarray(rng.standard_normal((core, 4 * HW, 4 * HW, feats)), dtype)
    xlr = jnp.asarray(
        rng.standard_normal((core, HW, HW, feats * factor * factor)), dtype
    )
    reps = 6

    def c2d(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def t_conv(x0, w, with_ps=False):
        def once(c):
            y = c2d(c, w, [(1, 1), (1, 1)])
            if with_ps:
                z = pixel_shuffle(y, 2)
                return c + 1e-6 * z[:, ::2, ::2, :]
            return c + 1e-6 * y[..., : c.shape[-1]]

        return _timeit(jax.jit(lambda c: _repeat(once, c, reps)), iters, x0)

    def t_conv3(x0):
        def once(c):
            y = c2d(c, k3, [(1, 1), (1, 1)])  # (core, 4HW, 4HW, 1)
            return c + 1e-6 * y

        return _timeit(jax.jit(lambda c: _repeat(once, c, reps)), iters, x0)

    def t_conv3_lr(x0):
        def once(c):
            # 3x3 at 4x resolution ≡ 2x2 at LR over phase-major channels
            y = c2d(c, k3lr, [(1, 0), (1, 0)])  # (core, HW, HW, 16)
            return c + 1e-6 * jnp.pad(
                y, ((0, 0), (0, 0), (0, 0), (0, c.shape[-1] - y.shape[-1]))
            )

        return _timeit(jax.jit(lambda c: _repeat(once, c, reps)), iters, x0)

    r2 = factor * factor
    rows = core * HW * HW
    results = {
        "conv1": (t_conv(x1, k1), rows * 9 * feats * 4 * feats * 2),
        "conv1_ps": (t_conv(x1, k1, with_ps=True), rows * 9 * feats * 4 * feats * 2),
        "conv2": (t_conv(x2, k1), rows * 4 * 9 * feats * 4 * feats * 2),
        "conv2_ps": (t_conv(x2, k1, with_ps=True), rows * 4 * 9 * feats * 4 * feats * 2),
        "conv3": (t_conv3(x3), rows * 16 * 9 * feats * 1 * 2),
        "conv3_lr": (t_conv3_lr(xlr), rows * 4 * (feats * r2) * r2 * 2),
    }
    return {
        name: {"sec": sec, "tflops": reps * flops / sec / 1e12}
        for name, (sec, flops) in results.items()
    }


def probe_dcn(T, HW, dtype, iters, cin=128, cout=128, dg=8, k=3):
    """Pure-XLA modulated deformable conv (ops/deform_conv.py) at EDVR-like
    shapes: B = 5 aligned frames, HW spatial, 128ch, 8 deformable groups.
    tflops counts the GEMM contraction; the k² bilinear gathers ride the VPU
    and are the overhead the SURVEY §7 Pallas kernel would target."""
    import jax
    import jax.numpy as jnp

    from ..ops.deform_conv import deform_conv2d

    rng = np.random.default_rng(0)
    B, K = 5, k * k
    x = jnp.asarray(rng.standard_normal((B, HW, HW, cin)), dtype)
    offset = jnp.asarray(rng.uniform(-2, 2, (B, HW, HW, 2 * dg * K)), dtype)
    mask = jnp.asarray(rng.uniform(0, 1, (B, HW, HW, dg * K)), dtype)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.01, dtype)
    reps = 10

    def once(c):
        y = deform_conv2d(c, offset, w, mask=mask, padding=k // 2, deformable_groups=dg)
        return c + 1e-6 * y[..., :cin]

    f = jax.jit(lambda c: _repeat(once, c, reps))
    sec = _timeit(f, iters, x)
    gemm_flops = reps * B * HW * HW * K * cin * cout * 2
    # dense-conv equivalence probe for the same shapes
    def dense(c):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return c + 1e-6 * y[..., :cin]

    fd = jax.jit(lambda c: _repeat(dense, c, reps))
    dense_sec = _timeit(fd, iters, x)
    return {
        "sec": sec,
        "tflops_gemm": gemm_flops / sec / 1e12,
        "dense_conv_sec": dense_sec,
        "overhead_vs_dense": sec / dense_sec,
    }


def probe_train_split(T, HW, dtype, iters):
    """Training-protocol decomposition (flagship, batch 16, 32x32 patches,
    7+2x6 frames): forward-only vs full grad step, with XLA's own
    cost-analysis FLOP counts, to locate the training bound.

    NOTE: the shapes are FIXED by the paper's training protocol — the
    --t/--hw CLI args are ignored here (unlike the eval-shape probes); the
    result carries a ``note`` saying so."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import RefineNet

    cfg = dict(
        in_channels=1, out_channels=1, num_features=[64, 64, 64], upscale_factor=4,
        num_stages=3, update_memory=True, num_updated_frames=6,
        refine_window_size=5, positional_encoding=True,
    )
    model = RefineNet(**cfg)
    rng = np.random.default_rng(0)
    B, TC, P = 16, 7, 32
    Tt = TC + 12
    lr = jnp.asarray(rng.standard_normal((B, Tt, P, P, 1)), dtype)
    pos = jnp.asarray(rng.uniform(-1, 1, (B, Tt, 1)), dtype)
    hr = jnp.asarray(rng.standard_normal((B, TC, P * 4, P * 4, 1)), dtype)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lr, pos)["params"]
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p):
        outs = model.apply({"params": p}, lr, pos)
        n = len(outs) // 3
        return sum(
            (0.5 ** (n - i // 3 - 1)) * jnp.mean(jnp.abs(o - hr))
            for i, o in enumerate(outs)
        )

    fwd = jax.jit(loss_fn)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def xla_flops(fn, *args):
        try:
            cost = fn.lower(*args).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", float("nan")))
            return None if np.isnan(flops) else flops
        except Exception:
            return None

    def time_pipelined(fn, *args, n=8):
        r = fn(*args)  # compile + warm, one dispatch
        float(jnp.sum(r[-1] if isinstance(r, tuple) else r))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(n)]
            acc = sum(
                jnp.sum(o[-1]) if isinstance(o, tuple) else jnp.sum(o) for o in outs
            )
            float(acc)
            times.append((time.perf_counter() - t0) / n)
        return float(np.median(times))

    fwd_sec = time_pipelined(fwd, params)

    # chained (donated-style) steps, one fetch — the bench_train protocol
    p, s = params, opt_state
    p, s, l = step(p, s)
    float(l)
    t0 = time.perf_counter()
    for _ in range(max(iters, 4)):
        p, s, l = step(p, s)
    float(l)
    step_sec = (time.perf_counter() - t0) / max(iters, 4)

    fwd_flops = xla_flops(fwd, params)
    step_flops = xla_flops(step, params, opt_state)
    out = {
        "note": "protocol shapes fixed (batch 16, 32x32, 7+2x6 frames); --t/--hw ignored",
        "sec": step_sec,
        "fwd_ms": fwd_sec * 1e3,
        "step_ms": step_sec * 1e3,
        "bwd_over_fwd": step_sec / fwd_sec - 1.0,
        "steps_per_sec": 1.0 / step_sec,
    }
    if fwd_flops:
        out["fwd_tflops"] = fwd_flops / fwd_sec / 1e12
    if step_flops:
        out["step_tflops"] = step_flops / step_sec / 1e12
        out["xla_step_gflops"] = step_flops / 1e9
    return out


def probe_remat_train(T, HW, dtype, iters, batch=16, patch=32, tc=7,
                      margins=6, feats=(64, 64, 64)):
    """Per-scan-step remat A/B at the flagship training protocol: steps/sec
    and XLA-reported temp/peak memory, remat off vs on, same process.

    The memory side is already pinned by CPU memory analysis (PERF_NOTES
    "Remat"); this probe prices the FLOPs side ON CHIP — the backward
    recomputes each ConvLSTM step, so expect roughly one extra LSTM-spine
    forward per step.  Protocol shapes fixed like train_split; --t/--hw
    ignored."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import RefineNet

    rng = np.random.default_rng(0)
    B, TC, P = batch, tc, patch
    Tt = TC + 2 * margins
    lr = jnp.asarray(rng.standard_normal((B, Tt, P, P, 1)), dtype)
    pos = jnp.asarray(rng.uniform(-1, 1, (B, Tt, 1)), dtype)
    hr = jnp.asarray(rng.standard_normal((B, TC, P * 4, P * 4, 1)), dtype)

    out = {"note": "protocol shapes fixed (batch 16, 32x32, 7+2x6 frames); --t/--hw ignored"}
    for label, remat in (("plain", False), ("remat", True)):
        model = RefineNet(
            in_channels=1, out_channels=1, num_features=list(feats),
            upscale_factor=4, num_stages=len(feats), update_memory=True,
            num_updated_frames=margins, refine_window_size=5,
            positional_encoding=True, remat=remat,
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lr, pos)["params"]
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p):
            outs = model.apply({"params": p}, lr, pos)
            n = len(outs) // 3
            return sum(
                (0.5 ** (n - i // 3 - 1)) * jnp.mean(jnp.abs(o - hr))
                for i, o in enumerate(outs)
            )

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        try:
            ma = step.lower(params, opt_state).compile().memory_analysis()
            out[f"{label}_temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
        except Exception:
            pass
        p, s = params, opt_state
        p, s, l = step(p, s)
        float(l)  # compile + warm; fetch to sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for _ in range(max(iters, 4)):
            p, s, l = step(p, s)
        float(l)
        out[f"{label}_steps_per_sec"] = round(max(iters, 4) / (time.perf_counter() - t0), 3)
    if out.get("plain_steps_per_sec"):
        out["remat_slowdown"] = round(
            out["plain_steps_per_sec"] / out["remat_steps_per_sec"], 3
        )
    out["sec"] = 1.0 / out["remat_steps_per_sec"]
    return out


def probe_edvr_full(T, HW, dtype, iters, n_pipeline=16):
    """Full EDVR at the zoo config (nf=128, 40 recon ResBlocks, 5-frame
    window), same-process A/B: exact gather DCN vs the windowed
    shift-and-weight path (dcn_max_offset=2) — the exp1_x4_tpu serving
    showcase.  Pipelined protocol (dispatch n, fetch once)."""
    import jax
    import jax.numpy as jnp

    from ..models import EDVRNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, HW, HW, 1)), dtype)

    def run(max_offset):
        model = EDVRNet(in_channels=1, out_channels=1, nf=128, nframes=5,
                        groups=8, front_RBs=5, back_RBs=40,
                        dcn_max_offset=max_offset)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        v = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, v
        )
        f = jax.jit(lambda v, x: model.apply(v, x))
        float(jnp.sum(f(v, x)))  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            outs = [f(v, x) for _ in range(n_pipeline)]
            float(sum(jnp.sum(o) for o in outs))
            times.append((time.perf_counter() - t0) / n_pipeline)
        return float(np.median(times))

    sec_gather = run(None)
    sec_windowed = run(2)
    return {
        "sec": sec_windowed,
        "gather_ms_per_window": sec_gather * 1e3,
        "windowed2_ms_per_window": sec_windowed * 1e3,
        "speedup": sec_gather / sec_windowed,
        "windowed_center_frames_per_sec": 1.0 / sec_windowed,
    }


def probe_warp(T, HW, dtype, iters, factor=4):
    """Isolated flow_warp / stn_warp at HR protocol scale vs a dense 3x3 conv
    over the same tensor — is the bilinear gather the bound here, like it was
    for the DCN (PERF_NOTES 'Deformable conv')?  Work amortized with in-graph
    repeats (the warped frame feeds the next warp)."""
    import jax
    import jax.numpy as jnp

    from ..ops.warp import flow_warp, stn_warp

    HR = HW * factor
    B = 6  # TOFlow's 6 warped neighbors per item
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HR, HR, 1)), dtype)
    flow = jnp.asarray(rng.standard_normal((B, HR, HR, 2)) * 5.0, dtype)
    u = jnp.asarray(rng.standard_normal((B, HR, HR)) * 0.05, dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 1)) * 0.1, dtype)
    reps = 20

    @jax.jit
    def warps(x, flow):
        return _repeat(lambda c: flow_warp(c, flow), x, reps)

    @jax.jit
    def warps_win(x, flow):
        return _repeat(lambda c: flow_warp(c, flow, max_flow=4), x, reps)

    @jax.jit
    def stn(x, u):
        return _repeat(lambda c: stn_warp(c, u, u, "border"), x, reps)

    @jax.jit
    def stn_win(x, u):
        return _repeat(lambda c: stn_warp(c, u, u, "border", max_flow=4), x, reps)

    @jax.jit
    def conv(x, w):
        def body(c):
            return jax.lax.conv_general_dilated(
                c, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return _repeat(body, x, reps)

    sec_fw = _timeit(warps, iters, x, flow)
    sec_fw_win = _timeit(warps_win, iters, x, flow)
    sec_stn = _timeit(stn, iters, x, u)
    sec_stn_win = _timeit(stn_win, iters, x, u)
    sec_conv = _timeit(conv, iters, x, w)
    return {
        "sec": sec_fw,
        "flow_warp_ms_per_call": sec_fw / reps / B * 1e3,
        "flow_warp_windowed4_ms_per_call": sec_fw_win / reps / B * 1e3,
        "stn_warp_ms_per_call": sec_stn / reps / B * 1e3,
        "stn_warp_windowed4_ms_per_call": sec_stn_win / reps / B * 1e3,
        "dense_conv3x3_ms_per_call": sec_conv / reps / B * 1e3,
        "warp_vs_conv": sec_fw / sec_conv,
        "windowed_speedup": sec_fw / sec_fw_win,
        "shape": f"({B},{HR},{HR},1)",
    }


def _pipelined(f, v, x, iters, n_pipeline):
    import jax.numpy as jnp

    float(jnp.sum(f(v, x)))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [f(v, x) for _ in range(n_pipeline)]
        float(sum(jnp.sum(o) for o in outs))
        times.append((time.perf_counter() - t0) / n_pipeline)
    return float(np.median(times))


def probe_toflow_full(T, HW, dtype, iters, n_pipeline=16):
    """Full TOFlowNet at the zoo config (num_frames=7), pipelined serving
    rate — exact gather warps vs the windowed max_flow=4 path (same params)."""
    import jax
    import jax.numpy as jnp

    from ..models import TOFlowNet

    kwargs = dict(in_channels=1, out_channels=1, num_frames=7, upscale_factor=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 7, HW, HW, 1)), dtype)
    model = TOFlowNet(**kwargs)
    # init in f32 (the runner's contract): bf16 inputs at init would create
    # f32 params against bf16 scan carries and fail the carry dtype check
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x.astype(jnp.float32))
    v = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, v
    )
    sec = _pipelined(jax.jit(lambda v, x: model.apply(v, x)), v, x, iters, n_pipeline)
    win = TOFlowNet(**kwargs, max_flow=4)
    sec_win = _pipelined(jax.jit(lambda v, x: win.apply(v, x)), v, x, iters, n_pipeline)
    return {
        "sec": sec_win,
        "gather_ms_per_window": sec * 1e3,
        "windowed4_ms_per_window": sec_win * 1e3,
        "speedup": sec / sec_win,
        "windowed_center_frames_per_sec": 1.0 / sec_win,
        "gather_center_frames_per_sec": 1.0 / sec,
    }


def probe_frvsr_full(T, HW, dtype, iters, n_pipeline=8):
    """Full FRVSRNet (zoo config, is_prediction) over a 30-frame cycle,
    pipelined serving rate — exact vs windowed max_flow=4 (same params)."""
    import jax
    import jax.numpy as jnp

    from ..models import FRVSRNet

    kwargs = dict(in_channels=1, out_channels=1, upscale_factor=4,
                  num_resblocks=10, is_prediction=True)
    core = 30
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, core, HW, HW, 1)), dtype)
    model = FRVSRNet(**kwargs)
    # init in f32 (see probe_toflow_full)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x.astype(jnp.float32))
    v = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, v
    )
    sec = _pipelined(jax.jit(lambda v, x: model.apply(v, x)), v, x, iters, n_pipeline)
    win = FRVSRNet(**kwargs, max_flow=4)
    sec_win = _pipelined(jax.jit(lambda v, x: win.apply(v, x)), v, x, iters, n_pipeline)
    return {
        "sec": sec_win,
        "gather_ms_per_clip": sec * 1e3,
        "windowed4_ms_per_clip": sec_win * 1e3,
        "speedup": sec / sec_win,
        "windowed_frames_per_sec": core / sec_win,
        "gather_frames_per_sec": core / sec,
    }


def probe_telemetry_cost(T, HW, dtype, iters, n_pipeline=16,
                         nets=("toflow", "edvr")):
    """On-chip cost of the windowed-op exceedance telemetry
    (ops/telemetry.py): the SAME net + params applied with and without
    ``mutable=["telemetry"]``, pipelined identically, with the stacked
    triples fetched alongside the output each dispatch — the predictor's
    serving protocol (runner/predictors.py).  Covers both knob families:
    TOFlowNet ``max_flow=4`` (flow-warp sites, the exp1_x4_tpu showcase)
    and EDVRNet ``dcn_max_offset=2`` (DCN offset sites).

    Frame counts are FIXED by each net's protocol (TOFlow window 7, EDVR
    nframes 5) — the driver-level ``--t`` does not apply and is recorded as
    such in the returned dict."""
    import jax
    import jax.numpy as jnp

    from ..models import EDVRNet, TOFlowNet
    from ..ops import telemetry

    rng = np.random.default_rng(0)

    def ab(model, x):
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x.astype(jnp.float32))
        v = telemetry.strip(v)
        v = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, v
        )
        f_off = jax.jit(lambda v, x: model.apply(v, x))

        def _on(v, x):
            y, tel = model.apply(v, x, mutable=[telemetry.COLLECTION])
            triples = jnp.stack(
                [jnp.asarray(t, jnp.float32) for t in jax.tree.leaves(tel)]
            )
            return y, triples

        f_on = jax.jit(_on)

        def timed(f, fetch):
            fetch([f(v, x)])  # compile + warm
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                outs = [f(v, x) for _ in range(n_pipeline)]
                fetch(outs)
                times.append((time.perf_counter() - t0) / n_pipeline)
            return float(np.median(times))

        sec_off = timed(f_off, lambda outs: float(sum(jnp.sum(o) for o in outs)))
        sec_on = timed(
            f_on, lambda outs: float(sum(jnp.sum(y) + jnp.sum(t) for y, t in outs))
        )
        n_sites = int(f_on(v, x)[1].shape[0])
        return {
            "off_ms": sec_off * 1e3,
            "on_ms": sec_on * 1e3,
            "overhead_frac": sec_on / sec_off - 1.0,
            "n_sites": n_sites,
        }

    out = {}
    if "toflow" in nets:
        out["toflow_max_flow4"] = ab(
            TOFlowNet(in_channels=1, out_channels=1, num_frames=7,
                      upscale_factor=4, max_flow=4),
            jnp.asarray(rng.standard_normal((1, 7, HW, HW, 1)), dtype),
        )
    if "edvr" in nets:
        out["edvr_dcn_max_offset2"] = ab(
            EDVRNet(in_channels=1, out_channels=1, nf=128, nframes=5, groups=8,
                    front_RBs=5, back_RBs=40, dcn_max_offset=2),
            jnp.asarray(rng.standard_normal((1, 5, HW, HW, 1)), dtype),
        )
    rows = list(out.values())
    if not rows:
        raise ValueError(f"nets must name 'toflow' and/or 'edvr'; got {nets!r}")
    out["sec"] = rows[0]["on_ms"] / 1e3
    out["max_overhead_frac"] = max(r["overhead_frac"] for r in rows)
    out["protocol_frames"] = {"toflow": 7, "edvr": 5}  # fixed; --t unused here
    return out


def probe_edvr_train(T, HW, dtype, iters, accum=2, batch=16, patch=32):
    """EDVR training at the REFERENCE protocol (batch 16, 32x32 LR patches,
    Charbonnier + Adam) via grad accumulation: the batch-16 backward graph
    kills the axon remote-compile helper (HTTP 500), but a lax.scan over
    ``accum`` microbatches of batch/accum compiles — and the averaged
    gradient IS the full-batch gradient.  Windowed DCN R=2 (the training
    showcase config).  Fetch-amortized chained steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import EDVRNet

    model = EDVRNet(in_channels=1, out_channels=1, nf=128, nframes=5,
                    groups=8, front_RBs=5, back_RBs=40, dcn_max_offset=2)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.standard_normal((batch, 5, patch, patch, 1)), dtype)
    hr = jnp.asarray(
        rng.standard_normal((batch, patch * 4, patch * 4, 1)), dtype
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lr[:1])["params"]
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    tx = optax.adam(4e-4)
    opt_state = tx.init(params)
    eps = 1e-6

    def loss_fn(p, lr_mb, hr_mb):
        out = model.apply({"params": p}, lr_mb)
        return jnp.mean(jnp.sqrt(jnp.square(out - hr_mb) + eps))

    @jax.jit
    def step(p, s, lr_in, hr_in):
        if accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(p, lr_in, hr_in)
        else:
            micro = lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            def body(carry, mb):
                g_acc, l_acc = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, mb[0], mb[1])
                return (jax.tree.map(jnp.add, g_acc, grads), l_acc + loss), ()

            (grads, loss), _ = jax.lax.scan(
                body,
                (jax.tree.map(jnp.zeros_like, p), jnp.zeros(())),
                (micro(lr_in), micro(hr_in)),
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss / accum
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = step(params, opt_state, lr, hr)
    float(loss)  # compile barrier
    params, opt_state, loss = step(params, opt_state, lr, hr)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, lr, hr)
    float(loss)
    sec = (time.perf_counter() - t0) / iters
    return {
        "sec": sec,
        "steps_per_sec": 1.0 / sec,
        "effective_batch": batch,
        "grad_accum_steps": accum,
        "protocol": f"batch {batch} = {accum}x{batch // max(accum,1)}, {patch}x{patch} LR, windowed DCN R=2",
    }


def probe_zoo_serving(T, HW, dtype, iters, n_pipeline=16):
    """Serving rate for the remaining zoo nets at their shipped configs
    (gen_configs._families) — completes the per-net on-chip table.  SISR
    nets serve one frame/item; MISR one center frame per 7-frame window;
    DRF one whole sequence.  Pipelined protocol, one process."""
    import jax
    import jax.numpy as jnp

    from ..models import (
        DRFNet,
        DUFNet,
        EDSRNet,
        EDVRNet,
        FRVSRNet,
        RBPNet,
        SRFBNet,
        TOFlowNet,
    )
    from ..ops import telemetry

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, HW, HW, 1)), dtype)
    window = jnp.asarray(rng.standard_normal((1, 7, HW, HW, 1)), dtype)
    window5 = jnp.asarray(rng.standard_normal((1, 5, HW, HW, 1)), dtype)
    seq = jnp.asarray(rng.standard_normal((1, 30, HW, HW, 1)), dtype)
    cases = {
        "edsr": (EDSRNet(in_channels=1, out_channels=1, num_resblocks=32,
                         num_features=256, upscale_factor=4, res_scale=0.1),
                 frame, 1, lambda o: o),
        "srfb": (SRFBNet(in_channels=1, out_channels=1, num_steps=4,
                         num_features=32, num_groups=6, upscale_factor=4),
                 frame, 1, lambda o: o[-1]),
        "duf": (DUFNet(in_channels=1, out_channels=1, num_frames=7,
                       size_filter=5, upscale_factor=4, backbone="_DenseLayer16"),
                window, 1, lambda o: o),
        "rbp": (RBPNet(in_channels=1, out_channels=1, base_filter=256, feat=64,
                       num_stages=3, num_resblocks=5, num_frames=7,
                       upscale_factor=4),
                window, 1, lambda o: o),
        "drf": (DRFNet(in_channels=1, out_channels=1, num_features=32,
                       num_groups=6, upscale_factor=4),
                seq, 30, lambda o: o),
        # the three windowed-knob nets at their showcase configs — their
        # lowering quality can't be read off FLOPs (round-3 finding), so the
        # achieved-TFLOP/s column is measured on the ACTUAL windowed serving
        # graphs (fills the "—" rows in PERF_NOTES "Full zoo serving table")
        "toflow": (TOFlowNet(in_channels=1, out_channels=1, num_frames=7,
                             upscale_factor=4, max_flow=4),
                   window, 1, lambda o: o),
        "edvr": (EDVRNet(in_channels=1, out_channels=1, nf=128, nframes=5,
                         groups=8, front_RBs=5, back_RBs=40,
                         dcn_max_offset=2),
                 window5, 1, lambda o: o),
        "frvsr": (FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                           num_resblocks=10, is_prediction=True, max_flow=4),
                  seq, 30, lambda o: o),
    }
    import inspect

    out = {"sec": 0.0}
    for name, (model, x, frames, select) in cases.items():
        kwargs = (
            {"train": False}
            if "train" in inspect.signature(type(model).__call__).parameters
            else {}
        )
        try:
            v = jax.jit(lambda xx: model.init(jax.random.PRNGKey(0), xx, **kwargs))(
                x.astype(jnp.float32)
            )
            # windowed nets sow telemetry at init — keep the stale collection
            # out of the serving variables (ops/telemetry.strip)
            v = telemetry.strip(v)
            v = jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, v,
            )
            f = jax.jit(lambda v, x: jnp.sum(select(model.apply(v, x, **kwargs))))
            # XLA-counted FLOPs per item -> achieved TFLOP/s below, so
            # "rates track their FLOP budgets" is a number, not a claim
            # (VERDICT r3 weak #5); the compiled executable is reused for
            # the timed calls (no second compile)
            flops = None
            try:
                compiled = f.lower(v, x).compile()
                f = compiled
                cost = compiled.cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                fl = float(cost.get("flops", float("nan")))
                flops = None if np.isnan(fl) else fl
            except Exception:
                flops = None
            float(f(v, x))  # compile + warm
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                chk = [f(v, x) for _ in range(n_pipeline)]
                float(sum(chk))
                times.append((time.perf_counter() - t0) / n_pipeline)
            sec = float(np.median(times))
            out[name] = {
                "ms_per_item": round(sec * 1e3, 2),
                "frames_per_sec": round(frames / sec, 1),
                "flops_per_item": flops,
                "achieved_tflops_per_sec": (
                    round(flops / sec / 1e12, 3) if flops else None
                ),
            }
            out["sec"] += sec
        except Exception as e:  # keep the table even if one net trips
            out[name] = {"error": str(e)[:200]}
    return out


def probe_tile_serving(T, HW, dtype, iters, tile=None, overlap=None,
                       sizes=None, feats=None, stages=None, margins=6):
    """Fixed-shape tiled serving (ops/tiling.py) vs whole-frame serving on
    the flagship, across heterogeneous frame sizes.

    Reports the REAL tradeoff: the tiled path compiles ONE executable for
    every size (vs one multi-minute compile per size) and bounds HBM by the
    tile, at the cost of halo recompute — upper-bounded by
    (tile/(tile-2*overlap))^2 per axis-pair, so bigger tiles amortize
    better.  Timings include the host-side window slicing + assembly AND
    the full-output device->host fetch in BOTH arms (serving materializes
    SR frames on the host — through the tunnel that fetch is a large share
    of either arm); compile seconds are wall-clock observed."""
    import jax
    import jax.numpy as jnp

    from ..models import RefineNet
    from ..ops.tiling import tiled_apply

    # defaults track --hw so the probe scales from a CPU smoke (hw 16: tiny
    # net, fast compiles) to the protocol shapes (hw >= 32: FLAGSHIP net,
    # tile 64 / overlap 8 / sizes 64/80/96 at hw 64).  The per-size whole-
    # frame compile time is part of the measurement — through the tunnel
    # each flagship compile is 5-10 min, which is exactly the cost the tile
    # path's single executable avoids.
    if tile is None:
        tile = HW
    if overlap is None:
        overlap = max(2, HW // 8)
    if sizes is None:
        sizes = (HW, HW + HW // 4, HW + HW // 2)
    if feats is None:
        feats = (64, 64, 64) if HW >= 32 else (6, 6)
    if stages is None:
        stages = 3 if HW >= 32 else 1
    # valid protocols have T = core + 2*margins with core >= 1 (bench.py:
    # 30 + 2*6); clamp so a short --t smoke stays a legal sequence
    margins = min(margins, (T - 1) // 2)
    cfg = dict(
        in_channels=1, out_channels=1, num_features=list(feats),
        upscale_factor=4, num_stages=stages, update_memory=True,
        num_updated_frames=margins, refine_window_size=5,
        positional_encoding=True,
    )
    model = RefineNet(**cfg)
    rng = np.random.default_rng(0)
    pos = np.asarray(rng.standard_normal((1, T, 1)), np.float32)
    x0 = jnp.asarray(rng.standard_normal((1, T, tile, tile, 1)), dtype)
    variables = jax.tree.map(
        lambda a: a.astype(dtype),
        jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.asarray(pos, dtype)),
    )
    f = jax.jit(lambda v, a, p: model.apply(v, a, p)[-1])

    out = {"tile": tile, "overlap": overlap}
    t0 = time.perf_counter()
    float(jnp.sum(f(variables, x0, jnp.asarray(pos, dtype))))  # ONE compile
    out["tiled_compile_sec"] = round(time.perf_counter() - t0, 1)

    def tiled_once(x):
        return tiled_apply(
            lambda a, p: f(variables, jnp.asarray(a, dtype), jnp.asarray(p, dtype)),
            (x, pos), (tile, tile), overlap,
        )

    whole_compile = 0.0
    for hw in sizes:
        x = np.asarray(rng.standard_normal((1, T, hw, hw, 1)), np.float32)
        tiled_once(x)  # warm the host path (executable already compiled)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            tiled_once(x)
            times.append(time.perf_counter() - t0)
        row = {"tiled_ms_per_clip": round(float(np.median(times)) * 1e3, 2)}

        xd = jnp.asarray(x, dtype)
        pd = jnp.asarray(pos, dtype)
        t0 = time.perf_counter()
        float(jnp.sum(f(variables, xd, pd)))  # per-size compile
        row["whole_compile_sec"] = round(time.perf_counter() - t0, 1)
        whole_compile += row["whole_compile_sec"]
        np.asarray(f(variables, xd, pd))  # warm the output-fetch path
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            # SYMMETRIC serving cost: start from HOST arrays (the tiled arm
            # uploads its windows from host every call) and fetch the FULL
            # output (serving materializes SR frames on the host; a
            # checksum-only pre-uploaded whole arm made the tiled overhead
            # look 4x worse through the tunnel than it is)
            np.asarray(f(variables, jnp.asarray(x, dtype), jnp.asarray(pos, dtype)))
            times.append(time.perf_counter() - t0)
        row["whole_ms_per_clip"] = round(float(np.median(times)) * 1e3, 2)
        row["tiled_overhead"] = round(
            row["tiled_ms_per_clip"] / row["whole_ms_per_clip"], 2
        )
        out[f"hw{hw}"] = row
    out["sec"] = out[f"hw{sizes[0]}"]["tiled_ms_per_clip"] / 1e3
    out["whole_compile_sec_total"] = round(whole_compile, 1)
    return out


def probe_full(T, HW, dtype, iters):
    import jax
    import jax.numpy as jnp

    from ..models import RefineNet

    cfg = dict(
        in_channels=1, out_channels=1, num_features=[64, 64, 64], upscale_factor=4,
        num_stages=3, update_memory=True, num_updated_frames=6,
        refine_window_size=5, positional_encoding=True,
    )
    model = RefineNet(**cfg)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.standard_normal((1, T, HW, HW, 1)), dtype)
    pos = jnp.asarray(rng.standard_normal((1, T, 1)), dtype)
    variables = jax.tree.map(
        lambda a: a.astype(dtype), jax.jit(model.init)(jax.random.PRNGKey(0), lr, pos)
    )
    f = jax.jit(lambda v, a, p: model.apply(v, a, p)[-1])
    sec = _timeit(f, iters, variables, lr, pos)
    core = T - 12
    return {"sec": sec, "frames_per_sec": core / sec}


PROBES = {
    "null": probe_null,
    "conv_chain": probe_conv_chain,
    "conv_batched": probe_conv_batched,
    "lstm": probe_lstm,
    "refine": probe_refine,
    "refine2d": probe_refine2d,
    "refine_pad": probe_refine_pad,
    "dcn": probe_dcn,
    "out": probe_out,
    "out_split": probe_out_split,
    "edvr_full": probe_edvr_full,
    "edvr_train": probe_edvr_train,
    "train_split": probe_train_split,
    "remat_train": probe_remat_train,
    "warp": probe_warp,
    "toflow_full": probe_toflow_full,
    "frvsr_full": probe_frvsr_full,
    "telemetry_cost": probe_telemetry_cost,
    "zoo_serving": probe_zoo_serving,
    "tile_serving": probe_tile_serving,
    "full": probe_full,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--probes", default="null,conv_chain,conv_batched,lstm,refine,out")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--t", type=int, default=42)
    parser.add_argument("--hw", type=int, default=64)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--device", default="cuda:0")
    args = parser.parse_args(argv)

    from ..main import resolve_device

    resolve_device(args.device)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    results = {}
    for name in args.probes.split(","):
        name = name.strip()
        t0 = time.perf_counter()
        results[name] = PROBES[name](args.t, args.hw, dtype, args.iters)
        results[name]["compile_plus_run_sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps({name: results[name]}), flush=True)
    return results


if __name__ == "__main__":
    main()
