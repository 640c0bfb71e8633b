"""On-device exceedance telemetry for the windowed-approximation knobs.

The ``max_flow`` / ``dcn_max_offset`` TPU knobs replace unbounded gathers
with gather-free shift-and-weight windows (``ops/warp.py``,
``ops/deform_conv.py``) that are EXACT only while the true displacement
stays inside the window — the reference's CUDA kernels sample anywhere in
the image (``deform_conv_cuda_kernel.cu:83-188``, ``toflow_net.py:116-138``),
so an out-of-window displacement is a silent accuracy cliff.  This module
makes the bound a *measured* quantity at inference time instead of an
a-priori cardiac-motion argument: every windowed call site computes a cheap
device-side reduction over its displacements —

    triple = [count(|d| > bound), count(total), max(|d|)]   (float32, (3,))

where ``|d|`` is the per-sample displacement magnitude in the USER's units
(pixels of flow for the warps, pixels of offset for the DCN) and ``bound``
is the configured knob — and publishes it through flax's ``sow`` into the
``"telemetry"`` variable collection.  Collection is strictly opt-in: when
the caller does not pass ``mutable=["telemetry"]`` to ``apply``, ``sow`` is
a no-op and XLA dead-code-eliminates the reductions, so training paths and
telemetry-off serving pay nothing.

Consumers (predictors, tools/serve.py, tools/parity_check.py) apply with the
collection mutable, then fold the per-call triples with :func:`summarize`
and warn via :func:`check` when the out-of-window fraction exceeds the
configured threshold.  Remedy on a warning: raise the knob (R) until the
fraction is 0, or drop the knob entirely to restore the exact gather path —
both are pure config changes (``net.kwargs.max_flow`` /
``net.kwargs.dcn_max_offset``).
"""
from __future__ import annotations

import logging
from typing import Mapping

import jax.numpy as jnp
import numpy as np

LOG = logging.getLogger(__name__)

#: the flax variable collection telemetry rides in
COLLECTION = "telemetry"


def exceedance_triple(bound: float, *mags: jnp.ndarray) -> jnp.ndarray:
    """[n_out, n_total, max_abs] over the per-sample displacement magnitude.

    ``mags`` are same-shaped arrays of |displacement| components in user
    units (e.g. |flow_x| and |flow_y|); a sample is out-of-window when ANY
    component exceeds ``bound`` — exactly the windowed ops' exactness
    condition.  f32 counts lose integer precision past 2^24 samples; the
    resulting fraction error is O(1e-7·n), irrelevant for a warning
    threshold.
    """
    mag = mags[0].astype(jnp.float32)
    for m in mags[1:]:
        mag = jnp.maximum(mag, m.astype(jnp.float32))
    n_out = jnp.sum((mag > float(bound)).astype(jnp.float32))
    return jnp.stack([n_out, jnp.asarray(mag.size, jnp.float32), jnp.max(mag)])


def merge_triples(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Associative fold of two triples (sum counts, max of maxima)."""
    return jnp.stack([a[0] + b[0], a[1] + b[1], jnp.maximum(a[2], b[2])])


def _init_triple() -> jnp.ndarray:
    return jnp.stack([0.0, 0.0, -jnp.inf]).astype(jnp.float32)


def sow_exceedance(module, name: str, bound: float, *mags: jnp.ndarray) -> None:
    """Compute + sow one call site's triple into the module's telemetry slot.

    Repeated calls (unrolled loops, pyramid levels) merge into one triple per
    (module path, name).  No-op (and dead code under jit) when the caller
    did not request the collection.
    """
    module.sow(
        COLLECTION,
        name,
        exceedance_triple(bound, *mags),
        init_fn=_init_triple,
        reduce_fn=merge_triples,
    )


def sow_triple(module, name: str, triple: jnp.ndarray) -> None:
    """Sow an already-reduced triple (e.g. merged over a scan's time axis)."""
    module.sow(COLLECTION, name, triple, init_fn=_init_triple, reduce_fn=merge_triples)


def sow_offset_exceedance(
    module, offset: jnp.ndarray, deformable_groups: int, bound: float,
    name: str = "dcn_offset_window",
) -> None:
    """DCN call-site telemetry: |offset| (both components, every group/tap)
    vs ``dcn_max_offset``.  ``offset`` is the (B, Ho, Wo, 2·dg·k²) tensor in
    the CUDA channel layout (y, x interleaved per tap within each group —
    ops/deform_conv.py module docstring)."""
    B, Ho, Wo, C = offset.shape
    off = offset.reshape(B, Ho, Wo, deformable_groups, C // (2 * deformable_groups), 2)
    sow_exceedance(module, name, bound, jnp.abs(off[..., 0]), jnp.abs(off[..., 1]))


def merge_time_axis(stacked: jnp.ndarray) -> jnp.ndarray:
    """Fold a (3, T) stack of triples (an ``nn.scan`` output) into one."""
    return jnp.stack([
        jnp.sum(stacked[0]), jnp.sum(stacked[1]), jnp.max(stacked[2]),
    ])


def strip(variables: Mapping) -> dict:
    """Drop the telemetry collection from a variables dict.

    ``net.init`` runs the sows too, so freshly-initialized variable dicts
    (and checkpoints saved from them) carry a stale telemetry collection;
    feeding it back into ``apply(..., mutable=["telemetry"])`` would make
    the sow REDUCE merge new triples into the stale ones.  Call this
    wherever ``model_state`` is formed.
    """
    return {k: v for k, v in dict(variables).items() if k != COLLECTION}


# --------------------------------------------------------------- host side


def _walk(tree, prefix, out):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            _walk(v, f"{prefix}/{k}" if prefix else str(k), out)
    else:
        # flax sow stores leaves as 1-tuples under the custom reduce_fn too
        vals = tree if isinstance(tree, (tuple, list)) else (tree,)
        if len(vals):
            out[prefix] = list(vals)


def summarize(telemetry_vars) -> dict[str, dict[str, float]]:
    """Flatten an apply's ``"telemetry"`` collection into per-site stats.

    Returns ``{site_path: {"frac_out", "max_abs", "n"}}``; empty dict when
    the net has no windowed knobs active (nothing sowed).  All sites' triples
    are fetched in ONE device→host transfer: a per-leaf ``np.asarray`` costs
    a full round trip EACH (~33 ms through a tunneled backend — CLAUDE.md),
    so the (3,) triples are stacked into one (N, 3) device array first.
    """
    flat: dict[str, list] = {}
    _walk(telemetry_vars or {}, "", flat)
    leaves = [v for vals in flat.values() for v in vals]
    if not leaves:
        return {}
    if any(not isinstance(v, np.ndarray) for v in leaves):
        stacked = np.asarray(
            jnp.stack([jnp.asarray(v, jnp.float32) for v in leaves])
        )
    else:
        stacked = np.stack(leaves).astype(np.float32)
    out, i = {}, 0
    for path, vals in flat.items():
        acc = None
        for _ in vals:
            v = stacked[i]
            i += 1
            acc = v if acc is None else np.array(
                [acc[0] + v[0], acc[1] + v[1], max(acc[2], v[2])], np.float32
            )
        n_out, n_tot, mx = acc
        out[path] = {
            "frac_out": float(n_out / n_tot) if n_tot else 0.0,
            "max_abs": float(mx),
            "n": float(n_tot),
        }
    return out


def merge_summaries(acc: dict, new: dict) -> dict:
    """Fold per-item summaries into a running per-site aggregate."""
    for path, s in new.items():
        if path not in acc:
            acc[path] = dict(s)
        else:
            a = acc[path]
            n = a["n"] + s["n"]
            a["frac_out"] = (a["frac_out"] * a["n"] + s["frac_out"] * s["n"]) / max(n, 1.0)
            a["max_abs"] = max(a["max_abs"], s["max_abs"])
            a["n"] = n
    return acc


def format_summary(summary: dict) -> str:
    """One human line per site: ``site: frac_out=1.2e-3 max=5.31``."""
    return "; ".join(
        f"{p}: frac_out={s['frac_out']:.2e} max|d|={s['max_abs']:.2f}"
        for p, s in sorted(summary.items())
    )


def check(summary: dict, warn_frac: float = 0.0, context: str = "") -> list[str]:
    """Warn for every site whose out-of-window fraction exceeds ``warn_frac``.

    Returns the warned site paths (for tests / callers that escalate).  The
    warning text carries the remedy because the failure is otherwise silent:
    scores simply degrade.
    """
    warned = []
    for path, s in sorted(summary.items()):
        if s["frac_out"] > warn_frac:
            warned.append(path)
            LOG.warning(
                "windowed-approximation exceedance%s at %s: %.3g%% of samples "
                "fall outside the configured window (max |displacement| %.2f px). "
                "Scores are silently degraded relative to the exact gather path — "
                "raise the window knob (max_flow / dcn_max_offset) above %.0f, or "
                "remove it to restore exact unbounded sampling.",
                f" [{context}]" if context else "",
                path,
                100.0 * s["frac_out"],
                s["max_abs"],
                np.ceil(s["max_abs"]),
            )
    return warned
