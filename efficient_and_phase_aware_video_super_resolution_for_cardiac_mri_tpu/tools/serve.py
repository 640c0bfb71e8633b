"""Headless SR serving: raw LR NIfTI volumes in → SR NIfTI volumes out.

No reference counterpart: the reference can only *evaluate* datasets that
carry HR targets (``src/runner/predictors/*``); production inference — new
patients with nothing but an LR acquisition — has no entry point there.
This CLI is that entry point, composed from the framework's serving
primitives (docs/TPU_EXTENSIONS.md):

* EVERY zoo net + checkpoint (``runner/checkpoint.load_net_variables`` —
  ours or genuine reference ``.pth``): whole-sequence nets take the clip,
  MISR window nets get per-center-frame circular windows batched into one
  dispatch, SISR nets get the frames batched (``_WORKLOADS``),
* the flagship's warm-up margins + phase codes: margins are rebuilt by
  circular extension exactly like the eval datasets
  (``data/datasets.VSRRefineNetDataset``: LR = one cycle + U wrapped frames
  each side, reference ``acdc_vsr_refinenet_dataset.py:74-83``), and a
  volume with NO precomputed position code gets one generated on the fly
  with the preprocessing tools' own algorithm (``tools/cardiac_cropping
  .find_bbox`` + ``tools/gen_positional_encoding.phase_code``, reference
  ``src/gen_positional_encoding.py:24-38``),
* shape-bounding knobs for heterogeneous patients: ``--t-bucket`` (circular
  cycle extension, sliced back to the true T) and ``--tile``/
  ``--tile-overlap`` (fixed-shape tiled inference, ``ops/tiling.py``),
* ``--aot-cache`` persistent executables (restart skips the compile),
  ``--dtype bfloat16`` compute casting, and double-buffered dispatch
  (``utils/dispatch.DoubleBuffer``: volume k+1 is on the device before
  volume k's fetch + disk write finish).

Outputs mirror the input tree: ``OUT/<relpath>`` with the SR volume in the
source (H*r, W*r, S, T) layout, values denormalized to rounded [0, 255]
like every exporter (``runner/common.denorm_uint8``).  Writes are atomic
(tmp + rename) and existing outputs are skipped, so ``--watch`` mode — poll
the input directory until SIGTERM/SIGINT — is restart- and crash-safe.

    python -m <pkg>.tools.serve CONFIG.yaml --in LR_DIR --out SR_DIR \
        [--ckpt model_best.pth] [--stats acdc|dsb15|MEAN,STD] \
        [--pos-code position_code.pkl] [--dtype bfloat16] [--t-bucket N] \
        [--tile N [--tile-overlap R]] [--aot-cache DIR] \
        [--watch [--poll SEC]] [--device cuda:0|cpu]

CONFIG.yaml is any zoo config — only its ``net:`` section (and
``main.loaded_path`` as the default checkpoint) is read.
"""
from __future__ import annotations

import argparse
import logging
import pickle
import signal
import threading
import time
from pathlib import Path

import numpy as np

from ..config import NETS, load_config
from ..ops import telemetry
from ..utils import nifti
from ..utils.stats import get_stats

LOG = logging.getLogger("evsr.serve")

#: which element of a multi-output net forward is the served SR frame —
#: mirrors the predictors (``runner/predictors.py``): RefineNet-style stage
#: lists serve the final fused stage (reference
#: ``acdc_vsr_refinenet_predictor.py:62``), FRVSR returns (sr, warped).
_OUTPUT_PICKERS = {
    "FRVSRNet": lambda outs: outs[0] if isinstance(outs, (tuple, list)) else outs,
}

#: how each zoo family consumes a cardiac cycle (the models/__init__
#: taxonomy, mirroring the reference's SISR/MISR/VSR dataset split):
#: ``sequence`` nets take the whole (1, T(+2U), H, W, C) clip; ``window``
#: nets take per-center-frame N-frame windows (served as ONE batch of T
#: windows); ``frame`` nets take independent frames (served as one batch).
_WORKLOADS = {
    "Bicubic": "frame", "EDSRNet": "frame", "SRFBNet": "frame",
    "DRFSISRNet": "frame",
    "DUFNet": "window", "EDVRNet": "window", "RBPNet": "window",
    "TOFlowNet": "window",
    "DRFNet": "sequence", "FRVSRNet": "sequence", "RefineNet": "sequence",
}


def _pick_output(net_name: str, outputs):
    picker = _OUTPUT_PICKERS.get(net_name)
    if picker is not None:
        return picker(outputs)
    return outputs[-1] if isinstance(outputs, (tuple, list)) else outputs


def neutral_phase_code(T: int) -> np.ndarray:
    """Fallback when phase estimation fails (blank/degenerate data): one
    cosine period over the cycle — the code's *shape* without a detected
    end-systole anchor."""
    return np.cos(np.linspace(0, 2 * np.pi, T, endpoint=False)).astype(np.float32)


def generate_phase_code(raw_slice: np.ndarray) -> np.ndarray:
    """(H, W, 1, T) RAW (un-normalized) LR sequence → (T,) phase code.

    The offline pipeline derives codes from HR data + motion bboxes
    (``gen_positional_encoding.py``); at serving time only LR exists, so the
    same Otsu end-systole algorithm runs on the LR frames with a motion bbox
    found on them (full frame if bbox detection degenerates)."""
    from .cardiac_cropping import find_bbox
    from .gen_positional_encoding import phase_code

    H, W, _, T = raw_slice.shape
    try:
        bbox = find_bbox(raw_slice)
        h0, hn, w0, wn = bbox
        if hn - h0 < 2 or wn - w0 < 2:
            bbox = (0, H, 0, W)
    except Exception:
        bbox = (0, H, 0, W)
    try:
        code = phase_code(raw_slice, bbox)
        if code.shape != (T,) or not np.all(np.isfinite(code)):
            raise ValueError("degenerate code")
        return code.astype(np.float32)
    except Exception:
        LOG.warning("phase-code estimation failed; using the neutral cosine code")
        return neutral_phase_code(T)


def _wrap(core: np.ndarray, U: int, t_bucket: int | None):
    """Rebuild the eval-time input sequence from one cardiac cycle: circular
    warm-up margins of U frames each side (dataset semantics above) and,
    with ``t_bucket``, circular extension of the core to the next bucket
    multiple (``runner/predictors.VSRPredictor._bucket_batch`` semantics).
    ``core``: (T, ...) — returns (extended array, true T)."""
    T = core.shape[0]
    Tb = -(-T // t_bucket) * t_bucket if t_bucket else T
    idx = np.arange(Tb) % T
    # modular indexing BOTH sides: a plain core[T - U:] silently under-fills
    # the front margin whenever the clip is shorter than U
    front = np.arange(-U, 0) % T
    back = np.arange(Tb, Tb + U) % T
    parts = [core[front], core[idx], core[back]] if U else [core[idx]]
    return np.concatenate(parts, axis=0), T


class Server:
    """One loaded net + one compiled-forward family, serving volumes."""

    def __init__(self, cfg, args):
        import jax

        from ..main import _import_components

        _import_components()  # populate the NETS registry
        net_kwargs = dict(cfg["net"].get("kwargs", {}))
        self.net_name = cfg["net"]["name"]
        self.net = NETS.get(self.net_name)(**net_kwargs)
        self.workload = (
            args.workload if args.workload != "auto"
            else _WORKLOADS.get(self.net_name, "sequence")
        )
        self.margins = (
            int(net_kwargs.get("num_updated_frames", 0) or 0)
            if self.workload == "sequence" else 0
        )
        self.positional = bool(net_kwargs.get("positional_encoding", False))
        # MISR window construction (reference acdc_misr_dataset.py:52-68):
        # the window size comes from the net itself (every window net carries
        # it), the center convention from --temporal-order (dataset default
        # 'middle' — no zoo config overrides it)
        self.num_frames = int(
            net_kwargs.get("num_frames") or net_kwargs.get("nframes") or 5
        )
        self.temporal_order = args.temporal_order
        self.mean, self.std = _parse_stats(args.stats)
        self.t_bucket = args.t_bucket
        self.dtype = args.dtype
        self.telemetry = not getattr(args, "no_telemetry", False)
        self.telemetry_warn_frac = float(getattr(args, "telemetry_warn_frac", 0.0))
        self.telemetry_summary: dict = {}
        # tile-seam probe policy ("first" = one measurement per distinct
        # input (H, W) per run; probes cost extra tile forwards — see
        # runner/predictors.py seam_stats)
        self.seam_stats = getattr(args, "seam_stats", "first")
        self._seam_probed_shapes: set = set()
        self.pos_codes = (
            _load_pickle(args.pos_code) if args.pos_code else None
        )

        ckpt = args.ckpt or cfg.get("main", {}).get("loaded_path")
        if not ckpt:
            raise SystemExit("no checkpoint: pass --ckpt or set main.loaded_path")
        from ..runner.checkpoint import load_net_variables

        import jax.numpy as jnp

        variables = dict(load_net_variables(ckpt, self.net_name))
        # device-put ONCE: a numpy weight tree would re-upload every weight
        # on every jitted call (hundreds of ms/volume through the tunnel)
        self.variables = jax.tree.map(jnp.asarray, variables)
        LOG.info(f"Loaded {self.net_name} weights from {ckpt}.")

        self._build_forward(args)

    def _build_forward(self, args):
        import jax
        import jax.numpy as jnp

        from ..runner import common
        from ..utils.casting import cast_floating

        net, dtype = self.net, self.dtype
        mean, std = self.mean, self.std
        name = self.net_name
        apply_kwargs = {"train": False} if common.accepts_train_kwarg(net) else {}
        collect_tel = self.telemetry

        @jax.jit
        def fwd(variables, *inputs):
            if dtype:
                variables = cast_floating(variables, dtype)
                inputs = cast_floating(inputs, dtype)
            if collect_tel:
                # windowed-knob exceedance telemetry (ops/telemetry.py);
                # empty (and free) for nets without max_flow/dcn_max_offset
                outputs, tel_vars = net.apply(
                    variables, *inputs, **apply_kwargs, mutable=["telemetry"]
                )
                tel = dict(tel_vars.get("telemetry", {}))
            else:
                outputs, tel = net.apply(variables, *inputs, **apply_kwargs), {}
            out = _pick_output(name, outputs)
            # denormalize ON DEVICE and fetch uint8: denorm_uint8 yields exact
            # integers in [0, 255], so the cast is LOSSLESS and the
            # device->host copy (the serving bottleneck on remote backends —
            # measured ~1 s/volume through the tunnel at f32) shrinks 4x
            out = common.denorm_uint8(
                cast_floating(out, jnp.float32) if dtype else out, mean, std
            )
            return out.astype(jnp.uint8), tel

        if args.aot_cache:
            from ..utils import aot

            fwd = aot.cached_dispatch(fwd, args.aot_cache, f"serve_{name}")

        if args.tile:
            from ..ops.tiling import tiled_apply

            tile = (args.tile, args.tile)
            overlap = args.tile_overlap

            def _want_seam(inputs) -> bool:
                if self.seam_stats == "all":
                    return True
                if self.seam_stats == "off":
                    return False
                hw = next(
                    (tuple(np.asarray(a).shape[-3:-1])
                     for a in inputs if np.ndim(a) >= 4),
                    None,
                )
                if hw is None or hw in self._seam_probed_shapes:
                    return False
                self._seam_probed_shapes.add(hw)
                return True

            def run(variables, *inputs):
                tels = []

                def tile_fn(*a):
                    out, tel = fwd(variables, *a)
                    if tel:
                        tels.append(tel)
                    return out

                def probe_fn(*a):
                    # probe windows re-cover already-predicted regions —
                    # discard their telemetry (no double-counting)
                    return fwd(variables, *a)[0]

                if _want_seam(inputs):
                    # per-run seam measurement (ops/tiling.py): outputs are
                    # already denormalized uint8, so the stats are in display
                    # units directly
                    out, seam = tiled_apply(
                        tile_fn, inputs, tile, overlap,
                        seam_stats=True, probe_fn=probe_fn,
                    )
                else:
                    out, seam = tiled_apply(tile_fn, inputs, tile, overlap), None
                tel_acc: dict = {}
                for t in tels:
                    tel_acc = (
                        jax.tree.map(telemetry.merge_triples, tel_acc, t)
                        if tel_acc else t
                    )
                return out, tel_acc, seam

            self.forward = run
        else:

            def plain(variables, *inputs):
                out, tel = fwd(variables, *inputs)
                return out, tel, None

            self.forward = plain

    # ------------------------------------------------------------- per-file
    def dispatch(self, src: Path):
        """Load + preprocess one volume and dispatch the per-slice forwards.
        Returns a list of per-slice device outputs + the true T (fetching is
        the caller's ``finish`` step, one volume behind)."""
        vol = np.asarray(nifti.load(src).data, np.float32)  # (H, W, S, T)
        if vol.ndim == 3:
            vol = vol[:, :, None, :]
        if vol.ndim != 4:
            raise ValueError(f"{src}: expected (H, W, S, T) volume, got {vol.shape}")
        H, W, S, T = vol.shape
        patient = src.name.split(".")[0].split("_")[0]

        outs, tels, seams = [], [], []
        true_t = T
        for s in range(S):
            raw = vol[:, :, s:s + 1, :]  # (H, W, 1, T)
            frames = np.transpose(raw, (3, 0, 1, 2))  # (T, H, W, 1)
            core = (frames - self.mean) / self.std
            if self.workload == "sequence":
                lr, true_t = _wrap(core, self.margins, self.t_bucket)
                inputs = [lr[None]]  # (1, T + 2U, H, W, 1)
                if self.positional:
                    code = self._phase_code(patient, raw)
                    pos, _ = _wrap(code[:, None], self.margins, self.t_bucket)
                    inputs.append(pos[None].astype(np.float32))
            else:
                # frame / window nets: the whole cycle as ONE batch of T
                # independent items (frames, or circular N-frame windows
                # around each frame — reference acdc_misr_dataset.py:52-68);
                # t_bucket pads the BATCH with wrapped centers
                Tb = -(-T // self.t_bucket) * self.t_bucket if self.t_bucket else T
                centers = np.arange(Tb) % T
                if self.workload == "frame":
                    inputs = [core[centers]]  # (Tb, H, W, 1)
                else:
                    idx = np.stack([self._window_idx(int(t), T) for t in centers])
                    inputs = [core[idx]]  # (Tb, N, H, W, 1)
            out, tel, seam = self.forward(self.variables, *inputs)
            outs.append(out)
            if tel:
                tels.append(tel)
            if seam:
                seams.append(seam)
        # fold per-slice telemetry on device (lazy; fetched once per volume
        # by the caller's finish step)
        tel_acc: dict = {}
        if tels:
            import jax

            tel_acc = tels[0]
            for t in tels[1:]:
                tel_acc = jax.tree.map(telemetry.merge_triples, tel_acc, t)
        seam_agg = None
        if seams:
            seam_agg = {
                "rms": max(s["rms"] for s in seams),
                "max_abs": max(s["max_abs"] for s in seams),
                "n_probes": sum(s["n_probes"] for s in seams),
            }
        return outs, tel_acc, seam_agg, true_t

    def _window_idx(self, t: int, T: int) -> np.ndarray:
        """Circular [start, end) window indices around center ``t`` —
        ``temporal_order`` semantics of the MISR datasets
        (``data/datasets._SRDatasetBase._bounds`` + ``_window``)."""
        n = self.num_frames
        if self.temporal_order == "last":
            start, end = t - n + 1, t + 1
        else:
            start, end = t - (n - 1) // 2, t + ((n - 1) - (n - 1) // 2) + 1
        return np.arange(start, end) % T

    def _phase_code(self, patient: str, raw_slice: np.ndarray) -> np.ndarray:
        if self.pos_codes is not None:
            code = self.pos_codes.get(patient)
            if code is not None:
                return np.asarray(code, np.float32)
            LOG.warning(f"{patient}: not in --pos-code pickle; generating")
        return generate_phase_code(raw_slice)

    @staticmethod
    def assemble(outs, true_t: int, out_dtype=np.float32) -> np.ndarray:
        """Fetch the per-slice outputs (uint8 across the wire) and assemble
        the source (H', W', S, T) layout.  The default on-disk dtype is
        float32 — the predictors' export_nifti convention; the uint8→f32
        cast is exact (denorm_uint8 values are integers in [0, 255]), and
        ``uint8`` quarters the written bytes losslessly."""
        # sequence nets return (1, T', H', W', 1); frame/window nets return a
        # (T', H', W', 1) batch of per-frame results — both slice to true T
        srs = [
            (a[0] if a.ndim == 5 else a)[:true_t]
            for a in (np.asarray(o) for o in outs)
        ]  # (T, H', W', 1) u8
        sr = np.stack([np.transpose(s[..., 0], (1, 2, 0)) for s in srs], axis=2)
        return sr.astype(out_dtype)

    @staticmethod
    def write(sr: np.ndarray, dst: Path):
        """Atomic NIfTI write (crash leaves only a .tmp; done-check is exact)."""
        dst.parent.mkdir(parents=True, exist_ok=True)
        # the tmp must keep the ".gz" FINAL suffix — nifti.save decides gzip
        # compression by it — while staying invisible to the done-check
        tmp = dst.with_name(
            dst.name + (".tmp.gz" if dst.name.endswith(".gz") else ".tmp")
        )
        nifti.save(sr, tmp)
        tmp.rename(dst)

    @classmethod
    def finish(cls, outs, true_t: int, dst: Path, out_dtype=np.float32):
        cls.write(cls.assemble(outs, true_t, out_dtype), dst)


def _parse_stats(spec: str) -> tuple[float, float]:
    if "," in spec:
        m, s = spec.split(",")
        return float(m), float(s)
    return get_stats(spec)


def _load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _out_path(src: Path, in_dir: Path, out_dir: Path) -> Path:
    return out_dir / src.relative_to(in_dir)


def discover(in_dir: Path, out_dir: Path, pattern: str):
    """(src, dst) pairs not yet served, stable order."""
    pairs = []
    for src in sorted(in_dir.glob(pattern)):
        if not src.is_file() or ".tmp" in src.name:
            continue
        dst = _out_path(src, in_dir, out_dir)
        if not dst.exists():
            pairs.append((src, dst))
    return pairs


def serve(args) -> int:
    from concurrent.futures import ThreadPoolExecutor

    from ..main import resolve_device
    from ..utils.dispatch import DoubleBuffer

    resolve_device(args.device)
    cfg = load_config(args.config)
    server = Server(cfg, args)
    in_dir, out_dir = Path(args.in_dir), Path(args.out_dir)
    out_dtype = np.dtype(args.out_dtype)

    stop = threading.Event()
    if args.watch:
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, lambda *_: stop.set())
            except ValueError:  # non-main thread (tests)
                pass

    # gzip + disk writes are pure host CPU (~0.4 s/volume measured for the
    # f32 flagship output) — run them on writer threads so they overlap the
    # next volume's device fetch; every future is drained before the next
    # discover() pass, so the done-skip check never races a pending write
    writers = ThreadPoolExecutor(max_workers=2, thread_name_prefix="evsr-write")
    pending: list = []

    failed = [0]

    def _finish_one(item):
        outs, tel, seam, true_t, dst, src, t0 = item
        try:
            # jax dispatch is async — a bad volume's device error (OOM,
            # transfer failure) surfaces HERE at fetch time, not in
            # dispatch(); it must log, not kill the daemon
            sr = server.assemble(outs, true_t, out_dtype)
        except Exception as e:
            LOG.error(f"{src}: {type(e).__name__}: {e}")
            failed[0] += 1
            return
        tel_note = ""
        if tel:
            summary = telemetry.summarize(tel)
            telemetry.check(summary, server.telemetry_warn_frac, context=src.name)
            telemetry.merge_summaries(server.telemetry_summary, summary)
            tel_note = f" [{telemetry.format_summary(summary)}]"
        if seam:
            tel_note += (
                f" [tile seam: rms={seam['rms']:.3f} max={seam['max_abs']:.1f} "
                f"display units]"
            )
        frames = true_t * len(outs)

        def _write():
            server.write(sr, dst)
            sec = time.perf_counter() - t0
            LOG.info(
                f"{src.name}: {frames} frames in {sec:.2f}s "
                f"({frames / sec:.1f} fps) -> {dst}{tel_note}"
            )

        pending.append(writers.submit(_write))

    buf = DoubleBuffer(_finish_one)
    total, busy_sec = 0, 0.0
    try:
        while True:
            pairs = discover(in_dir, out_dir, args.glob)
            cycle_t0 = time.perf_counter()
            served_this_cycle = 0
            for src, dst in pairs:
                if stop.is_set():
                    break
                t0 = time.perf_counter()
                try:
                    outs, tel, seam, true_t = server.dispatch(src)
                except Exception as e:  # one bad volume must not kill the daemon
                    LOG.error(f"{src}: {type(e).__name__}: {e}")
                    continue
                buf.push((outs, tel, seam, true_t, dst, src, t0))
                total += 1
                served_this_cycle += 1
            buf.drain()
            for f in pending:
                try:
                    f.result()
                except Exception as e:
                    LOG.error(f"write failed: {type(e).__name__}: {e}")
                    failed[0] += 1
            pending.clear()
            total -= failed[0]
            served_this_cycle -= failed[0]
            failed[0] = 0
            if served_this_cycle:
                busy_sec += time.perf_counter() - cycle_t0
            if not args.watch or stop.is_set():
                break
            stop.wait(args.poll)
    finally:
        writers.shutdown(wait=True)
    if server.telemetry_summary:
        LOG.info(
            "Windowed-op telemetry (run aggregate): "
            f"{telemetry.format_summary(server.telemetry_summary)}."
        )
    if total and busy_sec:
        # aggregate throughput (per-file lines measure dispatch->write
        # LATENCY, which overlaps across volumes and so overstates cost)
        LOG.info(
            f"Served {total} volume(s) in {busy_sec:.1f}s busy "
            f"({total / busy_sec:.2f} volumes/sec aggregate, incl. compile)."
        )
    else:
        LOG.info(f"Served {total} volume(s).")
    return total


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("config", help="zoo YAML; only net: (+ main.loaded_path) is read")
    p.add_argument("--in", dest="in_dir", required=True, help="LR NIfTI tree")
    p.add_argument("--out", dest="out_dir", required=True, help="SR output tree")
    p.add_argument("--ckpt", default=None, help="checkpoint (.pth, ours or torch)")
    p.add_argument("--glob", default="**/*.nii*", help="input file pattern")
    p.add_argument("--stats", default="acdc",
                   help="'acdc', 'dsb15', or 'MEAN,STD' normalization stats")
    p.add_argument("--pos-code", default=None,
                   help="position_code.pkl with exact per-patient codes "
                        "(generated from the LR data when absent)")
    p.add_argument("--device", default="cuda:0")
    p.add_argument("--dtype", default=None, help="compute dtype, e.g. bfloat16")
    p.add_argument("--out-dtype", default="float32", choices=["float32", "uint8"],
                   help="on-disk SR dtype; values are exact [0,255] integers "
                        "either way — uint8 quarters the written bytes")
    p.add_argument("--workload", default="auto",
                   choices=["auto", "sequence", "window", "frame"],
                   help="how the net consumes the cycle (auto: by net family)")
    p.add_argument("--temporal-order", default="middle", choices=["middle", "last"],
                   help="window-net center convention (MISR dataset default)")
    p.add_argument("--t-bucket", type=int, default=None,
                   help="pad cycles circularly to a multiple (bounds executables)")
    p.add_argument("--tile", type=int, default=None,
                   help="fixed-shape tiled inference: LR tile size")
    p.add_argument("--tile-overlap", type=int, default=8)
    p.add_argument("--aot-cache", default=None,
                   help="persistent AOT executable cache dir")
    p.add_argument("--watch", action="store_true",
                   help="poll --in for new volumes until SIGTERM/SIGINT")
    p.add_argument("--poll", type=float, default=5.0, help="watch poll seconds")
    p.add_argument("--no-telemetry", action="store_true",
                   help="disable windowed-knob exceedance telemetry "
                        "(ops/telemetry.py; on by default, free for nets "
                        "without max_flow/dcn_max_offset)")
    p.add_argument("--telemetry-warn-frac", type=float, default=0.0,
                   help="warn when a volume's out-of-window sample fraction "
                        "exceeds this (default: any exceedance warns)")
    p.add_argument("--seam-stats", default="first",
                   choices=["first", "all", "off"],
                   help="tiled serving only: measure the tile-seam error via "
                        "boundary-probe windows (extra tile forwards). "
                        "'first' (default) probes one slice per distinct "
                        "input (H, W) per run; 'all' probes every slice")
    return p.parse_args(argv)


def main(argv=None) -> int:
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s", level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    return serve(_parse_args(argv))


if __name__ == "__main__":
    main()
