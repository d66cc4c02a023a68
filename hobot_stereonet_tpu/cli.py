"""``stereod`` command-line interface.

Replaces the reference's process entry + launch-file orchestration
(SURVEY.md C1/C11: ``main.cpp``, ``hobot_stereonet_demo.launch.py``) with
subcommands:

  stereod infer  --left L.png --right R.png [--out out.png]   one pair
  stereod stream --frames N [--fps 15]                        live emulation
  stereod eval   --dataset synthetic|sceneflow|kitti [--root DIR]
  stereod bench                                               headline bench
  stereod train  --steps N [--checkpoint DIR]                 synthetic train
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional


def _make_config(args, h: Optional[int] = None, w: Optional[int] = None):
    """Config resolution: --config JSON (Config.from_json) if given, else
    defaults; optional camera-geometry override."""
    import dataclasses

    from .config import Config

    cfg = (
        Config.from_json(args.config)
        if getattr(args, "config", None)
        else Config()
    )
    if h is not None:
        cfg = dataclasses.replace(
            cfg, camera=dataclasses.replace(cfg.camera, width=w, height=h)
        )
    return cfg


def _make_model(cfg, args):
    """--model classic|fast (default fast, the streaming flagship)."""
    name = getattr(args, "model", None) or "fast"
    if name == "classic":
        from .models import StereoNet

        return StereoNet(cfg.model)
    from .models import FastStereoNet

    return FastStereoNet(cfg.model)


def _flagship_dir() -> Optional[str]:
    """The crowned default checkpoint (scripts/crown.py), if installed."""
    import os

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "checkpoints", "flagship")
    return d if os.path.isfile(os.path.join(d, "FLAGSHIP.json")) else None


def _resolve_checkpoint(args, cfg):
    """(cfg, checkpoint_path): explicit --checkpoint wins; otherwise the
    crowned flagship is the default (the reference node always loads a
    model file — a random-weights default is a trap), provided the user
    didn't pin a different architecture via --config and the requested
    model class matches the crowned one.  ``--checkpoint none`` forces
    random init (op-level debugging)."""
    import dataclasses

    explicit = getattr(args, "checkpoint", None)
    if explicit:
        return cfg, (None if explicit == "none" else explicit)
    flag = _flagship_dir()
    if flag is None or getattr(args, "config", None):
        return cfg, None
    import json as _json
    import os

    with open(os.path.join(flag, "FLAGSHIP.json")) as f:
        meta = _json.load(f)
    if meta.get("model_class", "fast") != (getattr(args, "model", None) or "fast"):
        return cfg, None
    from .config import Config

    flag_cfg = Config.from_json(os.path.join(flag, "config.json"))
    cfg = dataclasses.replace(cfg, model=flag_cfg.model)
    print(f"using flagship checkpoint {flag} "
          f"({meta['candidate']['name']}); pass --checkpoint none for "
          f"random init", file=sys.stderr)
    return cfg, os.path.join(flag, "params")


def _build_engine(args, h: Optional[int] = None, w: Optional[int] = None,
                  keep_left: bool = False):
    from .runtime.engine import StereoEngine

    cfg = _make_config(args, h, w)
    cfg, checkpoint = _resolve_checkpoint(args, cfg)
    model = _make_model(cfg, args)
    params = None
    if checkpoint:
        from .runtime import checkpoint as ckpt

        import jax
        import jax.numpy as jnp

        dummy = jnp.zeros((1, cfg.camera.height, cfg.camera.width, 3), jnp.float32)
        like = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
        params = ckpt.load_params(checkpoint, like=like)
    static_quant = None
    calib_path = getattr(args, "int8_calib", None)
    if calib_path:
        # Calibrated static-scale int8 (the reference's deployment scheme:
        # scales fixed at export, preprocess.h:236-240) — requires params.
        from .ops.quant import make_static_quant

        if params is None:
            import jax
            import jax.numpy as jnp

            dummy = jnp.zeros((1, cfg.camera.height, cfg.camera.width, 3),
                              jnp.float32)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
        static_quant = make_static_quant(
            model, params, calib_path, cfg.camera.height, cfg.camera.width
        )
    return StereoEngine(cfg, model=model, params=params, keep_left=keep_left,
                        int8=getattr(args, "int8", False),
                        static_quant=static_quant)


def _read_any_image(path: str, nv12_height: int, nv12_width: int):
    """Read PNG/JPEG via the dataset reader, or a raw .nv12 dump (the
    reference's golden-replay input format, ``CvtNV12File2Tensors``
    ``preprocess.cpp:1061-1103`` / ``RunBinFeedInfer``
    ``stereonet_node.cpp:441-590``) converted on device to RGB."""
    if not path.endswith(".nv12"):
        from .data.sceneflow import _read_image

        return _read_image(path)
    import jax.numpy as jnp
    import numpy as np

    from .ops import colorspace as cs

    raw = np.fromfile(path, dtype=np.uint8)
    expect = nv12_height * nv12_width * 3 // 2
    if raw.size != expect:
        raise SystemExit(
            f"{path}: {raw.size} bytes, expected {expect} for "
            f"{nv12_width}x{nv12_height} NV12 (set --nv12-width/--nv12-height)"
        )
    yuv = cs.nv12_to_yuv444(jnp.asarray(raw), nv12_height, nv12_width)
    rgb = jnp.clip(cs.yuv_to_rgb(yuv), 0.0, 255.0)
    return np.asarray(rgb).astype(np.uint8)


def cmd_infer(args) -> int:
    import numpy as np

    from .ops import disparity as dp
    from .viz import colormap as cm

    if getattr(args, "input_bin", None):
        # Raw-tensor replay (the reference's CvtBinData2Tensors /
        # RunBinFeedInfer golden-exchange path, preprocess.cpp:429-583):
        # a foreign float32-normalized or int8-quantized input tensor
        # dump goes straight to the network, bypassing preprocess.
        from .data.bintensor import load_input_tensor

        cfg = _make_config(args, h=args.bin_height, w=args.bin_width)
        x = load_input_tensor(
            args.input_bin, args.bin_height, args.bin_width,
            dtype=args.bin_dtype, layout=args.bin_layout,
            cfg=cfg.preprocess,
        )
        eng = _build_engine(args, h=args.bin_height, w=args.bin_width)
        disp = eng.infer_preprocessed(x)
        print(json.dumps({
            "source": "bin",
            "shape": list(disp.shape),
            "disparity_px": {
                "min": float(disp.min()),
                "max": float(disp.max()),
                "mean": float(disp.mean()),
                "median": float(np.median(disp)),
            },
        }))
        if args.out:
            cm.save_png(args.out, cm.colorize_disparity(disp))
            print(f"wrote {args.out}", file=sys.stderr)
        return 0
    if not args.left or not args.right:
        raise SystemExit("infer needs --left/--right images or --input-bin")
    left = _read_any_image(args.left, args.nv12_height, args.nv12_width)
    right = _read_any_image(args.right, args.nv12_height, args.nv12_width)
    h, w = left.shape[:2]
    # Pad to stride multiple.
    from .data.loader import pad_to_multiple

    k = 16
    lp, rp = pad_to_multiple(left, k), pad_to_multiple(right, k)
    if getattr(args, "artifact", None):
        # Deployment path: run the compiled .stereoblob (the .hbm analog) —
        # no model code, no checkpoint; geometry must match the artifact.
        from .runtime.artifact import CompiledStereoArtifact

        art = CompiledStereoArtifact(args.artifact)
        ah, aw = art.manifest["height"], art.manifest["width"]
        if (lp.shape[0], lp.shape[1]) != (ah, aw):
            raise SystemExit(
                f"input {lp.shape[1]}x{lp.shape[0]} != artifact geometry "
                f"{aw}x{ah} (artifacts are fixed-function, like .hbm blobs)"
            )
        disp = art.infer(lp, rp)[:h, :w]
    else:
        eng = _build_engine(args, h=lp.shape[0], w=lp.shape[1])
        disp = eng.infer(lp, rp)[:h, :w]
    print(
        json.dumps(
            {
                "shape": list(disp.shape),
                "disparity_px": {
                    "min": float(disp.min()),
                    "max": float(disp.max()),
                    "mean": float(disp.mean()),
                },
            }
        )
    )
    if args.out:
        cm.save_png(args.out, cm.render_result(left, disp))
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_stream(args) -> int:
    from .data.stream import SyntheticStreamSource
    from .utils.profiling import device_trace

    serve_port = getattr(args, "serve", None)
    if getattr(args, "artifact", None):
        # Deployment serving: the async feed/poll loop over a compiled
        # .stereoblob — the reference's node-around-a-.hbm runtime shape.
        if serve_port is not None:
            raise SystemExit("--serve needs the live engine (left-view "
                             "decode); run without --artifact")
        from .runtime.artifact import ArtifactEngine

        eng = ArtifactEngine(args.artifact)
        h, w = eng.height, eng.width
    else:
        eng = _build_engine(args, keep_left=serve_port is not None)
        h, w = eng.cfg.camera.height, eng.cfg.camera.width
    if getattr(args, "left_list", None) or getattr(args, "right_list", None):
        # Image-list replay (the reference's RunImglistFeedInfer feedback
        # harness, stereonet_node.cpp:820-976 — fps flag instead of its
        # hard-coded 300 ms pacing).
        if not (args.left_list and args.right_list):
            raise SystemExit("--left-list and --right-list go together")
        from .data.stream import ImageListStreamSource, read_list_file

        src = ImageListStreamSource(
            read_list_file(args.left_list), read_list_file(args.right_list),
            fps=args.fps, paced=not args.unpaced,
        )
        if args.frames:
            import itertools

            src = itertools.islice(iter(src), args.frames)
    else:
        src = SyntheticStreamSource(
            height=h,
            width=w,
            fps=args.fps,
            num_frames=args.frames,
            paced=not args.unpaced,
        )
    ring_mode = getattr(args, "ring", None)
    if ring_mode is None:
        # Default: list replay decodes images on the capture side — run it
        # through the capture-thread ring (the reference decouples capture
        # from inference across processes via hbmem; stereonet_node.h:95-97).
        ring_mode = bool(getattr(args, "left_list", None))
    if ring_mode:
        from .data.stream import ThreadedCaptureSource

        src = ThreadedCaptureSource(src)
    server = None
    if serve_port is not None:
        from .viz.server import DisplayServer

        server = DisplayServer(
            port=serve_port, metrics_fn=lambda: eng.metrics.snapshot()
        ).start()
        print(f"serving live view on http://localhost:{server.port}/", flush=True)
    try:
        with device_trace(getattr(args, "profile", None)):
            if server is not None:
                from .viz.server import publish_result

                results = []
                with eng:
                    for frame in src:
                        eng.feed(frame)
                        while True:
                            r = eng.poll(timeout=0)
                            if r is None:
                                break
                            publish_result(server, r)
                            results.append(r)
                    eng.drain()
                    while True:
                        r = eng.poll(timeout=0.2)
                        if r is None:
                            break
                        publish_result(server, r)
                        results.append(r)
            else:
                results = eng.run_stream(src)
    finally:
        if server is not None:
            server.stop()
    snap = eng.metrics.snapshot()
    if results and results[0].gt_disparity is not None:
        import numpy as np

        from .ops import disparity as dp

        epes = [
            float(dp.end_point_error(r.disparity, r.gt_disparity))
            for r in results
        ]
        snap["epe_px"] = round(float(np.mean(epes)), 3)
    print(json.dumps(snap))
    return 0


def cmd_eval(args) -> int:
    from .models import FastStereoNet
    from .runtime.evaluate import evaluate_dataset

    if args.dataset == "synthetic":
        from .data.loader import SyntheticStereoDataset

        ds = SyntheticStereoDataset(size=args.frames or 16, height=256, width=512,
                                    seed=args.eval_seed)
    elif args.dataset == "layered":
        # Cross-distribution family (fronto-parallel worlds) — different
        # generator from the slanted-field training distribution.
        from .data.loader import LayeredSceneDataset

        ds = LayeredSceneDataset(size=args.frames or 16)
    elif args.dataset == "sceneflow":
        from .data.sceneflow import SceneFlowDataset

        ds = SceneFlowDataset(args.root)
    elif args.dataset == "kitti":
        from .data.kitti import Kitti2015Dataset

        ds = Kitti2015Dataset(args.root)
    else:
        print(f"unknown dataset {args.dataset}", file=sys.stderr)
        return 2

    eng = _build_engine(args)
    out = {}
    if getattr(args, "check_determinism", False):
        # Determinism check (SURVEY §5): the functional core must be
        # bit-reproducible — same program + same data => identical output.
        import numpy as np

        s = ds[0]
        d1, d2 = eng.infer(s.left, s.right), eng.infer(s.left, s.right)
        out["deterministic"] = bool(np.array_equal(d1, d2))
        if not out["deterministic"]:
            print("DETERMINISM CHECK FAILED: identical inputs produced "
                  "different disparities", file=sys.stderr)
    res = evaluate_dataset(
        eng.model, eng.params, ds, eng.cfg, max_frames=args.frames or 0,
        int8=args.int8,
    )
    out.update(res.to_dict())
    print(json.dumps(out))
    return 0 if out.get("deterministic", True) else 1


def cmd_bench(args) -> int:
    import runpy
    import os

    bench = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    runpy.run_path(bench, run_name="__main__")
    return 0


def cmd_slam(args) -> int:
    """Stereo VO: synthetic trajectory by default, or a KITTI odometry
    sequence with --odometry-root; network disparity (or GT with
    --gt-disparity on the synthetic path) -> tracker -> windowed BA -> ATE."""
    import numpy as np

    from .config import CameraConfig, SLAMConfig

    if args.odometry_root:
        from .slam.run import open_sequence, run_odometry_sequence

        seq = open_sequence(args.odometry_root, args.sequence)
        first = seq[0]
        eng = _build_engine(args, h=first.left.shape[0] // 16 * 16,
                            w=first.left.shape[1] // 16 * 16)
        out = run_odometry_sequence(seq, engine=eng, max_frames=args.frames,
                                    loop_closure=args.loop_closure)
        if "ate_m" in out:
            out["ate_m"] = round(out["ate_m"], 4)
        print(json.dumps(out))
        return 0
    from .data.synthetic import LayeredScene
    from .slam.tracker import StereoSLAM, absolute_trajectory_error

    cam = CameraConfig(width=args.width, height=args.height)
    rng = np.random.default_rng(args.seed)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px, cam.baseline_m)
    conf_gate = getattr(args, "confidence_gate", 0.0) or 0.0
    slam = StereoSLAM(cam, SLAMConfig(keyframe_translation_m=0.08,
                                      min_confidence=conf_gate))

    eng = None
    if not args.gt_disparity:
        eng = _build_engine(args, h=cam.height, w=cam.width)
    elif conf_gate > 0:
        raise SystemExit("--confidence-gate needs network disparity "
                         "(drop --gt-disparity)")

    ts = np.linspace(0, 1, args.frames)
    gt_centers = np.stack(
        [0.6 * ts, 0.12 * np.sin(2 * np.pi * ts), np.zeros_like(ts)], axis=-1
    )
    tracked = 0
    for tx, ty, _ in gt_centers:
        l, r, d = scene.render(float(tx), float(ty))
        conf = None
        if eng is not None:
            if conf_gate > 0:
                d, conf = eng.infer_with_confidence(l, r)
            else:
                d = eng.infer(l, r)
        out = slam.process(l, d, confidence=conf)
        tracked += int(out["tracked"])
    slam.refine_window(window=4)
    loops = 0
    if args.loop_closure:
        from .slam.pose_graph import close_loops

        res = close_loops(slam)
        loops = len(res["loops"]) if res is not None else 0

    est = np.stack(slam.state.trajectory)
    ate = absolute_trajectory_error(est, gt_centers)
    print(
        json.dumps(
            {
                "ate_m": round(ate, 4),
                "frames": args.frames,
                "tracked": tracked,
                "keyframes": len(slam.state.keyframes),
                "disparity_source": "gt" if args.gt_disparity else "network",
                **({"confidence_gate": conf_gate} if conf_gate > 0 else {}),
                **({"loops_closed": loops} if args.loop_closure else {}),
            }
        )
    )
    return 0


def cmd_calibrate(args) -> int:
    """Offline int8 calibration (the vendor toolchain's calibration step,
    which bakes activation scales into the .hbm at conversion time): run N
    synthetic frames through a JITTED recording forward (one compile +
    one dispatch per calibration frame — eager-on-chip is an operational
    hazard on this backend, see CLAUDE.md), record per-conv max
    activations, write a scales JSON for --int8-calib / export."""
    import numpy as np

    from .data.loader import SyntheticStereoDataset
    from .ops import preprocess as pp
    from .ops.quant import calibrate_activation_scales, save_calibration

    eng = _build_engine(args, h=args.height, w=args.width)
    ds = SyntheticStereoDataset(size=args.frames, height=args.height,
                                width=args.width, seed=args.seed)

    def batches():
        for i in range(len(ds)):
            s = ds[i]
            x = pp.rgb_pair_to_model_input(s.left, s.right,
                                           eng.cfg.preprocess)
            yield pp.split_model_input(x)

    calib = calibrate_activation_scales(eng.model, eng.params, batches())
    save_calibration(args.out, calib)
    print(json.dumps({"out": args.out, "convs": len(calib),
                      "frames": args.frames,
                      "scale_range": [min(calib.values()),
                                      max(calib.values())]}))
    return 0


def cmd_train(args) -> int:
    from .runtime.train_loop import train_synthetic

    cfg = _make_config(args)
    metrics = train_synthetic(
        steps=args.steps,
        batch_size=args.batch,
        checkpoint_dir=args.checkpoint,
        log_every=args.log_every,
        lr=args.lr,
        seed=args.seed,
        resume_from=args.resume,
        model=_make_model(cfg, args),
        model_cfg=cfg.model,
        color_space=cfg.preprocess.color_space,
    )
    print(json.dumps(metrics))
    return 0


def cmd_export(args) -> int:
    """Compile + serialize the serving pipeline to a .stereoblob (the
    reference's offline .hbm build step; weights baked in, multi-platform
    StableHLO, one entry per batch bucket)."""
    from .runtime.artifact import export_artifact

    cfg = _make_config(args)
    eng = _build_engine(args)  # resolves model + checkpoint params and
    #                            builds static_quant when --int8-calib given
    buckets = tuple(int(b) for b in args.buckets.split(","))
    manifest = export_artifact(
        args.out, eng.model, eng.params, cfg,
        buckets=buckets, platforms=tuple(args.platforms.split(",")),
        int8=args.int8, static_quant=eng.static_quant,
    )
    import os

    print(json.dumps({
        "out": args.out,
        "bytes": os.path.getsize(args.out),
        "buckets": manifest["buckets"],
        "platforms": manifest["platforms"],
        "geometry": f"{manifest['width']}x{manifest['height']}",
    }))
    return 0


def cmd_dump(args) -> int:
    """Golden-tensor dump: run one pair, save every intermediate."""
    from .data.loader import pad_to_multiple
    from .data.sceneflow import _read_image
    from .runtime.golden import dump_pipeline

    left = pad_to_multiple(_read_image(args.left), 16)
    right = pad_to_multiple(_read_image(args.right), 16)
    eng = _build_engine(args, h=left.shape[0], w=left.shape[1])
    tensors = dump_pipeline(eng.model, eng.params, left, right, eng.cfg, path=args.out)
    out = {"tensors": len(tensors), "out": args.out,
           "names": sorted(tensors)[:8]}
    if getattr(args, "bin_out", None):
        # Raw .bin exchange set (the reference's loose golden files:
        # in_data_merge_norm.bin / in_data_nchw.bin / output dumps,
        # preprocess.cpp:540-548,730-812): float-normalized NCHW input,
        # its int8 quantization, and the disparity — readable by any
        # toolkit, diffable with `stereod compare`.
        from .data.bintensor import save_bin_dir, save_input_tensor
        import os

        x = tensors["input_normalized"]
        save_bin_dir(args.bin_out, {
            "input_normalized": x,
            "disparity": tensors["disparity"],
        })
        save_input_tensor(os.path.join(args.bin_out, "input_float_nchw.raw"),
                          x, dtype="float32", layout="nchw",
                          cfg=eng.cfg.preprocess)
        save_input_tensor(os.path.join(args.bin_out, "input_quant_nchw.raw"),
                          x, dtype="int8", layout="nchw",
                          cfg=eng.cfg.preprocess)
        out["bin_out"] = args.bin_out
    print(json.dumps(out))
    return 0


def cmd_compare(args) -> int:
    """Diff two golden dumps."""
    from .runtime.golden import compare, load_dump

    ok, report = compare(load_dump(args.a), load_dump(args.b),
                         rtol=args.rtol, atol=args.atol)
    bad = {k: v for k, v in report.items() if v["status"] != "ok"}
    print(json.dumps({"match": ok, "tensors": len(report),
                      "mismatches": bad}))
    return 0 if ok else 1


def cmd_bench_scaling(args) -> int:
    """GSPMD scaling check on a virtual CPU mesh: DP-sharded forward at
    1..N devices.  (Single-chip rigs can't measure real multi-chip perf;
    this validates the sharded program and reports relative efficiency on
    the host backend.)"""
    import os
    import time as _time

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    if jax.device_count() < args.devices:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from .config import MeshConfig, StereoNetConfig
    from .models import FastStereoNet
    from .parallel import mesh as mesh_mod

    cfg = StereoNetConfig(compute_dtype=jnp.float32)
    model = FastStereoNet(cfg)
    h, w = args.height, args.width
    rng = np.random.default_rng(0)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)

    results = {}
    n_dev = args.devices
    per_dev = args.per_device_batch
    for n in [1, n_dev]:
        mesh = mesh_mod.make_mesh(MeshConfig(data=n, tile=1), devices=jax.devices()[:n])
        b = per_dev * n
        l = mesh_mod.shard_batch(mesh, jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32)), tile_rows=False)
        r = mesh_mod.shard_batch(mesh, jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32)), tile_rows=False)
        ps = mesh_mod.replicate(mesh, params)
        f = jax.jit(lambda p, a, bb: jnp.mean(model.apply(p, a, bb)["disparity"]))
        float(f(ps, l, r))
        t0 = _time.perf_counter()
        iters = args.iters
        for _ in range(iters):
            out = f(ps, l, r)
        float(out)
        dt = _time.perf_counter() - t0
        results[n] = b * iters / dt
    eff = results[n_dev] / (results[1] * n_dev)
    print(json.dumps({
        "backend": jax.default_backend(),
        "fps_1dev": round(results[1], 2),
        f"fps_{n_dev}dev": round(results[n_dev], 2),
        "scaling_efficiency": round(eff, 3),
        "note": "virtual CPU devices share ONE physical host, so efficiency here only validates the sharded program compiles/runs; hardware scaling efficiency requires a real pod slice",
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="stereod", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default=None, metavar="JSON",
                        help="load a full Config from JSON (Config.from_json)")
        sp.add_argument("--model", default="fast", choices=["fast", "classic"],
                        help="network variant: fast (streaming flagship) or "
                             "classic (StereoNet-paper 3D-conv build)")
        sp.add_argument("--int8", action="store_true",
                        help="run the network w8a8 int8 (the reference's "
                             "whole network is int8 on the BPU; same "
                             "checkpoint, convs swapped at apply time)")
        sp.add_argument("--int8-calib", default=None, metavar="JSON",
                        help="calibrated static activation scales (stereod "
                             "calibrate) — selects the static-scale int8 "
                             "path (no runtime scale reductions, the "
                             "reference's deployment scheme)")
        sp.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans: every jitted function "
                             "re-runs op-by-op on the first NaN and raises "
                             "at the producing op (debug builds only — "
                             "disables async dispatch)")

    pi = sub.add_parser("infer", help="single stereo pair -> disparity "
                                      "(PNG/JPEG or raw .nv12 dumps)")
    pi.add_argument("--nv12-width", type=int, default=1280,
                    help="frame width for raw .nv12 inputs")
    pi.add_argument("--nv12-height", type=int, default=720,
                    help="frame height for raw .nv12 inputs")
    pi.add_argument("--left", default=None)
    pi.add_argument("--right", default=None)
    pi.add_argument("--input-bin", default=None, metavar="BIN",
                    help="raw preprocessed input-tensor dump (float32 "
                         "normalized or int8 quantized, the reference's "
                         "CvtBinData2Tensors golden-exchange format) — "
                         "replaces --left/--right")
    pi.add_argument("--bin-layout", default="nchw", choices=["nchw", "nhwc"],
                    help="tensor layout of --input-bin (reference dumps "
                         "are NCHW)")
    pi.add_argument("--bin-dtype", default="auto",
                    choices=["auto", "float32", "int8"],
                    help="element type of --input-bin (auto = from size)")
    pi.add_argument("--bin-height", type=int, default=720)
    pi.add_argument("--bin-width", type=int, default=1280)
    pi.add_argument("--out", default=None, help="composite PNG path")
    pi.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    pi.add_argument("--artifact", default=None, metavar="BLOB",
                    help="run a compiled .stereoblob (stereod export) "
                         "instead of building the model from code")
    common(pi)
    pi.set_defaults(fn=cmd_infer)

    ps = sub.add_parser("stream", help="live-stream emulation")
    ps.add_argument("--frames", type=int, default=30)
    ps.add_argument("--fps", type=float, default=15.0)
    ps.add_argument("--unpaced", action="store_true")
    ps.add_argument("--left-list", default=None, metavar="FILE",
                    help="replay (left) image-list file instead of the "
                         "synthetic stream (RunImglistFeedInfer analog)")
    ps.add_argument("--right-list", default=None, metavar="FILE")
    ps.add_argument("--ring", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="run capture in its own thread through the native "
                         "SPSC frame ring (default: on for list replay)")
    ps.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    ps.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="write a jax.profiler trace for TensorBoard")
    ps.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="serve a live MJPEG browser view (left|depth "
                         "composite) on this port")
    ps.add_argument("--artifact", default=None, metavar="BLOB",
                    help="serve a compiled .stereoblob (ArtifactEngine) "
                         "instead of building the model from code")
    common(ps)
    ps.set_defaults(fn=cmd_stream)

    pe = sub.add_parser("eval", help="dataset EPE/D1 evaluation")
    pe.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "layered", "sceneflow", "kitti"])
    pe.add_argument("--root", default=None)
    pe.add_argument("--frames", type=int, default=0)
    pe.add_argument("--eval-seed", type=int, default=777,
                    help="synthetic eval-set seed (disjoint from train seeds)")
    pe.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    pe.add_argument("--check-determinism", action="store_true",
                    help="run the first pair twice and require bit-equal "
                         "disparities before evaluating")
    common(pe)
    pe.set_defaults(fn=cmd_eval)

    pb = sub.add_parser("bench", help="headline throughput bench")
    pb.set_defaults(fn=cmd_bench)

    pv = sub.add_parser("slam", help="stereo VO on a synthetic trajectory")
    pv.add_argument("--frames", type=int, default=12)
    pv.add_argument("--width", type=int, default=320)
    pv.add_argument("--height", type=int, default=240)
    pv.add_argument("--seed", type=int, default=11)
    pv.add_argument("--gt-disparity", action="store_true",
                    help="use ground-truth disparity instead of the network")
    pv.add_argument("--odometry-root", default=None,
                    help="KITTI odometry or EuRoC MAV root (switches from "
                         "synthetic; layout auto-detected)")
    pv.add_argument("--sequence", default="00")
    pv.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    pv.add_argument("--loop-closure", action="store_true",
                    help="detect loop closures and optimize the keyframe "
                         "pose graph")
    pv.add_argument("--confidence-gate", type=float, default=0.0,
                    metavar="P",
                    help="triangulate only keypoints whose network match "
                         "confidence >= P (network-disparity path only; "
                         "0 disables)")
    common(pv)
    pv.set_defaults(fn=cmd_slam)

    pq = sub.add_parser("calibrate", help="offline int8 activation-scale "
                                          "calibration -> scales JSON")
    pq.add_argument("--out", required=True)
    pq.add_argument("--frames", type=int, default=8)
    pq.add_argument("--height", type=int, default=256)
    pq.add_argument("--width", type=int, default=512)
    pq.add_argument("--seed", type=int, default=4242,
                    help="calibration-set seed (disjoint from train/eval)")
    pq.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    common(pq)
    pq.set_defaults(fn=cmd_calibrate)

    pt = sub.add_parser("train", help="train on synthetic data")
    pt.add_argument("--steps", type=int, default=100)
    pt.add_argument("--batch", type=int, default=4)
    pt.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    pt.add_argument("--log-every", type=int, default=20)
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--resume", default=None,
                    help="checkpoint dir to continue training from")
    common(pt)
    pt.set_defaults(fn=cmd_train)

    px = sub.add_parser("export", help="compile + serialize the serving "
                                       "pipeline to a .stereoblob artifact")
    px.add_argument("--out", required=True)
    px.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    px.add_argument("--buckets", default="1,8",
                    help="comma-separated batch sizes to lower (default 1,8)")
    px.add_argument("--platforms", default="cpu,tpu",
                    help="lowering platforms baked into the artifact")
    common(px)
    px.set_defaults(fn=cmd_export)

    pd = sub.add_parser("dump", help="golden-tensor dump of one pair")
    pd.add_argument("--left", required=True)
    pd.add_argument("--right", required=True)
    pd.add_argument("--out", required=True)
    pd.add_argument("--bin-out", default=None, metavar="DIR",
                    help="also write raw .bin exchange tensors (float "
                         "NCHW input, int8 quantized input, disparity) "
                         "for foreign-toolkit diffing")
    pd.add_argument("--checkpoint", default=None,
                    help="params dir (default: crowned flagship checkpoint if installed; 'none' forces random init)")
    common(pd)
    pd.set_defaults(fn=cmd_dump)

    pc = sub.add_parser("compare", help="diff two golden dumps (.npz, a "
                                        ".bin dump dir, or a single raw "
                                        ".bin tensor)")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.add_argument("--rtol", type=float, default=1e-4)
    pc.add_argument("--atol", type=float, default=1e-4)
    pc.set_defaults(fn=cmd_compare)

    pbs = sub.add_parser("bench-scaling",
                         help="GSPMD scaling validation on a virtual mesh")
    pbs.add_argument("--devices", type=int, default=8)
    pbs.add_argument("--per-device-batch", type=int, default=1)
    pbs.add_argument("--width", type=int, default=256)
    pbs.add_argument("--height", type=int, default=128)
    pbs.add_argument("--iters", type=int, default=5)
    pbs.set_defaults(fn=cmd_bench_scaling)

    args = p.parse_args(argv)
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except (ValueError, AssertionError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
