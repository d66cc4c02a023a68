"""Compiled model artifact: serialized AOT export of the serving pipeline.

The reference deploys a fixed-function compiled blob — a ``.hbm`` file
produced offline by the vendor toolchain and loaded at node startup
(``stereonet_infer/launch/hobot_stereonet.launch.py`` ``stereonet_model_
file_path``; consumed via EasyDNN in ``stereonet_node.cpp`` model-init).
Weights, graph, and quantization are all baked in; the runtime only feeds
tensors.

The TPU-native equivalent is a ``jax.export`` StableHLO artifact:

  * the FULL serving pipeline (NV12 bytes -> disparity + depth) traced and
    lowered once per batch bucket, with the trained params closed over as
    constants — exactly the ".hbm semantics" (no separate weight files,
    no Python model code needed at load time);
  * multi-platform lowering (``cpu`` + ``tpu``) so one artifact runs in CI
    and on chip;
  * a plain zip container with a JSON manifest, so the artifact is
    inspectable with stock tools (the reference blob is opaque).

This kills the remaining gap in C13 (model artifact): a user of the
reference hands an ``.hbm`` to the node; a user of this framework hands a
``.stereoblob`` to ``stereod infer/stream --artifact`` or wraps it in
:class:`ArtifactEngine` for the async feed/poll serving loop.
"""

from __future__ import annotations

import json
import queue
import time
import zipfile
from typing import Optional, Sequence, Tuple

from .serving import ServingLoop

FORMAT_VERSION = 1
MANIFEST = "manifest.json"


def _pipeline_fns(model, params, cfg, int8: bool = False,
                  portable: bool = True, static_quant=None):
    """(nv12_fn, rgb_fn): the two serving contracts, params closed over.

    ``portable=True`` forces the XLA NV12 path: a multi-platform artifact
    must lower for every platform it declares, and the Mosaic kernel only
    targets TPU.  A tpu-only export (``platforms=("tpu",)``) keeps the
    fused Pallas ingest (~1.3 ms/frame faster at 720p)."""
    import jax
    import jax.numpy as jnp

    from ..ops import preprocess as pp
    from ..ops.quant import make_apply_fn

    apply_fn = make_apply_fn(model, int8, static_quant)
    camera = cfg.camera
    H, W = camera.height, camera.width
    use_pallas = False if portable else None

    def nv12_fn(sbs_batch):
        # [B, H*2W*3/2] uint8 side-by-side NV12 -> (disp [B,H,W], depth [B,H,W])
        x = jax.vmap(
            lambda f: pp.nv12_ingest(f, H, 2 * W, cfg.preprocess,
                                     use_pallas=use_pallas)[0]
        )(sbs_batch)
        left, right = pp.split_model_input(x)
        disp = apply_fn(params, left, right)["disparity"]
        return disp, camera.depth_from_disparity(disp)

    def rgb_fn(left_u8, right_u8):
        # [B,H,W,3] uint8 RGB pair -> (disp, depth); same conversion +
        # normalize contract as ops/preprocess.rgb_pair_to_model_input
        # (honors cfg.preprocess.color_space for YUV-native checkpoints).
        from ..ops import colorspace as cs

        def to_in(u):
            x = u.astype(jnp.float32)
            if cfg.preprocess.color_space == "yuv":
                x = jnp.clip(cs.rgb_to_yuv(x), 0.0, 255.0)
            return (x - cfg.preprocess.mean) / cfg.preprocess.std

        disp = apply_fn(params, to_in(left_u8), to_in(right_u8))["disparity"]
        return disp, camera.depth_from_disparity(disp)

    return nv12_fn, rgb_fn


def export_artifact(
    path: str,
    model,
    params,
    cfg,
    buckets: Sequence[int] = (1, 8),
    platforms: Sequence[str] = ("cpu", "tpu"),
    int8: bool = False,
    static_quant=None,
) -> dict:
    """Lower + serialize the serving pipeline for each batch bucket and
    write a ``.stereoblob`` zip.  Returns the manifest dict."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    camera = cfg.camera
    H, W = camera.height, camera.width
    frame_len = H * (2 * W) * 3 // 2
    portable = any(p != "tpu" for p in platforms)
    nv12_fn, rgb_fn = _pipeline_fns(model, params, cfg, int8=int8,
                                    portable=portable,
                                    static_quant=static_quant)

    entries = {}
    for b in sorted(set(int(x) for x in buckets)):
        exp = jexport.export(jax.jit(nv12_fn), platforms=tuple(platforms))(
            jax.ShapeDtypeStruct((b, frame_len), jnp.uint8)
        )
        entries[f"nv12_b{b}.stablehlo"] = exp.serialize()
        img = jax.ShapeDtypeStruct((b, H, W, 3), jnp.uint8)
        exp = jexport.export(jax.jit(rgb_fn), platforms=tuple(platforms))(
            img, img
        )
        entries[f"rgb_b{b}.stablehlo"] = exp.serialize()

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "buckets": sorted(set(int(x) for x in buckets)),
        "height": H,
        "width": W,
        "frame_len": frame_len,
        "int8": bool(int8),
        "quant": ("static" if static_quant is not None
                  else "dynamic" if int8 else "none"),
        "model": type(model).__name__,
        "config": cfg.to_dict(),
        "outputs": ["disparity_px[B,H,W]f32", "depth_m[B,H,W]f32"],
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST, json.dumps(manifest, indent=2))
        for name, blob in entries.items():
            z.writestr(name, blob)
    return manifest


class CompiledStereoArtifact:
    """Loaded ``.stereoblob``: run the baked pipeline with no model code.

    Mirrors the reference's node startup — load blob, introspect tensor
    properties, feed tensors (``stereonet_node.cpp`` model-init +
    ``FeedImg``) — except introspection reads a JSON manifest instead of
    EasyDNN tensor props.  Deserialized entries are cached per bucket;
    batches pad up to the nearest bucket (same policy as StereoEngine).
    """

    def __init__(self, path: str):
        self._zf = zipfile.ZipFile(path, "r")
        self.manifest = json.loads(self._zf.read(MANIFEST).decode())
        if self.manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest.get('format_version')} != "
                f"supported {FORMAT_VERSION}"
            )
        self.buckets = list(self.manifest["buckets"])
        self._cache = {}

    # -- internals ----------------------------------------------------
    def _entry(self, kind: str, bucket: int):
        key = (kind, bucket)
        if key not in self._cache:
            from jax import export as jexport

            blob = self._zf.read(f"{kind}_b{bucket}.stablehlo")
            self._cache[key] = jexport.deserialize(bytearray(blob))
        return self._cache[key]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        raise ValueError(
            f"batch {n} exceeds largest exported bucket {self.buckets[-1]}"
        )

    def _padded(self, arr, bucket: int):
        import numpy as np

        n = arr.shape[0]
        if n == bucket:
            return arr
        pad = np.zeros((bucket - n,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([np.asarray(arr), pad], axis=0)

    # -- public surface -------------------------------------------------
    def call_nv12_async(self, sbs_batch) -> Tuple:
        """[B<=bucket, frame_len] uint8 -> device-resident (disp, depth)
        padded to the bucket — the async building block ArtifactEngine
        pipelines on (results stay in flight until the fetch side reads
        them; ``run_nv12`` is the synchronous wrapper)."""
        b = self._bucket_for(sbs_batch.shape[0])
        return self._entry("nv12", b).call(self._padded(sbs_batch, b))

    def run_nv12(self, sbs_batch) -> Tuple["np.ndarray", "np.ndarray"]:
        """[B, frame_len] uint8 -> (disparity [B,H,W], depth_m [B,H,W])."""
        import numpy as np

        n = sbs_batch.shape[0]
        disp, depth = self.call_nv12_async(sbs_batch)
        return np.asarray(disp)[:n], np.asarray(depth)[:n]

    def infer(self, left_u8, right_u8):
        """RGB uint8 pair(s) -> disparity.  Accepts [H,W,3] or [B,H,W,3]."""
        import numpy as np

        l = np.asarray(left_u8)
        r = np.asarray(right_u8)
        single = l.ndim == 3
        if single:
            l, r = l[None], r[None]
        b = self._bucket_for(l.shape[0])
        disp, _ = self._entry("rgb", b).call(
            self._padded(l, b), self._padded(r, b)
        )
        disp = np.asarray(disp)[: l.shape[0]]
        return disp[0] if single else disp

    def close(self) -> None:
        self._zf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ArtifactEngine(ServingLoop):
    """Async streaming engine over a loaded ``.stereoblob`` — the
    deployment-side serving loop.

    This is what the reference's runtime actually is: a node wrapped around
    a pre-compiled blob with an async task pool (``StereonetNode`` +
    ``dnn_node`` ``task_num=4``, ``stereonet_node.cpp:129-147``) — no model
    code, no checkpoint, just feed tensors.  The feed/dispatch/fetch
    machine (micro-batching, geometry validation + drop, drain/results,
    worker-death surfacing) is :class:`~.serving.ServingLoop`, shared with
    :class:`~.engine.StereoEngine`, so downstream consumers are
    engine-agnostic; micro-batching pads to the artifact's exported
    buckets.

    Kept deliberately simpler than StereoEngine: host-resident results
    only (this is the cross-process deployment path — the reference also
    publishes host buffers), no mesh (artifacts are single-device
    fixed-function programs, like ``.hbm`` blobs).
    """

    _thread_prefix = "artifact"

    def __init__(self, artifact, inflight: int = 4,
                 feed_queue_depth: int = 64, drop_on_full: bool = True,
                 nan_guard: bool = True, max_batch: Optional[int] = None):
        self.artifact = (
            artifact
            if isinstance(artifact, CompiledStereoArtifact)
            else CompiledStereoArtifact(artifact)
        )
        m = self.artifact.manifest
        self.height, self.width = m["height"], m["width"]
        self.max_batch = max_batch or max(self.artifact.buckets)
        if self.max_batch not in self.artifact.buckets:
            raise ValueError(
                f"max_batch={self.max_batch} not an exported bucket "
                f"{self.artifact.buckets}"
            )
        self.nan_guard = nan_guard
        self._init_serving(
            expected_len=m["frame_len"],
            height=self.height,
            width=self.width,
            feed_queue_depth=feed_queue_depth,
            inflight=inflight,
            drop_on_full=drop_on_full,
        )

    # -- lifecycle ------------------------------------------------------
    def warmup(self) -> None:
        import numpy as np

        dummy = np.zeros((self.max_batch, self._expected_len), np.uint8)
        d, _ = self.artifact.call_nv12_async(dummy)
        np.asarray(d)

    # -- workers ----------------------------------------------------------
    def _dispatch_loop_inner(self) -> None:
        import numpy as np

        while not self._stop.is_set():
            try:
                frames = [self._feed_q.get(timeout=0.1)]
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            while len(frames) < self.max_batch:
                try:
                    frames.append(self._feed_q.get_nowait())
                except queue.Empty:
                    break
            t0 = time.monotonic()
            batch = np.stack([np.asarray(f.sbs_nv12) for f in frames])
            disp, depth = self.artifact.call_nv12_async(batch)
            self._inflight_q.put((frames, disp, depth, t0))
            self.metrics.dispatch_batch.record(len(frames))
            with self._in_progress_lock:
                self._in_progress -= 1

    def _fetch_loop_inner(self) -> None:
        import numpy as np

        from .engine import StereoResult

        while not self._stop.is_set():
            try:
                frames, disp, depth, t0 = self._inflight_q.get(timeout=0.1)
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            disp_out = np.asarray(disp)
            depth_out = np.asarray(depth)
            now = time.monotonic()
            self.metrics.infer_latency.record(now - t0)
            bad = ~np.isfinite(disp_out).all(axis=(1, 2))
            emitted = 0
            for i, frame in enumerate(frames):
                if self.nan_guard and bad[i]:
                    self.metrics.nan_drop()
                    continue
                self.metrics.e2e_latency.record(now - frame.timestamp)
                self._result_q.put(
                    StereoResult(
                        index=frame.index,
                        timestamp=frame.timestamp,
                        disparity=disp_out[i],
                        depth_m=depth_out[i],
                        gt_disparity=frame.gt_disparity,
                        e2e_latency_s=now - frame.timestamp,
                    )
                )
                emitted += 1
            if emitted:
                self.metrics.output_fps.tick(emitted)
            with self._in_progress_lock:
                self._in_progress -= 1
