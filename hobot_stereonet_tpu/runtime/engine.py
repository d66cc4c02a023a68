"""Streaming stereo inference engine.

TPU-native replacement for the reference's ``StereonetNode`` + dnn_node
async task pool (SURVEY.md C2/C4/C9): where the reference wires ROS
subscriptions into a BPU task queue with 4 in-flight requests
(``stereonet_node.cpp:144``), this engine runs a dispatch thread and a
fetch thread around one jit-compiled device pipeline:

  feed(frame)  ->  [bounded queue]  ->  dispatch: drain <=max_batch frames,
                                        ONE batched device call
               ->  [in-flight deque, depth = cfg.engine.inflight]
               ->  fetch: host transfer, split batch  ->  [result queue]

Frame geometry is validated on feed (the reference validates and drops at
``stereonet_node.cpp:682-690``); full queues drop the newest frame rather
than blocking the camera.  All device work is one fused jit function:
NV12 split + YUV444 + normalize + network forward (+ depth), vmapped over
the micro-batch.

Micro-batching is the engine's throughput lever: each device dispatch has
a fixed launch/RPC cost (~25 ms through this rig's tunnel; tens of us on a
directly-attached chip), so the dispatch thread drains every frame already
queued (up to ``EngineConfig.max_batch``) and pads to the nearest static
bucket.  Under light load batches are 1 frame (lowest latency); under
sustained load they grow to max_batch (highest throughput) — the adaptive
generalization of the reference's fixed 4-task async pool.

Zero-copy analog: ``feed`` also accepts frames whose ``sbs_nv12`` is
already a device-resident ``jax.Array`` (the reference ingests camera
frames via hbmem shared memory, ``stereonet_node.h:95-97``, precisely to
avoid copies on the hot path — our equivalent is a pre-staged device ring
buffer; see ``data.stream.DeviceFrameRing``).  Device frames are batched
with an on-device stack; host frames pay one host->device transfer per
dispatch.
"""

from __future__ import annotations

import queue
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import Config
from ..ops import preprocess as pp
from .serving import ServingLoop


class DeviceBatchView:
    """Lazy per-frame view into a device-resident result batch.

    In ``fetch_results=False`` mode the fetch thread must NOT slice the
    batch per frame — each slice is an eager device op, and 128 of them per
    batch cost more than the network itself through an RPC tunnel.  This
    handle defers the slice (and any host transfer) to the consumer that
    actually wants the frame."""

    __slots__ = ("_batch", "_i")

    def __init__(self, batch, i: int):
        self._batch = batch
        self._i = i

    @property
    def shape(self):
        return self._batch.shape[1:]

    @property
    def dtype(self):
        return self._batch.dtype

    def device_array(self):
        """The [H, W] jax.Array for device-side consumers (one slice op)."""
        return self._batch[self._i]

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self._batch[self._i])
        return out.astype(dtype) if dtype is not None else out


@dataclass
class StereoResult:
    index: int
    timestamp: float
    disparity: np.ndarray  # [H, W] float32 px (DeviceBatchView when the
    #                        engine runs with fetch_results=False)
    depth_m: Optional[np.ndarray] = None
    gt_disparity: Optional[np.ndarray] = None
    e2e_latency_s: float = 0.0
    left_rgb: Optional[np.ndarray] = None  # only when engine keep_left=True
    confidence: Optional[np.ndarray] = None  # [H/8, W/8] peak-probability
    #                        match confidence in [0,1]; only when the
    #                        engine runs with emit_confidence=True


class StereoEngine(ServingLoop):
    """Compile-once, feed-many streaming engine.

    Usage::

        eng = StereoEngine(cfg)            # builds model, inits/loads params
        eng.start()
        for frame in source: eng.feed(frame)
        for res in eng.results(): ...
        eng.stop()
    """

    _thread_prefix = "engine"

    def __init__(self, cfg: Config = Config(), model=None, params=None,
                 compute_depth: bool = True, keep_left: bool = False,
                 mesh=None, int8: bool = False,
                 emit_confidence: bool = False, static_quant=None):
        import jax
        import jax.numpy as jnp

        from ..models import FastStereoNet

        self.cfg = cfg
        H, W = cfg.camera.height, cfg.camera.width
        self._init_serving(
            expected_len=H * (2 * W) * 3 // 2,
            height=H,
            width=W,
            feed_queue_depth=cfg.engine.feed_queue_depth,
            inflight=cfg.engine.inflight,
            drop_on_full=cfg.engine.drop_on_full,
        )
        self.model = model if model is not None else FastStereoNet(cfg.model)
        # w8a8 network path (the reference's whole network is int8 on the
        # BPU, preprocess.h:236-240 / parser.cpp:84); same checkpoint, convs
        # swapped for s8xs8->s32 at apply time (ops/quant.py).
        from ..ops.quant import make_apply_fn

        self.int8 = int8
        # static_quant=(calib, baked): calibrated static-scale int8 (the
        # reference's actual scheme — scales fixed at export, no runtime
        # reductions; preprocess.h:236-240, parser.cpp:84).  Kept on the
        # engine so export can reuse it instead of rebuilding the bake.
        self.static_quant = static_quant
        self._apply = make_apply_fn(self.model, int8, static_quant)
        self._compute_depth = compute_depth
        # Decode the left view for display consumers (the reference
        # JPEG-encodes and republishes it, stereonet_node.cpp:782-785).
        self._keep_left = keep_left
        # Ship the 1/8-res soft-argmin peak probability with each result
        # (the model computes it anyway; the reference's BPU blob hides
        # it).  Opt-in: it adds one small output tensor per dispatch.
        self._emit_confidence = emit_confidence

        # Multi-chip serving (BASELINE "8 stereo pairs, tile-sharded"): the
        # frame batch shards over the mesh's ``data`` axis and image rows
        # over ``tile``; GSPMD inserts the halo collectives.  The reference
        # has no analog (one BPU); this is the scale-out the reference's
        # task pool can't express.
        if mesh is None and cfg.mesh.num_devices > 1:
            from ..parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh(cfg.mesh)
        self.mesh = mesh

        if params is None:
            dummy = jnp.zeros((1, H, W, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy, dummy)

        camera = cfg.camera
        self._buckets = cfg.engine.batch_buckets
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import mesh as mesh_mod

            ndata = mesh.shape[mesh_mod.DATA_AXIS]
            # Batch buckets must split evenly over the data axis; padding to
            # the bucket already covers partial batches.
            self._buckets = tuple(b for b in self._buckets if b % ndata == 0)
            if not self._buckets:
                raise ValueError(
                    f"no batch bucket divisible by mesh data={ndata}; "
                    f"set EngineConfig.batch_buckets accordingly"
                )
            m = cfg.engine.device_microbatch
            if m and m % ndata != 0:
                # Blockwise serving composes with mesh serving only when
                # each chunk splits evenly over the data axis; anything
                # else must fail loudly, not silently serve the full
                # bucket (the exact HBM OOM hbm_analysis.json documents).
                raise ValueError(
                    f"device_microbatch={m} must be a multiple of the mesh "
                    f"data axis ({ndata}) so each lax.map chunk shards "
                    f"evenly; use m={ndata * max(1, m // ndata)} or disable"
                )
            params = mesh_mod.replicate(mesh, params)
            self._batch_sharding = NamedSharding(mesh, P(mesh_mod.DATA_AXIS, None))
            self._act_spec = P(mesh_mod.DATA_AXIS, mesh_mod.TILE_AXIS, None, None)
            self._out_shardings = (
                NamedSharding(mesh, mesh_mod.batch_map_spec()),
                NamedSharding(mesh, mesh_mod.batch_map_spec())
                if compute_depth
                else None,
                NamedSharding(mesh, mesh_mod.batch_map_spec())
                if emit_confidence
                else None,
                NamedSharding(mesh, P(mesh_mod.DATA_AXIS)),
            )
        self.params = params

        def _nonfinite_flags(disp):
            # Per-frame NaN/Inf flags, fused into the pipeline program: the
            # failure-detection guard (SURVEY §5) costs one [B]-vector
            # transfer that doubles as the completion probe — zero extra
            # dispatches through the RPC tunnel.
            return jnp.any(~jnp.isfinite(disp), axis=(1, 2)).astype(jnp.float32)

        def _run_chunk(params, sbs_batch):
            # [B, frame_len] uint8 -> (disp [B,H,W], depth|None, probe [B]).
            # The probe vector is computed IN the fused program so the
            # fetch thread can confirm completion with one tiny transfer
            # and zero extra op dispatches — and it carries the per-frame
            # non-finite flags for the NaN-frame guard.
            x = jax.vmap(lambda f: pp.nv12_ingest(f, H, 2 * W, cfg.preprocess)[0])(
                sbs_batch
            )
            if self.mesh is not None:
                from jax.sharding import NamedSharding

                # Re-shard activations rows over ``tile`` for the network
                # (the ingest itself is batch-sharded only: flat NV12 bytes
                # have no row axis until decoded).
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, self._act_spec)
                )
            left, right = pp.split_model_input(x)
            net_out = self._apply(params, left, right)
            disp = net_out["disparity"]
            if compute_depth:
                depth = camera.depth_from_disparity(disp)
            else:
                depth = None
            conf = net_out["confidence"] if emit_confidence else None
            return disp, depth, conf, _nonfinite_flags(disp)

        def _run(params, sbs_batch):
            # Blockwise serving (EngineConfig.device_microbatch): chunk the
            # batch INSIDE the compiled program with lax.map — still one
            # dispatch through the RPC floor, but peak activation memory is
            # bounded by the chunk size instead of the full bucket.  Exact:
            # every op in the pipeline is per-sample.  In mesh mode each
            # chunk stays sharded over the ``data`` axis (m per-shard rows
            # = m // ndata), so blockwise serving composes with multi-chip
            # serving instead of being silently dropped (VERDICT r4 #7);
            # construction rejects a microbatch the mesh can't split.
            m = cfg.engine.device_microbatch
            bsz = sbs_batch.shape[0]
            if m and bsz > m and bsz % m == 0:
                sub = sbs_batch.reshape(bsz // m, m, sbs_batch.shape[1])
                if self.mesh is not None:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    from ..parallel import mesh as mesh_mod

                    sub = jax.lax.with_sharding_constraint(
                        sub,
                        NamedSharding(
                            self.mesh, P(None, mesh_mod.DATA_AXIS, None)
                        ),
                    )
                disp, depth, conf, flags = jax.lax.map(
                    lambda s: _run_chunk(params, s), sub
                )
                join = lambda a: a.reshape((bsz,) + a.shape[2:])
                return (
                    join(disp),
                    join(depth) if depth is not None else None,
                    join(conf) if conf is not None else None,
                    join(flags),
                )
            return _run_chunk(params, sbs_batch)

        if mesh is not None:
            self._pipeline = jax.jit(_run, out_shardings=self._out_shardings)
        else:
            self._pipeline = jax.jit(_run)
        # Ring-fed variant: batch assembly (gather of ring slots) fused into
        # the same compiled program — zero separate eager dispatches on the
        # hot path (an eager gather op costs a dispatch round trip per batch
        # and its first call pays a remote compile inside the serving loop).
        self._pipeline_ring = jax.jit(
            lambda params, ring_data, idx: _run(params, ring_data[idx])
        )
        # Stage-timing diagnostic split (reference rt_stat analog): the
        # same math as _pipeline but in two dispatches so each can be
        # synced and timed.
        @jax.jit
        def _pre_stage(sbs_batch):
            x = jax.vmap(
                lambda f: pp.nv12_ingest(f, H, 2 * W, cfg.preprocess)[0]
            )(sbs_batch)
            # Scalar completion probe computed IN the program: fetching it is
            # the stage sync.  Fetching an element of x instead (ravel()[0])
            # pulls the whole full-res f32 batch through the RPC tunnel
            # (~0.9 GB/batch at 32@720p — measured 2.9 s/batch and it
            # resource-exhausted the remote service after a few batches).
            return x, x.reshape(-1)[0]

        @jax.jit
        def _net_stage(params, x):
            left, right = pp.split_model_input(x)
            net_out = self._apply(params, left, right)
            disp = net_out["disparity"]
            depth = camera.depth_from_disparity(disp) if compute_depth else None
            conf = net_out["confidence"] if emit_confidence else None
            return disp, depth, conf, _nonfinite_flags(disp)

        self._pre_stage = _pre_stage
        self._net_stage = _net_stage
        # One jitted apply reused across infer() calls — a fresh jax.jit per
        # call would retrace and recompile every frame.
        self._infer_fn = jax.jit(self._apply)

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------

    def warmup(self, buckets=None, ring=None) -> None:
        """Compile the pipeline so the first real frame's latency metrics
        reflect steady state, not compilation.

        By default compiles the two shapes a stream actually hits: batch 1
        (light load) and max_batch (sustained load); intermediate buckets
        compile lazily on first use.  Pass an explicit bucket list to
        pre-compile more.  Pass the ``DeviceFrameRing`` the stream will use
        to compile the fused ring-gather variant instead of the plain-batch
        one (each is a separate XLA program; compiling both doubles warmup
        time for no benefit when the feed source is known)."""
        import jax.numpy as jnp
        import numpy as np

        if buckets is None:
            # Smallest and largest buckets the stream actually hits (in mesh
            # mode the smallest valid bucket is the data-axis size, not 1).
            buckets = sorted({self._buckets[0], self._buckets[-1]})
        for b in buckets:
            if self.cfg.engine.stage_timing:
                # The stage-timing dispatch path runs the split two-dispatch
                # variant, not the fused pipeline — compile what it will hit.
                if ring is not None and self.mesh is None:
                    # Ring-fed stage timing gathers slots EAGERLY before the
                    # pre stage — compile that gather here, or the first
                    # measured batch pays a remote compile.
                    idx = jnp.asarray(np.zeros((b,), np.int32))
                    dummy = ring.data[idx]
                else:
                    dummy = jnp.asarray(
                        np.zeros((b, self._expected_len), np.uint8)
                    )
                x, _pre_probe = self._pre_stage(dummy)
                probe = self._net_stage(self.params, x)[-1]
            elif ring is not None and self.mesh is None:
                idx = jnp.asarray(np.zeros((b,), np.int32))
                probe = self._pipeline_ring(self.params, ring.data, idx)[-1]
            else:
                dummy = np.zeros((b, self._expected_len), np.uint8)
                if self.mesh is not None:
                    import jax

                    dummy = jax.device_put(dummy, self._batch_sharding)
                else:
                    dummy = jnp.asarray(dummy)
                probe = self._pipeline(self.params, dummy)[-1]
            np.asarray(probe)  # force full execution through the tunnel

    # Lifecycle, feed/poll/results/drain, run_stream, and worker-error
    # surfacing are inherited from ServingLoop (shared with ArtifactEngine).

    def infer(self, left_rgb: np.ndarray, right_rgb: np.ndarray) -> np.ndarray:
        """Synchronous single-pair API (dataset eval path): RGB uint8 in,
        float disparity out."""
        x = pp.rgb_pair_to_model_input(left_rgb, right_rgb, self.cfg.preprocess)
        return self.infer_preprocessed(x)

    def infer_with_confidence(self, left_rgb, right_rgb):
        """Like :meth:`infer` but also returns the [H/8, W/8] soft-argmin
        peak-probability confidence map (the signal the reference's BPU
        blob computes internally and discards; here it gates SLAM
        triangulation — slam/tracker.py ``min_confidence``)."""
        x = pp.rgb_pair_to_model_input(left_rgb, right_rgb, self.cfg.preprocess)
        import jax.numpy as jnp

        left, right = pp.split_model_input(jnp.asarray(x))
        out = self._infer_fn(self.params, left, right)
        return (np.asarray(out["disparity"][0]),
                np.asarray(out["confidence"][0]))

    def infer_preprocessed(self, x) -> np.ndarray:
        """Synchronous forward on an already-normalized [1,H,W,6] input
        tensor — the raw-tensor replay path (the reference feeds foreign
        preprocessed dumps straight to the network via
        ``CvtBinData2Tensors``, ``preprocess.cpp:429-583``)."""
        import jax.numpy as jnp

        left, right = pp.split_model_input(jnp.asarray(x))
        disp = self._infer_fn(self.params, left, right)["disparity"]
        return np.asarray(disp[0])

    # ------------------------------------------------------------------
    # Workers
    # ------------------------------------------------------------------

    def _assemble_batch(self, frames):
        """Resolve frame buffers to a [bucket, L] batch, padded by repeating
        the last frame (pad rows are computed then discarded — padding to a
        static bucket costs idle-lane FLOPs but avoids a recompile per batch
        size).

        Returns either ``("ring", ring_data, idx)`` — all frames are slots
        of one device ring (hbmem zero-copy analog), gather happens INSIDE
        the compiled pipeline — or ``("batch", array)`` for device-resident
        or host frames (host frames pay one host->device transfer per
        dispatch; on a directly-attached host that is the DMA'd camera
        path).
        """
        import jax
        import jax.numpy as jnp

        from ..data.stream import RingSlot

        bucket = next(b for b in self._buckets if b >= len(frames))
        bufs = [f.sbs_nv12 for f in frames]
        bufs += [bufs[-1]] * (bucket - len(bufs))
        first = bufs[0]
        if (
            self.mesh is None
            and isinstance(first, RingSlot)
            and all(isinstance(b, RingSlot) and b.ring is first.ring for b in bufs)
        ):
            idx = jnp.asarray(np.asarray([b.slot for b in bufs], np.int32))
            return ("ring", first.ring.data, idx)
        bufs = [b.device_array() if isinstance(b, RingSlot) else b for b in bufs]
        if self.mesh is not None:
            # Mesh serving: place the batch sharded over the data axis in
            # one transfer (the ring, if any, lives on a single device, so
            # slots are resolved host-side first).
            host = np.stack([np.asarray(b) for b in bufs])
            return ("batch", jax.device_put(host, self._batch_sharding))
        if isinstance(bufs[0], jax.Array):
            return ("batch", jnp.stack(bufs))
        return ("batch", jnp.asarray(np.stack(bufs)))

    def _dispatch_loop_inner(self) -> None:
        max_batch = self.cfg.engine.max_batch
        stage_timing = self.cfg.engine.stage_timing

        while not self._stop.is_set():
            try:
                frames = [self._feed_q.get(timeout=0.1)]
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            # Adaptive micro-batch: take everything already queued, up to
            # max_batch.  No waiting — latency under light load stays one
            # frame deep; throughput under sustained load amortizes the
            # dispatch floor over up to max_batch frames.
            while len(frames) < max_batch:
                try:
                    frames.append(self._feed_q.get_nowait())
                except queue.Empty:
                    break
            t0 = time.monotonic()
            asm = self._assemble_batch(frames)
            if stage_timing:
                # Diagnostic split (rt_stat preprocess/infer analog):
                # sync after EACH stage to attribute time — which also
                # serializes dispatches.  That is deliberate: the split
                # materializes the full-res f32 preprocessed batch between
                # stages (~0.9 GB at batch 32 @720p), and letting `inflight`
                # of those pile up on device OOMs HBM (it did).  Throughput
                # in this mode is diagnostic, not headline.
                batch = asm[1][asm[2]] if asm[0] == "ring" else asm[1]
                x, pre_probe = self._pre_stage(batch)
                _ = float(pre_probe)  # tunnel-safe true sync, scalar-sized
                t_pre = time.monotonic()
                disp, depth, conf, probe = self._net_stage(self.params, x)
                _ = np.asarray(probe)  # complete the net stage before the
                t_net = time.monotonic()  # next batch's pre-stage runs
                self.metrics.preprocess_latency.record(t_pre - t0)
                self.metrics.network_latency.record(t_net - t_pre)
                self._inflight_q.put((frames, disp, depth, conf, probe, t0))
            else:
                if asm[0] == "ring":
                    disp, depth, conf, probe = self._pipeline_ring(
                        self.params, asm[1], asm[2]
                    )
                else:
                    disp, depth, conf, probe = self._pipeline(
                        self.params, asm[1]
                    )
                self._inflight_q.put((frames, disp, depth, conf, probe, t0))
            self.metrics.dispatch_batch.record(len(frames))
            with self._in_progress_lock:
                self._in_progress -= 1

    def _fetch_loop_inner(self) -> None:
        fetch_results = self.cfg.engine.fetch_results
        nan_guard = self.cfg.engine.nan_guard
        while not self._stop.is_set():
            try:
                frames, disp, depth, conf, probe, t0 = self._inflight_q.get(
                    timeout=0.1
                )
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            if fetch_results:
                disp_out = np.asarray(disp)  # true sync: host transfer
                depth_out = np.asarray(depth) if depth is not None else None
                conf_out = np.asarray(conf) if conf is not None else None
                # Results are on the host anyway — flag non-finite frames
                # there, no extra transfer.
                bad = ~np.isfinite(disp_out).all(axis=(1, 2))
            else:
                # Device-resident results: the fused probe vector confirms
                # completion (block_until_ready is not a true sync through
                # RPC tunnels) with ONE tiny transfer and zero extra op
                # dispatches — and carries the per-frame non-finite flags;
                # frames get lazy views, never eager slices.
                bad = np.asarray(probe) > 0
                disp_out, depth_out, conf_out = disp, depth, conf
            now = time.monotonic()
            self.metrics.infer_latency.record(now - t0)
            emitted = 0
            for i, frame in enumerate(frames):
                if nan_guard and bad[i]:
                    # Failure detection: a frame whose output contains
                    # NaN/Inf is dropped, not published (the reference drops
                    # bad frames and continues, stereonet_node.cpp:682-690 —
                    # here extended to the numeric-health of the output).
                    self.metrics.nan_drop()
                    continue
                left_rgb = None
                if self._keep_left:
                    from ..data.stream import sbs_nv12_to_left_rgb

                    left_rgb = sbs_nv12_to_left_rgb(
                        np.asarray(frame.sbs_nv12), frame.height, frame.full_width
                    )
                if fetch_results:
                    d_i = disp_out[i]
                    z_i = depth_out[i] if depth_out is not None else None
                    c_i = conf_out[i] if conf_out is not None else None
                else:
                    d_i = DeviceBatchView(disp_out, i)
                    z_i = (
                        DeviceBatchView(depth_out, i)
                        if depth_out is not None
                        else None
                    )
                    c_i = (
                        DeviceBatchView(conf_out, i)
                        if conf_out is not None
                        else None
                    )
                self.metrics.e2e_latency.record(now - frame.timestamp)
                self._result_q.put(
                    StereoResult(
                        index=frame.index,
                        timestamp=frame.timestamp,
                        disparity=d_i,
                        depth_m=z_i,
                        gt_disparity=frame.gt_disparity,
                        e2e_latency_s=now - frame.timestamp,
                        left_rgb=left_rgb,
                        confidence=c_i,
                    )
                )
                emitted += 1
            if emitted:
                self.metrics.output_fps.tick(emitted)
            with self._in_progress_lock:
                self._in_progress -= 1
