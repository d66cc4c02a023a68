"""Streaming stereo inference engine.

TPU-native replacement for the reference's ``StereonetNode`` + dnn_node
async task pool (SURVEY.md C2/C4/C9): where the reference wires ROS
subscriptions into a BPU task queue with 4 in-flight requests
(``stereonet_node.cpp:144``), this engine runs a dispatch thread and a
fetch thread around one jit-compiled device pipeline:

  feed(frame)  ->  [bounded queue]  ->  dispatch: device_put + launch
               ->  [in-flight deque, depth = cfg.engine.inflight]
               ->  fetch: host transfer  ->  [result queue]  -> results()

Frame geometry is validated on feed (the reference validates and drops at
``stereonet_node.cpp:682-690``); full queues drop the newest frame rather
than blocking the camera.  All device work is one fused jit function:
NV12 split + YUV444 + normalize + network forward (+ depth).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from ..config import Config
from ..data.stream import Frame
from ..ops import preprocess as pp
from .metrics import EngineMetrics


@dataclass
class StereoResult:
    index: int
    timestamp: float
    disparity: np.ndarray  # [H, W] float32 px
    depth_m: Optional[np.ndarray] = None
    gt_disparity: Optional[np.ndarray] = None
    e2e_latency_s: float = 0.0
    left_rgb: Optional[np.ndarray] = None  # only when engine keep_left=True


class StereoEngine:
    """Compile-once, feed-many streaming engine.

    Usage::

        eng = StereoEngine(cfg)            # builds model, inits/loads params
        eng.start()
        for frame in source: eng.feed(frame)
        for res in eng.results(): ...
        eng.stop()
    """

    def __init__(self, cfg: Config = Config(), model=None, params=None,
                 compute_depth: bool = True, keep_left: bool = False):
        import jax
        import jax.numpy as jnp

        from ..models import FastStereoNet

        self.cfg = cfg
        self.metrics = EngineMetrics()
        self.model = model if model is not None else FastStereoNet(cfg.model)
        self._compute_depth = compute_depth
        # Decode the left view for display consumers (the reference
        # JPEG-encodes and republishes it, stereonet_node.cpp:782-785).
        self._keep_left = keep_left

        H, W = cfg.camera.height, cfg.camera.width
        self._expected_len = H * (2 * W) * 3 // 2

        if params is None:
            dummy = jnp.zeros((1, H, W, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy, dummy)
        self.params = params

        camera = cfg.camera

        @jax.jit
        def _pipeline(params, sbs):
            x = pp.nv12_ingest(sbs, H, 2 * W, cfg.preprocess)
            left, right = pp.split_model_input(x)
            disp = self.model.apply(params, left, right)["disparity"][0]
            if compute_depth:
                depth = camera.depth_from_disparity(disp)
            else:
                depth = None
            return disp, depth

        self._pipeline = _pipeline
        # One jitted apply reused across infer() calls — a fresh jax.jit per
        # call would retrace and recompile every frame.
        self._infer_fn = jax.jit(self.model.apply)

        self._feed_q: "queue.Queue" = queue.Queue(maxsize=cfg.engine.feed_queue_depth)
        self._inflight_q: "queue.Queue" = queue.Queue(maxsize=max(cfg.engine.inflight, 1))
        self._result_q: "queue.Queue" = queue.Queue()
        # Frames popped from a queue but not yet pushed to the next stage
        # are otherwise invisible to emptiness checks (drain/results race).
        self._in_progress = 0
        self._in_progress_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = []

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------

    def warmup(self) -> None:
        """Compile the pipeline on a dummy frame so the first real frame's
        latency metrics reflect steady state, not compilation."""
        import jax.numpy as jnp
        import numpy as np

        dummy = jnp.asarray(np.zeros(self._expected_len, np.uint8))
        disp, _ = self._pipeline(self.params, dummy)
        np.asarray(disp)  # force full execution through the tunnel

    def start(self, warmup: bool = True) -> "StereoEngine":
        if warmup:
            self.warmup()
        self._stop.clear()
        self._threads = [
            threading.Thread(target=self._dispatch_loop, daemon=True, name="dispatch"),
            threading.Thread(target=self._fetch_loop, daemon=True, name="fetch"),
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=30.0)
        self._threads = []

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------------
    # Producer side
    # ------------------------------------------------------------------

    def feed(self, frame: Frame) -> bool:
        """Enqueue a frame.  Returns False if rejected (bad geometry) or
        dropped (queue full with drop_on_full)."""
        if (
            frame.sbs_nv12.dtype != np.uint8
            or frame.sbs_nv12.size != self._expected_len
            or frame.full_width != 2 * self.cfg.camera.width
            or frame.height != self.cfg.camera.height
        ):
            self.metrics.reject()
            return False
        self.metrics.input_fps.tick()
        try:
            self._feed_q.put_nowait(frame)
            return True
        except queue.Full:
            if self.cfg.engine.drop_on_full:
                self.metrics.drop()
                return False
            self._feed_q.put(frame)
            return True

    # ------------------------------------------------------------------
    # Consumer side
    # ------------------------------------------------------------------

    def poll(self, timeout: Optional[float] = None) -> Optional[StereoResult]:
        try:
            return self._result_q.get(timeout=timeout)
        except queue.Empty:
            return None

    def _idle(self) -> bool:
        with self._in_progress_lock:
            busy = self._in_progress
        return busy == 0 and self._feed_q.empty() and self._inflight_q.empty()

    def results(self, timeout: float = 5.0) -> Iterator[StereoResult]:
        """Drain results until the pipeline is idle for ``timeout`` seconds
        or the engine is stopped."""
        while True:
            res = self.poll(timeout=timeout)
            if res is None:
                if self._stop.is_set() or self._idle():
                    return
                continue
            yield res

    def drain(self) -> None:
        """Block until everything fed so far has been dispatched+fetched,
        including frames currently in a worker's hands."""
        while not self._idle():
            time.sleep(0.005)

    # ------------------------------------------------------------------
    # Convenience
    # ------------------------------------------------------------------

    def run_stream(self, source, max_frames: int = 0) -> list:
        """Feed a stream source to completion, return all results."""
        out = []
        with self:
            n = 0
            for frame in source:
                self.feed(frame)
                n += 1
                if max_frames and n >= max_frames:
                    break
                while True:
                    r = self.poll(timeout=0)
                    if r is None:
                        break
                    out.append(r)
            self.drain()
            while True:
                r = self.poll(timeout=0.2)
                if r is None:
                    break
                out.append(r)
        return out

    def infer(self, left_rgb: np.ndarray, right_rgb: np.ndarray) -> np.ndarray:
        """Synchronous single-pair API (dataset eval path): RGB uint8 in,
        float disparity out."""
        import jax

        x = pp.rgb_pair_to_model_input(left_rgb, right_rgb, self.cfg.preprocess)
        left, right = pp.split_model_input(x)
        disp = self._infer_fn(self.params, left, right)["disparity"]
        return np.asarray(disp[0])

    # ------------------------------------------------------------------
    # Workers
    # ------------------------------------------------------------------

    def _dispatch_loop(self) -> None:
        import jax.numpy as jnp

        while not self._stop.is_set():
            try:
                frame: Frame = self._feed_q.get(timeout=0.1)
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            t0 = time.monotonic()
            sbs = jnp.asarray(frame.sbs_nv12)
            disp, depth = self._pipeline(self.params, sbs)
            # Bounded in-flight depth: blocks dispatch when the device is
            # already `inflight` frames behind (backpressure, not drop).
            self._inflight_q.put((frame, disp, depth, t0))
            with self._in_progress_lock:
                self._in_progress -= 1

    def _fetch_loop(self) -> None:
        while not self._stop.is_set():
            try:
                frame, disp, depth, t0 = self._inflight_q.get(timeout=0.1)
            except queue.Empty:
                continue
            with self._in_progress_lock:
                self._in_progress += 1
            disp_np = np.asarray(disp)  # true sync: host transfer
            depth_np = np.asarray(depth) if depth is not None else None
            left_rgb = None
            if self._keep_left:
                from ..data.stream import sbs_nv12_to_left_rgb

                left_rgb = sbs_nv12_to_left_rgb(
                    frame.sbs_nv12, frame.height, frame.full_width
                )
            now = time.monotonic()
            self.metrics.infer_latency.record(now - t0)
            self.metrics.e2e_latency.record(now - frame.timestamp)
            self.metrics.output_fps.tick()
            self._result_q.put(
                StereoResult(
                    index=frame.index,
                    timestamp=frame.timestamp,
                    disparity=disp_np,
                    depth_m=depth_np,
                    gt_disparity=frame.gt_disparity,
                    e2e_latency_s=now - frame.timestamp,
                    left_rgb=left_rgb,
                )
            )
            with self._in_progress_lock:
                self._in_progress -= 1
