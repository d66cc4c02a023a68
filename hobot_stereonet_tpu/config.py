"""Central configuration for the TPU stereo framework.

The reference hard-codes camera intrinsics (focal length / baseline) in three
separate places (``stereonet_infer/src/parser.cpp:70-71``,
``stereonet_infer/src/stereonet_node.cpp:280-282``,
``stereonet_render_tools/hobot_stereonet_render/publisher_member_function.py:29-31``)
and configures the node through ROS2 parameters
(``stereonet_infer/src/stereonet_node.cpp:27-35``).  Here every knob lives in
one typed, frozen dataclass tree that is hashable (usable as a jit static
argument) and serializable to/from plain dicts for YAML/JSON configs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CameraConfig:
    """Stereo rig calibration.

    Defaults are the ZED 2i constants the reference duplicates in three files
    (``parser.cpp:70-71``: f = 527.1931762695312 px, B = 119.89382172 mm).
    """

    focal_px: float = 527.1931762695312
    baseline_mm: float = 119.89382172
    width: int = 1280
    height: int = 720

    @property
    def baseline_m(self) -> float:
        return self.baseline_mm / 1000.0

    def depth_from_disparity(self, disparity_px):
        """Metric depth (meters) from disparity (pixels).

        Mirrors ``parser.cpp:86`` / ``publisher_member_function.py:81``:
        ``Z = f * B / disp / 1000`` with B in mm.
        """
        disparity_px = jnp.maximum(disparity_px, 1e-6)
        return self.focal_px * self.baseline_mm / disparity_px / 1000.0


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StereoNetConfig:
    """Architecture of the StereoNet disparity network.

    The reference ships the network as an opaque BPU blob
    (``config/hobot_stereonet.hbm``, input [1,6,720,1280] int8, output
    [1,1,720,1280] int32 — see SURVEY.md C13).  This config describes our
    from-scratch JAX implementation of the same architecture family
    (StereoNet, Khamis et al. 2018): siamese feature tower at 1/2^k
    resolution, difference cost volume, 3D-conv aggregation, soft-argmin,
    hierarchical edge-aware refinement.
    """

    # Number of stride-2 downsampling convs in the feature tower.
    # 3 => cost volume at 1/8 resolution (the classic StereoNet "K=3").
    downsample_factor: int = 3
    # Channels of the shared feature tower output.
    feature_channels: int = 32
    # Residual blocks in the feature tower.
    num_feature_res_blocks: int = 6
    # Max disparity at FULL resolution (px).  192 matches the reference's
    # effective x192 output multiplier (``parser.cpp:86``).
    max_disparity: int = 192
    # 3D conv aggregation depth.
    num_aggregation_layers: int = 4
    aggregation_channels: int = 32
    # Refinement: one refinement network per scale on the way back up.
    # True => refine at each intermediate scale (hierarchical, the paper's
    # multi-scale variant); False => single refinement at full resolution.
    hierarchical_refinement: bool = True
    num_refinement_res_blocks: int = 6
    refinement_channels: int = 32
    # Per-scale overrides for the hierarchical refinement (coarse -> fine).
    # Finer scales get slimmer nets: full-res refinement dominates total
    # FLOPs (H*W*C^2), and edges need fewer channels than semantics.
    # None => (refinement_channels, num_refinement_res_blocks) at all scales.
    refinement_scale_channels: Optional[Tuple[int, ...]] = (32, 16, 12)
    refinement_scale_blocks: Optional[Tuple[int, ...]] = (6, 4, 3)
    # Full-resolution strategy for FastStereoNet: "convex" = learned KxK
    # convex-combination upsampling (all heavy compute stays at 1/K res with
    # MXU-friendly channel widths; ~0.3 ms/frame at 720p), "refine" =
    # classic hierarchical refinement convs (the StereoNet-paper path, used
    # by the parity model).  Measured on v5e: full-res convs cost ~1.3 ms
    # each regardless of channel width <=64, so "refine" costs ~16 ms more.
    upsample_mode: str = "convex"
    # Compute dtype for the network (params stay float32).
    compute_dtype: Any = jnp.bfloat16
    # Rematerialize the feature tower + aggregation in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for activation memory,
    # enabling large-crop/batch training within HBM.
    remat: bool = False
    # Input channels: 6 = stacked L/R in a single tensor is the reference's
    # contract; internally we feed 3-channel left and right separately.
    input_channels: int = 3

    @property
    def cost_resolution_divisor(self) -> int:
        return 2 ** self.downsample_factor

    @property
    def num_disparities_coarse(self) -> int:
        """Disparity candidates at cost-volume resolution (e.g. 192/8 = 24)."""
        return self.max_disparity // self.cost_resolution_divisor


# ---------------------------------------------------------------------------
# Preprocess (parity with the reference input contract)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PreprocessConfig:
    """Input normalization / optional int8 quantization contract.

    Parity constants from ``preprocess.cpp:1032-1050,1116-1136`` and
    ``include/preprocess.h:236-240``: normalize (x-128)/128 then quantize
    with scale 0.0078125, zero point 0.5, floor, clamp [-128, 127].
    """

    mean: float = 128.0
    std: float = 128.0
    quant_scale: float = 0.0078125
    quant_zero_point: float = 0.5
    quant_min: int = -128
    quant_max: int = 127
    # Native TPU path runs bf16/fp32; int8 path exists for parity testing.
    quantize: bool = False
    # Model input color space for the NV12 camera path.  "rgb" (default)
    # converts YUV444 -> RGB on device so streaming matches the RGB-trained
    # checkpoints (dataset/eval paths feed RGB); "yuv" keeps the raw
    # stacked-YUV444 contract of the reference blob (SURVEY.md C13) for
    # parity testing.
    color_space: str = "rgb"

    def __post_init__(self):
        # A typo like "rbg" would otherwise silently flip the model input
        # distribution to YUV (everything != "rgb" used to mean YUV).
        if self.color_space not in ("rgb", "yuv"):
            raise ValueError(
                f"color_space must be 'rgb' or 'yuv', got {self.color_space!r}"
            )


# ---------------------------------------------------------------------------
# Parallelism / mesh
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh.

    axes: ``data`` shards the batch of stereo pairs (DP), ``tile`` shards
    image rows of the cost volume with halo exchange (the vision analog of
    sequence/context parallelism — SURVEY.md §2 parallelism table).
    """

    data: int = 1
    tile: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.tile

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "tile")


# ---------------------------------------------------------------------------
# Runtime / engine
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EngineConfig:
    """Streaming inference engine.

    ``inflight`` generalizes the reference's async BPU task pool
    (``task_num = 4`` at ``stereonet_node.cpp:144``) to N in-flight device
    batches via JAX async dispatch.  ``max_batch``/``batch_buckets`` add
    adaptive micro-batching: the dispatch thread drains up to ``max_batch``
    queued frames into ONE device call (padded to the nearest bucket so jit
    compiles a handful of static shapes) — the throughput lever that
    amortizes the per-dispatch RPC/launch floor over many frames.
    """

    inflight: int = 4
    # Host-side feed queue capacity (frames).  Must comfortably exceed
    # max_batch or the dispatcher can never assemble a full batch.
    feed_queue_depth: int = 64
    drop_on_full: bool = True  # reference drops bad/late frames, we do too
    # Adaptive micro-batching: drain up to max_batch frames per dispatch,
    # padding to the smallest bucket >= n (static jit shapes).
    max_batch: int = 32
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32)
    # Diagnostic: time preprocess and network stages separately (forces a
    # device sync per stage — the reference's rt_stat preprocess/infer
    # split, ``stereonet_node.cpp:1078-1084``).  Off in production: the
    # fused async pipeline is faster than anything measurable per-stage.
    stage_timing: bool = False
    # True (default): results land on the host as numpy (the reference
    # publishes raw tensors to downstream processes).  False: results stay
    # device-resident (StereoResult.disparity is a jax.Array view) for
    # device-side consumers (e.g. the SLAM front end) — the fetch thread
    # confirms completion with a scalar probe instead of a full transfer.
    fetch_results: bool = True
    # Failure detection (SURVEY §5): drop frames whose output contains
    # NaN/Inf instead of publishing them.  The per-frame flags ride the
    # pipeline's completion probe, so the guard adds no device dispatches.
    nan_guard: bool = True
    # Blockwise serving (the long-context "never materialize" strategy,
    # SURVEY §5, applied to the axis that actually exhausts HBM at target
    # sizes — the dispatch batch): evaluate the pipeline in chunks of this
    # many frames via lax.scan INSIDE the one compiled program.  One device
    # dispatch, activation memory bounded by the chunk, bit-exact vs. the
    # monolithic vmap.  0 = off.  Single-device only (a mesh already splits
    # the batch across chips).
    device_microbatch: int = 0

    def __post_init__(self):
        buckets = tuple(sorted(set(self.batch_buckets) | {1}))
        object.__setattr__(self, "batch_buckets", buckets)
        if self.max_batch not in buckets:
            raise ValueError(
                f"max_batch={self.max_batch} must be one of batch_buckets={buckets}"
            )
        if self.device_microbatch:
            bad = [b for b in buckets
                   if b > self.device_microbatch and b % self.device_microbatch]
            if bad:
                raise ValueError(
                    f"batch buckets {bad} not divisible by "
                    f"device_microbatch={self.device_microbatch}"
                )


# ---------------------------------------------------------------------------
# SLAM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SLAMConfig:
    max_keyframes: int = 256
    max_points_per_keyframe: int = 512
    keyframe_translation_m: float = 0.3
    keyframe_rotation_deg: float = 10.0
    ba_iterations: int = 10
    ba_damping: float = 1e-4
    huber_delta_px: float = 3.0
    # Minimum soft-argmin peak probability (the network's match
    # confidence, StereoResult.confidence) for a keypoint's disparity to
    # be triangulated into the map; 0 disables the gate.  The reference's
    # BPU blob hides this signal entirely — exposing and consuming it is
    # a capability the reference cannot offer.
    min_confidence: float = 0.0


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    camera: CameraConfig = field(default_factory=CameraConfig)
    model: StereoNetConfig = field(default_factory=StereoNetConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    slam: SLAMConfig = field(default_factory=SLAMConfig)

    # ------------------------------------------------------------------
    # Serialization
    # ------------------------------------------------------------------

    def to_dict(self) -> dict:
        def enc(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                return {f.name: enc(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
            if isinstance(obj, type):
                # dtype classes: identity checks like ``obj is jnp.float32``
                # miss the ml_dtypes/np scalar types a from_dict round-trip
                # produces, so resolve any scalar type by name.
                return jnp.dtype(obj).name
            return obj

        return enc(self)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        sub_types = {
            "camera": CameraConfig,
            "model": StereoNetConfig,
            "preprocess": PreprocessConfig,
            "mesh": MeshConfig,
            "engine": EngineConfig,
            "slam": SLAMConfig,
        }
        kwargs = {}
        for name, klass in sub_types.items():
            if name in d:
                sub = dict(d[name])
                if name == "model" and "compute_dtype" in sub and isinstance(sub["compute_dtype"], str):
                    sub["compute_dtype"] = jnp.dtype(sub["compute_dtype"]).type
                kwargs[name] = klass(**sub)
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
