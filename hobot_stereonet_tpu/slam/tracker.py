"""Stereo SLAM front end + windowed back end.

Pipeline per frame (left image + dense disparity from the stereo network):

  1. detect+describe Harris/patch features        (device, static K)
  2. triangulate keypoints with network disparity (device)
  3. match against the active keyframe            (device, MXU matmul)
  4. robust PnP -> camera pose                    (device, vectorized RANSAC)
  5. keyframe decision (translation/rotation/inlier thresholds)
  6. windowed bundle adjustment over recent keyframes (device, Schur)

The map state (keyframe poses, landmarks) lives in plain numpy on the host
— it is tiny — while every per-frame computation is jitted device work.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CameraConfig, SLAMConfig
from . import se3
from .ba import BAProblem, bundle_adjust
from .features import Keypoints, detect_and_describe, match
from .odometry import robust_pnp, triangulate


@dataclass
class Keyframe:
    index: int
    R: np.ndarray          # world->cam
    t: np.ndarray
    keypoints: Keypoints   # device arrays (static K)
    points_w: np.ndarray   # [K, 3] triangulated world points
    valid: np.ndarray      # [K]


@dataclass
class TrackerState:
    keyframes: List[Keyframe] = field(default_factory=list)
    trajectory: List[np.ndarray] = field(default_factory=list)  # camera centers
    poses: List[Tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    frames_tracked: int = 0
    frames_lost: int = 0


class StereoSLAM:
    def __init__(self, camera: CameraConfig, cfg: SLAMConfig = SLAMConfig(),
                 num_keypoints: int = 512, seed: int = 0):
        self.camera = camera
        self.cfg = cfg
        self.k = num_keypoints
        self.state = TrackerState()
        self._key = jax.random.PRNGKey(seed)
        # Frame indices of keyframes pinned by loop-closure edges
        # (pose_graph.close_loops registers both endpoints): window
        # eviction must not discard them or future closures against the
        # same place lose their anchor.
        self.loop_anchor_indices: set = set()

    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _make_keyframe(self, index, R, t, kp: Keypoints, disp,
                       confidence=None) -> Keyframe:
        d = disp[kp.xy[:, 1].astype(jnp.int32), kp.xy[:, 0].astype(jnp.int32)]
        pts_cam, tri_valid = triangulate(kp.xy, d, self.camera)
        Rinv, tinv = se3.inverse(jnp.asarray(R), jnp.asarray(t))
        pts_w = se3.transform(Rinv, tinv, pts_cam)
        valid = kp.valid & tri_valid
        if confidence is not None and self.cfg.min_confidence > 0.0:
            # Confidence gate: only map points whose disparity the network
            # is sure about (soft-argmin peak probability at 1/8 res —
            # StereoEngine emit_confidence).  A wrong-but-confident
            # disparity becomes a bad landmark that PnP must outvote;
            # gating removes them at the source.
            conf = jnp.asarray(confidence)
            sh, sw = disp.shape[0] / conf.shape[0], disp.shape[1] / conf.shape[1]
            cy = jnp.clip((kp.xy[:, 1] / sh).astype(jnp.int32), 0,
                          conf.shape[0] - 1)
            cx = jnp.clip((kp.xy[:, 0] / sw).astype(jnp.int32), 0,
                          conf.shape[1] - 1)
            valid = valid & (conf[cy, cx] >= self.cfg.min_confidence)
        valid = np.asarray(valid)
        return Keyframe(
            index=index,
            R=np.asarray(R),
            t=np.asarray(t),
            keypoints=kp,
            points_w=np.asarray(pts_w),
            valid=valid,
        )

    def process(self, left_image: np.ndarray, disparity: np.ndarray,
                confidence: Optional[np.ndarray] = None) -> dict:
        """One frame.  Returns {"pose": (R, t), "tracked": bool, ...}.

        ``confidence``: optional [H/8, W/8] soft-argmin peak-probability
        map (StereoEngine ``emit_confidence``) — gates which keypoints
        become landmarks when ``SLAMConfig.min_confidence`` > 0."""
        st = self.state
        img = jnp.asarray(left_image)
        disp = jnp.asarray(disparity)
        kp = detect_and_describe(img, num_keypoints=self.k)

        if not st.keyframes:
            R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
            st.keyframes.append(
                self._make_keyframe(0, R, t, kp, disp, confidence))
            st.poses.append((R, t))
            st.trajectory.append(self._center(R, t))
            st.frames_tracked += 1
            return {"pose": (R, t), "tracked": True, "keyframe": True,
                    "num_inliers": int(np.sum(st.keyframes[-1].valid))}

        ref = st.keyframes[-1]
        m = match(ref.keypoints, kp)
        mvalid = np.asarray(m.valid) & ref.valid[np.asarray(m.idx_a)]

        pts_w = jnp.asarray(ref.points_w)[m.idx_a]
        obs = kp.xy[m.idx_b]
        res = robust_pnp(
            self._next_key(), pts_w, obs, jnp.asarray(mvalid), self.camera,
            thresh_px=self.cfg.huber_delta_px,
        )
        n_inl = int(res.num_inliers)
        tracked = n_inl >= 12
        if not tracked:
            st.frames_lost += 1
            # Hold last pose (drop-and-continue, the reference's frame-drop
            # policy applied to tracking).
            R, t = st.poses[-1]
            st.poses.append((R, t))
            st.trajectory.append(self._center(R, t))
            return {"pose": (R, t), "tracked": False, "keyframe": False,
                    "num_inliers": n_inl}

        R, t = np.asarray(res.R), np.asarray(res.t)
        st.poses.append((R, t))
        st.trajectory.append(self._center(R, t))
        st.frames_tracked += 1

        is_kf = self._keyframe_due(ref, R, t, n_inl)
        if is_kf:
            st.keyframes.append(
                self._make_keyframe(len(st.poses) - 1, R, t, kp, disp,
                                    confidence)
            )
            if len(st.keyframes) > self.cfg.max_keyframes:
                # Evict the oldest NON-anchor keyframe; loop-closure
                # endpoints stay resident (fall back to plain FIFO if
                # every keyframe is an anchor).
                for k_i, cand in enumerate(st.keyframes):
                    if cand.index not in self.loop_anchor_indices:
                        st.keyframes.pop(k_i)
                        break
                else:
                    st.keyframes.pop(0)
        return {"pose": (R, t), "tracked": True, "keyframe": is_kf,
                "num_inliers": n_inl}

    # ------------------------------------------------------------------

    def _center(self, R, t) -> np.ndarray:
        return np.asarray(-R.T @ t)

    def _keyframe_due(self, ref: Keyframe, R, t, n_inliers: int) -> bool:
        dR = ref.R.T @ R
        rot = float(np.linalg.norm(np.asarray(se3.log_so3(jnp.asarray(dR)))))
        trans = float(np.linalg.norm(self._center(R, t) - self._center(ref.R, ref.t)))
        return (
            trans > self.cfg.keyframe_translation_m
            or np.degrees(rot) > self.cfg.keyframe_rotation_deg
            or n_inliers < self.k // 8
        )

    # ------------------------------------------------------------------

    def refine_window(self, window: int = 0) -> Optional[dict]:
        """Windowed BA over the most recent keyframes (co-observed landmarks
        via descriptor matching against the newest keyframe)."""
        st = self.state
        n = min(window or len(st.keyframes), len(st.keyframes))
        if n < 2:
            return None
        kfs = st.keyframes[-n:]
        newest = kfs[-1]

        # Landmarks = newest keyframe's valid points; observations in each
        # window keyframe found by descriptor matching.
        m_lm = newest.points_w.shape[0]
        obs = np.zeros((n, m_lm, 2), np.float32)
        valid = np.zeros((n, m_lm), bool)
        obs[-1] = np.asarray(newest.keypoints.xy)
        valid[-1] = newest.valid
        for i, kf in enumerate(kfs[:-1]):
            mm = match(newest.keypoints, kf.keypoints)
            v = np.asarray(mm.valid) & newest.valid & kf.valid[np.asarray(mm.idx_b)]
            obs[i][v] = np.asarray(kf.keypoints.xy)[np.asarray(mm.idx_b)][v]
            valid[i] = v

        # Landmarks seen in <2 frames are unconstrained in BA (rank-2 Hll);
        # drop them from the problem (static shapes: just mask them out).
        multi_obs = valid.sum(axis=0) >= 2
        valid = valid & multi_obs[None, :]

        problem = BAProblem(
            poses=(
                jnp.asarray(np.stack([kf.R for kf in kfs])),
                jnp.asarray(np.stack([kf.t for kf in kfs])),
            ),
            landmarks=jnp.asarray(newest.points_w),
            obs=jnp.asarray(obs),
            valid=jnp.asarray(valid),
        )
        res = bundle_adjust(problem, self.camera, iters=self.cfg.ba_iterations,
                            huber_px=self.cfg.huber_delta_px,
                            damping=self.cfg.ba_damping)
        # Write back refined poses/landmarks — including the trajectory
        # entries at each keyframe's frame index, so reported ATE reflects
        # the bundle-adjusted poses, not the raw PnP ones.
        for i, kf in enumerate(kfs):
            kf.R = np.asarray(res.R[i])
            kf.t = np.asarray(res.t[i])
            if 0 <= kf.index < len(st.poses):
                st.poses[kf.index] = (kf.R, kf.t)
                st.trajectory[kf.index] = self._center(kf.R, kf.t)
        newest.points_w = np.asarray(res.landmarks)
        return {"cost": np.asarray(res.cost_history)}


def absolute_trajectory_error(est_centers: np.ndarray, gt_centers: np.ndarray) -> float:
    """RMS ATE after aligning the trajectories by their centroids (no scale
    — stereo gives metric scale)."""
    est = est_centers - est_centers.mean(axis=0, keepdims=True)
    gt = gt_centers - gt_centers.mean(axis=0, keepdims=True)
    # Optimal rotation (Kabsch).
    H = est.T @ gt
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    Rot = Vt.T @ D @ U.T
    aligned = est @ Rot.T
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))))


# ---------------------------------------------------------------------------
# Map persistence (SURVEY.md §5: checkpointed BA state so a restarted host
# rejoins — the reference has no checkpoint/resume at all)
# ---------------------------------------------------------------------------


def save_map(path: str, slam: "StereoSLAM") -> None:
    """Snapshot keyframe poses, landmarks, descriptors, and trajectory to a
    single .npz so a restarted process resumes tracking against the same
    map."""
    st = slam.state
    arrays = {
        "trajectory": np.stack(st.trajectory) if st.trajectory else np.zeros((0, 3)),
        "frames_tracked": np.asarray(st.frames_tracked),
        "frames_lost": np.asarray(st.frames_lost),
        "num_keyframes": np.asarray(len(st.keyframes)),
    }
    for i, kf in enumerate(st.keyframes):
        arrays[f"kf{i}_index"] = np.asarray(kf.index)
        arrays[f"kf{i}_R"] = kf.R
        arrays[f"kf{i}_t"] = kf.t
        arrays[f"kf{i}_points"] = kf.points_w
        arrays[f"kf{i}_valid"] = kf.valid
        arrays[f"kf{i}_xy"] = np.asarray(kf.keypoints.xy)
        arrays[f"kf{i}_score"] = np.asarray(kf.keypoints.score)
        arrays[f"kf{i}_desc"] = np.asarray(kf.keypoints.desc)
        arrays[f"kf{i}_kpvalid"] = np.asarray(kf.keypoints.valid)
    np.savez_compressed(path, **arrays)


def load_map(path: str, slam: "StereoSLAM") -> "StereoSLAM":
    """Restore a saved map into ``slam`` (in place; returns it)."""
    import jax.numpy as jnp

    data = np.load(path)
    st = slam.state
    st.keyframes = []
    traj = data["trajectory"]
    st.trajectory = [traj[i] for i in range(traj.shape[0])]
    st.poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))] * len(st.trajectory)
    st.frames_tracked = int(data["frames_tracked"])
    st.frames_lost = int(data["frames_lost"])
    for i in range(int(data["num_keyframes"])):
        kp = Keypoints(
            xy=jnp.asarray(data[f"kf{i}_xy"]),
            score=jnp.asarray(data[f"kf{i}_score"]),
            desc=jnp.asarray(data[f"kf{i}_desc"]),
            valid=jnp.asarray(data[f"kf{i}_kpvalid"]),
        )
        st.keyframes.append(
            Keyframe(
                index=int(data[f"kf{i}_index"]),
                R=data[f"kf{i}_R"],
                t=data[f"kf{i}_t"],
                keypoints=kp,
                points_w=data[f"kf{i}_points"],
                valid=data[f"kf{i}_valid"],
            )
        )
    return slam
