"""Pose-graph optimization + appearance-based loop closure.

No analog exists in the reference (hobot_stereonet is a per-frame depth
node, `stereonet_infer/src/main.cpp:17-22`); this completes the SLAM back
end (BASELINE.json config 5, SURVEY.md §7 step 8: "feature detect/match
across keyframes, pose graph, Schur-complement BA").  Windowed BA
(slam/ba.py) corrects local drift; the pose graph distributes the error of
a detected loop closure over the whole trajectory.

TPU-first formulation:

  * static-shape problem: N poses, E edges with a validity mask — padded
    edges are masked, not absent, so one compiled program serves a run
  * residual per edge: r_e = log_se3(T_meas^-1 * T_i * T_j^-1)  in R^6
  * exact Jacobians via jax.jacfwd of the residual stack w.r.t. the [N,6]
    left-perturbation twists at 0 (no hand-derived approximations)
  * damped Gauss-Newton, normal equations solved densely ([6N,6N] maps to
    the MXU for the window sizes a keyframe graph reaches), pose 0
    gauge-fixed by a stiff prior, `lax.scan` over iterations
  * loop-closure candidate scoring is one batched descriptor matmul over
    all past keyframes (vmap over the MXU matcher), geometric
    verification by the existing vectorized-RANSAC PnP
  * distributed variant: edges shard over the ``data`` mesh axis via
    shard_map; each device reduces its edges' (J^T W J, J^T W r) and a
    ``psum`` over ICI forms the global system (same collective pattern as
    the distributed Schur reduction in slam/ba.py)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import se3


class PoseGraph(NamedTuple):
    """Static-shape pose-graph problem.

    Poses are world->cam (the repo-wide convention, slam/se3.py).  An edge
    (i, j) carries the measured relative transform T_ij ~= T_i * T_j^-1
    (cam_j -> cam_i)."""

    R: jnp.ndarray        # [N, 3, 3] initial rotations
    t: jnp.ndarray        # [N, 3] initial translations
    edge_i: jnp.ndarray   # [E] int32
    edge_j: jnp.ndarray   # [E] int32
    R_ij: jnp.ndarray     # [E, 3, 3] measured relative rotations
    t_ij: jnp.ndarray     # [E, 3] measured relative translations
    weight: jnp.ndarray   # [E] information weight (loop edges > odometry)
    valid: jnp.ndarray    # [E] bool — padding mask


def relative_pose(Ra, ta, Rb, tb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T_a * T_b^-1: pose of frame b's camera expressed in frame a."""
    Rbi, tbi = se3.inverse(Rb, tb)
    return se3.compose(Ra, ta, Rbi, tbi)


def _edge_residuals(xi, R0, t0, graph: PoseGraph) -> jnp.ndarray:
    """[E, 6] residuals at left-perturbations xi [N, 6] of (R0, t0)."""
    dR, dt = se3.exp_se3(xi)
    R, t = se3.compose(dR, dt, R0, t0)
    Ri, ti = R[graph.edge_i], t[graph.edge_i]
    Rj, tj = R[graph.edge_j], t[graph.edge_j]
    R_rel, t_rel = relative_pose(Ri, ti, Rj, tj)
    # error transform: T_meas^-1 * T_rel
    Rm_inv, tm_inv = se3.inverse(graph.R_ij, graph.t_ij)
    R_err, t_err = se3.compose(Rm_inv, tm_inv, R_rel, t_rel)
    return se3.log_se3(R_err, t_err)


class PoseGraphResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    cost_history: jnp.ndarray


def _gn_system(R, t, graph: PoseGraph):
    """Weighted normal equations (H [6N,6N], g [6N], cost) at xi = 0."""
    n = R.shape[0]
    xi0 = jnp.zeros((n, 6))
    r = _edge_residuals(xi0, R, t, graph)                    # [E, 6]
    J = jax.jacfwd(_edge_residuals)(xi0, R, t, graph)        # [E, 6, N, 6]
    w = graph.valid.astype(jnp.float32) * graph.weight       # [E]
    Jf = J.reshape(-1, 6, n * 6) * w[:, None, None]          # weighted rows
    Jr = J.reshape(-1, 6, n * 6)
    H = jnp.einsum("eik,eil->kl", Jf, Jr)                    # [6N, 6N] (MXU)
    g = jnp.einsum("eik,ei->k", Jf, r)                       # [6N]
    cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return H, g, cost


@partial(jax.jit, static_argnames=("iters",))
@se3.f32_matmuls
def optimize_pose_graph(
    graph: PoseGraph,
    iters: int = 20,
    damping: float = 1e-6,
) -> PoseGraphResult:
    """Damped Gauss-Newton over the whole graph; pose 0 gauge-fixed."""
    n = graph.R.shape[0]
    gauge = jnp.zeros(6 * n).at[:6].set(1e8)

    def step(carry, _):
        R, t = carry
        H, g, cost = _gn_system(R, t, graph)
        H = H + damping * jnp.eye(6 * n) + jnp.diag(gauge)
        dx = -jnp.linalg.solve(H, g).reshape(n, 6)
        dR, dt = se3.exp_se3(dx)
        return se3.compose(dR, dt, R, t), cost

    (R, t), costs = jax.lax.scan(step, (graph.R, graph.t), None, length=iters)
    return PoseGraphResult(R=R, t=t, cost_history=costs)


def make_distributed_pose_graph(mesh, iters: int = 20, damping: float = 1e-6):
    """Edge-sharded pose-graph GN over the ``data`` mesh axis.

    Edge arrays shard across devices; each device accumulates its local
    (J^T W J, J^T W r) and ``psum`` over ICI forms the global normal
    equations.  The [6N,6N] solve is tiny and runs redundantly on every
    device.  E must be divisible by the data-axis size (pad with
    valid=False edges pointing at pose 0)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"

    @se3.f32_matmuls
    def local_opt(R0, t0, ei, ej, Rij, tij, wgt, val):
        n = R0.shape[0]
        gauge = jnp.zeros(6 * n).at[:6].set(1e8)

        def step(carry, _):
            R, t = carry
            g_local = PoseGraph(R, t, ei, ej, Rij, tij, wgt, val)
            H_l, g_l, cost_l = _gn_system(R, t, g_local)
            H = jax.lax.psum(H_l, axis)
            g = jax.lax.psum(g_l, axis)
            cost = jax.lax.psum(cost_l, axis)
            H = H + damping * jnp.eye(6 * n) + jnp.diag(gauge)
            dx = -jnp.linalg.solve(H, g).reshape(n, 6)
            dR, dt = se3.exp_se3(dx)
            return se3.compose(dR, dt, R, t), cost

        (R, t), costs = jax.lax.scan(step, (R0, t0), None, length=iters)
        return R, t, costs

    sharded = shard_map(
        local_opt,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )

    def run(graph: PoseGraph) -> PoseGraphResult:
        R, t, costs = jax.jit(sharded)(
            graph.R, graph.t, graph.edge_i, graph.edge_j,
            graph.R_ij, graph.t_ij, graph.weight, graph.valid,
        )
        return PoseGraphResult(R=R, t=t, cost_history=costs)

    return run


# ---------------------------------------------------------------------------
# Loop closure: appearance scoring + geometric verification
# ---------------------------------------------------------------------------


@jax.jit
@se3.f32_matmuls
def _pair_similarity(desc_a, valid_a, desc_b, valid_b, min_sim: float = 0.7):
    """Fraction of A's valid descriptors with a strong mutual match in B.

    One [K,K] matmul on the MXU; the same cosine-similarity machinery as
    slam/features.match, reduced to a scalar place-recognition score."""
    sim = desc_a @ desc_b.T
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, -jnp.inf)
    best_b = jnp.argmax(sim, axis=1)
    best_a_of_b = jnp.argmax(sim, axis=0)
    k = sim.shape[0]
    mutual = best_a_of_b[best_b] == jnp.arange(k)
    strong = jnp.max(sim, axis=1) > min_sim
    good = (mutual & strong & valid_a).sum()
    denom = jnp.maximum(jnp.minimum(valid_a.sum(), valid_b.sum()), 1)
    return good.astype(jnp.float32) / denom.astype(jnp.float32)


def similarity_scores(query_desc, query_valid, all_desc, all_valid,
                      min_sim: float = 0.7) -> jnp.ndarray:
    """[Nkf] scores of one query keyframe against a stack of keyframes
    (vmap over the batched descriptor matmul)."""
    return jax.vmap(
        lambda d, v: _pair_similarity(query_desc, query_valid, d, v, min_sim)
    )(all_desc, all_valid)


class LoopClosure(NamedTuple):
    i: int                 # index of the matched (older) keyframe
    j: int                 # index of the query (newest) keyframe
    R_ij: np.ndarray       # measured T_i * T_j^-1
    t_ij: np.ndarray
    num_inliers: int
    score: float


def _verify_candidate(slam, cand, query, i: int, j: int, score: float,
                      min_inliers: int) -> Optional[LoopClosure]:
    """Geometric verification: candidate's landmarks in *its own* camera
    frame vs. the query's 2D keypoints -> PnP pose = T_query<-cand-frame,
    i.e. the measured relative transform T_j * T_i^-1."""
    from .features import match
    from .odometry import robust_pnp

    m = match(cand.keypoints, query.keypoints)
    mvalid = np.asarray(m.valid) & cand.valid[np.asarray(m.idx_a)]
    pts_cand = se3.transform(
        jnp.asarray(cand.R), jnp.asarray(cand.t), jnp.asarray(cand.points_w)
    )
    res = robust_pnp(
        slam._next_key(),
        pts_cand[m.idx_a],
        query.keypoints.xy[m.idx_b],
        jnp.asarray(mvalid),
        slam.camera,
        thresh_px=slam.cfg.huber_delta_px,
    )
    n_inl = int(res.num_inliers)
    if n_inl < min_inliers:
        return None
    R_ji, t_ji = np.asarray(res.R), np.asarray(res.t)   # T_j * T_i^-1
    Ri, ti = se3.inverse(jnp.asarray(R_ji), jnp.asarray(t_ji))
    return LoopClosure(
        i=i, j=j, R_ij=np.asarray(Ri), t_ij=np.asarray(ti),
        num_inliers=n_inl, score=score,
    )


def detect_loops(slam, min_gap: int = 5, score_threshold: float = 0.25,
                 min_inliers: int = 20, max_loops: int = 3) -> list:
    """Detect loop closures for the newest keyframe of a StereoSLAM.

    Appearance: ONE batched descriptor-similarity pass (vmapped MXU matmul)
    scores every keyframe at least ``min_gap`` behind.  All candidates above
    threshold are geometrically verified (descending score) until
    ``max_loops`` edges are accepted; accepted candidates must be
    ``min_gap`` apart from each other so the edges constrain distinct parts
    of the trajectory rather than duplicating one."""
    kfs = slam.state.keyframes
    j = len(kfs) - 1
    if j < min_gap + 1:
        return []
    query = kfs[j]
    cands = kfs[: j - min_gap + 1]

    desc = jnp.stack([np.asarray(k.keypoints.desc) for k in cands])
    val = jnp.stack([np.asarray(k.keypoints.valid) for k in cands])
    scores = np.asarray(
        similarity_scores(query.keypoints.desc, query.keypoints.valid, desc, val)
    )
    order = np.argsort(scores)[::-1]
    accepted: list = []
    for idx in order:
        if len(accepted) >= max_loops:
            break
        if float(scores[idx]) < score_threshold:
            break
        if any(abs(int(idx) - a.i) < min_gap for a in accepted):
            continue
        lc = _verify_candidate(slam, cands[int(idx)], query, int(idx), j,
                               float(scores[idx]), min_inliers)
        if lc is not None:
            accepted.append(lc)
    return accepted


def detect_loop(slam, min_gap: int = 5, score_threshold: float = 0.25,
                min_inliers: int = 20) -> Optional[LoopClosure]:
    """Single best loop closure (compatibility wrapper over detect_loops)."""
    loops = detect_loops(slam, min_gap=min_gap, score_threshold=score_threshold,
                         min_inliers=min_inliers, max_loops=1)
    return loops[0] if loops else None


def build_keyframe_graph(slam, loops=(), odometry_weight: float = 1.0,
                         loop_weight: float = 10.0,
                         pad_edges_to: int = 0,
                         pad_poses_to: int = 0) -> PoseGraph:
    """Odometry chain (consecutive keyframes' current relative poses) plus
    loop-closure edges, padded to ``pad_edges_to`` with masked self-edges
    and to ``pad_poses_to`` with edge-free identity poses, so one compiled
    optimizer shape serves many graph sizes (padded poses contribute only
    their damping block to H — their update is exactly zero)."""
    kfs = slam.state.keyframes
    n = len(kfs)
    R = np.stack([k.R for k in kfs])
    t = np.stack([k.t for k in kfs])
    if pad_poses_to and n < pad_poses_to:
        R = np.concatenate(
            [R, np.broadcast_to(np.eye(3, dtype=R.dtype), (pad_poses_to - n, 3, 3))]
        )
        t = np.concatenate([t, np.zeros((pad_poses_to - n, 3), t.dtype)])
    R = jnp.asarray(R)
    t = jnp.asarray(t)

    ei, ej, Rm, tm, w, v = [], [], [], [], [], []
    for a in range(n - 1):
        Rr, tr = relative_pose(R[a], t[a], R[a + 1], t[a + 1])
        ei.append(a); ej.append(a + 1)
        Rm.append(np.asarray(Rr)); tm.append(np.asarray(tr))
        w.append(odometry_weight); v.append(True)
    for lc in loops:
        ei.append(lc.i); ej.append(lc.j)
        Rm.append(lc.R_ij); tm.append(lc.t_ij)
        w.append(loop_weight); v.append(True)
    while pad_edges_to and len(ei) < pad_edges_to:
        ei.append(0); ej.append(0)
        Rm.append(np.eye(3, dtype=np.float32)); tm.append(np.zeros(3, np.float32))
        w.append(0.0); v.append(False)

    return PoseGraph(
        R=R, t=t,
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        R_ij=jnp.asarray(np.stack(Rm)), t_ij=jnp.asarray(np.stack(tm)),
        weight=jnp.asarray(w, jnp.float32), valid=jnp.asarray(v),
    )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def close_loops(slam, min_gap: int = 5, iters: int = 20,
                max_loops: int = 3) -> Optional[dict]:
    """Detect loops for the newest keyframe and, if any verify, optimize
    the keyframe pose graph and write the correction back into the SLAM
    state CONSISTENTLY:

      * keyframe poses <- optimized poses;
      * each keyframe's landmarks are re-anchored so they keep their
        camera-frame position under the new pose
        (p_w' = K_new^-1 K_old p_w — without this, post-closure PnP against
        stale landmarks lands new poses back in the drifted frame);
      * intermediate (non-keyframe) trajectory entries get their anchoring
        keyframe's correction composed on (F' = F K_old^-1 K_new), so the
        reported trajectory doesn't mix corrected and uncorrected samples;
      * both loop endpoints are registered as eviction-protected anchors.

    Problem shapes are padded to power-of-two buckets (poses AND edges) so
    the jitted optimizer compiles O(log) shapes over a whole run instead of
    one per keyframe count."""
    loops = detect_loops(slam, min_gap=min_gap, max_loops=max_loops)
    if not loops:
        return None
    st = slam.state
    kfs = st.keyframes
    n = len(kfs)
    graph = build_keyframe_graph(
        slam, loops=loops,
        pad_poses_to=_next_pow2(n),
        pad_edges_to=_next_pow2(n - 1 + len(loops)),
    )
    res = optimize_pose_graph(graph, iters=iters)

    # --- consistent write-back -----------------------------------------
    old_poses = [(kf.R.copy(), kf.t.copy()) for kf in kfs]
    corrections = []  # per keyframe: (K_old^-1 K_new) as (R, t), world->world
    for idx, kf in enumerate(kfs):
        R_new = np.asarray(res.R[idx])
        t_new = np.asarray(res.t[idx])
        R_old, t_old = old_poses[idx]
        # Landmarks keep their camera-frame coordinates:
        # p_cam = R_old p + t_old  =>  p' = R_new^T (p_cam - t_new).
        p_cam = kf.points_w @ R_old.T + t_old
        kf.points_w = (p_cam - t_new) @ R_new
        kf.R, kf.t = R_new, t_new
        # World-to-world correction for poses hanging off this keyframe:
        # F' = F * (K_old^-1 K_new).
        Rc = R_old.T @ R_new
        tc = R_old.T @ (t_new - t_old)
        corrections.append((Rc, tc))
        if 0 <= kf.index < len(st.poses):
            st.poses[kf.index] = (kf.R, kf.t)
            st.trajectory[kf.index] = slam._center(kf.R, kf.t)

    # Propagate each keyframe's correction to the intermediate frames it
    # anchors (frames up to the next keyframe).
    kf_indices = [kf.index for kf in kfs]
    bounds = kf_indices + [len(st.poses)]
    for k in range(n):
        Rc, tc = corrections[k]
        for fi in range(bounds[k] + 1, bounds[k + 1]):
            if fi in kf_indices or not (0 <= fi < len(st.poses)):
                continue
            Rf, tf = st.poses[fi]
            Rn = Rf @ Rc
            tn = Rf @ tc + tf
            st.poses[fi] = (Rn, tn)
            st.trajectory[fi] = slam._center(Rn, tn)

    # Protect loop endpoints from keyframe-window eviction: a future
    # closure against the same place needs its anchor to still exist.
    anchors = getattr(slam, "loop_anchor_indices", None)
    if anchors is not None:
        for lc in loops:
            anchors.add(kfs[lc.i].index)
            anchors.add(kfs[lc.j].index)

    return {
        "loop": loops[0],
        "loops": loops,
        "cost": np.asarray(res.cost_history),
    }
