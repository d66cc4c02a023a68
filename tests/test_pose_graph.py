"""Pose-graph optimization + loop closure tests.

Synthetic drift problems with known ground truth: odometry edges carry the
noisy measurements the initial estimate was integrated from, a loop-closure
edge reveals the accumulated drift, and optimization must redistribute it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hobot_stereonet_tpu.config import CameraConfig, MeshConfig, SLAMConfig
from hobot_stereonet_tpu.parallel import mesh as mesh_mod
from hobot_stereonet_tpu.slam import se3
from hobot_stereonet_tpu.slam.pose_graph import (
    PoseGraph,
    _pair_similarity,
    build_keyframe_graph,
    close_loops,
    detect_loop,
    make_distributed_pose_graph,
    optimize_pose_graph,
    relative_pose,
)


def _drift_problem(rng, n=12, odo_noise=0.01, pad_to=0):
    """Ground-truth chain + noisy odometry edges + one exact loop edge.

    Initial poses integrate the noisy odometry (so they drift); the loop
    edge (0, n-1) is exact.  Returns (graph, (R_gt, t_gt))."""
    deltas = np.concatenate(
        [rng.uniform(-0.2, 0.2, (n - 1, 3)), rng.uniform(-0.05, 0.05, (n - 1, 3))],
        axis=-1,
    ).astype(np.float32)
    xi = np.zeros((n, 6), np.float32)
    for i in range(1, n):
        xi[i] = xi[i - 1] + deltas[i - 1]
    R_gt, t_gt = se3.exp_se3(jnp.asarray(xi))

    ei, ej, Rm, tm, w, v = [], [], [], [], [], []
    R0 = [np.asarray(R_gt[0])]
    t0 = [np.asarray(t_gt[0])]
    for a in range(n - 1):
        Rr, tr = relative_pose(R_gt[a], t_gt[a], R_gt[a + 1], t_gt[a + 1])
        eps = rng.normal(0, odo_noise, 6).astype(np.float32)
        dR, dt = se3.exp_se3(jnp.asarray(eps))
        Rn, tn = se3.compose(dR, dt, Rr, tr)           # noisy measurement
        ei.append(a); ej.append(a + 1)
        Rm.append(np.asarray(Rn)); tm.append(np.asarray(tn))
        w.append(1.0); v.append(True)
        # integrate: T_{a+1} = meas^-1 * T_a
        Rni, tni = se3.inverse(Rn, tn)
        Rna, tna = se3.compose(Rni, tni, jnp.asarray(R0[-1]), jnp.asarray(t0[-1]))
        R0.append(np.asarray(Rna)); t0.append(np.asarray(tna))

    Rl, tl = relative_pose(R_gt[0], t_gt[0], R_gt[n - 1], t_gt[n - 1])
    ei.append(0); ej.append(n - 1)
    Rm.append(np.asarray(Rl)); tm.append(np.asarray(tl))
    w.append(10.0); v.append(True)

    while pad_to and len(ei) < pad_to:
        ei.append(0); ej.append(0)
        Rm.append(np.eye(3, dtype=np.float32)); tm.append(np.zeros(3, np.float32))
        w.append(0.0); v.append(False)

    graph = PoseGraph(
        R=jnp.asarray(np.stack(R0)), t=jnp.asarray(np.stack(t0)),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        R_ij=jnp.asarray(np.stack(Rm)), t_ij=jnp.asarray(np.stack(tm)),
        weight=jnp.asarray(w, jnp.float32), valid=jnp.asarray(v),
    )
    return graph, (R_gt, t_gt)


def test_consistent_graph_is_fixed_point(rng):
    """Exact measurements + exact initialization: optimization is a no-op."""
    graph, (R_gt, t_gt) = _drift_problem(rng, odo_noise=0.0)
    res = optimize_pose_graph(graph, iters=5)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(graph.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(graph.t), atol=1e-5)
    assert float(res.cost_history[0]) < 1e-8


def test_loop_closure_redistributes_drift(rng):
    graph, (R_gt, t_gt) = _drift_problem(rng, odo_noise=0.02)
    rot0, tr0 = se3.relative_pose_error(graph.R[-1], graph.t[-1], R_gt[-1], t_gt[-1])
    res = optimize_pose_graph(graph, iters=20)
    rot1, tr1 = se3.relative_pose_error(res.R[-1], res.t[-1], R_gt[-1], t_gt[-1])
    # The loop edge pins the end pose: error must collapse vs. raw drift.
    assert float(tr1) < 0.3 * float(tr0) + 1e-4
    assert float(rot1) < 0.3 * float(rot0) + 1e-4
    costs = np.asarray(res.cost_history)
    assert costs[-1] <= costs[0]
    assert np.all(np.isfinite(np.asarray(res.R)))


def test_gauge_fixed_and_padding_inert(rng):
    graph, _ = _drift_problem(rng, odo_noise=0.02)
    graph_padded, _ = _drift_problem(
        np.random.default_rng(1234), odo_noise=0.02, pad_to=16
    )
    res = optimize_pose_graph(graph_padded, iters=10)
    # Pose 0 is the gauge.
    np.testing.assert_allclose(np.asarray(res.R[0]), np.asarray(graph_padded.R[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.t[0]), np.asarray(graph_padded.t[0]),
                               atol=1e-5)
    # Masked padding edges must not change the solution.
    fresh, _ = _drift_problem(np.random.default_rng(1234), odo_noise=0.02)
    res_unpadded = optimize_pose_graph(fresh, iters=10)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(res_unpadded.R),
                               atol=1e-5)


def test_distributed_matches_single_device(eight_devices, rng):
    graph, (R_gt, t_gt) = _drift_problem(rng, odo_noise=0.02, pad_to=16)
    res_single = optimize_pose_graph(graph, iters=10)
    mesh = mesh_mod.make_mesh(MeshConfig(data=8, tile=1))
    run = make_distributed_pose_graph(mesh, iters=10)
    res_dist = run(graph)
    np.testing.assert_allclose(np.asarray(res_dist.R), np.asarray(res_single.R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_dist.t), np.asarray(res_single.t),
                               atol=1e-4)


def test_pair_similarity_discriminates(rng):
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.features import detect_and_describe

    cam = CameraConfig(width=320, height=240, focal_px=300.0, baseline_mm=120.0)
    scene_a = LayeredScene(np.random.default_rng(3), cam.height, cam.width,
                           cam.focal_px, cam.baseline_m)
    scene_b = LayeredScene(np.random.default_rng(99), cam.height, cam.width,
                           cam.focal_px, cam.baseline_m)
    la, _, _ = scene_a.render(0.0, 0.0)
    lb, _, _ = scene_b.render(0.0, 0.0)
    ka = detect_and_describe(jnp.asarray(la), num_keypoints=256)
    kb = detect_and_describe(jnp.asarray(lb), num_keypoints=256)
    same = float(_pair_similarity(ka.desc, ka.valid, ka.desc, ka.valid))
    diff = float(_pair_similarity(ka.desc, ka.valid, kb.desc, kb.valid))
    assert same > 0.9
    assert diff < 0.5 * same


@pytest.fixture(scope="module")
def out_and_back_run():
    """Camera translates out and returns: the classic loop-closure setup."""
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.tracker import StereoSLAM

    cam = CameraConfig(width=320, height=240, focal_px=300.0, baseline_mm=120.0)
    rng = np.random.default_rng(21)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px, cam.baseline_m)
    slam = StereoSLAM(
        cam, SLAMConfig(keyframe_translation_m=0.05, ba_iterations=6),
        num_keypoints=256,
    )
    out = np.linspace(0, 0.4, 10)
    back = np.linspace(0.4, 0.0, 10)[1:]
    xs = np.concatenate([out, back])
    gt_centers = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=-1)
    for tx in xs:
        l, r, d = scene.render(float(tx), 0.0)
        slam.process(l, d)
    return slam, gt_centers


def test_detect_loop_on_revisit(out_and_back_run):
    slam, gt = out_and_back_run
    lc = detect_loop(slam, min_gap=4)
    assert lc is not None, "revisit must be recognized"
    assert lc.num_inliers >= 20
    # Verified relative translation between the two keyframes must match
    # the tracked one to within a few cm (clean synthetic world).
    kfs = slam.state.keyframes
    Rr, tr = relative_pose(
        jnp.asarray(kfs[lc.i].R), jnp.asarray(kfs[lc.i].t),
        jnp.asarray(kfs[lc.j].R), jnp.asarray(kfs[lc.j].t),
    )
    assert float(jnp.linalg.norm(jnp.asarray(lc.t_ij) - tr)) < 0.05


def test_close_loops_end_to_end(out_and_back_run):
    slam, gt = out_and_back_run
    from hobot_stereonet_tpu.slam.tracker import absolute_trajectory_error

    est_before = np.stack(slam.state.trajectory)
    ate_before = absolute_trajectory_error(est_before, gt)
    out = close_loops(slam, min_gap=4, iters=15)
    assert out is not None
    est_after = np.stack(slam.state.trajectory)
    ate_after = absolute_trajectory_error(est_after, gt)
    # Pose-graph correction must not degrade a good trajectory, and all
    # poses must stay finite.
    assert ate_after < ate_before * 1.5 + 5e-3
    assert np.all(np.isfinite(est_after))
    costs = np.asarray(out["cost"])
    assert costs[-1] <= costs[0] * 1.01


def test_build_keyframe_graph_shapes(out_and_back_run):
    slam, _ = out_and_back_run
    lc = detect_loop(slam, min_gap=4)
    graph = build_keyframe_graph(slam, loops=[lc] if lc else [], pad_edges_to=32)
    n = len(slam.state.keyframes)
    assert graph.R.shape == (n, 3, 3)
    assert graph.edge_i.shape == (32,)
    assert int(graph.valid.sum()) == (n - 1) + (1 if lc else 0)


def test_pose_padding_inert(rng):
    """Identity-padded poses (edge-free) must not change the solution for
    the real poses — the power-of-two shape-bucket mechanism close_loops
    uses to bound recompiles."""
    graph, _ = _drift_problem(np.random.default_rng(5), n=12, odo_noise=0.02)
    res = optimize_pose_graph(graph, iters=10)

    n = 12
    n_pad = 16
    R_p = np.concatenate([np.asarray(graph.R),
                          np.broadcast_to(np.eye(3, dtype=np.float32),
                                          (n_pad - n, 3, 3))])
    t_p = np.concatenate([np.asarray(graph.t), np.zeros((n_pad - n, 3), np.float32)])
    padded = PoseGraph(
        R=jnp.asarray(R_p), t=jnp.asarray(t_p),
        edge_i=graph.edge_i, edge_j=graph.edge_j,
        R_ij=graph.R_ij, t_ij=graph.t_ij,
        weight=graph.weight, valid=graph.valid,
    )
    res_p = optimize_pose_graph(padded, iters=10)
    np.testing.assert_allclose(np.asarray(res_p.R[:n]), np.asarray(res.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_p.t[:n]), np.asarray(res.t), atol=1e-5)
    # Padded poses stay exactly identity.
    np.testing.assert_allclose(np.asarray(res_p.R[n:]),
                               np.broadcast_to(np.eye(3), (n_pad - n, 3, 3)),
                               atol=1e-6)


def _inject_drift(slam, per_kf_twist):
    """Perturb keyframe poses with accumulated drift, CONSISTENTLY: each
    keyframe's landmarks keep their camera-frame coordinates (so visual
    loop measurements still reveal the true geometry), and trajectory
    entries follow their keyframes."""
    xi = np.zeros(6, np.float32)
    kf_indices = [kf.index for kf in slam.state.keyframes]
    bounds = kf_indices + [len(slam.state.poses)]
    for k, kf in enumerate(slam.state.keyframes):
        if k == 0:
            continue  # gauge: first keyframe stays exact
        xi = xi + np.asarray(per_kf_twist, np.float32)
        dR, dt = se3.exp_se3(jnp.asarray(xi))
        R_old, t_old = kf.R.copy(), kf.t.copy()
        R_new, t_new = se3.compose(dR, dt, jnp.asarray(R_old), jnp.asarray(t_old))
        R_new, t_new = np.asarray(R_new), np.asarray(t_new)
        p_cam = kf.points_w @ R_old.T + t_old
        kf.points_w = (p_cam - t_new) @ R_new
        kf.R, kf.t = R_new, t_new
        slam.state.poses[kf.index] = (R_new, t_new)
        slam.state.trajectory[kf.index] = slam._center(R_new, t_new)
        Rc = R_old.T @ R_new
        tc = R_old.T @ (t_new - t_old)
        for fi in range(bounds[k] + 1, bounds[k + 1]):
            if fi in kf_indices or fi >= len(slam.state.poses):
                continue
            Rf, tf = slam.state.poses[fi]
            Rn, tn = Rf @ Rc, Rf @ tc + tf
            slam.state.poses[fi] = (Rn, tn)
            slam.state.trajectory[fi] = slam._center(Rn, tn)


def _double_loop_run(seed=21):
    """Two out-and-back excursions over the same ground: the final keyframe
    revisits BOTH the start (kf ~0) and the mid-trajectory return (kf ~n/2),
    so one detect_loops call can accept two distinct loop edges."""
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.tracker import StereoSLAM

    cam = CameraConfig(width=320, height=240, focal_px=300.0, baseline_mm=120.0)
    rng = np.random.default_rng(seed)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px, cam.baseline_m)
    slam = StereoSLAM(
        cam, SLAMConfig(keyframe_translation_m=0.05, ba_iterations=6,
                        max_keyframes=64),
        num_keypoints=256,
    )
    leg = np.linspace(0, 0.3, 7)
    xs = np.concatenate([leg, leg[::-1][1:], leg[1:], leg[::-1][1:]])
    gt = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=-1)
    for tx in xs:
        l, r, d = scene.render(float(tx), 0.0)
        slam.process(l, d)
    return slam, gt


def test_detect_loops_accepts_multiple():
    """detect_loops(max_loops=3) must accept >=2 loop edges in ONE call on a
    double-revisit trajectory, and the accepted anchors must honor the
    min-gap separation rule (VERDICT r2 Next #7: the multi-loop path
    shipped unexercised)."""
    from hobot_stereonet_tpu.slam.pose_graph import detect_loops

    slam, _ = _double_loop_run()
    loops = detect_loops(slam, min_gap=4, max_loops=3)
    assert len(loops) >= 2, f"only {len(loops)} loops accepted"
    anchors = [lc.i for lc in loops]
    for a in range(len(anchors)):
        for b in range(a + 1, len(anchors)):
            assert abs(anchors[a] - anchors[b]) >= 4, anchors
    assert all(lc.num_inliers >= 20 for lc in loops)


def test_multi_loop_closure_beats_single():
    """With drift that GROWS along the trajectory, a single loop edge
    (start -> end) fixes the endpoints but leaves the middle sagging; the
    second edge to the mid-trajectory revisit pins it.  Joint optimization
    over >=2 accepted loops must beat single-loop ATE."""
    from hobot_stereonet_tpu.slam.tracker import absolute_trajectory_error

    drift = [0.0, 0.006, 0.0, 0.02, -0.008, 0.0]

    slam_multi, gt = _double_loop_run()
    _inject_drift(slam_multi, per_kf_twist=drift)
    ate_drifted = absolute_trajectory_error(
        np.stack(slam_multi.state.trajectory), gt)
    assert ate_drifted > 0.01

    # Identical second run (the pipeline is deterministic per instance) for
    # the single-loop comparison.
    slam_single, _ = _double_loop_run()
    _inject_drift(slam_single, per_kf_twist=drift)

    res_multi = close_loops(slam_multi, min_gap=4, iters=20, max_loops=3)
    res_single = close_loops(slam_single, min_gap=4, iters=20, max_loops=1)
    assert res_multi is not None and res_single is not None
    assert len(res_multi["loops"]) >= 2, "multi-loop closure accepted < 2"
    assert len(res_single["loops"]) == 1

    ate_multi = absolute_trajectory_error(
        np.stack(slam_multi.state.trajectory), gt)
    ate_single = absolute_trajectory_error(
        np.stack(slam_single.state.trajectory), gt)
    assert ate_multi < 0.5 * ate_drifted, (ate_drifted, ate_multi)
    assert ate_multi < ate_single, (ate_single, ate_multi)


def test_close_loops_recovers_injected_drift():
    """Round-2 acceptance test (VERDICT Next #7): inject accumulated drift
    into a loopy trajectory, close loops, assert ATE improves a lot — and
    that landmark re-anchoring keeps every keyframe's camera-frame points
    fixed (the ADVICE.md consistency defect)."""
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.tracker import (
        StereoSLAM, absolute_trajectory_error)

    cam = CameraConfig(width=320, height=240, focal_px=300.0, baseline_mm=120.0)
    rng = np.random.default_rng(21)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px, cam.baseline_m)
    slam = StereoSLAM(
        cam, SLAMConfig(keyframe_translation_m=0.05, ba_iterations=6),
        num_keypoints=256,
    )
    out = np.linspace(0, 0.4, 10)
    back = np.linspace(0.4, 0.0, 10)[1:]
    xs = np.concatenate([out, back])
    gt = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=-1)
    for tx in xs:
        l, r, d = scene.render(float(tx), 0.0)
        slam.process(l, d)

    _inject_drift(slam, per_kf_twist=[0.0, 0.008, 0.0, 0.025, -0.012, 0.0])
    ate_drifted = absolute_trajectory_error(np.stack(slam.state.trajectory), gt)
    assert ate_drifted > 0.01, "drift injection too weak to test recovery"

    # Camera-frame landmark snapshot (must be invariant under close_loops).
    cam_pts_before = [
        kf.points_w @ kf.R.T + kf.t for kf in slam.state.keyframes
    ]

    res = close_loops(slam, min_gap=4, iters=20)
    assert res is not None, "loop must be detected despite drift"
    ate_closed = absolute_trajectory_error(np.stack(slam.state.trajectory), gt)
    assert ate_closed < 0.5 * ate_drifted, (ate_drifted, ate_closed)

    for before, kf in zip(cam_pts_before, slam.state.keyframes):
        after = kf.points_w @ kf.R.T + kf.t
        np.testing.assert_allclose(after, before, atol=1e-4)

    # Loop endpoints are now eviction-protected anchors.
    assert len(slam.loop_anchor_indices) >= 2
