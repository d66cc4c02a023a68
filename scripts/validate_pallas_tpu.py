"""On-chip Pallas kernel validation: compiled (not interpret-mode) parity.

The pytest suite runs on a CPU mesh (tests/conftest.py), where Pallas
kernels execute in interpret mode — which does NOT prove Mosaic
compilability (CLAUDE.md).  This script runs each kernel compiled on the
real TPU against its jnp oracle.  Run from the repo root:

    python scripts/validate_pallas_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name: str, err: float, tol: float) -> None:
    status = "ok" if err <= tol else "FAIL"
    print(f"{name}: max_err={err:.3e} (tol {tol:.1e}) {status}")
    if err > tol:
        raise SystemExit(1)


def main() -> None:
    assert jax.default_backend() != "cpu", (
        "this validates compiled TPU kernels; run without forcing CPU"
    )
    rng = np.random.default_rng(0)

    # --- fused NV12 side-by-side ingest -------------------------------
    from hobot_stereonet_tpu.ops.pallas.preprocess_kernel import (
        nv12_sbs_preprocess_pallas,
    )
    from hobot_stereonet_tpu.ops.preprocess import (
        PreprocessConfig,
        side_by_side_nv12_to_model_input,
    )

    H, W = 720, 1280
    sbs = jnp.asarray(rng.integers(0, 256, (H * 2 * W * 3 // 2,), dtype=np.uint8))
    got = nv12_sbs_preprocess_pallas(sbs, H, W)
    want = side_by_side_nv12_to_model_input(
        sbs, H, 2 * W, PreprocessConfig(color_space="yuv")
    )[0]
    check("nv12_sbs_preprocess", float(jnp.max(jnp.abs(got - want))), 1e-5)

    # --- fused correlation volume -------------------------------------
    from hobot_stereonet_tpu.ops.cost_volume import build_correlation_volume
    from hobot_stereonet_tpu.ops.pallas.correlation import (
        correlation_volume_pallas,
        soft_argmin_pallas,
    )

    B, h, w, C, D = 1, 16, 128, 32, 24
    fl = jnp.asarray(rng.standard_normal((B, h, w, C)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((B, h, w, C)).astype(np.float32))
    got = correlation_volume_pallas(fl, fr, D, row_tile=8)
    want = jnp.transpose(build_correlation_volume(fl, fr, D), (0, 2, 3, 1))
    check("correlation_volume", float(jnp.max(jnp.abs(got - want))), 1e-5)

    # --- fused soft-argmin ---------------------------------------------
    cost = jnp.asarray(rng.standard_normal((B, h, w, D)).astype(np.float32))
    disp, conf = soft_argmin_pallas(cost, scale=8.0, row_tile=8)
    probs = jax.nn.softmax(-cost, axis=-1)
    dref = jnp.sum(probs * jnp.arange(D), axis=-1) * 8.0
    check("soft_argmin", float(jnp.max(jnp.abs(disp - dref))), 1e-4)
    assert bool(jnp.all((conf >= 0) & (conf <= 1.0 + 1e-6))), "confidence range"

    print("all pallas kernels compile and match on", jax.default_backend())


if __name__ == "__main__":
    main()
