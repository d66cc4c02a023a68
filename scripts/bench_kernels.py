"""On-chip Pallas-vs-XLA micro-bench for the cost-volume hot ops.

VERDICT.md Next #3 (wire or kill): `correlation_volume_pallas` and
`soft_argmin_pallas` exist and validate on chip, but have zero model call
sites.  This measures each against the XLA path AT THE SHAPES THE MODEL
USES (1/8-res features of a batch-32 720p dispatch) so the winner gets
wired into FastStereoNet and the loser becomes a documented negative
result.

Methodology (CLAUDE.md): the tunnel's ~25 ms RPC floor and async dispatch
mean per-call timing measures nothing — each variant runs ITERS dependent
iterations inside one lax.scan (output feeds back into the input so no op
can be hoisted), one dispatch, sync via scalar fetch.

Usage: python scripts/bench_kernels.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.ops.cost_volume import build_correlation_volume
from hobot_stereonet_tpu.ops.pallas.correlation import (
    correlation_volume_pallas,
    soft_argmin_pallas,
)
from hobot_stereonet_tpu.ops.soft_argmin import disparity_confidence, soft_argmin

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W, C, D = 90, 160, 32, 24  # 720p/8 feature maps, default config
ITERS = 50


def timed(fn, *args) -> float:
    """Seconds per iteration of fn, chained ITERS times in one dispatch."""

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            # Fold a scalar of the output back into every input: serializes
            # the chain so scan can't hoist the body as loop-invariant.
            bump = jnp.mean(out[0]) * 1e-6
            return tuple(a + bump.astype(a.dtype) for a in carry), ()

        carry, _ = jax.lax.scan(body, args, None, length=ITERS)
        return jnp.mean(carry[0])

    float(run(args))  # compile + warm
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    cost = jnp.asarray(rng.standard_normal((B, H, W, D)).astype(np.float32))

    dev = jax.devices()[0].platform
    print(f"# device={dev} B={B} feat={H}x{W}x{C} D={D} iters={ITERS}")

    # -- correlation volume: XLA (model layout: volume + transpose to
    #    channel-last) vs the fused Pallas kernel (emits channel-last).
    def corr_xla(l, r):
        return (
            jnp.transpose(build_correlation_volume(l, r, D), (0, 2, 3, 1)),
        )

    def corr_pl(l, r):
        return (correlation_volume_pallas(l, r, D, row_tile=6),)

    t_xla = timed(corr_xla, fl, fr)
    try:
        t_pl = timed(corr_pl, fl, fr)
        print(
            f'{{"op": "correlation_volume", "xla_ms": {t_xla*1e3:.3f}, '
            f'"pallas_ms": {t_pl*1e3:.3f}, "speedup": {t_xla/t_pl:.2f}}}'
        )
    except Exception as e:
        print(
            f'{{"op": "correlation_volume", "xla_ms": {t_xla*1e3:.3f}, '
            f'"pallas_ms": null, "error": "{type(e).__name__}"}}'
        )
        print(str(e).splitlines()[0], file=sys.stderr)

    # -- soft-argmin + confidence (the model computes both).
    def sam_xla(c):
        return (soft_argmin(c, axis=-1) * 8.0, disparity_confidence(c, axis=-1))

    def sam_pl(c):
        return soft_argmin_pallas(c, scale=8.0, row_tile=6)

    t_xla = timed(sam_xla, cost)
    try:
        t_pl = timed(sam_pl, cost)
        print(
            f'{{"op": "soft_argmin+conf", "xla_ms": {t_xla*1e3:.3f}, '
            f'"pallas_ms": {t_pl*1e3:.3f}, "speedup": {t_xla/t_pl:.2f}}}'
        )
    except Exception as e:
        print(
            f'{{"op": "soft_argmin+conf", "xla_ms": {t_xla*1e3:.3f}, '
            f'"pallas_ms": null, "error": "{type(e).__name__}"}}'
        )
        print(str(e).splitlines()[0], file=sys.stderr)


if __name__ == "__main__":
    main()
