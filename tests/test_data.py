"""Data layer tests: synthetic GT exactness, PFM round trip, loaders,
stream framing."""

import numpy as np
import pytest

from hobot_stereonet_tpu.data import loader, stream, synthetic
from hobot_stereonet_tpu.data.sceneflow import read_pfm, write_pfm


def test_synthetic_pair_shapes(rng):
    cfg = synthetic.SyntheticConfig(height=64, width=128, num_layers=3)
    l, r, d = synthetic.generate_pair(rng, cfg)
    assert l.shape == (64, 128, 3) and l.dtype == np.uint8
    assert r.shape == (64, 128, 3)
    assert d.shape == (64, 128) and d.dtype == np.float32
    assert d.min() >= cfg.min_disparity and d.max() <= cfg.max_disparity


def test_synthetic_gt_is_consistent():
    """Warping the noiseless right image back by GT disparity must
    reconstruct the left image in non-occluded regions."""
    rng = np.random.default_rng(7)  # local rng: scene must be reproducible
    cfg = synthetic.SyntheticConfig(height=96, width=192, num_layers=3, noise_std=0.0,
                                    photometric_asymmetry=False)
    l, r, d = synthetic.generate_pair(rng, cfg)
    lf, rf = l.astype(np.float32), r.astype(np.float32)

    h, w = d.shape
    xs = np.arange(w)[None, :].repeat(h, axis=0).astype(np.float32)
    src = xs - d  # right-image x for each left pixel
    x0 = np.floor(src).astype(np.int64)
    frac = (src - x0)[..., None]
    valid = (x0 >= 0) & (x0 + 1 < w)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None].repeat(w, axis=1)
    recon = rf[rows, x0c] * (1 - frac) + rf[rows, x1c] * frac

    # Exact occlusion test: left pixel x is hidden in the right view iff
    # some pixel x+off maps to the same-or-smaller right-view coordinate,
    # i.e. d(x+off) >= d(x) + off.  Also dilate disparity discontinuities
    # by 2 px to skip interpolation seams.
    occluded = np.zeros_like(valid)
    k = int(np.ceil(d.max())) + 1
    for off in range(1, k):
        shifted = np.pad(d, ((0, 0), (0, off)), mode="edge")[:, off:]
        occluded |= shifted >= d + off - 0.5
    edges = np.abs(np.diff(d, axis=1, prepend=d[:, :1])) > 0.5
    for off in range(1, 3):
        edges |= np.pad(edges, ((0, 0), (off, 0)))[:, :-off]
        edges |= np.pad(edges, ((0, 0), (0, off)))[:, off:]
    mask = valid & ~occluded & ~edges
    assert mask.mean() > 0.3  # enough evaluable pixels
    err = np.abs(recon - lf).mean(axis=-1)[mask]
    # Blocky textures + double bilinear interpolation leave a few counts of
    # error; the discriminative check is that GT disparity reconstructs far
    # better than an off-by-2 disparity does.
    assert err.mean() < 6.0
    src_bad = xs - (d + 2.0)
    xb0 = np.floor(src_bad).astype(np.int64)
    fb = (src_bad - xb0)[..., None]
    xb0c = np.clip(xb0, 0, w - 1)
    xb1c = np.clip(xb0 + 1, 0, w - 1)
    recon_bad = rf[rows, xb0c] * (1 - fb) + rf[rows, xb1c] * fb
    err_bad = np.abs(recon_bad - lf).mean(axis=-1)[mask]
    assert err_bad.mean() > 3.0 * err.mean()


def test_synthetic_surfaces_are_slanted():
    """v2 generator: disparity must vary *within* surfaces (slant/curvature),
    not just across layer boundaries — the round-1 fronto-parallel
    circularity fix.  Check: many pixels whose horizontal disparity gradient
    is small-but-nonzero (a step edge gives large gradients; a slanted plane
    gives |dd/dx| in (0, max_slant + curvature term])."""
    rng = np.random.default_rng(3)
    cfg = synthetic.SyntheticConfig(height=96, width=192, num_layers=3)
    _, _, d = synthetic.generate_pair(rng, cfg)
    gx = np.abs(np.diff(d, axis=1))
    smooth_varying = (gx > 1e-4) & (gx < 0.5)
    assert smooth_varying.mean() > 0.5, "disparity is piecewise constant"


def test_synthetic_photometric_asymmetry():
    """Same scene rendered with and without asymmetry: left identical,
    right differs (gain/bias/vignette are right-eye only)."""
    base = dict(height=64, width=128, num_layers=2, noise_std=0.0)
    l0, r0, d0 = synthetic.generate_pair(
        np.random.default_rng(5),
        synthetic.SyntheticConfig(photometric_asymmetry=False, **base),
    )
    l1, r1, d1 = synthetic.generate_pair(
        np.random.default_rng(5),
        synthetic.SyntheticConfig(photometric_asymmetry=True, **base),
    )
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(d0, d1)
    assert np.abs(r0.astype(np.float32) - r1.astype(np.float32)).mean() > 0.5


def test_synthetic_gt_consistent_with_slant():
    """The back-warp reconstruction check must hold for slanted/curved
    surfaces too (the fixed-point right-view renderer is exact for
    |dD/dx| < 0.5)."""
    rng = np.random.default_rng(11)
    cfg = synthetic.SyntheticConfig(
        height=96, width=192, num_layers=2, noise_std=0.0,
        photometric_asymmetry=False, max_slant=0.12, curvature_amp=2.0,
        textureless_prob=0.0,
    )
    l, r, d = synthetic.generate_pair(rng, cfg)
    lf, rf = l.astype(np.float32), r.astype(np.float32)
    h, w = d.shape
    xs = np.arange(w)[None, :].repeat(h, axis=0).astype(np.float32)
    src = xs - d
    x0 = np.floor(src).astype(np.int64)
    frac = (src - x0)[..., None]
    valid = (x0 >= 0) & (x0 + 1 < w)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None].repeat(w, axis=1)
    recon = rf[rows, x0c] * (1 - frac) + rf[rows, x1c] * frac
    occluded = np.zeros_like(valid)
    for off in range(1, int(np.ceil(d.max())) + 1):
        shifted = np.pad(d, ((0, 0), (0, off)), mode="edge")[:, off:]
        occluded |= shifted >= d + off - 0.5
    edges = np.abs(np.diff(d, axis=1, prepend=d[:, :1])) > 0.5
    for off in range(1, 3):
        edges |= np.pad(edges, ((0, 0), (off, 0)))[:, :-off]
        edges |= np.pad(edges, ((0, 0), (0, off)))[:, off:]
    mask = valid & ~occluded & ~edges
    assert mask.mean() > 0.3
    err = np.abs(recon - lf).mean(axis=-1)[mask]
    assert err.mean() < 6.0


def _backwarp_err(l, r, d):
    """Mean |left - warp(right, d)| over unoccluded/off-edge pixels (the GT
    exactness check shared by the generator-consistency tests)."""
    lf, rf = l.astype(np.float32), r.astype(np.float32)
    h, w = d.shape
    xs = np.arange(w)[None, :].repeat(h, axis=0).astype(np.float32)
    src = xs - d
    x0 = np.floor(src).astype(np.int64)
    frac = (src - x0)[..., None]
    valid = (x0 >= 0) & (x0 + 1 < w)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None].repeat(w, axis=1)
    recon = rf[rows, x0c] * (1 - frac) + rf[rows, x1c] * frac
    occluded = np.zeros_like(valid)
    for off in range(1, int(np.ceil(d.max())) + 1):
        shifted = np.pad(d, ((0, 0), (0, off)), mode="edge")[:, off:]
        occluded |= shifted >= d + off - 0.5
    edges = np.abs(np.diff(d, axis=1, prepend=d[:, :1])) > 0.5
    for off in range(1, 3):
        edges |= np.pad(edges, ((0, 0), (off, 0)))[:, :-off]
        edges |= np.pad(edges, ((0, 0), (0, off)))[:, off:]
    mask = valid & ~occluded & ~edges
    assert mask.mean() > 0.3
    return np.abs(recon - lf).mean(axis=-1)[mask].mean()


def test_layered_hard_gt_is_exact():
    """Closed-form inverse warp: GT disparity must reconstruct the left view
    from the right (photometrics off) — and far better than off-by-2 GT."""
    rng = np.random.default_rng(21)
    l, r, d = synthetic.generate_layered_hard(
        rng, 96, 192, photometric_asymmetry=False
    )
    assert d.min() > 0  # slant cap keeps disparity positive layer-wide
    err = _backwarp_err(l, r, d)
    assert err < 6.0
    err_bad = _backwarp_err(l, r, d + 2.0)
    assert err_bad > 3.0 * err


def test_layered_hard_has_mixed_slants():
    """Disparity must vary smoothly *within* planes (affine slant), with
    some fronto-parallel planes mixed in."""
    rng = np.random.default_rng(4)
    _, _, d = synthetic.generate_layered_hard(
        rng, 96, 192, frontal_prob=0.3, photometric_asymmetry=False
    )
    gx = np.abs(np.diff(d, axis=1))
    smooth_varying = (gx > 1e-5) & (gx < 0.5)
    assert smooth_varying.mean() > 0.3, "no slanted planes rendered"


def test_layered_hard_photometric_asymmetry_is_nonlinear():
    """Right eye gets gamma + gain/bias/vignette; left and GT unchanged.
    Gamma is the non-affine component the training distribution never
    shows — verify the L/R intensity map is not a pure affine fit."""
    kw = dict(height=64, width=128)
    l0, r0, d0 = synthetic.generate_layered_hard(
        np.random.default_rng(9), photometric_asymmetry=False, **kw
    )
    l1, r1, d1 = synthetic.generate_layered_hard(
        np.random.default_rng(9), photometric_asymmetry=True,
        gamma_range=0.25, **kw
    )
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(d0, d1)
    a, b = r0.astype(np.float64).ravel(), r1.astype(np.float64).ravel()
    assert np.abs(a - b).mean() > 0.5
    # Residual of the best affine fit b ~ k*a + c: zero iff asymmetry were
    # affine-only.  (Seed 9 draws |gamma-1| ~ 0.19; clipping at 0/255 adds
    # a little extra nonlinearity, which only helps the margin.)
    k, c = np.polyfit(a, b, 1)
    resid = np.abs(b - (k * a + c)).mean()
    assert resid > 1.0, "photometric asymmetry collapsed to an affine map"


def test_layered_dataset_modes():
    """hard=True (default) and hard=False are both deterministic per index
    and produce valid samples."""
    ds_hard = loader.LayeredSceneDataset(size=2, height=64, width=128)
    ds_soft = loader.LayeredSceneDataset(size=2, height=64, width=128, hard=False)
    a, b = ds_hard[0], loader.LayeredSceneDataset(size=2, height=64, width=128)[0]
    np.testing.assert_array_equal(a.left, b.left)
    assert a.disparity.min() > 0
    s = ds_soft[0]
    assert s.left.shape == (64, 128, 3)
    # The two modes are different generators.
    assert np.abs(
        a.left.astype(np.float32) - s.left.astype(np.float32)
    ).mean() > 1.0


def test_pfm_roundtrip(tmp_path, rng):
    disp = rng.uniform(0, 100, size=(16, 32)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, disp)
    back = read_pfm(p)
    np.testing.assert_allclose(back, disp, rtol=1e-6)


def test_pad_and_crop(rng):
    img = rng.integers(0, 255, size=(30, 50, 3), dtype=np.uint8)
    padded = loader.pad_to_multiple(img, 16)
    assert padded.shape == (32, 64, 3)
    l, r, d = loader.random_crop(
        rng, img, img.copy(), np.zeros((30, 50), np.float32), (16, 32)
    )
    assert l.shape == (16, 32, 3) and d.shape == (16, 32)
    # Crop larger than image pads first.
    l2, _, _ = loader.random_crop(
        rng, img, img.copy(), np.zeros((30, 50), np.float32), (64, 64)
    )
    assert l2.shape == (64, 64, 3)


def test_batch_iterator(rng):
    ds = loader.SyntheticStereoDataset(size=8, height=64, width=96, num_layers=2)
    it = iter(loader.BatchIterator(ds, batch_size=4, crop_hw=(32, 64), seed=1))
    l, r, d = next(it)
    assert l.shape == (4, 32, 64, 3) and d.shape == (4, 32, 64)
    # Deterministic dataset: same index -> same sample.
    s0a, s0b = ds[0], ds[0]
    np.testing.assert_array_equal(s0a.left, s0b.left)


def test_stream_source_framing():
    src = stream.SyntheticStreamSource(
        height=64, width=128, fps=1000.0, num_frames=3, paced=False
    )
    frames = list(src)
    assert len(frames) == 3
    f = frames[0]
    assert f.sbs_nv12.shape == (64 * 256 * 3 // 2,)
    assert f.full_width == 256 and f.height == 64
    assert f.gt_disparity.shape == (64, 128)
    assert [fr.index for fr in frames] == [0, 1, 2]


def test_stream_nv12_content_matches_rgb(rng):
    """NV12 wire format decodes back to approximately the RGB input."""
    import jax.numpy as jnp

    from hobot_stereonet_tpu.ops import colorspace as cs

    # Smooth images: 4:2:0 chroma decimation is lossy for per-pixel random
    # chroma by design, so test with content a camera could actually see.
    yy, xx = np.mgrid[0:32, 0:64]
    l = np.stack([40 + 3 * xx % 180, 30 + 4 * yy % 180, (2 * xx + yy) % 200], -1).astype(np.uint8)
    r = np.roll(l, 5, axis=1)
    buf = stream.rgb_pair_to_sbs_nv12(l, r)
    yuv = np.asarray(cs.nv12_to_yuv444(jnp.asarray(buf), 32, 128))
    bgr = np.asarray(cs.yuv_to_bgr(jnp.asarray(yuv.astype(np.float32))))
    rgb = np.clip(bgr[..., ::-1], 0, 255)
    # Chroma decimation + nearest upsample loses detail; mean error small.
    err = np.abs(rgb[:, :64] - l.astype(np.float32)).mean()
    assert err < 12.0
