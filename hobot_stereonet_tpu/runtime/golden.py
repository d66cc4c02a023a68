"""Golden-tensor dump / compare harness.

Formalizes the reference's debugging workflow (SURVEY.md C5/§4): the
reference dumps every preprocessing intermediate to loose .bin/.txt files
(``preprocess.cpp:398-399,540-548,730-812``) for manual diffing against the
training toolkit.  Here one call captures every named intermediate of the
jitted pipeline (flax ``capture_intermediates``) plus the preprocess
stages into a single .npz, and ``compare`` diffs two dumps with per-tensor
tolerances — usable both as a CLI debugging tool and as regression
fixtures in CI.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def dump_pipeline(
    model,
    params,
    left_rgb: np.ndarray,
    right_rgb: np.ndarray,
    cfg=None,
    path: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Run one stereo pair and capture all intermediates.

    Returns {name: array}; writes a compressed .npz when ``path`` given.
    """
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..ops import preprocess as pp

    cfg = cfg or Config()

    x = pp.rgb_pair_to_model_input(left_rgb, right_rgb, cfg.preprocess)
    left, right = pp.split_model_input(x)

    @jax.jit
    def run(p, l, r):
        out, inter = model.apply(p, l, r, capture_intermediates=True)
        return out, inter

    out, inter = run(params, left, right)

    tensors: Dict[str, np.ndarray] = {
        "input_normalized": np.asarray(x),
        "disparity": np.asarray(out["disparity"]),
        "confidence": np.asarray(out["confidence"]),
    }
    for i, lvl in enumerate(out["pyramid"]):
        tensors[f"pyramid_{i}"] = np.asarray(lvl)

    def to_np(v):
        arr = np.asarray(v)
        # bfloat16 (ml_dtypes) does not round-trip through .npz; widen any
        # non-native float dtype to float32 for the dump.
        if arr.dtype.kind not in "fiub":
            arr = np.asarray(jnp.asarray(v).astype(jnp.float32))
        return arr

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}[{i}]")
        else:
            tensors[f"inter/{prefix}"] = to_np(tree)

    walk(jax.device_get(inter.get("intermediates", inter)), "")

    if path:
        np.savez_compressed(path, **tensors)
    return tensors


def compare(
    a: Dict[str, np.ndarray],
    b: Dict[str, np.ndarray],
    rtol: float = 1e-4,
    atol: float = 1e-4,
) -> Tuple[bool, Dict[str, Dict]]:
    """Diff two dumps.  Returns (all_match, per-tensor report)."""
    report = {}
    ok = True
    keys = sorted(set(a) | set(b))
    for k in keys:
        if k not in a or k not in b:
            report[k] = {"status": "missing", "in_a": k in a, "in_b": k in b}
            ok = False
            continue
        ta, tb = np.asarray(a[k]), np.asarray(b[k])
        reshaped = False
        if ta.shape != tb.shape:
            if ta.size == tb.size and (ta.ndim == 1 or tb.ndim == 1):
                # Foreign raw .bin dumps carry no shape (they load flat,
                # 1-D) — compare the flat values and say so (the
                # reference's golden diffs are flat byte streams too).
                # When BOTH sides carry authoritative shapes, a same-size
                # mismatch is a genuine layout bug (e.g. NCHW vs NHWC):
                # report it as a shape error, never silently flatten.
                ta, tb = ta.ravel(), tb.ravel()
                reshaped = True
            else:
                report[k] = {"status": "shape", "a": ta.shape, "b": tb.shape}
                ok = False
                continue
        diff = np.abs(ta.astype(np.float64) - tb.astype(np.float64))
        max_abs = float(diff.max()) if diff.size else 0.0
        tol = atol + rtol * np.abs(tb.astype(np.float64))
        n_bad = int((diff > tol).sum())
        match = n_bad == 0
        report[k] = {"status": "ok" if match else "mismatch",
                     "max_abs_diff": max_abs, "n_bad": n_bad,
                     **({"flat_compare": True} if reshaped else {})}
        ok = ok and match
    return ok, report


def load_dump(path: str) -> Dict[str, np.ndarray]:
    """Load a dump: a .npz archive, a directory of raw ``.bin`` tensors
    (``data.bintensor.load_bin_dir`` — the foreign-toolkit exchange
    format), or a single raw ``.bin`` file (loaded flat as float32, keyed
    by its stem)."""
    import os

    if os.path.isdir(path):
        from ..data.bintensor import load_bin_dir

        return load_bin_dir(path)
    if path.endswith(".bin"):
        raw = np.fromfile(path, dtype=np.uint8)
        arr = raw.view(np.float32) if raw.size % 4 == 0 else raw
        return {os.path.splitext(os.path.basename(path))[0]: arr}
    data = np.load(path)
    return {k: data[k] for k in data.files}
