"""Flagship selection rule (scripts/crown.py + scripts/epe_matrix.py
``pick_flagship``): min held-out EPE among candidates holding the fps
floor, fastest within the EPE tie band.  The rule decides what every CLI
entry serves by default, so it gets a unit test."""

import sys

sys.path.insert(0, "/root/repo/scripts")

from epe_matrix import pick_flagship  # noqa: E402


def _row(name, epe, fps):
    return {"name": name, "heldout_epe_px": epe, "engine_fps": fps}


def test_fps_floor_excludes_slow_candidates():
    rows = [_row("slow_accurate", 0.5, 42.0), _row("fast", 1.0, 700.0)]
    assert pick_flagship(rows)["name"] == "fast"


def test_tie_band_prefers_fastest():
    # B is 0.002 px better but 300 fps slower — inside the 0.03 px band
    # the fastest wins (eval noise on 24 scenes exceeds the delta).
    rows = [_row("A", 1.020, 770.0), _row("B", 1.018, 467.0)]
    assert pick_flagship(rows)["name"] == "A"


def test_outside_tie_band_accuracy_wins():
    rows = [_row("A", 1.10, 770.0), _row("B", 1.00, 467.0)]
    assert pick_flagship(rows)["name"] == "B"


def test_falls_back_to_all_rows_without_fps():
    rows = [{"name": "x", "heldout_epe_px": 0.9},
            {"name": "y", "heldout_epe_px": 0.8}]
    assert pick_flagship(rows)["name"] == "y"


def test_pooled_rows_from_multiple_files():
    # crown.py pools the equal-budget sweep with post-frontier rows
    # (e.g. A_ft); a pooled better-EPE row must displace the old winner.
    sweep = [_row("A_base", 1.02, 770.0)]
    extra = [_row("A_ft", 0.90, 760.0)]
    assert pick_flagship(sweep + extra)["name"] == "A_ft"


def test_direct_crown_installs_yuv_contract(tmp_path):
    """crown.py --name YUV_ft must install a flagship whose config
    carries the YUV444-native input contract (round-5 crowning path)."""
    import json
    import types

    import crown as crown_mod
    import frontier as frontier_mod

    frontier_mod._build_candidates()
    src = tmp_path / "ckpt"
    src.mkdir()
    (src / "dummy").write_text("params")
    dest = tmp_path / "flagship"
    args = types.SimpleNamespace(dest=str(dest), min_fps=300.0)
    rc = crown_mod._install(
        args, frontier_mod,
        {"name": "YUV_ft", "checkpoint": str(src), "why": "test"},
        rule="direct crown (test)")
    assert rc == 0
    cfg = json.loads((dest / "config.json").read_text())
    assert cfg["preprocess"]["color_space"] == "yuv"
    flag = json.loads((dest / "FLAGSHIP.json").read_text())
    assert flag["candidate"]["name"] == "YUV_ft"
    assert flag["model_class"] == "fast"
