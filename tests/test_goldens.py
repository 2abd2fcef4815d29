"""Golden-image regression gate (VERDICT r1 #7; BASELINE.md PSNR>=40 dB).

Each BASELINE-ladder config renders at a fixed camera/size and must stay
within 40 dB PSNR of the checked-in golden (tests/goldens/*.png, produced
by tools/make_goldens.py).  A shading regression that moves the picture —
even identically on both backends — fails here, which the backend-parity
harness alone cannot catch."""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _configs():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import golden_configs
    return golden_configs()


@pytest.mark.parametrize("entry", _configs(), ids=lambda e: e[0])
def test_golden(entry):
    from vk_renderer_tpu.utils.image import load_png, psnr
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import render_config

    name, builder, settings, cfg = entry
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert os.path.exists(path), \
        f"missing golden {path} — run tools/make_goldens.py"
    want = load_png(path)[..., :3].astype(np.float32) / 255.0
    got, stats = render_config(builder, settings, cfg, with_stats=True)
    got = got.astype(np.float32) / 255.0
    # golden configs must render with ZERO deviation counters — a golden
    # that bakes an approximation (truncated bins, unresolved peels,
    # compaction overflow) is not a reference image (VERDICT r2 task 4)
    for key in ("bin_overflow", "peel_overflow", "sparse_overflow"):
        assert stats[key] == 0, f"{name}: {key} = {stats[key]} != 0"
    p = psnr(got, want)
    assert p >= 40.0, f"{name}: PSNR {p:.1f} dB < 40 dB vs golden"


def test_mr_nearest_mip_knob_gated():
    """The mr_nearest_mip fidelity knob (half the metallic-roughness
    texture gathers) must stay >= 40 dB against the EXACT golden — the
    gate that allows bench configs to enable it (VERDICT r2 task 3)."""
    import dataclasses
    from vk_renderer_tpu.utils.image import load_png, psnr
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import render_config, golden_configs

    entry = next(e for e in golden_configs()
                 if e[0] == "sponza_like_flagship")
    name, builder, settings, cfg = entry
    cfg = dataclasses.replace(cfg, mr_nearest_mip=True)
    want = load_png(os.path.join(GOLDEN_DIR, f"{name}.png"))[..., :3]
    got = render_config(builder, settings, cfg).astype(np.float32) / 255.0
    p = psnr(got, want.astype(np.float32) / 255.0)
    assert p >= 40.0, f"mr_nearest_mip: PSNR {p:.1f} dB < 40 dB vs exact"
