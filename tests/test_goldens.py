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
    got = render_config(builder, settings, cfg).astype(np.float32) / 255.0
    p = psnr(got, want)
    assert p >= 40.0, f"{name}: PSNR {p:.1f} dB < 40 dB vs golden"
