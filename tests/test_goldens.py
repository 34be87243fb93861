"""Golden-image regression tier — the RMSE acceptance gate.

The reference's test plan stubs VisualValidator and gates releases on
per-spp RMSE vs reference renders (tests/common/test_utils.hpp:34-39;
BASELINE.json threshold 1e-2). Here the goldens are deterministic CPU
(wavefront) renders committed under tests/goldens/ as float16 npz; the
TPU packet kernel is tied to the same results by the kernel-vs-oracle
tests in test_bvh.py, so a golden drift means integrator semantics
changed.

Regenerate intentionally with:  VKGR_UPDATE_GOLDENS=1 pytest tests/test_goldens.py
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
RES = "/root/reference/resources"
THRESHOLD = 2e-3  # identical pipeline; drift tolerance only (fma/reorder)

CASES = [
    ("box_sky", f"{RES}/Box.glb", None, {}),
    ("ball_sky", f"{RES}/shader_ball.gltf", None, {}),
    ("ball_hdr", f"{RES}/shader_ball.gltf", f"{RES}/std_env.hdr", {}),
    ("ball_hdr_dof", f"{RES}/shader_ball.gltf", f"{RES}/std_env.hdr", {"aperture": 0.02}),
    ("ball_preview", f"{RES}/shader_ball.gltf", f"{RES}/std_env.hdr", {"render_system": 1}),
]


def _render(scene_path, hdr_path, opts):
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    opts = dict(opts)
    rs = opts.pop("render_system", 0)
    r = GltfRenderer(width=128, height=128, spp=1, max_depth=3, render_system=rs)
    r.create_scene(scene_path)
    if hdr_path:
        r.create_hdr(hdr_path)
    for k, v in opts.items():
        setattr(r, k, v)
    for _ in range(2):  # 2 accumulated frames: exercises accumulation too
        r.on_render()
    return np.asarray(r.image_linear(), np.float32)


@pytest.mark.goldens
@pytest.mark.parametrize("name,scene,hdr,opts", CASES, ids=[c[0] for c in CASES])
def test_golden(name, scene, hdr, opts):
    img = _render(scene, hdr, opts)
    assert np.isfinite(img).all()
    path = GOLDEN_DIR / f"{name}.npz"
    if os.environ.get("VKGR_UPDATE_GOLDENS") or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        pytest.skip(f"golden written: {path.name}")
    golden = np.load(path)["img"].astype(np.float32)

    from vk_gltf_renderer_tpu.utils.visual_validator import rmse

    err = rmse(np.clip(img, 0, 4), np.clip(golden, 0, 4))
    assert err <= THRESHOLD, f"{name}: RMSE {err:.5f} > {THRESHOLD}"
