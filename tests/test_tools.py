"""Tests for the tooling tier: benchmark harness (the reference tests its
harness parsers too, utils/benchmark/tests/test_benchmark_results.py),
profiler, memory tracker, camera manipulator, denoiser, preview, postfx."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_benchmark_headless_and_compare(tmp_path):
    from vk_gltf_renderer_tpu.benchmark.__main__ import main

    csv1 = tmp_path / "a.csv"
    rc = main([
        "headless", "--scene", "/root/reference/resources/Box.glb",
        "--size", "24", "24", "--frames", "3", "--spp", "1",
        "--output", str(csv1),
    ])
    assert rc == 0 and csv1.exists()
    text = csv1.read_text()
    assert "ms_per_frame" in text and "Box.glb" in text

    # compare with itself -> no regression
    rc = main(["compare", str(csv1), str(csv1)])
    assert rc == 0


def test_benchmark_sequencer(tmp_path):
    from vk_gltf_renderer_tpu.benchmark.__main__ import main

    cfg = tmp_path / "seq.cfg"
    cfg.write_text(
        "# demo sequence\n"
        "--scenefile /root/reference/resources/Box.glb --size 24 24 --frames 2 --ptSamples 1\n"
    )
    rc = main(["run", str(cfg), "--output", str(tmp_path / "seq.csv")])
    assert rc == 0


def test_profiler_and_memory():
    from vk_gltf_renderer_tpu.utils.profiler import Profiler, device_memory_stats

    p = Profiler()
    with p.section("stage_a"):
        sum(range(1000))
    with p.section("stage_a"):
        sum(range(1000))
    assert p.sections["stage_a"].count == 2
    assert "stage_a" in p.report()
    stats = device_memory_stats()
    assert "bytes_in_use" in stats


def test_camera_manipulator():
    from vk_gltf_renderer_tpu.utils.camera_manipulator import CameraManipulator

    m = CameraManipulator(eye=(0, 0, 5), center=(0, 0, 0))
    d0 = np.linalg.norm(m.eye - m.center)
    m.orbit(np.pi / 2, 0.0)
    assert abs(np.linalg.norm(m.eye - m.center) - d0) < 1e-6  # radius preserved
    assert abs(m.eye[0]) > 1.0  # rotated off-axis
    m.dolly(0.5)
    assert np.linalg.norm(m.eye - m.center) < d0
    m.fit([-1, -1, -1], [1, 1, 1])
    np.testing.assert_allclose(m.center, [0, 0, 0], atol=1e-9)
    g = m.to_gltf_node()
    assert g["camera"]["type"] == "perspective"


def test_denoise_reduces_variance_preserves_mean():
    from vk_gltf_renderer_tpu.ops.denoise import denoise

    rng = np.random.default_rng(0)
    h = w = 32
    clean = np.ones((h, w, 3), np.float32) * 0.5
    noisy = clean + rng.normal(0, 0.2, (h, w, 3)).astype(np.float32)
    albedo = np.ones((h, w, 3), np.float32) * 0.8
    normal = np.tile(np.array([0, 0, 1], np.float32), (h, w, 1))
    depth = np.ones((h, w), np.float32)
    valid = np.ones((h, w), bool)
    out = np.asarray(denoise(jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(depth), jnp.asarray(valid)))
    assert out.var() < noisy.var() * 0.2
    assert abs(out.mean() - noisy.mean()) < 0.02


def test_denoise_preserves_edges():
    from vk_gltf_renderer_tpu.ops.denoise import denoise

    h = w = 32
    img = np.zeros((h, w, 3), np.float32)
    img[:, 16:] = 1.0
    normal = np.tile(np.array([0, 0, 1.0], np.float32), (h, w, 1))
    normal[:, 16:] = [1, 0, 0]  # normal edge coincides with color edge
    depth = np.ones((h, w), np.float32)
    depth[:, 16:] = 5.0
    valid = np.ones((h, w), bool)
    out = np.asarray(denoise(jnp.asarray(img), jnp.asarray(np.ones_like(img)), jnp.asarray(normal), jnp.asarray(depth), jnp.asarray(valid)))
    assert out[:, :14].mean() < 0.05 and out[:, 18:].mean() > 0.95  # edge survives


def test_silhouette_outline():
    from vk_gltf_renderer_tpu.ops.postfx import silhouette

    oid = np.full((16, 16), -1, np.int32)
    oid[4:12, 4:12] = 0
    img = np.zeros((16, 16, 3), np.float32)
    mask = np.array([True])
    out = np.asarray(silhouette(jnp.asarray(oid), jnp.asarray(mask), jnp.asarray(img)))
    assert out[4, 4].sum() > 0  # boundary colored
    assert out[8, 8].sum() == 0  # interior untouched
    assert out[0, 0].sum() == 0  # background untouched


def test_adaptive_sampler():
    from vk_gltf_renderer_tpu.renderer import AdaptiveSampler

    a = AdaptiveSampler(target_fps=30)  # 33.3 ms budget
    spp = a.update(5.0)  # one sample cost 5ms -> ~6 spp fit
    for _ in range(20):
        spp = a.update(5.0 * a.spp)
    assert 4 <= spp <= 8
    a2 = AdaptiveSampler(target_fps=30)
    for _ in range(5):
        s = a2.update(200.0 * a2.spp)
    assert s == 1  # too slow -> floor at 1


def test_visual_validator(tmp_path):
    from vk_gltf_renderer_tpu.utils.visual_validator import check_or_create_golden, compare_screenshots, rmse

    rng = np.random.default_rng(0)
    a = rng.random((16, 16, 3)).astype(np.float32)
    assert rmse(a, a) == 0.0
    b = a + 0.005
    r = compare_screenshots(a, b, threshold=1e-2)
    assert r["passed"] and 0.004 < r["rmse"] < 0.006
    g = tmp_path / "golden.png"
    r1 = check_or_create_golden(a, g)
    assert r1["created"]
    r2 = check_or_create_golden(a, g)
    assert not r2["created"] and r2["rmse"] < 5e-3  # 8-bit quantization only


def test_inspect_cli(capsys):
    from vk_gltf_renderer_tpu.inspect_cli import main

    rc = main(["/root/reference/resources/Box.glb", "--stats", "--tree", "--materials", "--validate"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "triangles:         12" in out
    assert "validation: OK" in out


def test_render_golden_self_consistency(tmp_path):
    """Same scene/camera/frames must reproduce the golden bit-for-bit-ish
    (deterministic seeding) — the regression-image workflow."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.utils.visual_validator import check_or_create_golden

    def render():
        r = GltfRenderer(width=32, height=32, spp=1, max_depth=3)
        r.create_scene("/root/reference/resources/Box.glb")
        for _ in range(2):
            r.on_render()
        return r.image_tonemapped()

    g = tmp_path / "box32.png"
    r1 = check_or_create_golden(render(), g)
    r2 = check_or_create_golden(render(), g)
    assert r2["rmse"] < 4e-3, r2  # identical up to 8-bit quantization


def test_motion_vectors_static_camera_zero():
    from vk_gltf_renderer_tpu.ops.temporal import motion_vectors

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(8, 8, 3)), jnp.float32)
    solid = jnp.ones((8, 8), bool)
    vp = jnp.asarray(np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    mv = motion_vectors(pos, solid, vp, vp, 8, 8)
    np.testing.assert_allclose(np.asarray(mv), 0.0, atol=1e-4)


def test_temporal_accumulate_converges_and_rejects():
    from vk_gltf_renderer_tpu.ops.temporal import temporal_accumulate

    rng = np.random.default_rng(1)
    clean = np.full((16, 16, 3), 0.5, np.float32)
    motion = np.zeros((16, 16, 2), np.float32)
    valid = np.ones((16, 16), bool)
    hist = clean + rng.normal(0, 0.01, clean.shape).astype(np.float32)
    cur = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    out = np.asarray(temporal_accumulate(jnp.asarray(cur), jnp.asarray(hist), jnp.asarray(motion), jnp.asarray(valid)))
    # blended output is closer to clean than the noisy current frame
    assert np.abs(out - clean).mean() < np.abs(cur - clean).mean()
    # stale history (wrong value) is neighborhood-clamped toward current
    bad_hist = np.full_like(clean, 5.0)
    out2 = np.asarray(temporal_accumulate(jnp.asarray(cur), jnp.asarray(bad_hist), jnp.asarray(motion), jnp.asarray(valid)))
    assert np.abs(out2 - clean).mean() < 0.5  # clamp rejected the 5.0 history


def test_temporal_reprojection_shifts_history():
    from vk_gltf_renderer_tpu.ops.temporal import temporal_accumulate

    h = w = 16
    hist = np.zeros((h, w, 3), np.float32)
    hist[:, 4] = 1.0  # bright column at x=4
    cur = np.zeros((h, w, 3), np.float32)
    cur[:, 6] = 1.0  # moved to x=6
    motion = np.zeros((h, w, 2), np.float32)
    motion[..., 0] = -2.0  # history position = current - 2 px
    valid = np.ones((h, w), bool)
    out = np.asarray(temporal_accumulate(jnp.asarray(cur), jnp.asarray(hist), jnp.asarray(motion), jnp.asarray(valid), alpha=0.5))
    # reprojected history aligns with the current bright column
    assert out[:, 6].mean() > 0.7
    assert out[:, 4].mean() < 0.2


def test_terminal_viewer_scripted_fast():
    """Viewer loop in scripted mode starting in PREVIEW (--renderer 1):
    orbit + image out, without compiling the path tracer OR the denoiser
    (both expensive CPU compiles live in the slow-marked variant; the
    denoise pipeline itself is covered by test_render)."""
    import subprocess
    import sys

    out = "/tmp/viewer_test_fast.png"
    r = subprocess.run(
        [sys.executable, "-m", "vk_gltf_renderer_tpu.viewer",
         "--scenefile", "/root/reference/resources/Box.glb",
         "--size", "24", "--renderer", "1", "--keys", "a", "--output", out],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Saved" in r.stdout and "[preview]" in r.stdout
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (24, 24) and img.max() > 0


@pytest.mark.slow
def test_terminal_viewer_scripted():
    """Viewer loop end-to-end in scripted mode: orbit, dolly, renderer
    toggle, denoise toggle, image out. Slow: compiles path tracer +
    preview + denoise variants back to back on CPU (opt in with
    VKGR_RUN_SLOW=1)."""
    import subprocess
    import sys

    out = "/tmp/viewer_test.png"
    r = subprocess.run(
        [sys.executable, "-m", "vk_gltf_renderer_tpu.viewer",
         "--scenefile", "/root/reference/resources/Box.glb",
         "--size", "32", "--keys", "ad+pn", "--output", out],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Saved" in r.stdout and "[preview +denoise]" in r.stdout
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (32, 32) and img.max() > 0


def test_terminal_viewer_browser_verbs():
    """Scene-browser workflow in the viewer's scripted mode (ui_scene_browser
    / ui_inspector role, VERDICT r3 #7): tree pane + selection, rename,
    visibility toggle, grid overlay, ':' inspector commands — all in one
    --keys script, preview renderer for speed."""
    import subprocess
    import sys

    out = "/tmp/viewer_test_browser.png"
    keys = "t]Gx:rename 1 Lid;:matset 0 metallicFactor 0.5;q"
    r = subprocess.run(
        [sys.executable, "-m", "vk_gltf_renderer_tpu.viewer",
         "--scenefile", "/root/reference/resources/Box.glb",
         "--size", "24", "--renderer", "1", "--keys", keys, "--output", out],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Saved" in r.stdout
    assert "+grid" in r.stdout                       # grid overlay active
    assert "Lid" in r.stdout                         # rename landed in the pane
    assert "[hidden]" in r.stdout                    # visibility toggled
    assert "> " in r.stdout                          # selection cursor shown


def test_viewer_inspector_verbs_rerender():
    """VERDICT r4 #8: the live viewer reaches inspector parity in function —
    a ':' material edit must actually re-render (not just mutate the model),
    camera get+set must drive the live view camera, and tab completion must
    resolve verbs and matset field names (ui_inspector.cpp role)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from vk_gltf_renderer_tpu.viewer import TerminalViewer

    v = TerminalViewer("/root/reference/resources/Box.glb", size=24,
                       render_system=1)
    img0 = v.frame_u8().astype(float)

    def type_cmd(line):
        assert v.handle_key(":")
        for ch in line:
            assert v.handle_key(ch)
        assert v.handle_key(";")

    # material edit -> re-render: box turns red (base color was ~white)
    type_cmd("matset 0 baseColorFactor 1 0 0 1")
    img1 = v.frame_u8().astype(float)
    ctr0 = img0[8:16, 8:16].mean(axis=(0, 1))
    ctr1 = img1[8:16, 8:16].mean(axis=(0, 1))
    assert abs(ctr1[0] - ctr1[1]) > 25, (ctr0, ctr1)  # red-dominant now
    assert abs(ctr0[0] - ctr0[1]) < abs(ctr1[0] - ctr1[1])  # more than before

    # matget through the viewer: output captured for the inspector pane
    type_cmd("matget 0")
    assert any("baseColorFactor" in l for l in v._last_out), v._last_out

    # camera get+set drives the LIVE view camera
    type_cmd("cam fov 30")
    assert abs(np.degrees(v.r.camera.yfov) - 30.0) < 1e-3
    type_cmd("cam dist 10")
    assert abs(np.linalg.norm(np.asarray(v.r.camera.eye) -
                              np.asarray(v.r.camera.center)) - 10.0) < 1e-2
    type_cmd("cam")
    assert any(l.startswith("fov 30") for l in v._last_out), v._last_out

    # tab completion: verb names and matset field names
    assert v.handle_key(":")
    for ch in "matg":
        v.handle_key(ch)
    v.handle_key("\t")
    assert v._cmdbuf == "matget ", v._cmdbuf  # unique -> completed + space
    v.handle_key("\x1b")  # cancel
    assert v.handle_key(":")
    for ch in "matset 0 irid":
        v.handle_key(ch)
    v.handle_key("\t")
    assert v._cmdbuf.startswith("matset 0 iridescence"), v._cmdbuf
    assert len(v._candidates) > 1  # ambiguous -> candidates in status line
    assert "iridescenceIor" in v.status()
    v.handle_key("\x1b")

    # variant verb parity (no variants in Box: shell reports, stays alive)
    type_cmd("variants")


def test_grid_overlay_math():
    """The grid module's analytic properties: lines composite only where
    the plane is in FRONT and closer than the scene; coverage is 1 on a
    line center and 0 mid-cell (the slang fwidth/smoothstep recipe)."""
    import numpy as np

    from vk_gltf_renderer_tpu.ops.grid import _line_coverage, grid_overlay

    # coverage: exact on-line -> full; mid-cell with sub-pixel footprint -> 0
    c = np.array([[0.0, 0.5]])
    fw = np.array([[0.01, 0.01]])
    cov = _line_coverage(c, fw, 1.0)
    assert cov[0, 0] == 1.0 and cov[0, 1] == 0.0

    img = np.zeros((32, 32, 3), np.float32)
    eye = np.array([0.0, 2.0, 5.0])
    center = np.zeros(3)
    up = np.array([0.0, 1.0, 0.0])
    over = grid_overlay(img, eye, center, up, 0.8)
    assert over.sum() > 0  # grid visible looking down at the plane
    # rays all above the horizon -> no plane hit -> untouched image
    up_center = np.array([0.0, 50.0, 0.0])
    none = grid_overlay(img, eye, up_center, up, 0.4)
    assert none.sum() == 0
    # scene depth closer than the plane everywhere -> grid fully occluded
    occl = grid_overlay(img, eye, center, up, 0.8,
                        scene_depth=np.full((32, 32), 0.01))
    assert occl.sum() == 0


def test_edit_cli_matfields_registry(tmp_path):
    """Every per-field material verb writes its documented JSON path and
    undoes cleanly (ui_inspector.cpp editable-set parity)."""
    from vk_gltf_renderer_tpu.edit_cli import EditShell
    from vk_gltf_renderer_tpu.models import Scene

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    sh = EditShell(sc)
    mat = sc.model.materials[0]

    sh.run_line("matset 0 clearcoatFactor 0.7")
    assert mat["extensions"]["KHR_materials_clearcoat"]["clearcoatFactor"] == 0.7
    sh.run_line("matset 0 sheenColorFactor 1 0.5 0.25")
    assert mat["extensions"]["KHR_materials_sheen"]["sheenColorFactor"] == [1, 0.5, 0.25]
    sh.run_line("matset 0 alphaMode MASK")
    assert mat["alphaMode"] == "MASK"
    sh.run_line("matset 0 doubleSided true")
    assert mat["doubleSided"] is True
    sh.run_line("matset 0 unlit on")
    assert mat["extensions"]["KHR_materials_unlit"] == {}
    sh.run_line("matset 0 unlit off")
    assert "KHR_materials_unlit" not in mat.get("extensions", {})
    sh.run_line("matset 0 ior 1.33")
    assert mat["extensions"]["KHR_materials_ior"]["ior"] == 1.33
    # undo unwinds the whole stack
    for _ in range(7):
        sh.undo.undo()
    mat = sc.model.materials[0]
    assert "KHR_materials_clearcoat" not in mat.get("extensions", {})
    assert mat.get("alphaMode", "OPAQUE") == "OPAQUE"
    # the registry covers the inspector's editable set
    assert len(sh.MAT_FIELDS) >= 30


def test_settings_persistence_cli_override(tmp_path, monkeypatch):
    """Saved settings apply to flags NOT passed on the CLI; CLI wins when
    passed (the reference's ini + wasParsed filter contract)."""
    import json

    monkeypatch.setenv("VKGR_SETTINGS", str(tmp_path / "settings.json"))
    from vk_gltf_renderer_tpu.utils import settings as st
    from vk_gltf_renderer_tpu.headless import build_parser

    st.save_settings({"flags": {"ptDepth": 9, "tonemapper": "aces"},
                      "recent_files": ["/tmp/a.glb"]})

    argv = ["--scenefile", "x.glb", "--ptDepth", "3"]
    args = build_parser().parse_args(argv)
    st.apply_saved_settings(args, argv)
    assert args.ptDepth == 3  # CLI wins
    assert args.tonemapper == "aces"  # saved value fills the gap

    st.remember(args, "/tmp/b.glb")
    data = json.loads((tmp_path / "settings.json").read_text())
    assert data["flags"]["ptDepth"] == 3
    assert data["recent_files"][:2] == ["/tmp/b.glb", "/tmp/a.glb"]
    assert st.recent_files()[0] == "/tmp/b.glb"


def test_benchmark_compare_thresholds(tmp_path, capsys):
    """Harness self-test (reference utils/benchmark/tests/
    test_benchmark_results.py role): compare flags time regressions over
    the threshold, memory regressions over 64 MB, and passes otherwise."""
    import csv
    import types

    from vk_gltf_renderer_tpu.benchmark.__main__ import cmd_compare

    def write(path, rows):
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["scene", "spp", "width", "ms_per_frame", "peak_bytes"])
            w.writeheader()
            for r in rows:
                w.writerow(r)

    old = tmp_path / "old.csv"
    new = tmp_path / "new.csv"
    base = {"scene": "s.glb", "spp": "1", "width": "64"}
    write(old, [{**base, "ms_per_frame": "100.0", "peak_bytes": "1000000"}])

    # within threshold: pass
    write(new, [{**base, "ms_per_frame": "103.0", "peak_bytes": "1000000"}])
    args = types.SimpleNamespace(old=str(old), new=str(new), threshold=5.0, mem_threshold_mb=64.0)
    assert cmd_compare(args) == 0

    # time regression: fail
    write(new, [{**base, "ms_per_frame": "120.0", "peak_bytes": "1000000"}])
    assert cmd_compare(args) == 1

    # memory regression: fail
    write(new, [{**base, "ms_per_frame": "100.0", "peak_bytes": str(1000000 + 100 * 1024 * 1024)}])
    assert cmd_compare(args) == 1
    capsys.readouterr()


def test_headless_animate_flag(tmp_path):
    """--animate plays the scene animation across headless frames: the
    rendered pose differs from frame 0's."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np

    # synthetic 1s 180-degree rotation animation
    positions = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array([[0, 0, 0, 1], [0, 0, 1, 0]], np.float32)
    buf = positions.tobytes() + idx.tobytes() + b"\0\0" + times.tobytes() + rots.tobytes()
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0, "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.2, 0.2, 1]}}],
        "animations": [{"channels": [{"sampler": 0, "target": {"node": 0, "path": "rotation"}}],
                        "samplers": [{"input": 2, "output": 3, "interpolation": "LINEAR"}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [-1, -1, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2, "type": "SCALAR",
             "min": [0], "max": [1]},
            {"bufferView": 3, "componentType": 5126, "count": 2, "type": "VEC4"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            {"buffer": 0, "byteOffset": 44, "byteLength": 8},
            {"buffer": 0, "byteOffset": 52, "byteLength": 32}],
        "buffers": [{"uri": "anim.bin", "byteLength": len(buf)}],
    }
    (tmp_path / "anim.bin").write_bytes(buf)
    (tmp_path / "anim.gltf").write_text(json.dumps(gltf))

    def run(extra, out):
        r = subprocess.run(
            [sys.executable, "-m", "vk_gltf_renderer_tpu.headless",
             "--scenefile", str(tmp_path / "anim.gltf"), "--size", "24", "24",
             "--ptDepth", "2", "--output", out] + extra,
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-1500:]

    from PIL import Image

    run(["--frames", "1"], str(tmp_path / "f0.png"))
    run(["--frames", "9", "--animate", "3"], str(tmp_path / "f9.png"))
    a = np.asarray(Image.open(tmp_path / "f0.png")).astype(np.float32)
    b = np.asarray(Image.open(tmp_path / "f9.png")).astype(np.float32)
    assert np.abs(a - b).mean() > 1.0  # the triangle rotated


def test_edit_cli_shell(tmp_path):
    """Scene-editing shell: TRS edit + structural ops + undo/redo + save —
    the headless scene-browser/inspector editing surface
    (ui_scene_browser.cpp / ui_inspector.cpp role)."""
    import subprocess
    import sys
    import os

    out = tmp_path / "edited.glb"
    script = "\n".join([
        "tree",
        "add cube",                 # -> node 2 (Box.glb has nodes 0..1)
        "translate 2 1 0.5 0",
        "matset 0 baseColorFactor 0.1 0.9 0.1 1",
        "duplicate 2",              # -> node 3
        "delete 3",
        "undo",   # restore the deleted duplicate
        "redo",   # delete it again
        "undo",
        "undo",   # undo duplicate entirely
        f"save {out}",
        "quit",
    ]) + "\n"
    r = subprocess.run(
        [sys.executable, "-m", "vk_gltf_renderer_tpu.edit_cli",
         "/root/reference/resources/Box.glb"],
        input=script, capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "error:" not in r.stdout, r.stdout
    assert out.exists()

    from vk_gltf_renderer_tpu.models import Scene

    sc = Scene()
    sc.load(out)
    # cube added and translated; the duplicate was undone
    names = [n.get("name", "") for n in sc.model.nodes]
    assert any("cube" in n.lower() for n in names), names
    cube_id = next(i for i, n in enumerate(sc.model.nodes) if "cube" in n.get("name", "").lower())
    assert sc.model.nodes[cube_id].get("translation") == [1.0, 0.5, 0.0]
    # the duplicate was undone: exactly one cube
    assert sum("cube" in n.get("name", "").lower() for n in sc.model.nodes) == 1
    # material edit persisted
    bc = sc.model.materials[0]["pbrMetallicRoughness"]["baseColorFactor"]
    assert bc == [0.1, 0.9, 0.1, 1.0]


def test_edit_cli_inspector_verbs(capsys, triangle_model):
    """Inspector/browser parity verbs: flat list, search, node panel,
    material dump, cameras, light editing, animation scrub, variants
    (ui_inspector.cpp property panels + ui_animation.cpp slider roles)."""
    import numpy as np

    from vk_gltf_renderer_tpu.edit_cli import EditShell
    from vk_gltf_renderer_tpu.models import Scene

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    sh = EditShell(sc)
    for line in ("flat", "find mesh", "inspect 0", "matget 0", "cameras",
                 "light point", "lightset 0 intensity 40"):
        assert sh.run_line(line)
    out = capsys.readouterr().out
    assert "error:" not in out, out
    assert "[0]" in out and "world" in out  # flat + inspect panel
    assert "baseColorFactor" in out or "pbrMetallicRoughness" in out  # matget
    lights = sc.model.gltf["extensions"]["KHR_lights_punctual"]["lights"]
    assert lights[0]["intensity"] == 40.0
    sh.run_line("undo")  # lightset undone
    lights = sc.model.gltf["extensions"]["KHR_lights_punctual"]["lights"]
    assert "intensity" not in lights[0] or lights[0]["intensity"] != 40.0

    # animation scrub on a procedural animated scene (anim IDX TIME)
    g = triangle_model.gltf
    buf = triangle_model.buffers[0]
    times = np.array([0.0, 1.0], np.float32)
    vals = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
    off_t = len(buf); buf.extend(times.tobytes())
    off_v = len(buf); buf.extend(vals.tobytes())
    g["buffers"][0]["byteLength"] = len(buf)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": off_t, "byteLength": times.nbytes},
        {"buffer": 0, "byteOffset": off_v, "byteLength": vals.nbytes},
    ]
    g["accessors"] += [
        {"bufferView": len(g["bufferViews"]) - 2, "componentType": 5126,
         "count": 2, "type": "SCALAR", "min": [0], "max": [1]},
        {"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126,
         "count": 2, "type": "VEC3"},
    ]
    g["animations"] = [{
        "samplers": [{"input": len(g["accessors"]) - 2,
                      "output": len(g["accessors"]) - 1,
                      "interpolation": "LINEAR"}],
        "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
    }]
    sa = Scene()
    sa.load_from_model(triangle_model)
    sha = EditShell(sa)
    assert sha.run_line("anims") and sha.run_line("anim 0 0.5")
    out = capsys.readouterr().out
    assert "error:" not in out, out
    assert sa.model.nodes[0]["translation"] == [2.0, 0.0, 0.0]

    # variants: synthetic 2-variant model
    g["extensions"] = {"KHR_materials_variants": {
        "variants": [{"name": "A"}, {"name": "B"}]}}
    g["materials"].append({"pbrMetallicRoughness": {"baseColorFactor": [0, 0, 1, 1]}})
    g["meshes"][0]["primitives"][0].setdefault("extensions", {})[
        "KHR_materials_variants"] = {
        "mappings": [{"material": 0, "variants": [0]},
                     {"material": 1, "variants": [1]}]}
    sv = Scene()
    sv.load_from_model(triangle_model)
    shv = EditShell(sv)
    assert shv.run_line("variants") and shv.run_line("variant 1")
    out = capsys.readouterr().out
    assert "error:" not in out, out
    assert sv.model.meshes[0]["primitives"][0]["material"] == 1
    shv.run_line("undo")
    assert sv.model.meshes[0]["primitives"][0]["material"] == 0

def test_viewer_renderer_settings_and_aov_verbs():
    """ui_renderer.cpp panel parity: ':rset' edits live renderer settings
    (display-side ones take effect without losing accumulation; jit-keyed
    ones reset), and ':aov' swaps the displayed image to a debug guide
    buffer (the reference's debug-render-mode combo)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np

    from vk_gltf_renderer_tpu.viewer import TerminalViewer

    v = TerminalViewer("/root/reference/resources/Box.glb", size=24)

    def type_cmd(line):
        assert v.handle_key(":")
        for ch in line:
            assert v.handle_key(ch)
        assert v.handle_key(";")

    base = v.frame_u8().astype(float)

    # listing prints every field
    type_cmd("rset")
    listed = "\n".join(v._last_out)
    for f in ("depth", "tonemapper", "exposure", "firefly", "aov"):
        assert f in listed, listed

    # display-side edit: exposure doubles -> image brightens, NO reset
    samp = v.r.total_samples
    type_cmd("rset exposure 2.5")
    assert v.r.exposure == 2.5 and v.r.total_samples == samp > 0
    bright = v.frame_u8().astype(float)
    assert bright.mean() > base.mean() + 1.0

    # tonemapper validation + switch
    type_cmd("rset tonemapper nosuch")
    assert any("must be one of" in l for l in v._last_out)
    type_cmd("rset tonemapper none")
    assert v.r.tonemapper == "none"

    # jit-keyed edit resets accumulation
    v.frame_u8()
    assert v.r.total_samples > 0
    type_cmd("rset depth 2")
    assert v.r.max_depth == 2 and v.r.total_samples == 0

    # AOV debug views: normal view differs from beauty and is a valid image
    type_cmd("aov normal")
    assert "+aov:normal" in v.status()
    nrm = v.frame_u8().astype(float)
    assert nrm.shape == base.shape and np.isfinite(nrm).all()
    for name in ("albedo", "depth", "solid", "objectid", "roughness"):
        type_cmd(f"aov {name}")
        img = v.frame_u8()
        assert img.shape == base.shape and img.max() > 0, name
    type_cmd("aov off")
    assert v.aov is None

    # tab completion reaches rset fields and tonemapper operators
    assert v.handle_key(":")
    for ch in "rset expo":
        v.handle_key(ch)
    v.handle_key("\t")
    assert v._cmdbuf == "rset exposure ", v._cmdbuf
    v.handle_key("\x1b")
    assert v.handle_key(":")
    for ch in "rset tonemapper ag":
        v.handle_key(ch)
    v.handle_key("\t")
    assert v._cmdbuf == "rset tonemapper agx ", v._cmdbuf
    v.handle_key("\x1b")

def test_viewer_animation_timeline(triangle_model):
    """ui_animation.cpp panel parity: ':timeline' plays/pauses/scrubs the
    live animation in the viewer ('A' key = play button), playback advances
    per rendered frame at the selected speed, and scrub moves the node."""
    import os

    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    # translation animation 0->(4,0,0) over [0,1] s on node 0 (the suite's
    # standard synthetic channel, test_animation.py pattern)
    g = triangle_model.gltf
    buf = triangle_model.buffers[0]
    times = np.array([0.0, 1.0], np.float32)
    vals = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
    off_t = len(buf); buf.extend(times.tobytes())
    off_v = len(buf); buf.extend(vals.tobytes())
    g["buffers"][0]["byteLength"] = len(buf)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": off_t, "byteLength": times.nbytes},
        {"buffer": 0, "byteOffset": off_v, "byteLength": vals.nbytes},
    ]
    g["accessors"] += [
        {"bufferView": len(g["bufferViews"]) - 2, "componentType": 5126,
         "count": 2, "type": "SCALAR", "min": [0], "max": [1]},
        {"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126,
         "count": 2, "type": "VEC3"},
    ]
    g["animations"] = [{
        "samplers": [{"input": len(g["accessors"]) - 2,
                      "output": len(g["accessors"]) - 1,
                      "interpolation": "LINEAR"}],
        "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
    }]
    from vk_gltf_renderer_tpu.models.gltf import save_model

    path = "/tmp/viewer_anim_test.gltf"
    save_model(triangle_model, path)

    from vk_gltf_renderer_tpu.viewer import TerminalViewer

    v = TerminalViewer(path, size=16, render_system=1)

    def type_cmd(line):
        assert v.handle_key(":")
        for ch in line:
            assert v.handle_key(ch)
        assert v.handle_key(";")

    type_cmd("timeline")
    assert any("paused" in l for l in v._last_out), v._last_out

    # scrub to t=0.5 -> node world x == 2 (LERP midpoint)
    type_cmd("timeline time 0.5")
    assert any("t=0.500" in l for l in v._last_out), v._last_out
    np.testing.assert_allclose(
        v.r.scene.render_nodes[0].world_matrix[:3, 3], [2, 0, 0], atol=1e-6)

    # play at 6x: each rendered frame advances 0.1 s
    type_cmd("timeline play 6")
    assert v.r.animate and v.r.anim_speed == 6.0
    t0 = v.r.scene.animations[0].current_time
    v.frame_u8()
    t1 = v.r.scene.animations[0].current_time
    assert abs((t1 - t0) - 0.1) < 1e-6, (t0, t1)
    assert "+anim:" in v.status()

    # 'A' key toggles pause (the play button)
    assert v.handle_key("A")
    assert not v.r.animate
    type_cmd("timeline select 0")
    type_cmd("timeline speed 1")
    assert v.r.anim_speed == 1.0
