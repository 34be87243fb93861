"""Feature-level end-to-end render tests: variants, solid background,
infinite plane / shadow catcher, DoF, textured + extension materials."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from conftest import make_triangle_gltf
from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.gltf import load_model_from_json
from vk_gltf_renderer_tpu.renderer import GltfRenderer


def test_variants_switching(triangle_model):
    from vk_gltf_renderer_tpu.models.variants import apply_variant, parse_variants

    g = triangle_model.gltf
    g["materials"].append({"pbrMetallicRoughness": {"baseColorFactor": [0, 1, 0, 1]}})
    g["extensions"] = {"KHR_materials_variants": {"variants": [{"name": "red"}, {"name": "green"}]}}
    g["extensionsUsed"] = ["KHR_materials_variants"]
    prim = g["meshes"][0]["primitives"][0]
    prim["extensions"] = {"KHR_materials_variants": {"mappings": [
        {"material": 0, "variants": [0]},
        {"material": 1, "variants": [1]},
    ]}}
    sc = Scene()
    sc.load_from_model(triangle_model)
    assert parse_variants(sc.model) == ["red", "green"]
    assert apply_variant(sc, 1) == 1
    assert prim["material"] == 1
    assert apply_variant(sc, 0) == 1
    assert prim["material"] == 0


def test_solid_background_render():
    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")
    r.background = (1.0, 0.0, 1.0)
    r.rebuild_device_scene()
    r.on_render()
    img = r.image_linear()
    corner = img[1, 1]
    np.testing.assert_allclose(corner, [1, 0, 1], atol=1e-5)  # backplate exact


def test_infinite_plane_render():
    r = GltfRenderer(width=32, height=32, spp=1, max_depth=3)
    r.create_scene("/root/reference/resources/Box.glb")
    r.use_infinite_plane = True
    r.plane_height = -0.6  # just below the box
    r.rebuild_device_scene()
    for _ in range(3):
        r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all()
    # bottom rows should show the gray plane, not sky-ground gradient
    bottom = img[30, 16]
    assert bottom.std() < 0.12, bottom  # gray-ish (low saturation)


def test_depth_of_field_changes_image():
    """DoF wiring: a wide aperture must substantially change the image
    (silhouettes dither, backgrounds mix) while staying finite; aperture=0
    must be the exact pinhole image."""

    def render(aperture, frames=6):
        r = GltfRenderer(width=32, height=32, spp=2, max_depth=2)
        r.create_scene("/root/reference/resources/Box.glb")
        r.aperture = aperture
        r.rebuild_device_scene()
        for _ in range(frames):
            r.on_render()
        return r.image_linear()

    sharp = render(0.0)
    sharp2 = render(0.0)
    blurred = render(0.3)
    np.testing.assert_allclose(sharp, sharp2, atol=1e-6)  # deterministic
    assert np.isfinite(blurred).all()
    assert np.abs(sharp - blurred).mean() > 0.02  # the lens does something


def test_textured_scene_render(tmp_path, triangle_model):
    """End-to-end texture pipeline: checkerboard baseColor texture."""
    import io

    from PIL import Image

    # 8x8 red/blue checker PNG embedded via bufferView
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[::2, ::2] = [255, 0, 0]
    tex[1::2, 1::2] = [255, 0, 0]
    tex[tex.sum(-1) == 0] = [0, 0, 255]
    buf = io.BytesIO()
    Image.fromarray(tex).save(buf, format="PNG")
    png = buf.getvalue()

    g = triangle_model.gltf
    b = triangle_model.buffers[0]
    # add UVs for the 3 vertices
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    uv_off = len(b); b.extend(uvs.tobytes())
    png_off = len(b); b.extend(png)
    g["buffers"][0]["byteLength"] = len(b)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": uv_off, "byteLength": uvs.nbytes},
        {"buffer": 0, "byteOffset": png_off, "byteLength": len(png)},
    ]
    g["accessors"].append({"bufferView": len(g["bufferViews"]) - 2, "componentType": 5126, "count": 3, "type": "VEC2"})
    g["meshes"][0]["primitives"][0]["attributes"]["TEXCOORD_0"] = len(g["accessors"]) - 1
    g["images"] = [{"bufferView": len(g["bufferViews"]) - 1, "mimeType": "image/png"}]
    g["textures"] = [{"source": 0}]
    g["materials"][0]["pbrMetallicRoughness"] = {"baseColorTexture": {"index": 0}, "roughnessFactor": 1.0}

    sc = Scene()
    sc.load_from_model(triangle_model)
    r = GltfRenderer(width=32, height=32, spp=2, max_depth=2)
    r.scene = sc
    from vk_gltf_renderer_tpu.renderer import fit_camera

    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    for _ in range(4):
        r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all()
    # check the albedo GUIDE buffer (pure texture, no lighting): the
    # checkerboard must show both red- and blue-dominant texels
    aux = r._last_aux
    solid = np.asarray(aux["solid"]).reshape(32, 32)
    albedo = np.asarray(aux["albedo"]).reshape(32, 32, 3)[solid]
    assert albedo.shape[0] > 20
    red_frac = (albedo[:, 0] > albedo[:, 2] * 1.5).mean()
    blue_frac = (albedo[:, 2] > albedo[:, 0] * 1.5).mean()
    assert red_frac > 0.15 and blue_frac > 0.15, (red_frac, blue_frac)


def test_emissive_material_glows():
    gltf, bufs = make_triangle_gltf()
    gltf["materials"][0]["emissiveFactor"] = [5.0, 0.0, 0.0]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorFactor"] = [0, 0, 0, 1]
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, bufs))
    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.scene = sc
    from vk_gltf_renderer_tpu.renderer import fit_camera

    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    r.on_render()
    img = r.image_linear()
    aux = r._last_aux
    solid = np.asarray(aux["solid"]).reshape(24, 24)
    assert solid.any()
    tri = img[solid]
    assert tri[:, 0].mean() > 2.0  # emissive red, unclamped HDR
