"""Texture pool: decode -> flat texel array + per-mip descriptors; bilinear
trilinear sampling as gathers.

TPU has no texture units, so the bindless Sampler2D array of the reference
(gltf_scene_vk.cpp:951 createTextureImages) becomes one flat float32 texel
pool plus a (texture, mip) -> (offset, w, h) descriptor table. The pool is
QUAD-PACKED ([K,16]: each row carries all 4 bilinear taps anchored at its
texel, wrap pre-applied), so sampling is ONE row gather + lerp per mip,
2 mips for trilinear (ray-cone LOD, the SampleGrad analog of
gltf_material_eval.h.slang:76-110). TPU gathers cost per row regardless of
width, and texel-pool gathers dominate textured-frame time — quad packing
cuts them 4x for 4x pool memory (textures are a small fraction of HBM).

sRGB classification follows the reference (SceneVk::findSrgbImages
gltf_scene_vk.hpp:176): images used by baseColor/emissive/sheenColor/
specularColor/diffuse(SG) are sRGB-decoded to linear at load.
"""

from __future__ import annotations

import io

import numpy as np
import jax.numpy as jnp

_SRGB_SLOT_KEYS = (
    "baseColorTexture",
    "emissiveTexture",
    "sheenColorTexture",
    "specularColorTexture",
    "diffuseTexture",
    "diffuseTransmissionColorTexture",
)


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def find_srgb_images(model) -> set:
    """Image indices that must be sRGB-decoded (usage-based classification)."""
    srgb = set()

    def visit(tex_ref):
        if not isinstance(tex_ref, dict) or "index" not in tex_ref:
            return
        tex = model.textures[tex_ref["index"]]
        src = -1
        text = tex.get("extensions", {})
        for e in ("EXT_texture_webp", "MSFT_texture_dds", "KHR_texture_basisu"):
            if e in text and text[e].get("source") is not None:
                src = text[e]["source"]
                break
        if src < 0:
            src = tex.get("source", -1)
        if src >= 0:
            srgb.add(src)

    for mat in model.materials:
        pbr = mat.get("pbrMetallicRoughness", {})
        visit(pbr.get("baseColorTexture"))
        visit(mat.get("emissiveTexture"))
        for ext in mat.get("extensions", {}).values():
            if isinstance(ext, dict):
                for k in _SRGB_SLOT_KEYS:
                    visit(ext.get(k))
    return srgb


def decode_image(model, image: dict) -> np.ndarray:
    """Decode one glTF image to float32 RGBA [H,W,4] in [0,1].

    PNG/JPG/WebP-by-PIL plus DDS and KTX2 containers (ops/dds.py — the
    nv_dds/nv_ktx role, gltf_image_loader.cpp:1-242)."""
    from PIL import Image

    if "bufferView" in image:
        bv = model.buffer_views[image["bufferView"]]
        buf = model.buffers[bv.get("buffer", 0)]
        off = bv.get("byteOffset", 0)
        data = bytes(buf[off : off + bv["byteLength"]])
    elif "uri" in image:
        uri = image["uri"]
        if uri.startswith("data:"):
            import base64

            data = base64.b64decode(uri.split(",", 1)[1])
        else:
            from urllib.parse import unquote

            data = (model.base_dir / unquote(uri)).read_bytes()
    else:
        return np.ones((1, 1, 4), np.float32)

    from .dds import sniff_decode

    decoded = sniff_decode(data)
    if decoded is not None:
        return decoded
    img = Image.open(io.BytesIO(data)).convert("RGBA")
    return np.asarray(img, np.float32) / 255.0


def _mip_chain(img: np.ndarray, max_mips: int = 16) -> list:
    mips = [img]
    while min(img.shape[0], img.shape[1]) > 1 and len(mips) < max_mips:
        h, w = img.shape[:2]
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        img = img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, 4).mean(axis=(1, 3))
        mips.append(img.astype(np.float32))
    return mips


def _quad_pack(mip: np.ndarray) -> np.ndarray:
    """[h,w,4] -> [h*w,16]: row (y,x) = taps (x,y),(x+1,y),(x,y+1),(x+1,y+1)
    with REPEAT wrap, so bilinear = ONE row gather (TPU gathers cost per
    row; the texel pool is the only large gather target in shading)."""
    right = np.roll(mip, -1, axis=1)
    down = np.roll(mip, -1, axis=0)
    diag = np.roll(right, -1, axis=0)
    return np.concatenate([mip, right, down, diag], axis=-1).reshape(-1, 16).astype(np.float32)


def build_texture_pool(model, used_texinfos=None):
    """Decode all images -> (quads [K,16], desc [D,4], mip_table [ntex,max],
    num_mips [ntex])."""
    srgb = find_srgb_images(model)
    texel_chunks = []
    desc_rows = []
    per_image_descs = []
    offset = 0
    for i, image in enumerate(model.images):
        try:
            img = decode_image(model, image)
        except Exception:
            img = np.ones((1, 1, 4), np.float32)
        if i in srgb:
            img = np.concatenate([_srgb_to_linear(img[..., :3]), img[..., 3:4]], axis=-1)
        rows = []
        for mip in _mip_chain(img):
            h, w = mip.shape[:2]
            desc_rows.append([offset, w, h, 0])
            rows.append(len(desc_rows) - 1)
            texel_chunks.append(_quad_pack(mip))
            offset += h * w
        per_image_descs.append(rows)

    if not desc_rows:
        texel_chunks = [np.ones((1, 16), np.float32)]
        desc_rows = [[0, 1, 1, 0]]
        per_image_descs = [[0]]

    max_mips = max(len(r) for r in per_image_descs)
    ntex = len(per_image_descs)
    mip_table = np.full((ntex, max_mips), -1, np.int32)
    num_mips = np.zeros(ntex, np.int32)
    for i, rows in enumerate(per_image_descs):
        mip_table[i, : len(rows)] = rows
        num_mips[i] = len(rows)
        # pad trailing entries with the coarsest mip so gathers stay in-range
        mip_table[i, len(rows) :] = rows[-1]

    quads = np.concatenate(texel_chunks).astype(np.float32)
    return quads, np.asarray(desc_rows, np.int32), mip_table, num_mips


def _fetch_bilinear(quads, desc, uv):
    """One mip bilinear fetch = ONE quad-row gather. desc: [...,4]
    (offset,w,h). uv in [0,1) wrapped. quads rows carry all 4 taps
    (wrap baked in by _quad_pack)."""
    w = desc[..., 1].astype(jnp.float32)
    h = desc[..., 2].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    wi = desc[..., 1]
    hi = desc[..., 2]

    def wrap(v, n):
        return jnp.mod(v.astype(jnp.int32), jnp.maximum(n, 1))

    x0i = wrap(x0, wi)
    y0i = wrap(y0, hi)
    row = quads[desc[..., 0] + y0i * wi + x0i]  # [...,16]
    c00, c10, c01, c11 = row[..., 0:4], row[..., 4:8], row[..., 8:12], row[..., 12:16]
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def sample_texture(flat, ti_slot, uv0, uv1, grad):
    """Sample via texture-info slot (KHR_texture_transform + trilinear).

    ti_slot: [..] int32 into the texinfo table (0 = none -> white).
    grad: [..] UV-space footprint of the ray cone (the SampleGrad gradient,
    gltf_material_eval.h.slang:84-94); mip level = log2(grad * width).
    Returns [...,4] RGBA.
    """
    idx = flat.ti_index[ti_slot]  # image index; -1 none
    texcoord = flat.ti_texcoord[ti_slot]
    xf = flat.ti_uvxform[ti_slot]  # [...,2,3]
    uv = jnp.where((texcoord == 0)[..., None], uv0, uv1)
    u = xf[..., 0, 0] * uv[..., 0] + xf[..., 0, 1] * uv[..., 1] + xf[..., 0, 2]
    v = xf[..., 1, 0] * uv[..., 0] + xf[..., 1, 1] * uv[..., 1] + xf[..., 1, 2]
    uvt = jnp.stack([u, v], axis=-1)
    uvt = uvt - jnp.floor(uvt)  # REPEAT wrap

    safe_idx = jnp.maximum(idx, 0)
    nmips = flat.tex_num_mips[safe_idx].astype(jnp.float32)
    d0_ = flat.tex_desc[flat.tex_mip_table[safe_idx, 0]]
    lod = jnp.log2(jnp.maximum(grad * d0_[..., 1].astype(jnp.float32), 1.0))
    lod = jnp.clip(lod, 0.0, nmips - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, (nmips - 1.0).astype(jnp.int32))
    fl = (lod - l0.astype(jnp.float32))[..., None]
    d0 = flat.tex_desc[flat.tex_mip_table[safe_idx, l0]]
    d1 = flat.tex_desc[flat.tex_mip_table[safe_idx, l1]]
    c0 = _fetch_bilinear(flat.tex_quads, d0, uvt)
    c1 = _fetch_bilinear(flat.tex_quads, d1, uvt)
    c = c0 * (1 - fl) + c1 * fl
    return jnp.where((idx >= 0)[..., None], c, jnp.ones_like(c))
