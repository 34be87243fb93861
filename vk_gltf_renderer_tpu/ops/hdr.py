"""HDR environment: Radiance (.hdr/RGBE) loader, alias-table importance
sampling, evaluation.

In-repo replacement for nvvk::HdrIbl + nvshaders/hdr_env_sampling.h.slang
(reference binds `EnvAccel` at gltf_pathtrace.slang:69 and samples via
`environmentSample`; the lat-long image stores the sampling pdf in its
alpha channel — we keep that exact layout).

Conventions:
  * lat-long mapping: u = 0.5 + atan2(d.x, -d.z) / 2pi, v = acos(d.y) / pi
  * `rotation` spins the environment about +Y (frameInfo.envRotation).
  * pdf is solid-angle measure; every texel's pdf = L / (integral * dOmega).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------------ loader
def read_hdr(path) -> np.ndarray:
    """Decode a Radiance RGBE .hdr file -> float32 [H,W,3]."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends with empty line, then resolution line
    pos = 0
    if not data.startswith(b"#?"):
        raise ValueError("not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    res = data[pos:eol].decode().split()
    pos = eol + 1
    if res[0] != "-Y" or res[2] != "+X":
        raise ValueError(f"unsupported HDR orientation {res}")
    h, w = int(res[1]), int(res[3])

    rgbe = np.zeros((h, w, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bi = 0
    for y in range(h):
        if buf[bi] == 2 and buf[bi + 1] == 2 and (int(buf[bi + 2]) << 8 | int(buf[bi + 3])) == w:
            # adaptive RLE scanline
            bi += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[bi])
                    bi += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = buf[bi]
                        bi += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = buf[bi : bi + count]
                        bi += count
                        x += count
        else:  # flat scanline
            row = buf[bi : bi + w * 4].reshape(w, 4)
            rgbe[y] = row
            bi += w * 4
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)  # 2^(e-128-8)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None].astype(np.float32)
    return rgb


# --------------------------------------------------------------- build env
def _build_alias_table(weights: np.ndarray):
    """Walker alias method. Returns (prob [N] f32, alias [N] i32)."""
    n = weights.size
    w = weights.astype(np.float64)
    total = w.sum()
    if total <= 0:
        return np.ones(n, np.float32), np.arange(n, dtype=np.int32)
    p = w * n / total
    alias = np.arange(n, dtype=np.int32)
    prob = np.ones(n, np.float32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return prob, alias


def build_environment(rgb: np.ndarray, intensity: float = 1.0, rotation: float = 0.0) -> dict:
    """Lat-long HDR -> env dict (img rgb+pdf, alias table) — the EnvAccel
    build (nvvk::HdrIbl importance table)."""
    h, w = rgb.shape[:2]
    lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    theta = (np.arange(h) + 0.5) / h * np.pi
    sin_t = np.sin(theta)[:, None]
    weights = (lum * sin_t).reshape(-1)
    prob, alias = _build_alias_table(weights)

    d_omega = (2.0 * np.pi / w) * (np.pi / h) * np.maximum(sin_t, 1e-8)  # [h,1]
    total = (lum * sin_t).sum()
    pdf = np.where(total > 0, lum * sin_t / np.maximum(total, 1e-20) / d_omega, 1.0 / (4 * np.pi))
    img = np.concatenate([rgb, pdf[..., None]], axis=-1).astype(np.float32)
    return {
        "img": jnp.asarray(img),
        "prob": jnp.asarray(prob),
        "alias": jnp.asarray(alias),
        "intensity": jnp.float32(intensity),
        "rotation": jnp.float32(rotation),
    }


def load_hdr_environment(path, intensity: float = 1.0, rotation: float = 0.0) -> dict:
    return build_environment(read_hdr(path), intensity, rotation)


# ---------------------------------------------------------------- sampling
def _rotate_y(d, ang):
    c, s = jnp.cos(ang), jnp.sin(ang)
    return jnp.stack(
        [c * d[..., 0] + s * d[..., 2], d[..., 1], -s * d[..., 0] + c * d[..., 2]], axis=-1
    )


def _spherical_uv(d):
    u = 0.5 + jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def _uv_dir(u, v):
    theta = v * jnp.pi
    phi = (u - 0.5) * 2.0 * jnp.pi
    sin_t = jnp.sin(theta)
    return jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], axis=-1)


def eval_hdr(env, d):
    """(radiance, pdf) for direction(s) d — the env-miss path
    (pathtrace_functions.h.slang:474-480)."""
    img = env["img"]
    h, w = img.shape[0], img.shape[1]
    dl = _rotate_y(d, -env["rotation"])
    u, v = _spherical_uv(dl)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    texel = img[y, x]
    return texel[..., :3] * env["intensity"], texel[..., 3]


def sample_hdr(env, u3):
    """Alias-table importance sample: (direction, radiance, pdf)
    (nvshaders environmentSample semantics)."""
    img = env["img"]
    h, w = img.shape[0], img.shape[1]
    n = h * w
    q = u3[..., 0] * n
    j = jnp.clip(q.astype(jnp.int32), 0, n - 1)
    frac = q - j.astype(jnp.float32)
    take_alias = frac > env["prob"][j]
    idx = jnp.where(take_alias, env["alias"][j], j)
    y = idx // w
    x = idx % w
    u = (x.astype(jnp.float32) + u3[..., 1]) / w
    v = (y.astype(jnp.float32) + u3[..., 2]) / h
    d = _uv_dir(u, v)
    texel = img[y, x]
    d = _rotate_y(d, env["rotation"])
    return d, texel[..., :3] * env["intensity"], texel[..., 3]
