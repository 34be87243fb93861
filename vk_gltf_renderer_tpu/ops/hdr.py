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


# Filtered-importance-sampling resolution (Křivánek & Colbert 2008 style):
# sampling, NEE radiance and pdf all come from this reduced map, which
# keeps the estimator self-consistent (pdf matches the sampling density
# and the radiance it integrates) while making every per-ray lookup a
# Pallas small-table gather instead of an XLA gather (~34 ns/element).
# The FULL-resolution map is kept for the directly-visible background
# (primary-miss fix-up in ops/pathtrace.py). The reference samples the
# full-resolution alias table on hardware where gathers are free
# (nvshaders hdr_env_sampling.h.slang); this split is the TPU-native
# equivalent.
RED_H, RED_W = 64, 128


def _downsample(rgb: np.ndarray) -> np.ndarray:
    """Energy-preserving block mean onto the RED_H x RED_W grid."""
    h, w = rgb.shape[:2]
    ry = np.arange(h) * RED_H // h
    rx = np.arange(w) * RED_W // w
    acc = np.zeros((RED_H, RED_W, 3), np.float64)
    cnt = np.zeros((RED_H, RED_W), np.float64)
    np.add.at(acc, (ry[:, None].repeat(w, 1), rx[None, :].repeat(h, 0)), rgb)
    np.add.at(cnt, (ry[:, None].repeat(w, 1), rx[None, :].repeat(h, 0)), 1.0)
    return (acc / np.maximum(cnt, 1.0)[..., None]).astype(np.float32)


def build_environment(rgb: np.ndarray, intensity: float = 1.0, rotation: float = 0.0) -> dict:
    """Lat-long HDR -> env dict (full img rgb+pdf + reduced sampling
    tables) — the EnvAccel build (nvvk::HdrIbl importance table)."""
    h, w = rgb.shape[:2]
    lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    theta = (np.arange(h) + 0.5) / h * np.pi
    sin_t = np.sin(theta)[:, None]
    d_omega = (2.0 * np.pi / w) * (np.pi / h) * np.maximum(sin_t, 1e-8)  # [h,1]
    total = (lum * sin_t).sum()
    pdf = np.where(total > 0, lum * sin_t / np.maximum(total, 1e-20) / d_omega, 1.0 / (4 * np.pi))
    img = np.concatenate([rgb, pdf[..., None]], axis=-1).astype(np.float32)

    # reduced sampling distribution
    rgb_s = _downsample(rgb)
    lum_s = 0.2126 * rgb_s[..., 0] + 0.7152 * rgb_s[..., 1] + 0.0722 * rgb_s[..., 2]
    theta_s = (np.arange(RED_H) + 0.5) / RED_H * np.pi
    sin_s = np.sin(theta_s)[:, None]
    prob_s, alias_s = _build_alias_table((lum_s * sin_s).reshape(-1))
    dom_s = (2.0 * np.pi / RED_W) * (np.pi / RED_H) * np.maximum(sin_s, 1e-8)
    tot_s = (lum_s * sin_s).sum()
    pdf_s = np.where(
        tot_s > 0, lum_s * sin_s / np.maximum(tot_s, 1e-20) / dom_s, 1.0 / (4 * np.pi)
    )
    samp = np.stack(
        [
            prob_s,
            alias_s.astype(np.float32),
            rgb_s[..., 0].reshape(-1),
            rgb_s[..., 1].reshape(-1),
            rgb_s[..., 2].reshape(-1),
            pdf_s.reshape(-1).astype(np.float32),
        ]
    ).astype(np.float32)
    return {
        "img": jnp.asarray(img),
        "samp": jnp.asarray(samp),  # [6, RED_H*RED_W]: prob alias r g b pdf
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


def eval_hdr(env, d, full=False):
    """(radiance, pdf) for direction(s) d — the env-miss path
    (pathtrace_functions.h.slang:474-480).

    Default: reduced-resolution map via the Pallas gather (pdf MUST come
    from here — it is the density sample_hdr actually uses). full=True
    reads the full-resolution image with an XLA gather — only for the
    directly-visible background fix-up (once per sample, not per bounce).
    """
    dl = _rotate_y(d, -env["rotation"])
    u, v = _spherical_uv(dl)
    if full:
        img = env["img"]
        h, w = img.shape[0], img.shape[1]
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        texel = img[y, x]
        return texel[..., :3] * env["intensity"], texel[..., 3]
    from .pallas_gather import gather_channels

    x = jnp.clip((u * RED_W).astype(jnp.int32), 0, RED_W - 1)
    y = jnp.clip((v * RED_H).astype(jnp.int32), 0, RED_H - 1)
    ch = gather_channels(env["samp"][2:6], (y * RED_W + x).reshape(-1))
    shp = d.shape[:-1]
    rgb = jnp.stack([ch[0], ch[1], ch[2]], axis=-1).reshape(shp + (3,))
    return rgb * env["intensity"], ch[3].reshape(shp)


def sample_hdr(env, u3):
    """Alias-table importance sample on the reduced map:
    (direction, radiance, pdf) (nvshaders environmentSample semantics)."""
    from .pallas_gather import gather_channels

    n = RED_H * RED_W
    shp = u3.shape[:-1]
    q = (u3[..., 0] * n).reshape(-1)
    j = jnp.clip(q.astype(jnp.int32), 0, n - 1)
    frac = q - j.astype(jnp.float32)
    pa = gather_channels(env["samp"][0:2], j)
    take_alias = frac > pa[0]
    idx = jnp.where(take_alias, pa[1].astype(jnp.int32), j)
    ch = gather_channels(env["samp"][2:6], idx)
    y = idx // RED_W
    x = idx - y * RED_W
    u = (x.astype(jnp.float32).reshape(shp) + u3[..., 1]) / RED_W
    v = (y.astype(jnp.float32).reshape(shp) + u3[..., 2]) / RED_H
    d = _uv_dir(u, v)
    rgb = jnp.stack([ch[0], ch[1], ch[2]], axis=-1).reshape(shp + (3,))
    d = _rotate_y(d, env["rotation"])
    return d, rgb * env["intensity"], ch[3].reshape(shp)
