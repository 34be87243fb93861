"""Post effects + interaction images: silhouette outline, ray picking.

Silhouette (reference renderer_silhouette.* + silhouette.comp.slang:52-102):
Sobel edge detection over the frame-0 object-ID image, masked by the
selection bit set, composited onto the tonemapped image.

Picking (reference nvvk::RayPicker usage, renderer.cpp ray-pick selection):
trace one camera ray at the mouse pixel and return the render-node id (the
selection image eSelectImage analog without a readback of the full buffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silhouette(object_ids, selection_mask, image, color=(1.0, 0.6, 0.1)):
    """object_ids: [H,W] int32 (-1 = background, else render-node id);
    selection_mask: [N] bool per render node; image: [H,W,3] tonemapped.
    Returns image with outline composited (silhouette.comp.slang:52-102)."""
    sel = jnp.concatenate([selection_mask, jnp.zeros(1, bool)])  # -1 -> False
    s = sel[jnp.clip(object_ids, -1, sel.shape[0] - 2)].astype(jnp.float32)
    s = jnp.where(object_ids >= 0, s, 0.0)

    # Sobel over the selection field
    p = jnp.pad(s, 1, mode="edge")
    gx = (
        p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
        - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2]
    )
    gy = (
        p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
        - p[:-2, :-2] - 2 * p[:-2, 1:-1] - p[:-2, 2:]
    )
    edge = jnp.sqrt(gx * gx + gy * gy) > 0.5
    c = jnp.asarray(color, jnp.float32)
    return jnp.where(edge[..., None], c, image)


def pick_ray(renderer, px: int, py: int) -> int:
    """Trace the selection ray at pixel (px, py); returns render-node id or
    -1 (reference traceSelectionRay, pathtrace_functions.h.slang:813-820)."""
    import numpy as np
    import jax.numpy as jnp

    from .camera import generate_rays
    from .traverse_wavefront import intersect_rays_wavefront

    frame = renderer._frame_inputs()
    sp = jnp.asarray([[float(px), float(py)]], jnp.float32)
    ro, rd = generate_rays(
        sp, jnp.full((1, 2), 0.5), jnp.asarray([renderer.width, renderer.height], jnp.float32),
        frame["proj_inv"], frame["view_inv"],
    )
    from .traverse import as_device

    hit = intersect_rays_wavefront(as_device(renderer.bvh), ro, rd)
    return int(hit["rnode"][0])
