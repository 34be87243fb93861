"""vk_gltf_renderer_tpu — a TPU-native glTF 2.0 path-tracing framework.

A from-scratch rebuild of the capabilities of nvpro-samples/vk_gltf_renderer
(reference: a C++20/Vulkan Monte-Carlo path tracer for glTF scenes) designed
for TPU hardware: JAX/XLA for the compute graph, Pallas for hot kernels,
jax.sharding for multi-chip scaling.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  models/    host-side Model-primary scene library (reference layer 1:
             src/gltf_scene.*, gltf_scene_editor.*, ...). Pure Python/numpy,
             no JAX dependency — unit-testable without any accelerator.
  ops/       device compute: SceneFlat pytree (layer 2: gltf_scene_vk),
             LBVH build/traverse (layer 2: gltf_scene_rtx), wavefront path
             tracer + BSDF stack + env sampling (layer 3:
             shaders/gltf_pathtrace.slang and nvpro_core2 nvshaders).
  parallel/  device-mesh sharding: pixel-tile data parallelism over ICI,
             psum stats (new first-class component; reference has none).
  utils/     math, logging, parameter registry, benchmarking harness hooks.

Data-flow invariant preserved from the reference
(docs/RENDERING_ARCHITECTURE.md:10-43): the glTF Model (JSON dict + buffers)
is the single source of truth; flat RenderNode[]/RenderPrimitive[] arrays are
derived and regenerated; the device pytree mirrors the derived arrays and is
updated functionally through dirty-flag diffs.
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS request even on hosts whose sitecustomize
# force-registers an accelerator plugin that ignores the env var (observed:
# JAX_PLATFORMS=cpu in the env, yet jax.devices() returns the tunneled TPU;
# subprocess tests then pay a ~26 ms network round-trip per dispatch). The
# env var is user intent; make it authoritative.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized — too late to switch; leave as is
