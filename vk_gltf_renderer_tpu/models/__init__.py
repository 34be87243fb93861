"""Host-side Model-primary scene library (reference layer 1).

The glTF Model — a JSON dict plus binary buffers — is the single source of
truth, exactly like tinygltf::Model in the reference (gltf_scene.hpp:210).
Flat render arrays (RenderNode / RenderPrimitive) are derived, never edited.
"""

from .gltf import GltfModel, load_model, save_model
from .scene import Scene, DirtyFlags, RenderNode, RenderPrimitive
