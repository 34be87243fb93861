"""Persistent XLA compilation cache — the TPU analog of the reference's
VkPipelineCache-on-disk (pipeline_cache_util.{hpp,cpp}) + its in-memory
shader variant cache.

First compilation of a render variant costs tens of seconds; with the
cache, later processes reload the compiled executable in milliseconds.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("VKGR_TPU_CACHE", Path.home() / ".cache" / "vk_gltf_renderer_tpu" / "xla"))
_enabled = False


def enable(path=None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    p = Path(path) if path else _DEFAULT
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True


def rotate() -> str:
    """Point the persistent cache at a FRESH directory.

    Crashed compiles can leave poisoned entries that load but fail at run
    time with INVALID_ARGUMENT (the reference's analog is a corrupt
    VkPipelineCache blob — drivers just rebuild). Rotation makes every
    subsequent compile miss the poisoned store without deleting the user's
    cache out from under concurrent processes. Returns the new path."""
    import tempfile

    import jax

    p = Path(tempfile.mkdtemp(prefix="vkgr_xla_cache_"))
    jax.config.update("jax_compilation_cache_dir", str(p))
    return str(p)
