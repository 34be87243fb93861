"""Device-mesh parallelism — a new first-class subsystem (the reference is
single-GPU, SURVEY.md §2.7; this is the TPU-native scaling layer)."""

from .mesh import make_sharded_render_fn, render_mesh
