"""Device compute: SceneFlat pytree, BVH, wavefront path tracer (JAX/Pallas).

Renderer math is precision-critical: ray/triangle/transform arithmetic must
be true float32. On TPU, jnp matmul/dot default to bfloat16 inputs, which
breaks intersection t-values at the 3rd decimal. Hot code paths therefore
avoid dot_general on small vectors (explicit mul+add), and we raise the
global default so any remaining matmuls are exact.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
