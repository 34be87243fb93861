"""Driver for tests/test_multihost.py — run as a real separate process:

    python tests/multihost_driver.py <pid> <nproc> <port>

Initializes the JAX distributed runtime (CPU, 4 virtual devices per
process, Gloo collectives), renders one frame of Box.glb sharded over the
GLOBAL 8-device mesh (parallel/multihost.py), and asserts every local
accumulation shard is bit-identical to the locally computed UNSHARDED
render. Prints MULTIHOST_OK on success."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("VKGR_SETTINGS", "/tmp/vkgr_test_settings.json")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# distributed init MUST precede anything that touches the XLA backend —
# including importing the package (renderer import chain touches jax)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

from vk_gltf_renderer_tpu.parallel.multihost import (  # noqa: E402
    global_mesh, render_multihost,
)

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from vk_gltf_renderer_tpu.renderer import GltfRenderer  # noqa: E402

assert len(jax.devices()) == 4 * nproc, jax.devices()


def make_renderer():
    r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")
    return r


# unsharded reference (deterministic seeding -> placement independent)
ref = make_renderer()
ref.on_render()
ref_accum = np.asarray(ref.accum)

r = make_renderer()
mesh = global_mesh()
aux, local = render_multihost(r, mesh)
assert float(aux["rays"]) > 0
for start, shard in local:
    want = ref_accum[start : start + shard.shape[0]]
    # not bit-exact: sharded vs unsharded XLA programs fuse differently
    # (observed max diff 1.9e-9); 1e-6 is pixel-exact for any 8-bit output
    np.testing.assert_allclose(shard, want, atol=1e-6, rtol=0)

# adaptive lock-step: process-0's measured wall_ms is broadcast, so every
# process must land on the same spp bucket each frame (and the bucket must
# come from REAL wall time, not the old hard-coded 1.0 ms)
from vk_gltf_renderer_tpu.renderer import AdaptiveSampler  # noqa: E402

ra = make_renderer()
ra.adaptive = AdaptiveSampler(target_fps=10)  # 100 ms budget
spps = []
for _ in range(3):
    render_multihost(ra, mesh)
    spps.append(ra.spp)
from jax.experimental import multihost_utils  # noqa: E402

all_spps = np.asarray(multihost_utils.process_allgather(np.asarray(spps)))
assert (all_spps == all_spps[0]).all(), f"spp buckets diverged: {all_spps}"

print(f"MULTIHOST_OK pid={pid} shards={len(local)} rays={float(aux['rays'])} "
      f"spps={spps}", flush=True)
