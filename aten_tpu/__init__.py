"""aten_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference renderer nackdai/aten (CPU "aten" + CUDA "idaten"):
NEE path tracing with MIS, a two-level threaded (hit/miss link) BVH,
a material zoo (Lambert/OrenNayar/GGX/Beckmann/Disney/refraction/...),
area/point/spot/directional/IBL lights, CMJ QMC sampling, SVGF
denoising, ReSTIR direct lighting, and volume rendering — all as
batched JAX programs over flat device arrays, sharded across TPU
meshes with `shard_map`, with reverse-mode pixel gradients.

Design notes (vs. reference /root/reference):
  * The reference dual-compiles header-only shading code into CPU and
    CUDA namespaces (src/libaten/defs.h:100-113).  Here there is ONE
    JAX source of truth; the "CPU reference" path is the same code
    jit-compiled on the CPU backend, and Pallas kernels are the
    optimized device path, gated by allclose parity tests.
  * The reference's `aten::context` registry of id-linked assets
    (src/libaten/scene/host_scene_context.h:38) becomes an immutable
    pytree of flat arrays (`aten_tpu.scene.SceneData`).
"""

__version__ = "0.1.0"

from aten_tpu.scene.scene import SceneData, SceneBuilder  # noqa: F401
