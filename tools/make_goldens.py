"""Regenerate the pinned golden images (tests/golden/*.npz).

Run on the CPU oracle backend (matching tests/conftest.py) after an
INTENTIONAL rendering change, then review the diffs before committing:
    python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/aten_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def configs():
    """The five BASELINE.md fixture configs, shrunk to CI size.

    Each entry: (name, render() -> [H,W,3]).
    """
    import jax.numpy as jnp

    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene import scenedefs

    def cornell():
        scene, cam = scenedefs.cornell_box(64, 64)
        return render_image(scene, cam, spp=16, max_depth=5)

    def zoo():
        scene, cam = scenedefs.material_test_scene(96, 48)
        return render_image(scene, cam, spp=8, max_depth=4)

    def sponza():
        scene, cam = scenedefs.sponza_scene(64, 64)
        return render_image(scene, cam, spp=4, max_depth=3)

    def restir_lights():
        from aten_tpu.integrator import restir

        scene, cam = scenedefs.many_light_scene(64, 64, num_lights=32)
        st = restir.init_state(64, 64)
        img = None
        for f in range(2):
            img, st = restir.restir_direct_sample(
                scene, cam.arrays(), 64, 64, jnp.uint32(f), st
            )
        return img

    def volume():
        from aten_tpu.integrator.volpt import render_volpt

        scene, cam = scenedefs.hetero_volume_scene(32, 32, res=24)
        return render_volpt(scene, cam, spp=4, max_depth=6)

    def restir_gi():
        from aten_tpu.integrator import restir

        scene, cam = scenedefs.many_light_scene(64, 64, num_lights=32)
        st = restir.init_state(64, 64)
        img = None
        for f in range(2):
            img, st = restir.restir_gi_sample(
                scene, cam.arrays(), 64, 64, jnp.uint32(f), st,
                max_depth=3, rr_depth=2,
            )
        return img

    return [
        ("cornell", cornell),
        ("mtrl_zoo", zoo),
        ("sponza", sponza),
        ("restir_lights", restir_lights),
        ("restir_gi", restir_gi),
        ("volume", volume),
    ]


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in configs():
        img = np.asarray(fn())
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, img=img.astype(np.float32))
        print(f"{name}: {img.shape} mean={img.mean():.5f} -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
