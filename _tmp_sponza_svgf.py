import time, numpy as np, jax, jax.numpy as jnp
from aten_tpu.scene.scenedefs import sponza_scene
from aten_tpu.integrator.pathtracer import render_sample_with_aovs
from aten_tpu.denoise.svgf import SVGFDenoiser
from aten_tpu.io.image import save_image
W = H = 384
sc, cam = sponza_scene(W, H)
ca = cam.arrays()
den = SVGFDenoiser(W, H)
t0 = time.perf_counter()
out = None
for f in range(8):  # 8 frames at 1 spp, temporally accumulated + filtered
    rad, aovs = render_sample_with_aovs(sc, ca, W, H, jnp.uint32(f), jnp.uint32(0), 1, 4, 3)
    out = den.step(rad, aovs, cam)
img = np.asarray(out)
print("svgf mean", img.mean(), "nan", np.isnan(img).any(),
      f"{(time.perf_counter()-t0)/8*1000:.0f} ms/frame avg (incl compile)", flush=True)
save_image("/tmp/sponza_svgf.png", np.clip(img, 0, None))
