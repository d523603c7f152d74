import time, numpy as np, jax, jax.numpy as jnp
from aten_tpu.scene.scenedefs import many_light_scene
from aten_tpu.integrator.restir import ReSTIRRenderer
from aten_tpu.io.image import save_image
sc, cam = many_light_scene(256, 256, num_lights=126)
r = ReSTIRRenderer(sc, cam)
t0 = time.perf_counter()
img = None
for f in range(8):
    img = r.render_frame()
jax.block_until_ready(img)
dt = time.perf_counter() - t0
img = np.asarray(img)
print("restir mean", img.mean(), "nan", np.isnan(img).any(),
      f"{dt/8*1000:.0f} ms/frame avg incl compile", flush=True)
save_image("/tmp/restir.png", np.clip(img, 0, None))
