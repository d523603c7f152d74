import time, numpy as np, jax, jax.numpy as jnp
from aten_tpu.scene.scenedefs import sponza_scene
from aten_tpu.integrator.pathtracer import render_sample
from aten_tpu.io.image import save_image
sc, cam = sponza_scene(384, 384)
print("layout:", [k for k in sc.arrays if k.startswith(("pl_","trl_"))], flush=True)
ca = cam.arrays()
acc = 0
t0=time.perf_counter()
for s in range(12):
    acc = acc + render_sample(sc, ca, 384, 384, jnp.uint32(0), jnp.uint32(s), 12, 4, 3)
img = np.asarray(acc/12)
print("mean", img.mean(), "nan", np.isnan(img).any(), flush=True)
save_image("/tmp/sponza.png", np.clip(img,0,None))
