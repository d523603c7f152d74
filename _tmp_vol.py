import numpy as np, jax, jax.numpy as jnp
from aten_tpu.scene.scenedefs import hetero_volume_scene
from aten_tpu.integrator.volpt import render_volpt
from aten_tpu.io.image import save_image
sc, cam = hetero_volume_scene(256, 256, res=48)
img = np.asarray(render_volpt(sc, cam, spp=12, max_depth=6))
print("vol mean", img.mean(), "nan", np.isnan(img).any(), flush=True)
save_image("/tmp/volgrid.png", np.clip(img, 0, None))
