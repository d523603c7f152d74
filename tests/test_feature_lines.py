"""Sample-ray feature lines (reference feature_line.h formulation)."""
import jax.numpy as jnp
import numpy as np

from aten_tpu.core.camera import PinholeCamera
from aten_tpu.integrator.npr import ToonParams, feature_lines_sample_rays
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def test_silhouette_and_interior():
    """A sphere floating before a plane: lines at the silhouette, none
    on the flat plane interior / sphere interior."""
    sb = SceneBuilder()
    m1 = sb.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.2, 0.2))
    m2 = sb.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.2, 0.2))
    sb.add_quad((-10, -10, -3), (10, -10, -3), (10, 10, -3), (-10, 10, -3), m2)
    sb.add_sphere((0, 0, 0), 1.0, m1)
    sc = sb.build()
    W = H = 64
    cam = PinholeCamera(origin=(0, 0, 6), lookat=(0, 0, 0), vfov_deg=30,
                        width=W, height=H)
    lines = np.asarray(
        feature_lines_sample_rays(
            sc, cam.arrays(), W, H, jnp.uint32(0),
            ToonParams(), num_samples=8, disc_radius_px=1.5,
        )
    )
    assert lines.shape == (H, W)
    # sphere projected radius ~ W * tan-ratio; silhouette ring must light up
    yy, xx = np.mgrid[0:H, 0:W]
    r = np.hypot(yy - H / 2 + 0.5, xx - W / 2 + 0.5)
    # find the sphere edge radius: depth/id edge between sphere and plane
    ring = (r > 16) & (r < 26)
    assert lines[ring].mean() > 0.1          # edge detected somewhere in ring
    assert lines[r < 8].mean() < 0.05        # sphere interior clean
    assert lines[(xx < 6) & (yy < 6)].mean() < 0.05  # plane corner clean
