from aten_tpu.integrator.pathtracer import PathTracer, render_image  # noqa: F401
from aten_tpu.integrator.film import Film  # noqa: F401
