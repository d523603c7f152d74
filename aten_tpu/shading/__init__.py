from aten_tpu.shading import brdf, nee  # noqa: F401
