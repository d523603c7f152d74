from aten_tpu.core import vecmath, sampler, camera  # noqa: F401
