from aten_tpu.accel.build import build_bvh, LEAF_MAX  # noqa: F401
from aten_tpu.accel.traverse import traverse  # noqa: F401
