from aten_tpu.ops import traverse_pallas  # noqa: F401
