from aten_tpu.volume.medium import MediumTable, hg_sample, hg_phase  # noqa: F401
