from aten_tpu.denoise.svgf import SVGFDenoiser  # noqa: F401
