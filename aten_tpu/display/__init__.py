"""Presentation layer: tone mapping, TAA, standalone a-trous, magnifier
(SURVEY.md §2.8) — batched image ops instead of GLSL fullscreen passes."""
