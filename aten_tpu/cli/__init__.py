"""CLI apps/tools (SURVEY.md §2.10): render, bvh_builder,
envmap_converter, bump2normal, obj_tool — `python -m aten_tpu.cli.<tool>`."""
