"""Asset I/O: image load/save (incl. Radiance HDR), material XML/JSON
load/export, OBJ writing (SURVEY.md §2.7, libatenscene counterpart)."""
