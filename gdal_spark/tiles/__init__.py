"""XYZ/TMS tile pyramid pipeline (gdal2tiles re-expressed, SURVEY.md §2.9)."""
