"""Raster operators over decoded pixel blocks (SURVEY.md §2.7-2.8)."""
