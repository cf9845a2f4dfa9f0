"""Structured Streaming extensions (incremental tile refresh).

The reference has no streaming model (SURVEY.md §2.10) — its closest
concepts are single-pass "streamed" pipeline datasets
(apps/gdalalg_abstract_pipeline.cpp:805-817) and gdal2tiles --resume.
This package is therefore an ENGINE EXTENSION: new image arrivals are
folded into the tile pyramid incrementally instead of re-running the
batch job.
"""
