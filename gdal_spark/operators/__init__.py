"""DataFrame operators: spatial join, kNN, raster ops, tiling, dedup/text."""
