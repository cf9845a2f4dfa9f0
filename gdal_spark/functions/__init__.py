"""Vectorized function catalog: tile math, cell keys, geometry kernels,
image codecs, checksums, perceptual hashes.
"""
