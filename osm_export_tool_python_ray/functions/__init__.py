"""Vectorized scalar/geometry kernels (NumPy over Arrow buffers).

The reference delegates all geometry to shapely/OGR/osmium C++ (reference
tabular.py:8-16); none of those are available here, so every kernel is
implemented from scratch and exercised by unit tests against hand-computed
expectations.
"""
