"""Ray Data stages: batch transforms (``map_batches`` functions / callable
classes) and shuffle recipes composing the export + analysis pipelines."""
