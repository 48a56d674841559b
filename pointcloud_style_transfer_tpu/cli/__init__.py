"""Command-line entry points (same surface as the reference console scripts,
setup.py:115-123): pc-preprocess / pc-train / pc-test / pc-inference /
pc-visualize plus pc-benchmark and pc-compare."""
