"""Device compute kernels (extraction, counting, junctions, chains)."""
