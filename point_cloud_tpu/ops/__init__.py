"""Device kernels: exact arithmetic, sorting, segmented reductions."""
