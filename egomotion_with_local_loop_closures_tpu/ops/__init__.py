"""Pallas TPU kernels for the hot depth-filter ops."""
