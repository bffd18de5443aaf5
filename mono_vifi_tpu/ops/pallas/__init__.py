"""Pallas TPU kernels for the framework's hot custom ops."""
