"""Utilities: profiling, logging, quantization helpers."""
