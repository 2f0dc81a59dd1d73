"""Quantized NN building blocks as pure functions over parameter pytrees."""
