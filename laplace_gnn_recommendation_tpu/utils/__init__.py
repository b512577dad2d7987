"""Utility layer: tensor helpers, profiling, visualization."""
