"""Compute ops: weight generation (overlap1d, clipper, weights) and apply."""
