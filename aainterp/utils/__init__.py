"""Utilities: I/O, operator cache, logging/profiling."""
