"""Utilities: visualization, logging, profiling."""
