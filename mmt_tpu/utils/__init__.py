"""Shared utilities: logging, profiling."""
