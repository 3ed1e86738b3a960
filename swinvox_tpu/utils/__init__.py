"""Utilities: logging, meters, visualization, caches."""
