"""Data subsystem: codecs, dataset indexes, transforms, host pipeline."""
