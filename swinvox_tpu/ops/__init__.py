"""Compute ops: attention kernels, losses, voxel metrics."""
