"""Offline data factory: multi-traversal LiDAR registration and the
preprocessing stage pipeline (counterpart of `nuplan_scripts/` in
OpenDriveLab/MTGS)."""
