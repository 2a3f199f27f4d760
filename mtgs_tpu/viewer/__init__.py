"""Interactive scene viewer (stdlib-only HTTP, no viser dependency)."""

from mtgs_tpu.viewer.server import ViewerServer
