"""Host-side utilities: point-cloud IO, config plumbing."""
