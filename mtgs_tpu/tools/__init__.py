"""User-facing tools: trajectory rendering, training CLI, benchmark farm."""
