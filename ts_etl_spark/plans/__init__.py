"""Physical-plan introspection helpers (scale hygiene checks)."""
