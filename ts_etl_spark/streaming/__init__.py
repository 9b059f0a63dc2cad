"""Structured Streaming operators (SURVEY.md §2.4: event-time windows,
watermarks, late-data handling, custom stateful processing)."""
