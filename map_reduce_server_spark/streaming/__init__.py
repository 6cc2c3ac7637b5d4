"""Structured Streaming front-ends (the reference's job queue and
event-time analytics, re-expressed as streams)."""
