"""Structured Streaming wrappers around the ingest path."""
