"""Streaming/CDC ingest: change-stream buffering, squash, and merge."""
