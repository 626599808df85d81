"""Maintenance jobs: compaction and append-only history ledgers."""
