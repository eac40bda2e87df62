"""Incremental / streaming execution wrappers."""
