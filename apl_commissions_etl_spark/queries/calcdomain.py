"""Populated incrementally; see registry.py."""
