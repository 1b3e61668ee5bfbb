"""Shared utilities: observability (logging, phase timing, ROI markers,
memory introspection) — see observability.py."""
