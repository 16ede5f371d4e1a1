"""Utilities: config, tracing, timers, fixtures, and accuracy metrics."""
