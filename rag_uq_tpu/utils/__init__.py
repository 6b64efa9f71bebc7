"""Utilities: timing/profiling hooks and logging setup."""
