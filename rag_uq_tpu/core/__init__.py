"""Core types, configuration, and mesh/sharding helpers."""
