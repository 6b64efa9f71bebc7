"""Experiment entry points (reference: experiments/ + data/preprocessing CLIs)."""
