"""Calibrated evaluation protocol: metrics, bootstrap CIs, plots."""
