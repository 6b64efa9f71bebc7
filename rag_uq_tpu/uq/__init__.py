"""Uncertainty quantification: MC sampling + split conformal prediction."""
