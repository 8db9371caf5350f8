"""Differential numeric parity against the reference TF implementation."""
