"""Datasets, simulation, trajectory IO and evaluation (ref: app/ toolkit)."""
