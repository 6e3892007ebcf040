"""Nn layer: label scorers, encoders, trainers (reference: src/Nn)."""
