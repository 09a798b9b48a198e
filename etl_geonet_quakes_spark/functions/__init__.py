"""Scalar expression kits shared across operators."""
