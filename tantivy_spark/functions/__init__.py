"""Scalar text functions used by analyzers."""
