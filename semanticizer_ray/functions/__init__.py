"""Scalar / vectorized functions: normalization, string metrics, sketches."""
