"""Spark column expressions + vectorized pandas/Arrow UDFs."""
