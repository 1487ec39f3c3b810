"""Conversion pipeline: device batch dedup + host cell store."""
