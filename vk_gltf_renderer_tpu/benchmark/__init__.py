"""Benchmark harness (reference utils/benchmark/* port)."""
