"""Metrics, profiling, logging, plotting utilities."""
