"""Structured Streaming twins of the batch-declared K-row operators."""
