"""Structured Streaming surface: continuous candidate ingestion."""
