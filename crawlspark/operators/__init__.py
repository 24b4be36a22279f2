"""Distributed crawl operators: dedup, sequencing, politeness, robots."""
