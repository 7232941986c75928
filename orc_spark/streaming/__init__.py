"""Structured Streaming surface: continuous crawl ingestion."""
