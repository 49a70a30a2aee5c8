"""Realtime ingestion + hybrid tables (Structured Streaming)."""
