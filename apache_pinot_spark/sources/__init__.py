"""Sources & sinks: batch ingestion, segment-store layout, maintenance
jobs (purge / re-layout)."""
