"""Sources & sinks: CSV-with-COPY-options scan, GTFS static zip ingest,
GTFS-RT feed flattening, idempotent file loader."""
