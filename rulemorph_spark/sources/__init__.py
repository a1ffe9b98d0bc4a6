"""Corpus-scale source readers (robust ingestion with quarantine)."""

from .corpus import read_csv_quarantine, read_ndjson_quarantine

__all__ = ["read_ndjson_quarantine", "read_csv_quarantine"]
