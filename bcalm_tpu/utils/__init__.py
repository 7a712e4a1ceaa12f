"""Utilities: options parsing, tool lifecycle, logging, DNA helpers."""
