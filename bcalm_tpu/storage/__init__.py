"""Persistent stage storage (checkpoint/resume)."""
