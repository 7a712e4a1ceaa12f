"""Brute-force reference implementations used as correctness oracles."""
