"""Placeholder — queries land in M1+."""
