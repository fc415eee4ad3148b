"""Placeholder — operators land in a later milestone."""
