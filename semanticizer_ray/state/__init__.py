"""Broadcast / artifact state: anchor dictionary, scoring weights."""
