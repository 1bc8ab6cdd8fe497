"""Plan inspection helpers."""
