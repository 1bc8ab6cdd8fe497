"""Operator library — each module registers oracle-checked queries."""
