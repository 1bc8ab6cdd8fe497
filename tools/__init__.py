"""Repo tooling (driver simulation, plan audit, forensics)."""
