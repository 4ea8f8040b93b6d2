"""Resumable multi-stage pipeline plans."""
