"""Shared utilities: native library loader, logging."""
