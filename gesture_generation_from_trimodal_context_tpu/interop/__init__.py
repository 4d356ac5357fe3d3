"""Interop with the reference PyTorch implementation (checkpoint import)."""
