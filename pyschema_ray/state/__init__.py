"""Subpackage — see module docstrings."""
