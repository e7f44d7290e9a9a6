"""Standalone CLI plane: sender/receiver processes, demos, device tools."""
