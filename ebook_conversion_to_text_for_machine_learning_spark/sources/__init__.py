"""Table sources and adapters."""
