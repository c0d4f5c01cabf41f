"""Golden fixtures + deterministic synthetic corpus (shared by tests,
the driver contract, and the benchmark)."""
