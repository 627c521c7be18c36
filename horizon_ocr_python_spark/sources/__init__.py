"""Sources: deterministic synthetic pages generation + table readers."""
