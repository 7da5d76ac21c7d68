"""Driver-contract pipelines (queries/oracles for __ray_entry__.py)."""
