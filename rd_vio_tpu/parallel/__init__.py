"""Multi-chip scaling: device mesh + landmark-sharded distributed Schur BA."""
