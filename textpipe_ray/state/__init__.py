"""Job state: per-partition lineage ledger + counter metrics."""
