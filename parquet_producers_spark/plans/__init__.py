"""DAG orchestration and versioned stage state."""
