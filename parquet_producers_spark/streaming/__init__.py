"""Reserved: the reference is batch-incremental (micro-batch deltas,
README.md:115-144), not a streaming system — incremental maintenance
lives in operators/. Structured-Streaming adapters would land here."""
