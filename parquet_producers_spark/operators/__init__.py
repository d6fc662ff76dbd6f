"""Producer operators: grouped flat-map, incremental reconcile, CDC,
multi-feeder merge, surrogate-key preservation."""
