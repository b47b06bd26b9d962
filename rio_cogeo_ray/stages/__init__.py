"""Ray Data stage implementations (map_batches fns + actor-pool classes)."""
