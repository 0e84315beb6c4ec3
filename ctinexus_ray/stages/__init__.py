"""Ray Data stages: stateless map_batches tasks + actor-pool callable classes."""
