"""Pure, stateless per-record functions used inside ``map_batches`` stages."""
