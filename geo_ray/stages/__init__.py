"""map_batches stage library: stateless vectorized kernels and
stateful actor-pool callables for Ray Data pipelines."""
