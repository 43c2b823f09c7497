"""Pipeline compositions: the flagship spatial-join + tiling pipeline,
checkpoint manifests, metrics."""
