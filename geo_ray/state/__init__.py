"""Driver-side region objects and broadcastable join state.

These are small scalar structures (polygon sets, coverings, cell
geometry) built once on the driver or in actor ``__init__``; the big
data never flows through this layer.
"""
