"""geo_ray — a Ray-Data-native S2 spatial-join + tiling engine.

Built from scratch against the observable semantics of golang/geo
(reference checkout at /root/reference, cited as ``s2/<file>.go:<line>``
in docstrings).  The execution model is idiomatic Ray Data: every
per-record operator is a vectorized numpy/pyarrow kernel invoked from
``Dataset.map_batches`` over zero-copy Arrow batches; stateful stages
(polygon indexes, codecs) are actor pools; wide steps are
groupby/sort/repartition keyed on the Hilbert-ordered ``cell_id``.

Layout:
  functions/  pure numpy/scalar kernels: stuv, cellid, latlng, metric,
              predicates (robust sign ladder), chord distances
  state/      driver-side region objects + coverings + broadcastable
              join state (cap, rect, loop, polygon, cellunion, coverer)
  stages/     map_batches stages: assign, join, knn, tiles, dedup, text
  sources/    synthetic image table generator, image codecs, io helpers
  pipelines/  flagship spatial-join + tiling pipeline, checkpointing
"""

__version__ = "0.1.0"
