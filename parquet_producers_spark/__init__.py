"""parquet_producers_spark — a PySpark-native sorted-Parquet producer engine
with a per-column lightweight-compression layer.

Built from scratch against the behavioral spec of
danielearwicker/Parquet.Producers (see /root/repo/SURVEY.md):

* sorted key–value "producer" datasets with incremental update/delete
  reconciliation, chained stages, and versioned resume
  (reference: Parquet.Producers/ParquetProduction.cs — re-expressed here
  as DataFrame joins/unions + ``applyInPandas``, not a port);
* a new codec layer (dictionary, RLE, bit-packing, frame-of-reference /
  delta, FSST-family string compression) with statistics-driven
  auto-selection, implemented as vectorized Arrow/numpy kernels invoked
  through ``mapInArrow`` — zero per-row Python.

Subpackages
-----------
``codecs``     pure numpy/pyarrow encode/decode kernels + auto-selection
``operators``  producer semantics: grouped flat-map, incremental reconcile,
               CDC classification, surrogate-key preservation
``plans``      DAG orchestration, versioned stages, manifests, exact resume
``functions``  training-data-pipeline ops: dedup, similarity search,
               text analysis, multimodal column plumbing
``sources``    table readers/writers (versioned parquet layout)
"""

__version__ = "0.1.0"
