"""entity_linkings_spark — a PySpark-native record-linkage / entity-linking engine.

A from-scratch re-expression of the capabilities of naist-nlp/entity-linkings
(reference read-only at /root/reference) as an idiomatic Spark DataFrame pipeline:

    mention extraction  ->  normalization  ->  blocking (token + MinHash-LSH)
        ->  pairwise scoring (batched Arrow/pandas UDF)
        ->  threshold  ->  connected components (large-star/small-star)
        ->  entity clusters + top-1 resolution + set-based evaluation

The reference's dataflow (mention detection -> candidate retrieval -> reranking
-> top-1 -> evaluation; see /root/reference/entity_linkings/pipeline.py:23-53)
is reproduced with declarative DataFrame plans so Catalyst/Tungsten/AQE pick the
physical strategy. Nothing here is a port of the reference's row-at-a-time Python.
"""

from entity_linkings_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
