"""pyvectorsearch_spark — a PySpark-native analytics engine with the query
capabilities of the reference library sitmo/pyvectorsearch (an exact k-NN /
range-search spatial index, ``/root/reference/include/pktree.hpp``), rebuilt
Spark-first and extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md):

- DataFrame/SQL declarative plans; Catalyst handles pushdown/pruning/codegen.
- Vector math as native columnar expressions (``zip_with`` + ``aggregate``),
  never row-at-a-time Python UDFs; numpy-backed ``mapInPandas`` only for the
  blocked top-k fast path where a matrix multiply genuinely wins.
- The PK-tree index (reference ``include/pktree.hpp:300-311``) becomes a
  closed-form grid ``cell_id`` column + partitioned Parquet + a tiny cell-stats
  table — no pointer tree, any executor computes any cell id with zero
  communication.
"""

__version__ = "0.1.0"

from pyvectorsearch_spark.api import (  # noqa: F401
    IVFIndex,
    IVFPQIndex,
    VectorIndex,
    knn_bruteforce,
    range_bruteforce,
    topk_global,
)
from pyvectorsearch_spark.session import get_spark  # noqa: F401
