from pyvectorsearch_spark.operators.knn import (  # noqa: F401
    knn_join,
    knn_join_blocked,
    range_join,
    topk_global,
)
