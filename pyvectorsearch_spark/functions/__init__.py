from pyvectorsearch_spark.functions.vector import (  # noqa: F401
    cosine_sim,
    dot,
    l2_dist,
    l2_sq,
    norm_l2,
)
