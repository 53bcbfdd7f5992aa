from pyvectorsearch_spark.index.grid import GridIndex  # noqa: F401
from pyvectorsearch_spark.index.ivf import IVFIndex  # noqa: F401
