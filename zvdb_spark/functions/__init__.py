from zvdb_spark.functions.vector import (  # noqa: F401
    as_double_array,
    cosine_sim,
    dist_sq,
    dot,
    l2_norm,
)
