"""Plan inspection utilities (the .explain feedback loop)."""

from bayesiandatafusion_jl_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    n_exchanges,
    pushed_filters,
)
