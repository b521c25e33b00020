from data_sync_spark.operators.dedup import (  # noqa: F401
    lww_collapse,
    lww_collapse_salted,
    lww_collapse_window,
)
from data_sync_spark.operators.route import route_filter  # noqa: F401
from data_sync_spark.operators.columns import (  # noqa: F401
    column_filter,
    schema_conform,
)
from data_sync_spark.operators.transforms import (  # noqa: F401
    get_transform,
    register_transform,
)
