"""Dataset-level constraints — the cross-row operators the reference
implies but never scales (SURVEY.md §2.6): uniqueness, referential
integrity, column statistics, distribution drift, row invariants."""

from .unique import unique_violations, unique_violations_table  # noqa: F401
from .foreign_key import fk_violations, fk_violations_table  # noqa: F401
from .stats import (  # noqa: F401
    ColumnStats, StatsPartialStage, column_stats, column_stats_table,
)
from .drift import (  # noqa: F401
    DriftReport, categorical_drift, ks_statistic, numeric_drift,
    numeric_drift_from_stats,
)
from .row_invariant import (  # noqa: F401
    content_rollup, content_rollup_table, with_sha256,
)
from .heavy_hitters import heavy_hitters  # noqa: F401
from .diff import snapshot_diff  # noqa: F401
