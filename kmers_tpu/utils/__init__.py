"""Observability, configuration, and persistence utilities."""

from .metrics import BatchStats, Metrics
from .checkpoint import (
    save_count_table,
    load_count_table,
    input_manifest_entry,
)
from .debug import checked, checked_mode, set_checked
from .profiling import trace, annotate, device_op_times, profile_step
