from .checkpoint import CheckpointManager, plan_partitions, run_partitioned  # noqa: F401
