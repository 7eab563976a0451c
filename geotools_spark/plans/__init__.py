"""Execution plans: partitioned checkpointed writes, per-partition
lineage + metrics, resumable runs (north rule: 'resumable from
checkpoint with per-partition lineage + metrics')."""
