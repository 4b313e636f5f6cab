"""Batched multi-sequence runtime: N independent VIO sequences advanced in
lockstep through vmapped device programs (one dispatch + one fetch per tick
drives all N streams). See rd_vio_tpu.batch.runtime.BatchedVIO."""

from rd_vio_tpu.batch.runtime import BatchedVIO, run_sequences_lockstep

__all__ = ["BatchedVIO", "run_sequences_lockstep"]
