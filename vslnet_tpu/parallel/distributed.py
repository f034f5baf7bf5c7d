"""Multi-host (multi-process) utilities.

The reference is strictly single-process (SURVEY.md §2.7). For pod-scale
training each host runs this same program: `initialize()` wires up
jax.distributed, and the train records are host-sharded by process index so
every host feeds its local chips a disjoint slice — the GSPMD gradient
all-reduce then spans all chips via ICI/DCN. Single-process runs are
unaffected (everything no-ops to identity).
"""
import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Wire up jax.distributed for multi-host runs; no-op when the runtime
    is already initialized or when running single-process with no
    coordinator configured."""
    if coordinator_address is None and num_processes is None:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:
        return False  # already initialized


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def host_shard(records, index=None, count=None):
    """Deterministic per-host slice of a record list: records[i::count].

    Slices are disjoint, cover the input, and differ in size by at most 1.
    Applied to the TRAIN split only — evaluation runs the full set on every
    host so metrics agree without a gather.
    """
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    if count <= 1:
        return records
    return records[index::count]
