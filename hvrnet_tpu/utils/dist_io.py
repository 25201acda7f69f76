"""Filesystem-rendezvous result merging for distributed inference/eval.

Counterpart of the reference's `tools/test.py:collect_selsa_results_cpu`
(`/root/reference/tools/test.py:546-589`): every rank dumps its LOCAL result
list to a part file, rank 0 barriers (here: polls for the files, which are
written atomically) and concatenates the rank blocks in order.  Whole videos
are dealt to ranks in order by ``VIDSeqDataset.get_indices``, so rank-block
order IS global frame order.
"""
from __future__ import annotations

import os
import pickle
import time


def trim_to_local(results, dataset, rank: int):
    """Cut a rank's runner output down to its shard.

    The runner places detections at per-rank LOCAL frame ids (the dataset
    rebases ``frame_id`` in ``get_indices``), so a rank's frames occupy the
    leading ``local_frame_size_list[rank]`` slots of its result list."""
    return results[:dataset.local_frame_size_list[rank]]


def dump_part(results, tmpdir: str, rank: int) -> str:
    """Atomically persist one rank's local results as ``part_{rank}.pkl``."""
    os.makedirs(tmpdir, exist_ok=True)
    part = os.path.join(tmpdir, f"part_{rank}.pkl")
    with open(part + ".tmp", "wb") as f:
        pickle.dump(results, f)
    os.replace(part + ".tmp", part)   # atomic: never seen half-written
    return part


def collect_results(tmpdir: str, world_size: int, total: int):
    """Concatenate per-rank LOCAL part pickles in rank order and truncate
    (reference `tools/test.py:573-585` — ``part_list.extend`` then
    ``[:size]``)."""
    merged = []
    for r in range(world_size):
        with open(os.path.join(tmpdir, f"part_{r}.pkl"), "rb") as f:
            merged.extend(pickle.load(f))
    return merged[:total]


def wait_for_parts(paths, timeout: float = 3600.0, poll: float = 0.5):
    """Filesystem rendezvous replacing the reference's dist.barrier
    (test.py:568): rank 0 blocks until every rank's part file exists, or
    raises on timeout."""
    deadline = time.time() + timeout
    while True:
        missing = [p for p in paths if not os.path.isfile(p)]
        if not missing:
            return
        if time.time() > deadline:
            raise TimeoutError(
                f"timed out after {timeout:.0f}s waiting for rank part "
                f"files: {missing}")
        time.sleep(poll)
