"""Capture a device profile of the flagship chunk and print the top ops."""

import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from kmers_tpu.pipelines.canonical_count import _chunk_count

    L = 1 << 26
    rng = np.random.default_rng(0)
    data = jax.device_put(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    )
    out = _chunk_count(data, 31, True)
    int(np.asarray(out[3]))  # warm

    jax.profiler.start_trace("/tmp/tb_chunk")
    for _ in range(2):
        out = _chunk_count(data, 31, True)
        int(np.asarray(out[3]))
    jax.profiler.stop_trace()
    print("trace files:", glob.glob("/tmp/tb_chunk/**/*", recursive=True))


if __name__ == "__main__":
    main()
