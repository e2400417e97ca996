#!/usr/bin/env python
"""Profile the host lattice finalization (the e2e tail): decode one bench
batch on the chip, then cProfile finalize_batch."""

import cProfile
import io
import pathlib
import pstats
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (reuses the bench workload/decoder builders)


def main():
    graph, scores, lengths, refs = bench.build_hlg_workload()
    dec = bench.make_decoder(graph)
    t0 = time.time()
    res = dec.decode(scores, lengths, chunk_frames=bench.CHUNK_FRAMES)
    print(f"decode (compile+run+download): {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    hyp0 = bench.finalize_batch(res)
    print(f"finalize_batch cold: {time.time() - t0:.2f}s", flush=True)

    res2 = dec.decode(scores, lengths, chunk_frames=bench.CHUNK_FRAMES)
    pr = cProfile.Profile()
    pr.enable()
    t0 = time.time()
    bench.finalize_batch(res2)
    dt = time.time() - t0
    pr.disable()
    print(f"finalize_batch profiled: {dt:.2f}s", flush=True)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
