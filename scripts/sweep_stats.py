#!/usr/bin/env python
"""Device-sweep survivor counts + swept e2e at bench scale (round 4)."""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench as B  # noqa: E402
from kaldi_decoder_tpu.fst import path_labels  # noqa: E402


def main():
    graph, scores, lengths, refs = B.build_hlg_workload()
    dec = B.make_decoder(graph)
    t0 = time.time()
    res = dec.decode(scores, lengths, chunk_frames=B.CHUNK_FRAMES)
    t_dec = time.time() - t0
    print(f"decode (incl sweep + survivor download): {t_dec:.2f}s", flush=True)
    for c, chunk in enumerate(res.survivors):
        print(
            f"chunk {c}: tok {chunk['tok_count'].tolist()} "
            f"em {chunk['em_count'].tolist()} eps {chunk['eps_count'].tolist()} "
            f"ovf {chunk['overflow'].tolist()}",
            flush=True,
        )
    t1 = time.time()
    from concurrent.futures import ThreadPoolExecutor

    Bn = scores.shape[0]
    with ThreadPoolExecutor(max_workers=8) as ex:
        bests = list(ex.map(res.best_path, range(Bn)))
    hyps = [path_labels(b) if b is not None else [] for b in bests]
    t_host = time.time() - t1
    audio_s = float(lengths.sum()) * B.FRAME_SECONDS
    print(f"host finalize: {t_host:.2f}s; e2e = "
          f"{audio_s / (t_dec + t_host):.1f} audio-s/s", flush=True)
    if refs is not None:
        from kaldi_decoder_tpu.utils.wer import wer

        print("WER:", wer(refs, hyps), flush=True)


if __name__ == "__main__":
    main()
