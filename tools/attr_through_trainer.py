"""Attribute the through-trainer gap (VERDICT r3 #3).

bench.py measures two ends of the same pipeline at Music-small shapes:
the device-resident chunked train loop (~26k samples/s) and the real
Trainer.fit (~4.6k).  This probe times each stage the real loop adds, on
the same synthetic packed dataset bench.py uses, so the gap decomposes
into measured parts instead of suspicion:

  A. loader-only: BatchLoader fancy-indexing + dead-padding (host)
  B. loader + chunk stacking (chunk_stream with an identity "transfer")
  C. B + device_put of each stacked chunk (the real transfer, incl. the
     relay round trip) + one lazy readback at the end
  D. RNG fold_chunk dispatch per chunk
  E. full Trainer.fit wall (bench.py's through_trainer; re-measured here
     for a same-session number)

    python tools/attr_through_trainer.py [--n 16384] [--k 10]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umpr_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import bench
    from umpr_tpu.data.loader import BatchLoader, chunk_stream

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(9)
    ds = bench.synthetic_packed_dataset(args.n, rng)
    n_steps = args.n // args.batch

    def loader():
        return BatchLoader(ds, args.batch, shuffle=True, ignore_photos=True,
                           seed=3, workers=2)

    # A: loader only (pure host)
    for _ in range(2):
        t0 = time.perf_counter()
        cnt = sum(1 for _ in loader())
        a = (time.perf_counter() - t0) / cnt * 1e3
    print(f"A loader fancy-index+pad      : {a:6.2f} ms/step", flush=True)

    # B: + chunk stacking (identity transfer, drain the prefetch thread)
    for _ in range(2):
        t0 = time.perf_counter()
        steps = 0
        for dev, _x, chunked in chunk_stream(loader(), args.k,
                                             put_chunk=lambda s: s,
                                             put_single=lambda b: b,
                                             extract=lambda hb: None):
            steps += args.k if chunked else 1
        b_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"B + chunk stack (host)        : {b_ms:6.2f} ms/step", flush=True)

    # C: + real device transfer per chunk
    for _ in range(2):
        t0 = time.perf_counter()
        steps = 0
        last = None
        for dev, _x, chunked in chunk_stream(loader(), args.k,
                                             put_chunk=jax.device_put,
                                             put_single=jax.device_put,
                                             extract=lambda hb: None):
            last = dev
            steps += args.k if chunked else 1
        jax.block_until_ready(last)
        float(np.asarray(last["ratings"]).ravel()[0])  # relay sync
        c_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"C + device_put per chunk      : {c_ms:6.2f} ms/step", flush=True)

    # D: RNG fold dispatch per chunk
    import jax.numpy as jnp
    offs = jnp.arange(args.k, dtype=jnp.uint32)
    fold = jax.jit(lambda key, start: jax.vmap(
        lambda j: jax.random.fold_in(key, j))(start + offs))
    base = jax.random.PRNGKey(0)
    r = fold(base, 0)
    jax.block_until_ready(r)
    n_chunks = max(1, n_steps // args.k)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        r = fold(base, i)
    jax.block_until_ready(r)
    d_ms = (time.perf_counter() - t0) / n_chunks / args.k * 1e3
    print(f"D rng fold dispatch           : {d_ms:6.2f} ms/step "
          f"(HISTORICAL: round 5 moved the fold in-graph -- multi_step "
          f"derives keys from (base_rng, start) -- so the real fit no "
          f"longer pays this dispatch)", flush=True)

    # E: the full real loop (same code path bench.py records).  Stages
    # A-D time the STREAMING pipeline's costs, so the residue must use
    # the streaming fit wall -- the device-resident default ships indices
    # instead and would make the subtraction cross two code paths
    # (ADVICE r4 #1); guard the None return of a too-short run.
    e = bench.bench_through_trainer(n=args.n, epochs=3, k_dispatch=args.k,
                                    workers=2)
    if e is None or not e.get("streaming_samples_per_sec"):
        print("E Trainer.fit wall            : unavailable (run too short "
              "for steady-state epochs)", flush=True)
        return
    print(f"E fit wall, resident default  : "
          f"{args.batch / e['samples_per_sec'] * 1e3:6.2f} ms/step "
          f"({e['samples_per_sec']:.0f} samples/s)", flush=True)
    e_ms = args.batch / e["streaming_samples_per_sec"] * 1e3
    print(f"E fit wall, streaming         : {e_ms:6.2f} ms/step "
          f"({e['streaming_samples_per_sec']:.0f} samples/s)", flush=True)
    print(f"   device-loop reference       : see bench.py chunked "
          f"(~{64 / 26000 * 1e3:.2f} ms/step)")
    # residue excludes D: the chunk-rng fold runs in-graph since round 5
    # (step.py make_multi_train_step), so the streaming fit wall never
    # pays that dispatch and subtracting it would understate the residue
    print(f"   unattributed residue E-C-dev: "
          f"{e_ms - c_ms - 64 / 26000 * 1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
