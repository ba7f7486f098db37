"""Round-3 targeted question: with the FUSED bounce (per-hop dispatch cost
gone), does per-bounce spatial re-sorting (sort_every=1/2) restore enough
tile coherence to beat the 3.59 Mrays/s brute split-sweep at 10k spheres?

The pre-outage sweep (sort_every in {0,2,4,8}) was measured on the
3-program bounce whose ~20 ms/bounce hop cost drowned any sort benefit;
the fused bounce changes the economics, and sorting is the only lever that
attacks the post-scatter incoherence that makes per-tile culling sweep
near-full reach. One process, interleaved variants, best-of-rounds
(CLAUDE.md thermal rules)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo/scripts")
from bench_binned_tpu import make_renderer, drive  # noqa: E402

import jax.numpy as jnp  # noqa: E402


class A:
    n = 10_000
    width, height, depth = 512, 384, 24
    spp, bounces = 4, 8
    streams = None
    inflight = None
    nee = False


def main():
    args = A()
    variants = [(1, 64), (1, 128), (1, 256), (2, 128), (2, 256),
                (0, 256), (0, 512), (4, 128)]
    r = make_renderer(args, sort_every=1)
    t0 = time.perf_counter()
    drive(r, args.spp, args.bounces)  # compile (incl. shuffle) + warm
    print(f"# warm {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    best = {v: 0.0 for v in variants}
    for rep in range(2):
        for v in variants:
            se, kn = v
            r.sort_every = se
            r.k_near = jnp.asarray(kn, jnp.int32)
            r.reset()
            r.stats.rays = 0
            r.stats.wall_s = 0.0
            rays, dt = drive(r, args.spp, args.bounces)
            rate = rays / dt
            best[v] = max(best[v], rate)
            print(f"# se={se} kn={kn} rep={rep}: {rate/1e6:.2f} M",
                  file=sys.stderr, flush=True)
    for v, rate in sorted(best.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"sort_every": v[0], "k_near": v[1],
                          "rays_per_s": round(rate)}))


if __name__ == "__main__":
    main()
