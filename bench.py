"""Headline benchmark: Mrays/s on the Cornell-box NEE path tracer.

Mirrors the reference's live meter `Mrays/sec = W*H*samples/elapsed`
(/root/reference/src/device_renderer/main.cpp:250).  The reference
publishes no numbers (BASELINE.md), so vs_baseline is reported against
this repo's own recorded first-light figure (BENCH_r*.json history).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from aten_tpu.integrator.pathtracer import render_sample
    from aten_tpu.scene.scenedefs import cornell_box

    width = height = 512
    # Measured on TPU v5e (axon): per-execution dispatch latency is a
    # flat ~50 ms floor regardless of payload up to spp_chunk=128
    # (~33M paths/execution) — the device is underfed below that.  A
    # renderer should therefore batch MANY samples per dispatch; 128 spp
    # per execution amortizes the bubble 32x vs the old chunk of 4
    # (19.8 -> ~680 Mrays/s measured) while 512x512x128 path state still
    # fits HBM comfortably.
    spp_chunk = 128
    max_depth = 5
    scene, cam = cornell_box(width, height)
    cam_arrays = cam.arrays()

    def run(frame, sample):
        return render_sample(
            scene, cam_arrays, width, height, frame, sample,
            spp_chunk, max_depth, 3,
        )

    # warmup / compile
    run(jnp.uint32(0), jnp.uint32(0)).block_until_ready()

    iters = 16
    t0 = time.perf_counter()
    # accumulate AFTER the loop: a per-iteration host-side `acc + img`
    # chain serializes dispatch (measured +70% per iter) and would time
    # the host bubble, not the renderer
    imgs = [run(jnp.uint32(1), jnp.uint32(i)) for i in range(iters)]
    acc = sum(imgs[1:], imgs[0])
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    primary_rays = width * height * spp_chunk * iters
    mrays = primary_rays / dt / 1e6
    # Self-baseline: round-1 first-light figure on TPU v5e (see BASELINE.md:
    # reference publishes no numbers, so parity ratio is vs our own history).
    baseline_mrays = 0.3973
    print(
        json.dumps(
            {
                "metric": "cornell_512_primary_mrays_per_s",
                "value": round(mrays, 4),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline_mrays, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
