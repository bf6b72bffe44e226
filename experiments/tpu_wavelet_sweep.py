"""Wavelet-config tuning sweep (VERDICT r3 #4): lane-aligned padding x
channel-block depth x tile, measured on the real chip via
bench.bench_wavelet (full fixed-iteration solves, real-pixel throughput).

Run SOLO (one chip process at a time). One process for the whole sweep is
safe: every variant is the same fused-Pallas program family (no op probing).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def main():
    variants = [
        # (label, pad_to, channel_block, tile)
        ("r3-baseline unpadded auto", 0, 0, 0),
        ("padded512 auto-cb", 512, 0, 0),
        ("padded512 cb=4", 512, 4, 0),
        ("padded512 cb=4 (128,512)", 512, 4, (128, 512)),
        ("padded512 cb=2 (256,512)", 512, 2, (256, 512)),
        ("padded512 cb=1 (256,512)", 512, 1, (256, 512)),
        ("unpadded cb=4", 0, 4, 0),
    ]
    for label, pad_to, cb, tile in variants:
        try:
            r = bench.bench_wavelet(repeats=3, pad_to=pad_to,
                                    channel_block=cb, tile=tile)
            print(f"{label:28s}: {r['value']:8.1f} Mpix-it/s "
                  f"spread={r['spread']} psnr={r['psnr_db']}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives a bad variant
            print(f"{label:28s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
