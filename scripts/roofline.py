"""Roofline accounting vs TPU v5e peaks (VERDICT r4 item 5).

Derives achieved FLOP/s and bytes/s for the two hot kernels from
(a) analytic operand/IO byte counts computed from the ACTUAL plans
    (make_omnibus_plan / make_pool_plan on the benched configs), and
(b) the recorded on-chip timings (DESIGN.md §4c/§6, BASELINE.md),
and prints them against the v5e single-chip peaks so the "measured
floor" claims are falsifiable from the numbers alone.

Pure host-side analysis: no TPU needed (runs the plan builders only).

    /opt/venv/bin/python scripts/roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# -- v5e single-chip peaks (public spec) -------------------------------------
PEAK_BF16_FLOPS = 197e12  # MXU, bf16
PEAK_HBM_BPS = 819e9      # HBM bandwidth

# -- recorded on-chip measurements this analysis combines --------------------
# Omnibus offline kernel (default 6-band 44.1 kHz config, chunk 2^21):
OMNIBUS_TILE = 16384
OMNIBUS_US_PER_TILE = 42.0   # device trace: 5.37 ms custom call / 128 tiles
                             # (DESIGN.md §4c; round-4 bench 5.61 ms/2^21
                             # end-to-end = 43.8 µs incl. scan glue)
OMNIBUS_MACS_PER_TILE = 1.59e9  # executed dot inventory incl. bf16x3 passes
                                # (scripts/bench_kernel_attrib.py; DESIGN §4c)

# Pallas serving pool (4-band 48 kHz Bela config, hw=2048, G=16):
POOL_S = 4096
POOL_MS_PER_BLOCK = 9.15     # B=4096 capacity peak (BASELINE.md quarters row)
POOL_FLOOR_S = 2048
POOL_FLOOR_MS = 1.83         # pure-copy floor, G-invariant (bench_pool_floor)
POOL_BODY_MS = 6.51 - 1.83   # per-bucket VPU body at S=2048 (DESIGN §6)
POOL_BODY_MB_PER_STEP = 17.5  # materialized intermediates per grid step
                              # (mid of the 15-20 MB decomposition, DESIGN §6)


def offline_plan_bytes():
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import _plan_buckets
    from upmix_tpu.ops.pallas_omnibus import make_omnibus_plan

    cfg = UpmixConfig.make(
        [0.0, 300.0, 1000.0, 3000.0, 8000.0, 14000.0], sr=44100.0
    )  # the default bench config (bench.py EDGES)
    plan, leftover = make_omnibus_plan(_plan_buckets(cfg, 1 << 21), 1 << 21)
    assert plan is not None and not leftover
    weight_bytes = sum(int(a.nbytes) for a in plan.arrays())
    io_bytes = (2 + 3) * plan.tile * 4  # stereo in + LCR out, f32, per tile
    halo_bytes = 2 * plan.halo * 4
    return plan, weight_bytes, io_bytes, halo_bytes


def pool_plan_bytes(n_streams):
    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.ops.pallas_pool import make_pool_plan

    cfg = UpmixConfig.streaming(
        [0.0, 500.0, 2000.0, 8000.0], sr=48000.0, hw_block_size=2048
    )  # the benched Bela serving config
    plan = make_pool_plan(cfg, 2048, n_streams, group=16)
    assert plan is not None
    # The floor probe's HBM-visible traffic per block: read both
    # channels' [S, window] histories, write 3 [S, hw] outputs.
    hist_read = 2 * n_streams * plan.window * 4
    out_write = 3 * n_streams * plan.hw * 4
    state_rw = 0
    for b in plan.buckets:
        state_rw += 2 * n_streams * 3 * b.B * 4  # read+write [S,3B] OLA accum
    weight_bytes = sum(int(a.nbytes) for a in plan.arrays() if a is not None)
    return plan, hist_read, out_write, state_rw, weight_bytes


def main():
    rows = []

    plan, wbytes, io, halo = offline_plan_bytes()
    t = OMNIBUS_US_PER_TILE * 1e-6
    flops = 2 * OMNIBUS_MACS_PER_TILE / t
    hbm = (io + halo) / t  # weights are grid-resident/looped from HBM once
    hbm_w = (io + halo + wbytes / plan.n_tiles) / t  # amortized weight refetch
    rows.append(
        ("omnibus offline (bf16x3)",
         f"{OMNIBUS_US_PER_TILE:.0f} us/16k-tile",
         f"{flops/1e12:.0f} TFLOP/s ({100*flops/PEAK_BF16_FLOPS:.0f}% MFU)",
         f"IO {hbm/1e9:.1f} GB/s ({100*hbm/PEAK_HBM_BPS:.1f}% HBM); "
         f"+amortized weights {hbm_w/1e9:.1f} GB/s",
         "MXU-pass-bound"))
    print(f"omnibus plan: tile={plan.tile} halo={plan.halo} "
          f"n_tiles={plan.n_tiles} weights={wbytes/2**20:.1f} MB "
          f"io/tile={(io+halo)/2**10:.0f} KB")

    plan, hist, out, state, wbytes = pool_plan_bytes(POOL_S)
    t_full = POOL_MS_PER_BLOCK * 1e-3
    hbm_full = (hist + out + state) / t_full
    # floor at S=2048
    _, hist2, out2, _, _ = pool_plan_bytes(POOL_FLOOR_S)
    t_floor = POOL_FLOOR_MS * 1e-3
    hbm_floor = (hist2 + out2) / t_floor
    steps = POOL_FLOOR_S // 16  # grid steps at G=16
    vpu_body = POOL_BODY_MB_PER_STEP * 2**20 * steps / (POOL_BODY_MS * 1e-3)
    rows.append(
        ("pallas pool full kernel",
         f"{POOL_MS_PER_BLOCK:.2f} ms/block @S={POOL_S}",
         f"MXU hidden (substitution wash, DESIGN §6)",
         f"HBM-visible {hbm_full/1e9:.0f} GB/s "
         f"({100*hbm_full/PEAK_HBM_BPS:.0f}% HBM); "
         f"VPU/VMEM body ~{vpu_body/1e12:.2f} TB/s",
         "VPU-materialization-bound"))
    rows.append(
        ("pallas pool copy floor",
         f"{POOL_FLOOR_MS:.2f} ms/block @S={POOL_FLOOR_S} (G-invariant)",
         "none (pure copy)",
         f"{hbm_floor/1e9:.0f} GB/s ({100*hbm_floor/PEAK_HBM_BPS:.0f}% HBM)",
         "Mosaic materialization, not HBM"))
    print(f"pool plan: window={plan.window} hw={plan.hw} "
          f"buckets={[b.B for b in plan.buckets]} weights={wbytes/2**20:.1f} MB "
          f"hist+out+state/block={(hist+out+state)/2**20:.0f} MB @S={POOL_S}")

    print()
    hdr = ("kernel", "measured", "compute", "bytes", "bound")
    widths = [max(len(str(r[i])) for r in rows + [hdr]) for i in range(5)]
    for r in [hdr] + rows:
        print("  ".join(str(x).ljust(w) for x, w in zip(r, widths)))
    print(f"\npeaks: bf16 {PEAK_BF16_FLOPS/1e12:.0f} TFLOP/s, "
          f"HBM {PEAK_HBM_BPS/1e9:.0f} GB/s (v5e, 1 chip)")


if __name__ == "__main__":
    main()
