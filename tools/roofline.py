#!/usr/bin/env python
"""Per-kernel roofline / efficiency accounting (VERDICT r2 item 6).

The DP kernels (bsw, phmm, chain, abea) are VPU-bound codes — no MXU
shapes — so the relevant ceiling is the vector unit's elementwise
throughput.  TPU VPU throughput is not published at op granularity; we
use the same nominal as BASELINE.md's bsw accounting, measured-order
constants on this chip:

    VPU_NOMINAL = 5e12 elementwise int32 ops/s/chip (order of magnitude;
    f32 FMA counts as 2 ops).  The bsw 12-op int32 row-update microbench
    (tools/microbench_int16.py) sustains ~1.6e12 ops/s inside a
    lax.scan loop carry, so ~30% of this nominal is the practical
    ceiling for SEQUENTIAL-scan DP codes on this chip — the loop-carried
    dependence, not ALU width, is the binding constraint.

Op models (ops per executed slot; derivation in comments — these are
the kernels' real instruction mixes, not tuned constants):

  bsw    ~40 int32/slot: H/E/F affine recurrences incl. the closed-form
         cummax F (doubling log-steps amortized), band masks, packed
         max+argmax maintenance (ops/bsw.py _bsw_core).
  phmm   ~20 f32 FLOP/cell: M = fm*tmm + fx*txm + fy*tym (5), X/Y 2 FMA
         each (8), emission prior select + mul (3), carry shifts (~4)
         (ops/pairhmm.py forward scan).
  chain  ~60 int32/slot (slot = anchor x window candidate): dq/dr/dd +
         clips (~10), min-span logic (~6), ilog2 (~8), the int32-limb
         fixed-point double gap-cost emulation (~28), masked max+argmax
         (~8) (ops/chain.py _chain_scan).
  abea   ~30 f32 FLOP/band-cell: 3-way max + trace encode (~8), scaled
         Gaussian log-pdf emission (~8: sub/mul/fma/log-lookup), lp_*
         adds + band-edge masks (~8), SK steering amortized (~6)
         (ops/abea.py band scan).

Usage: python tools/roofline.py [SCALE_rNN.json ...]
Reads the newest SCALE_r*.json (and BENCH_r*.json for the bsw headline)
and prints achieved ops/s and share-of-nominal per kernel.  The slot
efficiency for bsw (real cells / executed lane slots) comes from the
recorded row when present, else the documented 0.58 bench-mix value.
"""
import glob
import json
import os
import sys

VPU_NOMINAL = 5.0e12          # elementwise ops/s/chip, order of magnitude
SCAN_PRACTICAL = 1.6e12       # measured sequential-scan ceiling (12-op mix)

OPS = {
    "bsw": ("cells_per_s", 40, "int32/slot", "slot_efficiency"),
    "phmm": ("cells_per_s", 20, "f32 FLOP/cell", None),
    "chain": ("anchors_per_s", 60, "int32/slot x W", "window"),
    "abea": ("band_cells_per_s", 30, "f32 FLOP/cell", None),
}


def rows_from(path):
    with open(path) as f:
        data = json.load(f)
    return {r["workload"]: r for r in data if "workload" in r}


def main():
    paths = sys.argv[1:] or sorted(glob.glob("SCALE_r*.json"))
    if not paths:
        sys.exit("no SCALE_r*.json found")
    rows = rows_from(paths[-1])
    print(f"# roofline accounting from {paths[-1]}")
    print(f"# nominal VPU {VPU_NOMINAL:.1e} ops/s; practical sequential-"
          f"scan ceiling {SCAN_PRACTICAL:.1e} (measured 12-op scan mix)")
    hdr = f"{'kernel':7s} {'unit rate':>12s} {'ops/unit':>9s} " \
          f"{'achieved ops/s':>15s} {'%nominal':>9s} {'%scan-ceil':>10s}"
    print(hdr)
    out = {}
    for kernel, (rate_key, ops, unit, extra) in OPS.items():
        r = rows.get(kernel)
        if not r or rate_key not in r:
            print(f"{kernel:7s} {'- no row -':>12s}")
            continue
        rate = float(r[rate_key])
        eff_note = ""
        # prefer the profiler-separated device rate when the row carries
        # device seconds (SCALE_r03+): compute-bound share needs the
        # kernel's own time, not a transfer-inclusive wall
        if r.get("device_s") and r.get("wall_s"):
            rate = rate * float(r["wall_s"]) / float(r["device_s"])
            eff_note += f"  (device_s={r['device_s']})"
        if kernel == "bsw":
            # executed slots = real cells / slot efficiency
            se = float(r.get("slot_efficiency", 0.58))
            rate = rate / se
            eff_note += f"  (slot eff {se:.2f})"
        if kernel == "chain":
            w = int(r.get("window", 128))
            rate = rate * w
            eff_note += f"  (W={w} candidate slots/anchor)"
        achieved = rate * ops
        out[kernel] = dict(achieved_ops_per_s=achieved,
                           pct_nominal=100 * achieved / VPU_NOMINAL,
                           pct_scan_ceiling=100 * achieved / SCAN_PRACTICAL)
        print(f"{kernel:7s} {rate:12.3e} {ops:9d} {achieved:15.3e} "
              f"{100*achieved/VPU_NOMINAL:8.1f}% "
              f"{100*achieved/SCAN_PRACTICAL:9.1f}%{eff_note}")
    print(json.dumps({"roofline": out}))


if __name__ == "__main__":
    main()
