"""Same-process flagship A/B of the radiance-MLP kernel backends.

Times the full production train step (bench.py measure_train, 512^3
flagship workload) for each kernel in AB_KERNELS (default
"xla,pallas_pe,xla" -- an A/B/A so tunnel drift between the two anchor
runs bounds the noise), pinning the (window, refetch) pair the first run
auto-calibrates so the kernel is the only delta. mlp_kernel="pallas_pe"
is the featurize-in-kernel fused NerfMLP (north-star fusion step 2:
BASELINE.json; the reference materializes per-scan features at
rnerf/models.py:249-254); "pallas" is the feature-fed fused kernel,
"xla" the Dense stack.

Usage: python scripts/ab_mlp_kernel.py  (writes one JSON line per run)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
  kernels = os.environ.get("AB_KERNELS", "xla,pallas_pe,xla").split(",")
  bench.wait_for_backend()
  window = refetch = None
  results = []
  for kernel in kernels:
    os.environ["BENCH_MLP_KERNEL"] = kernel
    if refetch is not None:
      os.environ["BENCH_MARCH_REFETCH"] = str(refetch)
    args = bench.production_args(window=window)
    value, info = bench.measure_train(args, bench.GRID_N)
    if window is None:
      window = info.get("march_window", args.march_window)
      refetch = info.get("march_refetch", args.march_refetch)
    row = {"mlp_kernel": kernel, "rays_per_sec": round(value, 1),
           "march_window": window, "march_refetch": refetch,
           "march_exact": info.get("march_exact"),
           "march_oow": info.get("march_oow")}
    results.append(row)
    print(json.dumps(row), flush=True)
  anchors = [r["rays_per_sec"] for r in results if r["mlp_kernel"] == "xla"]
  summary = {"ab": results}
  if anchors:
    anchor = sum(anchors) / len(anchors)
    summary["anchor_xla_rays_per_sec"] = round(anchor, 1)
    for r in results:
      if r["mlp_kernel"] != "xla":
        summary[f"{r['mlp_kernel']}_vs_xla"] = round(
            r["rays_per_sec"] / anchor, 4)
  print(json.dumps(summary), flush=True)


if __name__ == "__main__":
  main()
