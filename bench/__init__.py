"""Measurement harness (SURVEY.md §6): per-kernel rooflines, end-to-end
streaming throughput, and mesh-scaling curves.

The reference publishes no numbers (BASELINE.md), so this package IS the
baseline: it probes the chip's achievable memory bandwidth and matmul rate
empirically, then reports every kernel as a fraction of that roofline.

Run:
    python -m bench.kernels      # per-kernel microbench + rooflines
    python -m bench.rx_e2e       # end-to-end streaming RX configs 1-4
    python -m bench.scaling      # weak scaling over a device mesh
Each writes bench/results_<name>_<backend>.json.
"""
