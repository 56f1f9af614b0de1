"""Communication/compute scaling model for mesh runs.

No multi-chip hardware is attached to this environment, so multi-chip
step times cannot be measured; this tool turns MEASURED single-chip
numbers plus the KNOWN collective schedule of the sharded step (the
explicit all_to_all pencil solve + overlapped ppermute halos,
parallel/spectral.py, parallel/halo.py) into projected step times and
scaling efficiencies. Every assumption is printed. The projection is
a model, not a measurement -- labelled as such in BENCHMARKS.md.

Model:
  T_P = T_compute / P + T_a2a(P) [+ T_halo ~ 0: measured overlapped]
  a2a bytes leaving each device per solve = 4 transposes x
      field_bytes * (P-1) / P^2          (each repartition moves the
                                          off-diagonal blocks once)
  ICI: v5e has 4 links/chip at ~45 GB/s/direction after overheads;
  an all_to_all saturates the torus near the per-chip injection rate,
  so t_a2a = bytes_per_device / ICI_BW with ICI_BW = 45e9 (1 link
  equivalent, conservative: no credit for multi-link injection).
  DCN (multi-host rows, make_hybrid_mesh): 25 GB/s/host assumed.

Run: python tools/scaling_model.py
"""

import argparse

ICI_BW = 45e9          # bytes/s per chip, conservative injection rate
DCN_BW = 25e9          # bytes/s per host


def project(name, n_interior, nm, t1_ms, ps, bw=ICI_BW,
            solves_per_step=1):
    field_bytes = nm * n_interior * n_interior * 4     # f32
    print(f"\n{name}: measured single-chip step {t1_ms:.2f} ms, "
          f"field {field_bytes/1e6:.0f} MB")
    print(f"  {'P':>4} {'compute':>9} {'a2a':>8} {'T_P':>8} "
          f"{'efficiency':>10}")
    for p in ps:
        bytes_dev = (4 * solves_per_step * field_bytes
                     * (p - 1) / (p * p))
        t_comm = bytes_dev / bw * 1e3
        t_p = t1_ms / p + t_comm
        eff = t1_ms / (p * t_p)
        print(f"  {p:>4} {t1_ms/p:>7.2f}ms {t_comm:>6.2f}ms "
              f"{t_p:>6.2f}ms {eff:>9.0%}")


def weak(name, t1_ms, field_bytes_per_chip, ps, bw=ICI_BW):
    """Weak scaling: grid area grows with P (per-chip work constant)."""
    print(f"\n{name} (weak scaling, {field_bytes_per_chip/1e6:.0f} "
          f"MB/chip kept constant):")
    print(f"  {'P':>4} {'a2a':>8} {'T_P':>8} {'efficiency':>10}")
    for p in ps:
        bytes_dev = 4 * field_bytes_per_chip * (p - 1) / p
        t_comm = bytes_dev / bw * 1e3
        t_p = t1_ms + t_comm
        print(f"  {p:>4} {t_comm:>6.2f}ms {t_p:>6.2f}ms "
              f"{t1_ms/t_p:>9.0%}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dcn", action="store_true",
                    help="use DCN bandwidth (multi-host rows)")
    args = ap.parse_args()
    ps = (4, 8, 16, 64)

    for links, label in ((1, "conservative: 1-link injection"),
                         (3, "realistic: 3 of 4 torus links")):
        bw = (DCN_BW if args.dcn else ICI_BW) * links
        print(f"\n=== {label} ({bw/1e9:.0f} GB/s/chip) ===")
        # measured single-chip step times (BENCHMARKS.md round-2 table)
        project("NAtl 4801^2x3 f32 (strong)", 4799, 3, 87.0, ps, bw)
        project("double-gyre 961^2x3 f32 (strong)", 959, 3, 1.39,
                ps, bw)
        weak("NAtl-density per chip", 87.0, 3 * 4799 * 4799 * 4,
             ps, bw)

    print("""
Notes:
- halos: ppermute cost is <1% of the stencil phase and the 'overlap'
  schedule hides it entirely (BENCHMARKS.md 'Halo exchange') -- not
  modelled.
- strong-scaling a2a time falls ~1/P (bytes/device ~ (P-1)/P^2), so
  efficiency RISES back toward the compute bound at large P; the dip
  at small P is the first transpose paying the full bisection.
- the model gives the a2a no credit for pipelining with the per-block
  MXU transform stages; the tree-form block spectra make that overlap
  implementable, so these are lower bounds on achievable efficiency.
""")


if __name__ == "__main__":
    main()
