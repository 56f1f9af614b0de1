"""Generate docs/radiation_coefficients.txt: the init-time radiation
coefficients for all four reference example configurations, printed to
full precision.

The reference prints these quantities at startup "to more significant
figures (as a check when porting the code between different systems)"
(/root/reference/src/WhatsNew.txt:103-106; the printout lives in
/root/reference/src/radsubs.f:241-502).  No Fortran compiler exists in
this environment, so the reference's own numbers cannot be produced
here; this manifest records OUR values in the same spirit -- anyone
with a compiled reference can diff them line by line, and
tests/test_init.py::test_radiation_manifest pins them against
cross-round regressions.

Usage:  python tools/radiation_manifest.py [> docs/radiation_coefficients.txt]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASES = [
    "double_gyre_ocean_only",
    "double_gyre_coupled",
    "southern_ocean_ocean_only",
    "southern_ocean_coupled",
]


def _fmt(v):
    a = np.atleast_1d(np.asarray(v, np.float64))
    return "  ".join(f"{x: .15e}" for x in a)


def manifest_lines(repo_root):
    from qgcm_tpu.config import PRESETS
    from qgcm_tpu.params import parse_input_params, params_to_config
    from qgcm_tpu.grids import build_grids
    from qgcm_tpu.radiation import radiat

    lines = [
        "Radiation coefficients at model initialisation "
        "(radsubs.f:241-502 printout analogue).",
        "One section per reference example configuration; values from "
        "examples/<case>/input.params.",
        "Regenerate with: python tools/radiation_manifest.py",
        "",
    ]
    for case in CASES:
        p = parse_input_params(
            os.path.join(repo_root, "examples", case, "input.params"))
        cfg = params_to_config(p, PRESETS[case]())
        r = radiat(cfg, build_grids(cfg))
        lines.append(f"[{case}]")
        for name in ("fspco", "tmbara", "tmbaro", "toc", "tat",
                     "Bmup", "B1down", "Bup", "Cmup", "C1down", "Cup",
                     "D0up", "Dmup", "Dmdown", "Dup",
                     "rbetat", "rbtmat", "rbtmoc",
                     "tsbdy", "tnbdy",
                     "aface", "bface", "cface", "dface"):
            lines.append(f"  {name:8s} = {_fmt(getattr(r, name))}")
        for name in ("Aup", "Adown"):
            m = np.asarray(getattr(r, name), np.float64)
            for k in range(m.shape[0]):
                lines.append(f"  {name}[{k}]{'':2s} = {_fmt(m[k])}")
        lines.append("")
    return lines


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    text = "\n".join(manifest_lines(root)) + "\n"
    out = os.path.join(root, "docs", "radiation_coefficients.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
