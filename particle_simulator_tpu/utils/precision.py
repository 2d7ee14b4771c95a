"""Numeric-precision diagnostic: fixed-point vs float position encodings.

Functional equivalent of the reference's ``log_precision``
(cuda_simulator/src/kernel.cuh:153-197): evaluate the species' equilibrium
distance and the Mie force near it in four representations — f32, f64,
u32 fixed point, u64 fixed point — quantifying the error each encoding
injects into the stiff r^-(n+1) force. This is the analysis that justifies
u32 fixed-point positions: uniform absolute resolution everywhere in the box
(f32 resolution degrades ~256x between the near and far wall).
"""

from __future__ import annotations

import numpy as np

from particle_simulator_tpu.io.frame import MieParams


def _mie_force(r: float, p: MieParams) -> float:
    n, m = float(p.n), float(p.m)
    C = (n / (n - m)) * (n / m) ** (m / (n - m))
    sr = float(p.sigma) / r
    return C * float(p.epsilon) * (m * sr**m - n * sr**n) / r


def precision_report(
    params: MieParams | None = None, box_width: float = 50e-9, at_fraction: float = 0.9
) -> dict:
    """Representation error of the equilibrium distance and the resulting Mie
    force, for a pair sitting near ``at_fraction`` of the box (where f32
    absolute resolution is worst)."""
    p = params or MieParams.nitrogen()
    r0 = p.force0_r()  # f64 ground truth

    base = at_fraction * box_width

    def encode_delta(encode):
        """Distance r0 as the difference of two encoded absolute positions."""
        a, b = encode(base), encode(base + r0)
        return b - a

    reps = {
        "f64": encode_delta(lambda x: np.float64(x)),
        "f32": float(np.float32(base + r0) - np.float32(base)),
        "u32_fixed": (
            (round(0xFFFFFFFF * (base + r0) / box_width) - round(0xFFFFFFFF * base / box_width))
            * box_width
            / 0xFFFFFFFF
        ),
        "u64_fixed": (
            (
                round(0xFFFFFFFFFFFFFFFF * (base + r0) / box_width)
                - round(0xFFFFFFFFFFFFFFFF * base / box_width)
            )
            * box_width
            / 0xFFFFFFFFFFFFFFFF
        ),
    }

    # F(r0) = 0 by definition, so errors are reported against a physical
    # force scale: the repulsion at 0.95 r0 (the stiff near-contact regime
    # that amplifies any position error)
    f_true = _mie_force(r0, p)
    f_scale = abs(_mie_force(0.95 * r0, p))
    out = {
        "r0_m": r0,
        "box_width_m": box_width,
        "at_fraction": at_fraction,
        "force_scale_N": f_scale,
        "reps": {},
    }
    for name, r in reps.items():
        f = _mie_force(float(r), p)
        out["reps"][name] = {
            "r_m": float(r),
            "r_rel_err": abs(float(r) - r0) / r0,
            "force_N": f,
            "force_err_vs_scale": abs(f - f_true) / f_scale,
        }
    return out


def log_precision() -> None:
    """Print the report to stderr, like the reference's disabled call site
    (kernel.cuh:249)."""
    import json
    import sys

    print(json.dumps(precision_report(), indent=2), file=sys.stderr)


if __name__ == "__main__":
    log_precision()
