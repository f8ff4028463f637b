"""Empirical collision probabilities for the cross-polytope hash family
(similarity.cp_* — argmax-with-sign over a deterministic ±1 projection).

Cross-polytope LSH (Andoni, Indyk, Laarhoven, Razenshteyn, Schmidt 2015,
"Practical and Optimal LSH for Angular Distance") has no closed-form
per-hash collision probability at finite d, and this package's variant
replaces the random rotation with a dense ±1 md5-parity matrix over a
2^20-quantized vector (exact integer arithmetic — the property that makes
the bucketing reproducible bit-for-bit in SQL).  So the geometry planner
(`auto_cp_params`) uses an EMPIRICAL table measured on exactly the
production pipeline, produced by this script:

    python tools/calibrate_cp.py [n_trials] [dim]

For each cosine c it samples pairs (u, v) at angle acos(c) (u uniform on
S^{d-1}, v = c·u + sqrt(1-c²)·w with w a uniform unit vector ⊥ u),
pushes both through the quantize→±1-project→argmax-code pipeline with a
fresh parity matrix per trial, and reports P[code(u) == code(v)].
The committed constants in similarity._CP_P1 come from n=200k trials at
d=64 (stderr < 0.0012); re-run this script to regenerate or to extend to
other dims.
"""

from __future__ import annotations

import sys

import numpy as np


def cp_code(y: np.ndarray) -> np.ndarray:
    """argmax-with-sign code (0..2d-1) with the production tie-break:
    maximize |y|·128 + (127 - (2i + [y<0])) — exact-integer keys."""
    codes = 2 * np.arange(y.shape[1]) + (y < 0)
    key = np.abs(y) * 128 + (127 - codes)
    m = key.max(axis=1)
    return 127 - (m % 128).astype(np.int64)


def collision_prob(cos: float, dim: int, n_trials: int,
                   rng: np.random.Generator) -> float:
    hits = 0
    batch = 2000
    done = 0
    while done < n_trials:
        b = min(batch, n_trials - done)
        u = rng.standard_normal((b, dim))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        w = rng.standard_normal((b, dim))
        w -= (w * u).sum(axis=1, keepdims=True) * u
        w /= np.linalg.norm(w, axis=1, keepdims=True)
        v = cos * u + np.sqrt(1.0 - cos * cos) * w
        # the production pipeline: quantize then ±1-project
        qu = np.floor(u * (1 << 20) + 0.5)
        qv = np.floor(v * (1 << 20) + 0.5)
        R = rng.choice([-1.0, 1.0], size=(b, dim, dim))
        yu = np.einsum("bij,bj->bi", R, qu)
        yv = np.einsum("bij,bj->bi", R, qv)
        hits += int((cp_code(yu) == cp_code(yv)).sum())
        done += b
    return hits / n_trials


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.default_rng(13)
    print(f"# cross-polytope P[collision] at d={dim}, n={n} pairs/point")
    print("_CP_P1 = {")
    for cos in (0.80, 0.85, 0.90, 0.925, 0.95, 0.975, 0.99):
        p = collision_prob(cos, dim, n, rng)
        se = (p * (1 - p) / n) ** 0.5
        print(f"    {cos}: {p:.4f},  # +- {se:.4f}")
    print("}")


if __name__ == "__main__":
    main()
