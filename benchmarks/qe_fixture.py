"""Deterministic Quantum-ESPRESSO-shaped (H, S) fixture generator.

The reference's test driver can replay REAL QE matrices from unformatted
Fortran files (test_dsygvdx.F90:120-145).  No QE run is possible in this
build environment, so this generator constructs the same *kind* of
matrix pair from first principles instead of conjugating a chosen
spectrum with a random unitary (utils/testing.qe_style_pair): a
plane-wave ultrasoft-pseudopotential Hamiltonian/overlap pair, which is
exactly what QE hands zhegvdx (pwscf's cdiaghg).

Construction (deterministic in n and seed-free):

  * basis: the n plane waves G (integer triples) of lowest |k+G|^2 in a
    cubic cell of side L, k a fixed off-Gamma point;
  * H_kin = 1/2 |k+G|^2 delta_GG'   (Hartree-ish units);
  * H_loc[G,G'] = sum_atoms e^{-i (G-G') . tau} v(|G-G'|), a
    Gaussian-screened local pseudopotential v(q) = -Z 4pi/(V q^2)
    exp(-q^2 / 4a)  (q=0 term fixed);
  * nonlocal + overlap: per-atom s/p-like Gaussian projectors beta_i(G),
    H += sum_i D_i beta_i beta_i^H,  S = I + sum_i q_i beta_i beta_i^H
    with q_i > 0 (S positive definite by construction -- the ultrasoft
    overlap structure that makes QE a GENERALIZED eigenproblem).

The result has the physical QE spectrum shape: a cluster of bound
occupied bands below a dense free-electron-like tail, and an overlap
matrix that is a low-rank perturbation of the identity.

Usage:
  python benchmarks/qe_fixture.py [n] [out.npz]   # default 512
Then replay through the 4-way harness:
  python benchmarks/compare.py 512 --dtype z --cases zpl \
      --input benchmarks/qe_n512.npz
"""

import os
import sys

import numpy as np


def qe_pw_pair(n, natoms=4, L=12.0, z_ion=4.0, alpha=0.7, nproj=3):
    """Plane-wave ultrasoft (H, S) pair of size n (complex128)."""
    # G vectors: lowest |k+G|^2 in a cubic cell, k off-Gamma so H is
    # genuinely complex (no accidental real symmetry)
    gmax = int(np.ceil((2.0 * n) ** (1.0 / 3.0))) + 2
    rng_g = np.arange(-gmax, gmax + 1)
    gx, gy, gz = np.meshgrid(rng_g, rng_g, rng_g, indexing="ij")
    gint = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    two_pi_L = 2.0 * np.pi / L
    k = np.array([0.11, 0.23, 0.31]) * two_pi_L
    kg = gint * two_pi_L + k  # (m, 3)
    kin = 0.5 * np.sum(kg * kg, axis=1)
    order = np.argsort(kin, kind="stable")[:n]
    gint = gint[order]
    kg = kg[order]
    kin = kin[order]

    # fixed atom positions (deterministic, low-symmetry)
    tau = (
        np.array(
            [
                [0.13, 0.21, 0.34],
                [0.55, 0.62, 0.18],
                [0.27, 0.81, 0.73],
                [0.79, 0.35, 0.58],
                [0.41, 0.09, 0.92],
                [0.68, 0.47, 0.05],
                [0.91, 0.74, 0.46],
                [0.06, 0.58, 0.67],
            ]
        )[:natoms]
        * L
    )

    # local pseudopotential on G - G'
    dg = gint[:, None, :] - gint[None, :, :]  # (n, n, 3), integers
    q = two_pi_L * np.sqrt(np.sum(dg * dg, axis=2))
    vol = L**3
    with np.errstate(divide="ignore", invalid="ignore"):
        vq = -z_ion * 4.0 * np.pi / (vol * q * q) * np.exp(-q * q / (4.0 * alpha))
    vq[q == 0] = -z_ion * 4.0 * np.pi / (vol * 4.0 * alpha)  # q->0 limit of the screened form
    phase = np.exp(-1j * two_pi_L * (dg @ tau.T))  # e^{-i (G-G').tau_a}
    sfac = np.sum(phase, axis=2)
    h = np.diag(kin).astype(np.complex128) + vq * sfac

    # nonlocal projectors + ultrasoft overlap augmentation
    s = np.eye(n, dtype=np.complex128)
    kg_norm2 = np.sum(kg * kg, axis=1)
    for ia in range(natoms):
        ph = np.exp(-1j * (kg @ tau[ia]))
        for ip in range(nproj):
            sigma2 = 0.8 + 0.45 * ip
            if ip == 0:
                rad = np.exp(-kg_norm2 / (2.0 * sigma2))  # s-like
            else:
                rad = kg[:, ip % 3] * np.exp(-kg_norm2 / (2.0 * sigma2))  # p-like
            beta = ph * rad
            beta = beta / np.linalg.norm(beta)
            d_i = -1.5 + 0.6 * ip  # attractive s channel, repulsive p
            q_i = 0.08 + 0.03 * ip  # ultrasoft augmentation, S stays HPD
            h += d_i * np.outer(beta, beta.conj())
            s += q_i * np.outer(beta, beta.conj())

    h = (h + h.conj().T) / 2
    s = (s + s.conj().T) / 2
    return h, s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), f"qe_n{n}.npz")
    )
    h, s = qe_pw_pair(n)
    np.savez_compressed(out, a=h, b=s)
    import scipy.linalg

    wlow = scipy.linalg.eigh(h, s, eigvals_only=True, subset_by_index=(0, min(n, 32) - 1))
    print(f"wrote {out}: n={n}, lowest eigenvalues {wlow[:8]}")
    print(f"S deviation from identity: {np.abs(s - np.eye(n)).max():.3f}")


if __name__ == "__main__":
    main()
