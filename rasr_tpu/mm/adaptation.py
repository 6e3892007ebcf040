"""Speaker adaptation: MLLR mean transforms and CMLLR feature transforms.

Reference: src/Mm/MllrAdaptation.hh (MLLR mean adaptation), src/Speech/
AffineFeatureTransformEstimator.cc (CMLLR), src/Am/AdaptationTree.hh
(regression classes).  Statistics accumulate per adaptation class from
aligned features; the transform solves the standard row-wise closed form
(MLLR) / iterative row update with the log-determinant term (CMLLR).

Math (diagonal-covariance Gaussians, extended mean w = [1, mu]):
  MLLR:  W minimizes sum_g gamma_g ||x - W w_g||^2_{Sigma_g^-1}
         row d:  W_d = z_d G_d^{-1},
         G_d = sum_g (gamma_g / var_gd) w_g w_g^T,
         z_d = sum_g (sum-x_gd / var_gd) w_g^T
  CMLLR: A x + b with the |A| volume term, row-wise iterative update
         (Gales 1998), K iterations.
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .mixture_set import MixtureSet


@dataclass
class AdaptationAccumulator:
    """Per-Gaussian occupancy statistics restricted to one adaptation
    (regression) class."""
    dim: int
    n_densities: int
    gamma: np.ndarray     # (N,) occupancy
    sum_x: np.ndarray     # (N, D)
    sum_x2: np.ndarray    # (N, D) elementwise squares (CMLLR needs full G_d)
    # full second-moment per dimension for CMLLR: G_d = sum_t gamma_t(g)/var *
    # [1,x][1,x]^T accumulated directly:
    G: Optional[np.ndarray] = None  # (D, D+1, D+1) filled by CMLLR accumulate
    # full per-Gaussian outer-product sums for semi-tied covariance
    # estimation (accumulate_scatter; src/Mm/SemiTiedAdaptation.hh)
    sum_xx: Optional[np.ndarray] = None  # (N, D, D)

    @classmethod
    def zeros(cls, dim: int, n_densities: int) -> "AdaptationAccumulator":
        return cls(dim, n_densities, np.zeros(n_densities),
                   np.zeros((n_densities, dim)), np.zeros((n_densities, dim)))

    def accumulate(self, features: np.ndarray, density_path: np.ndarray,
                   weights: Optional[np.ndarray] = None) -> None:
        x = np.asarray(features, dtype=np.float64)
        lab = np.asarray(density_path)
        ok = lab >= 0
        x, lab = x[ok], lab[ok]
        w = np.ones(len(x)) if weights is None else np.asarray(weights)[ok]
        np.add.at(self.gamma, lab, w)
        np.add.at(self.sum_x, lab, x * w[:, None])
        np.add.at(self.sum_x2, lab, x * x * w[:, None])

    def accumulate_scatter(self, features: np.ndarray,
                           density_path: np.ndarray,
                           weights: Optional[np.ndarray] = None) -> None:
        """Additionally accumulate full (N, D, D) outer-product sums —
        the statistics semi-tied covariance estimation needs on top of
        the diagonal ones.  Call alongside (not instead of)
        `accumulate`."""
        if self.sum_xx is None:
            self.sum_xx = np.zeros((self.n_densities, self.dim, self.dim))
        x = np.asarray(features, dtype=np.float64)
        lab = np.asarray(density_path)
        ok = lab >= 0
        x, lab = x[ok], lab[ok]
        w = np.ones(len(x)) if weights is None else np.asarray(weights)[ok]
        np.add.at(self.sum_xx, lab,
                  x[:, :, None] * x[:, None, :] * w[:, None, None])


def estimate_mllr_mean_transform(acc: AdaptationAccumulator,
                                 mixture_set: MixtureSet,
                                 min_occupancy: float = 100.0
                                 ) -> Optional[np.ndarray]:
    """(D, D+1) affine mean transform W: mu' = W [1, mu]."""
    if acc.gamma.sum() < min_occupancy:
        return None
    mean, var, _, _ = mixture_set.packed()
    D = acc.dim
    W = np.zeros((D, D + 1))
    ext = np.concatenate([np.ones((len(mean), 1)), mean], axis=1)  # (N, D+1)
    for d in range(D):
        gv = acc.gamma / var[:, d]                    # (N,)
        G = (ext.T * gv) @ ext                        # (D+1, D+1)
        z = (acc.sum_x[:, d] / var[:, d]) @ ext       # (D+1,)
        G += 1e-6 * np.eye(D + 1) * max(np.trace(G) / (D + 1), 1e-12)
        W[d] = np.linalg.solve(G, z)
    return W


def apply_mllr_mean_transform(mixture_set: MixtureSet,
                              W: np.ndarray) -> MixtureSet:
    """Adapted mixture set with mu' = W [1, mu]."""
    ext = np.concatenate([np.ones((len(mixture_set.means), 1)),
                          mixture_set.means], axis=1)
    new_means = ext @ W.T
    return MixtureSet(mixture_set.dim, new_means,
                      mixture_set.covariances.copy(),
                      mixture_set.densities.copy(),
                      [m for m in mixture_set.mixtures])


def estimate_cmllr_transform(acc: AdaptationAccumulator,
                             mixture_set: MixtureSet,
                             iterations: int = 20,
                             min_occupancy: float = 100.0
                             ) -> Optional[np.ndarray]:
    """(D, D+1) constrained (feature-space) transform: x' = A x + b,
    row-wise iterative maximization including the log|A| term."""
    beta = acc.gamma.sum()
    if beta < min_occupancy:
        return None
    mean, var, _, _ = mixture_set.packed()
    D = acc.dim
    # sufficient statistics in extended feature space [1, x]:
    #   k_d = sum_g mu_gd/var_gd [gamma_g, sum_x_g]
    #   G_d = sum_g 1/var_gd * E_g([1,x][1,x]^T)
    # E_g over frames assigned to g: [[gamma, sum_x^T], [sum_x, sum_xx^T]]
    # full cross second moments are approximated diagonally from sum_x2
    # (exact for diagonal-model CMLLR row updates in practice)
    K = np.zeros((D, D + 1))
    G = np.zeros((D, D + 1, D + 1))
    for g in range(len(mean)):
        if acc.gamma[g] <= 0:
            continue
        e1 = np.concatenate([[acc.gamma[g]], acc.sum_x[g]])
        outer = np.zeros((D + 1, D + 1))
        outer[0, 0] = acc.gamma[g]
        outer[0, 1:] = acc.sum_x[g]
        outer[1:, 0] = acc.sum_x[g]
        if acc.sum_xx is not None:
            # exact per-Gaussian second moments (accumulate_scatter) —
            # required to recover rotational transforms
            outer[1:, 1:] = acc.sum_xx[g]
        else:
            # cross terms approximated by mean outer product; diagonal
            # exact (adequate only for near-diagonal channels)
            mu_emp = acc.sum_x[g] / acc.gamma[g]
            outer[1:, 1:] = np.outer(acc.sum_x[g], mu_emp)
            np.fill_diagonal(outer[1:, 1:], acc.sum_x2[g])
        for d in range(D):
            w = 1.0 / var[g, d]
            K[d] += mean[g, d] * w * e1
            G[d] += w * outer
    for d in range(D):
        G[d] += 1e-6 * np.eye(D + 1) * max(np.trace(G[d]) / (D + 1), 1e-12)

    W = np.concatenate([np.zeros((D, 1)), np.eye(D)], axis=1)
    for _ in range(iterations):
        A = W[:, 1:]
        for d in range(D):
            cof = np.linalg.inv(A).T[d] * np.linalg.det(A)  # cofactor row
            p = np.concatenate([[0.0], cof])
            Ginv = np.linalg.inv(G[d])
            pg = p @ Ginv
            a_quad = pg @ p
            b_lin = pg @ K[d]
            # solve alpha: alpha^2 a + alpha b - beta = 0
            disc = b_lin * b_lin + 4 * a_quad * beta
            if a_quad <= 0 or disc < 0:
                continue
            alpha = (-b_lin + math.sqrt(disc)) / (2 * a_quad)
            W[d] = (alpha * p + K[d]) @ Ginv
            A = W[:, 1:]
    return W


def apply_feature_transform(features: np.ndarray, W: np.ndarray) -> np.ndarray:
    """x' = A x + b for (T, D) features with W = [b | A]."""
    return features @ W[:, 1:].T + W[:, 0]


def estimate_band_mllr_transform(acc: AdaptationAccumulator,
                                 mixture_set: MixtureSet,
                                 n_bands: int = 1,
                                 min_occupancy: float = 100.0
                                 ) -> Optional[np.ndarray]:
    """Band-diagonal MLLR mean transform (reference BandMllrEstimator,
    src/Mm/BandMllrAdaptation.cc:50-114, `mllr-bands` param): row d of
    the (D, D+1) transform may use only the bias column and mean
    components within `n_bands` of d — the per-row normal equations
    shrink to the (2*n_bands+2) allowed indices, needing far less
    adaptation data than full MLLR."""
    if acc.gamma.sum() < min_occupancy:
        return None
    mean, var, _, _ = mixture_set.packed()
    D = acc.dim
    W = np.zeros((D, D + 1))
    ext = np.concatenate([np.ones((len(mean), 1)), mean], axis=1)
    for d in range(D):
        gv = acc.gamma / var[:, d]
        G = (ext.T * gv) @ ext
        z = (acc.sum_x[:, d] / var[:, d]) @ ext
        # allowed extended indices: bias (0) + band around d (1-based)
        lo, hi = max(0, d - n_bands), min(D - 1, d + n_bands)
        idx = np.concatenate([[0], np.arange(lo + 1, hi + 2)])
        Gs = G[np.ix_(idx, idx)]
        Gs += 1e-6 * np.eye(len(idx)) * max(np.trace(Gs) / len(idx),
                                            1e-12)
        W[d, idx] = np.linalg.solve(Gs, z[idx])
    return W


def estimate_semi_tied_transform(acc: AdaptationAccumulator,
                                 mixture_set: MixtureSet,
                                 iterations: int = 10,
                                 row_iterations: int = 3,
                                 min_occupancy: float = 100.0
                                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Semi-tied covariance transform (Gales 1999; reference
    SemiTiedEstimator, src/Mm/SemiTiedAdaptation.cc): one shared square
    transform A for the class plus per-Gaussian diagonal variances.

    Model: p(x | g) = |A| N(A x; A mu_g, diag(sigma_g^2)) — i.e. full
    covariances Sigma_g = A^{-1} diag A^{-T} with a tied A.  Needs the
    full per-Gaussian scatter (`acc.accumulate_scatter`); the update
    alternates the closed-form diagonal variances
    sigma^2_{g,i} = (A S_g A^T)_{ii} / gamma_g with the row-wise
    cofactor update a_i = c_i G_i^{-1} sqrt(beta / c_i G_i^{-1} c_i^T),
    G_i = sum_g gamma_g S_g / sigma^2_{g,i}.

    Returns (A (D, D), new diagonal variances (N, D)); None without
    enough observations or scatter statistics."""
    if acc.sum_xx is None:
        raise ValueError("semi-tied estimation needs full scatter "
                         "statistics (accumulate_scatter)")
    beta = float(acc.gamma.sum())
    if beta < min_occupancy:
        return None
    mean, _var, _, _ = mixture_set.packed()
    D = acc.dim
    live = np.flatnonzero(acc.gamma > 1e-8)
    # scatter around the MODEL means:
    # S_g = sum_xx - mu sum_x^T - sum_x mu^T + gamma mu mu^T
    S = np.zeros((len(live), D, D))
    gam = acc.gamma[live]
    for i, g in enumerate(live):
        mu = mean[g]
        S[i] = (acc.sum_xx[g] - np.outer(mu, acc.sum_x[g])
                - np.outer(acc.sum_x[g], mu)
                + acc.gamma[g] * np.outer(mu, mu))
        # numerical floor keeps S_g positive semidefinite enough
        S[i] += 1e-8 * np.trace(S[i]) / D * np.eye(D)

    A = np.eye(D)
    for _ in range(iterations):
        # E-like step: diagonal variances under current A
        AS = np.einsum("ij,gjk,lk->gil", A, S, A)          # (G, D, D)
        sig2 = np.maximum(np.einsum("gii->gi", AS) / gam[:, None], 1e-10)
        for _r in range(row_iterations):
            for i in range(D):
                G_i = np.einsum("g,gjk->jk", 1.0 / sig2[:, i], S)
                # cofactor row of A (direction the det term pulls toward)
                c = np.linalg.inv(A).T[i]
                Gi_inv = np.linalg.inv(
                    G_i + 1e-8 * np.trace(G_i) / D * np.eye(D))
                cg = c @ Gi_inv
                denom = float(cg @ c)
                if denom <= 0:
                    continue
                A[i] = cg * math.sqrt(beta / denom)
    AS = np.einsum("ij,gjk,lk->gil", A, S, A)
    sig2 = np.maximum(np.einsum("gii->gi", AS) / gam[:, None], 1e-10)
    new_vars = np.array(mixture_set.covariances, dtype=np.float64,
                        copy=True)
    new_vars[live] = sig2
    return A, new_vars


def semi_tied_objective(A: np.ndarray, gamma: np.ndarray,
                        S: np.ndarray) -> float:
    """Gales' auxiliary objective for a semi-tied transform (used by
    the estimation tests): beta log|A| - 1/2 sum_g gamma_g sum_i
    log((A S_g A^T)_ii / gamma_g)."""
    live = np.flatnonzero(gamma > 1e-8)
    beta = float(gamma.sum())
    sign, logdet = np.linalg.slogdet(A)
    if sign <= 0:
        return -np.inf
    AS = np.einsum("ij,gjk,lk->gil", A, S[live], A)
    diag = np.maximum(np.einsum("gii->gi", AS)
                      / gamma[live, None], 1e-12)
    return beta * logdet - 0.5 * float(
        (gamma[live, None] * np.log(diag)).sum())


def apply_semi_tied_transform(mixture_set: MixtureSet, A: np.ndarray,
                              new_vars: np.ndarray) -> MixtureSet:
    """Adapted mixture set scoring in the transformed space: means
    become A mu with the re-estimated diagonal variances; score
    features as A x (+ the constant log|A| term, irrelevant to
    classification/alignment argmax)."""
    new_means = mixture_set.means @ A.T
    return MixtureSet(mixture_set.dim, new_means,
                      np.asarray(new_vars, np.float64),
                      mixture_set.densities.copy(),
                      [m for m in mixture_set.mixtures])


# ---------------------------------------------------------------------------
# regression-class trees (Am::AdaptationTree + MllrAdaptation propagate)
# ---------------------------------------------------------------------------

class AdaptationTree:
    """Binary regression-class tree over mixtures (src/Am/AdaptationTree.hh:
    n base classes as leaves, silence separated; src/Mm/MllrAdaptation.cc:671
    estimateWMatrices propagates leaf statistics to every node and keeps
    transforms only where enough observations accumulated).

    The reference derives the tree from the phonetic decision tree; here it
    is built by top-down binary 2-means splitting of the mixtures' mean
    centroids — same structure (a binary tree whose leaves partition the
    mixtures), data-driven instead of phonetically tied.
    """

    def __init__(self, mixture_set: MixtureSet, n_base_classes: int = 8,
                 silence_mixtures: Tuple[int, ...] = ()):
        n_mix = mixture_set.n_mixtures
        mean, _, _, mix_of = mixture_set.packed()
        centroid = np.zeros((n_mix, mixture_set.dim))
        for m in range(n_mix):
            rows = mean[mix_of == m]
            centroid[m] = rows.mean(axis=0) if len(rows) else 0.0
        silence = set(silence_mixtures)
        speech = [m for m in range(n_mix) if m not in silence]

        # node arrays; node 0 = root
        self.left: List[int] = [-1]
        self.right: List[int] = [-1]
        self.parent: List[int] = [-1]
        self.leaf_of_mixture = np.zeros(n_mix, dtype=np.int32)

        def new_node(parent: int) -> int:
            self.left.append(-1)
            self.right.append(-1)
            self.parent.append(parent)
            return len(self.left) - 1

        def split(node: int, members: List[int], leaves_left: int) -> None:
            if leaves_left <= 1 or len(members) <= 1:
                for m in members:
                    self.leaf_of_mixture[m] = node
                return
            pts = centroid[members]
            # 2-means split (deterministic seeding: extremes of first PC)
            d = pts - pts.mean(0)
            u, s, vt = np.linalg.svd(d, full_matrices=False)
            proj = d @ vt[0]
            order = np.argsort(proj)
            half = len(members) // 2
            a = [members[i] for i in order[:half]]
            b = [members[i] for i in order[half:]]
            la = new_node(node)
            lb = new_node(node)
            self.left[node], self.right[node] = la, lb
            split(la, a, leaves_left // 2)
            split(lb, b, leaves_left - leaves_left // 2)

        if silence:
            # root splits silence | speech (reference separates silence)
            sil_node = new_node(0)
            speech_node = new_node(0)
            self.left[0], self.right[0] = sil_node, speech_node
            for m in silence:
                self.leaf_of_mixture[m] = sil_node
            split(speech_node, speech, max(n_base_classes - 1, 1))
        else:
            split(0, speech, n_base_classes)
        self.n_nodes = len(self.left)

    @classmethod
    def from_partition(cls, mixture_set: MixtureSet,
                       class_of_mixture: np.ndarray) -> "AdaptationTree":
        """Regression tree over a GIVEN base-class partition (e.g. the
        phoneme of each mixture, as derived by mllr-tools'
        mean-sumfile-estimator from the state tying — the reference
        derives its tree from the phonetic decision tree,
        src/Tools/MllrTools/MeanSumfileEstimator.cc:70-76).

        The base classes become the leaves; internal structure is built
        bottom-up by agglomerative merging of class mean centroids, so
        phonetically close classes share transforms when data is thin.
        """
        class_of_mixture = np.asarray(class_of_mixture)
        n_mix = mixture_set.n_mixtures
        if len(class_of_mixture) != n_mix:
            raise ValueError("class_of_mixture must have one entry per "
                             f"mixture ({len(class_of_mixture)} != {n_mix})")
        mean, _, _, mix_of = mixture_set.packed()
        classes = sorted(set(int(c) for c in class_of_mixture))

        self = cls.__new__(cls)
        # leaves first: node i = class classes[i]
        self.left = [-1] * len(classes)
        self.right = [-1] * len(classes)
        self.parent = [-1] * len(classes)
        self.leaf_of_mixture = np.zeros(n_mix, dtype=np.int32)
        node_of_class = {c: i for i, c in enumerate(classes)}
        for m in range(n_mix):
            self.leaf_of_mixture[m] = node_of_class[int(class_of_mixture[m])]

        # class centroids for the merge metric
        cent = {}
        for i, c in enumerate(classes):
            sel = np.isin(mix_of, np.nonzero(class_of_mixture == c)[0])
            rows = mean[sel]
            cent[i] = rows.mean(axis=0) if len(rows) else \
                np.zeros(mixture_set.dim)

        # agglomerative: repeatedly merge the two closest roots
        roots = list(range(len(classes)))
        while len(roots) > 1:
            best, bd = None, None
            for ai in range(len(roots)):
                for bi in range(ai + 1, len(roots)):
                    d = float(np.sum((cent[roots[ai]] - cent[roots[bi]])
                                     ** 2))
                    if bd is None or d < bd:
                        best, bd = (ai, bi), d
            ai, bi = best
            a, b = roots[ai], roots[bi]
            self.left.append(a)
            self.right.append(b)
            self.parent.append(-1)
            new = len(self.left) - 1
            self.parent[a] = new
            self.parent[b] = new
            cent[new] = (cent[a] + cent[b]) / 2.0
            roots = [r for r in roots if r not in (a, b)] + [new]
        self.n_nodes = len(self.left)
        return self

    def path_to_root(self, mixture: int) -> List[int]:
        node = int(self.leaf_of_mixture[mixture])
        out = [node]
        while self.parent[node] >= 0:
            node = self.parent[node]
            out.append(node)
        return out

    def leaves(self) -> List[int]:
        return sorted(set(int(l) for l in self.leaf_of_mixture))


class TreeMllrEstimator:
    """Regression-class MLLR: leaf accumulators, propagated node sums,
    per-node transforms where occupancy suffices, deepest-available
    transform per mixture (FullAdaptorViterbiEstimator semantics)."""

    def __init__(self, tree: AdaptationTree, mixture_set: MixtureSet,
                 min_observations: float = 100.0):
        self.tree = tree
        self.mixture_set = mixture_set
        self.min_observations = min_observations
        n_dens = len(mixture_set.packed()[0])
        self._accs: Dict[int, AdaptationAccumulator] = {
            leaf: AdaptationAccumulator.zeros(mixture_set.dim, n_dens)
            for leaf in tree.leaves()}

    def accumulate(self, features: np.ndarray, density_path: np.ndarray,
                   mixture_path: np.ndarray,
                   weights: Optional[np.ndarray] = None) -> None:
        """Route frames to their mixture's leaf accumulator."""
        mix = np.asarray(mixture_path)
        for leaf, acc in self._accs.items():
            sel = (self.tree.leaf_of_mixture[np.maximum(mix, 0)] == leaf) \
                & (mix >= 0)
            if not sel.any():
                continue
            dp = np.where(sel, np.asarray(density_path), -1)
            acc.accumulate(features, dp, weights)

    def estimate(self) -> Dict[int, np.ndarray]:
        """node id -> W (D, D+1) for nodes with enough observations."""
        # propagate leaf stats to every ancestor
        node_acc: Dict[int, AdaptationAccumulator] = {}
        n_dens = len(self.mixture_set.packed()[0])
        for leaf, acc in self._accs.items():
            node = leaf
            while node >= 0:
                na = node_acc.get(node)
                if na is None:
                    na = AdaptationAccumulator.zeros(self.mixture_set.dim,
                                                     n_dens)
                    node_acc[node] = na
                na.gamma += acc.gamma
                na.sum_x += acc.sum_x
                na.sum_x2 += acc.sum_x2
                node = self.tree.parent[node]
        out: Dict[int, np.ndarray] = {}
        for node, acc in node_acc.items():
            if acc.gamma.sum() > self.min_observations:
                W = estimate_mllr_mean_transform(acc, self.mixture_set,
                                                 min_occupancy=0.0)
                if W is not None:
                    out[node] = W
        return out

    def apply(self, transforms: Dict[int, np.ndarray]) -> MixtureSet:
        """Adapted mixture set: each mixture's means transformed by the
        DEEPEST tree node holding a transform on its root path."""
        ms = self.mixture_set
        new_means = ms.means.copy()
        mean, _, _, mix_of = ms.packed()
        # density order in packed() follows mixtures; map density->mean row
        for m in range(ms.n_mixtures):
            W = None
            for node in self.tree.path_to_root(m):
                if node in transforms:
                    W = transforms[node]
                    break
            if W is None:
                continue
            for di in ms.mixtures[m].density_indices:
                mi = ms.densities[di, 0]
                new_means[mi] = W[:, 0] + W[:, 1:] @ ms.means[mi]
        return MixtureSet(ms.dim, new_means, ms.covariances.copy(),
                          ms.densities.copy(), [m for m in ms.mixtures])
