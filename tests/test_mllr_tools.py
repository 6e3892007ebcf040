"""mllr-tools: mean-sumfile-estimator + regression-tree estimation
(reference src/Tools/MllrTools/MeanSumfileEstimator.cc)."""

import pickle

import numpy as np
import pytest

from rasr_tpu.mm.adaptation import AdaptationTree, TreeMllrEstimator
from rasr_tpu.mm.mixture_set import Mixture, MixtureSet
from rasr_tpu.tools.mllr_tools import main as mllr_main

pytestmark = pytest.mark.fast

DIM = 3


@pytest.fixture
def mixture_set(tmp_path):
    """6 mixtures (2 phonemes x 3 states), 1 density each."""
    rng = np.random.default_rng(0)
    means = rng.standard_normal((6, DIM)) * 2.0
    cov = np.ones((1, DIM))
    densities = np.stack([np.arange(6), np.zeros(6, int)], axis=1)
    mixtures = [Mixture([i], [0.0]) for i in range(6)]
    ms = MixtureSet(DIM, means, cov, densities, mixtures)
    p = tmp_path / "m.pms"
    ms.write_pms(str(p))
    tying = tmp_path / "tying.lut"
    lines = []
    for s in range(3):
        lines.append(f"a{{#+b}}.{s} {s}")
        lines.append(f"b{{a+#}}@f.{s} {3 + s}")
    tying.write_text("\n".join(lines) + "\n")
    return tmp_path, p, tying, ms


def test_mean_sumfile_and_tree(mixture_set):
    tmp_path, pms, tying, ms = mixture_set
    sumfile = tmp_path / "mean.sum"
    assert mllr_main(["--*.action=mean-sumfile-estimator",
                      f"--*.mixture-set-file={pms}",
                      f"--*.state-tying-file={tying}",
                      f"--*.sumfile={sumfile}"]) == 0
    rows = [l.split() for l in sumfile.read_text().splitlines()
            if not l.startswith("#")]
    assert len(rows) == 6
    assert [r[1] for r in rows] == ["a"] * 3 + ["b"] * 3
    # weighted mean of a single unit-weight density == its mean
    np.testing.assert_allclose(
        [float(v) for v in rows[0][4:]], ms.means[0], atol=1e-5)

    tree_file = tmp_path / "adapt.tree"
    assert mllr_main(["--*.action=estimate-regression-tree",
                      f"--*.mixture-set-file={pms}",
                      f"--*.sumfile={sumfile}",
                      f"--*.tree-file={tree_file}"]) == 0
    with open(tree_file, "rb") as fh:
        blob = pickle.load(fh)
    tree = blob["tree"]
    assert blob["classes"] == ["a", "b"]
    # 2 base classes -> 2 leaves + 1 root
    assert tree.n_nodes == 3
    leaves = tree.leaves()
    assert len(leaves) == 2
    # mixtures of the same phoneme share a leaf
    assert len({int(tree.leaf_of_mixture[m]) for m in range(3)}) == 1
    assert (tree.leaf_of_mixture[0] != tree.leaf_of_mixture[3])


def test_partition_tree_drives_tree_mllr(mixture_set):
    """from_partition tree + TreeMllrEstimator recovers a global shift."""
    tmp_path, pms, tying, ms = mixture_set
    tree = AdaptationTree.from_partition(
        ms, np.asarray([0, 0, 0, 1, 1, 1]))
    est = TreeMllrEstimator(tree, ms, min_observations=10.0)
    rng = np.random.default_rng(1)
    shift = np.asarray([0.5, -0.3, 0.2])
    for m in range(6):
        feats = ms.means[m] + shift + 0.01 * rng.standard_normal((60, DIM))
        est.accumulate(feats.astype(np.float64),
                       np.full(60, m), np.full(60, m))
    transforms = est.estimate()
    assert transforms
    adapted = est.apply(transforms)
    np.testing.assert_allclose(adapted.means, ms.means + shift, atol=0.05)
