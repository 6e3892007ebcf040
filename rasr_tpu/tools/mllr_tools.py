"""mllr-tools: sumfile machinery for MLLR regression-class-tree
estimation.

Reference: src/Tools/MllrTools/MeanSumfileEstimator.cc — loads a mixture
set, maps every mixture to its central phoneme via the phonetic decision
tree, and writes a "sumfile" of per-mixture mean statistics that seeds
regression-class-tree estimation.  (The Legacy/ implementation behind
that driver is not in the public tree; this is a functional equivalent
over this framework's formats.)

Actions:

    --action=mean-sumfile-estimator   (default, the reference tool)
        --mixture-set-file=<pms|legacy MIXSET>
        --state-tying-file=<lut>    "allophone.state index" lines; the
                                    central phoneme of each tied state
                                    gives the mixture -> phoneme map
        --sumfile=<out>
      Writes one record per mixture:
        <mixture> <phoneme> <n-densities> <weight> <mean values...>
      (weight = summed density weights; mean = weight-averaged mean).

    --action=estimate-regression-tree
        --sumfile=<in> --mixture-set-file=<..> --tree-file=<out pickle>
      Groups mixtures by the sumfile's phoneme column (silence and other
      context-independent symbols become their own base classes exactly
      as the reference separates silence) and builds an
      mm.adaptation.AdaptationTree via from_partition, ready for
      TreeMllrEstimator.
"""

from __future__ import annotations

import pickle
import sys
from typing import Dict, List, Optional

import numpy as np

from ..core.application import Application
from ..core.parameter import ParameterString
from ..mm.mixture_set import MixtureSet


def _load_mixture_set(path: str) -> MixtureSet:
    if path.endswith((".mix", ".bin")):
        from ..mm import legacy_io
        from ..mm.estimator import MixtureSetEstimator
        legacy = legacy_io.read_legacy_accumulator(path)
        acc = legacy_io.to_mixture_accumulator(legacy)
        est = MixtureSetEstimator(acc.dim, acc.mixture_of,
                                  minimum_observation_weight=0.0)
        est.acc = acc
        return est.estimate()
    return MixtureSet.read_pms(path)


def mixture_to_phoneme(tying_path: str, n_mixtures: int) -> List[str]:
    """mixture index -> central phoneme symbol, from a state-tying LUT
    ("allophone.state index" lines, doc/file_formats/state_tying.rst).
    The central phoneme is the symbol before '{' (triphone) or '.'
    (monophone); conflicting entries resolve by majority, unmapped
    mixtures error (MeanSumfileEstimator.cc:79-82 does the same)."""
    votes: List[Dict[str, int]] = [dict() for _ in range(n_mixtures)]
    import gzip
    op = gzip.open if tying_path.endswith(".gz") else open
    with op(tying_path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            sym, idx = line.rsplit(None, 1)
            idx = int(idx)
            if idx >= n_mixtures:
                continue
            central = sym.split("{")[0].split(".")[0]
            votes[idx][central] = votes[idx].get(central, 0) + 1
    out = []
    for m, v in enumerate(votes):
        if not v:
            raise ValueError(f"no state-tying entry maps to mixture {m}")
        out.append(max(v.items(), key=lambda kv: kv[1])[0])
    return out


class MllrToolsApp(Application):
    param_action = ParameterString("action", "what to do",
                                   "mean-sumfile-estimator")

    def __init__(self, argv=None):
        super().__init__("mllr-tools", argv)

    def action_mean_sumfile(self) -> int:
        ms = _load_mixture_set(self.config.get("mixture-set-file"))
        phon = mixture_to_phoneme(self.config.get("state-tying-file"),
                                  ms.n_mixtures)
        out = self.config.get("sumfile") or "mean.sum"
        with open(out, "w") as fh:
            fh.write(f"# mean sumfile: {ms.n_mixtures} mixtures "
                     f"dim {ms.dim}\n")
            for m in range(ms.n_mixtures):
                mix = ms.mixtures[m]
                w = np.exp(np.asarray(mix.log_weights, np.float64))
                rows = ms.means[[ms.densities[d, 0]
                                 for d in mix.density_indices]]
                mean = (w[:, None] * rows).sum(0) / max(w.sum(), 1e-20)
                vals = " ".join(f"{v:.6f}" for v in mean)
                fh.write(f"{m} {phon[m]} {len(mix.density_indices)} "
                         f"{w.sum():.6f} {vals}\n")
        self.log("wrote sumfile for %d mixtures -> %s", ms.n_mixtures, out)
        return 0

    def action_estimate_tree(self) -> int:
        from ..mm.adaptation import AdaptationTree
        ms = _load_mixture_set(self.config.get("mixture-set-file"))
        phon_of_mix: List[str] = []
        with open(self.config.get("sumfile")) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                fields = line.split()
                phon_of_mix.append(fields[1])
        if len(phon_of_mix) != ms.n_mixtures:
            raise ValueError("sumfile rows != mixtures "
                             f"({len(phon_of_mix)} != {ms.n_mixtures})")
        symbols = sorted(set(phon_of_mix))
        class_of = np.asarray([symbols.index(p) for p in phon_of_mix])
        tree = AdaptationTree.from_partition(ms, class_of)
        out = self.config.get("tree-file") or "adaptation.tree"
        with open(out, "wb") as fh:
            pickle.dump({"tree": tree, "classes": symbols}, fh)
        self.log("regression tree: %d base classes, %d nodes -> %s",
                 len(symbols), tree.n_nodes, out)
        return 0

    def run(self) -> int:
        action = self.param_action(self.config)
        dispatch = {
            "mean-sumfile-estimator": self.action_mean_sumfile,
            "estimate-regression-tree": self.action_estimate_tree,
        }
        if action not in dispatch:
            raise ValueError(f"unknown action {action!r}; "
                             f"known: {sorted(dispatch)}")
        return dispatch[action]()


def main(argv=None) -> int:
    return MllrToolsApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
