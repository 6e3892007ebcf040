"""nn-trainer tool.

The reference NnTrainer drives legacy FFNN training actions
(src/Tools/NnTrainer/NnTrainer.cc:66-171: supervised-training,
combine-statistics, estimate priors...).  Here the trainable model is the
native conformer-CTC stack; this tool provides:

    --action=supervised-training   features+transcripts -> sharded CTC
                                   training with checkpointing
    --action=compute-priors        label priors from model posteriors
    --action=init                  write an initial checkpoint

Config: corpus / lexicon / feature-cache / model / trainer selectors.
Batches assemble by length bucketing (the BufferedFeatureExtractor
minibatch role, src/Nn/BufferedFeatureExtractor.hh:38) and shard over the
(data, model) mesh.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import numpy as np

from ..bliss.corpus import CorpusDescription
from ..bliss.lexicon import Lexicon
from ..core.application import Application
from ..speech.feature_cache import FeatureCacheReader


def _pad_batch(items: List[Tuple[np.ndarray, List[int]]],
               pad_T: int, pad_L: int):
    B = len(items)
    D = items[0][0].shape[1]
    feats = np.zeros((B, pad_T, D), np.float32)
    feat_lens = np.zeros((B,), np.int32)
    labels = np.zeros((B, pad_L), np.int32)
    label_lens = np.zeros((B,), np.int32)
    for i, (f, l) in enumerate(items):
        feats[i, :len(f)] = f[:pad_T]
        feat_lens[i] = min(len(f), pad_T)
        labels[i, :len(l)] = l[:pad_L]
        label_lens[i] = min(len(l), pad_L)
    return feats, feat_lens, labels, label_lens


class NnTrainerApp(Application):
    def __init__(self, argv=None):
        super().__init__("nn-trainer", argv)

    def _model_and_trainer(self, dim: int, vocab: int):
        import jax.numpy as jnp
        import optax
        from ..models import ConformerCtc
        from ..nn.training import CtcTrainer, make_optimizer
        from ..parallel import make_mesh
        m = self.config.sub("model")
        t = self.config.sub("trainer")
        model = ConformerCtc(
            vocab_size=vocab,
            d_model=int(m.get("d-model") or 256),
            n_layers=int(m.get("n-layers") or 12),
            n_heads=int(m.get("n-heads") or 4),
            dtype=jnp.bfloat16 if (m.get("dtype") or "bfloat16") == "bfloat16"
            else jnp.float32)
        lr = float(t.get("learning-rate") or 1e-3)
        warmup = int(t.get("warmup-steps") or 1000)
        stages = t.get("pipeline-stages")
        if stages:
            # GPipe pipeline over a (stage, data) mesh (models.pipelined);
            # with model-parallel > 1 a 3-D (stage, data, model) mesh with
            # tensor-parallel blocks (models.tp_conformer)
            from ..nn.training import PipelinedCtcTrainer
            trainer = PipelinedCtcTrainer(
                model, n_stages=int(stages),
                optimizer=make_optimizer(lr, warmup),
                example_shape=(2, 32, dim),
                n_microbatches=int(t.get("microbatches") or 2),
                model_parallel=int(t.get("model-parallel") or 1))
            return model, trainer
        dp = t.get("data-parallel")
        mp = t.get("model-parallel")
        if dp:
            dp = int(dp)
            mp = int(mp) if mp else 1
            mesh = make_mesh(n_devices=dp * mp, data_parallel=dp)
        else:
            mesh = make_mesh()
        trainer = CtcTrainer(model, mesh,
                             optimizer=make_optimizer(lr, warmup),
                             example_shape=(2, 32, dim))
        return model, trainer

    def _label_seq(self, lexicon: Lexicon, orth: str) -> List[int]:
        out = []
        for word in orth.split():
            lemma = lexicon.lemma_by_orth(word)
            if lemma is None:
                continue
            out.append(lemma.id)
        return out

    def action_supervised_training(self) -> int:
        import jax
        from ..nn.checkpoint import load_params, save_params
        corpus = CorpusDescription(self.config.sub("corpus"))
        lexicon = Lexicon(self.config.sub("lexicon"))
        cache = FeatureCacheReader(self.config.sub("feature-cache").get("path"))
        t = self.config.sub("trainer")
        batch_size = int(t.get("batch-size") or 8)
        epochs = int(t.get("epochs") or 1)
        ckpt = t.get("checkpoint") or "model.msgpack"
        resume = t.get("resume") or ""

        data: List[Tuple[np.ndarray, List[int]]] = []
        for seg in corpus.segments():
            try:
                feats = cache.features(seg.full_name)
            except KeyError:
                continue
            labels = self._label_seq(lexicon, seg.orth)
            if labels:
                data.append((feats, labels))
        if not data:
            raise ValueError("no training data")
        dim = data[0][0].shape[1]
        model, trainer = self._model_and_trainer(dim, len(lexicon.lemmas))
        if resume:
            trainer.params, step = load_params(resume, trainer.params)
            trainer.step = step
        # sort by length for efficient bucketing, fixed pad shapes per epoch
        data.sort(key=lambda x: len(x[0]))
        losses = []
        rng = np.random.default_rng(0)
        for epoch in range(epochs):
            order = list(range(0, len(data), batch_size))
            rng.shuffle(order)
            dp = trainer.mesh.shape.get("data", 1)
            for start in order:
                batch = data[start:start + batch_size]
                # batch must divide the data-parallel axis: repeat entries
                while len(batch) % dp:
                    batch = batch + batch[:dp - len(batch) % dp]
                pad_T = max(len(f) for f, _ in batch)
                pad_T = -(-pad_T // 32) * 32  # round to bucket
                pad_L = max(len(l) for _, l in batch)
                feats, fl, labels, ll = _pad_batch(batch, pad_T, pad_L)
                loss = trainer.train_step(feats, fl, labels, ll)
                losses.append(loss)
            self.log("epoch %d: mean loss %.4f", epoch,
                     float(np.mean(losses[-len(order):])))
        save_params(ckpt, trainer.params, step=trainer.step)
        self.log("saved checkpoint -> %s (step %d)", ckpt, trainer.step)
        return 0

    def _frame_model(self, dim: int):
        """[model] for the segmentwise actions: `type = linear` (the
        reference's legacy FFNN shape, src/Nn/NeuralNetwork.hh:37) or
        `type = hybrid` (conformer frame AM, models/hybrid.py); returns
        (model_apply(params, (T, D)) -> (T, S) log-posteriors, params,
        save(params) hook)."""
        import jax
        import jax.numpy as jnp
        from ..nn.checkpoint import load_params, save_params
        m = self.config.sub("model")
        n_classes = int(m.get("n-classes") or 0)
        if not n_classes:
            raise ValueError("model.n-classes required")
        ckpt = m.get("checkpoint")
        typ = (m.get("type") or "linear").lower()
        if typ == "linear":
            rng = np.random.default_rng(int(m.get("seed") or 0))
            params = {"w": jnp.asarray(
                0.1 * rng.standard_normal((dim, n_classes)), jnp.float32),
                "b": jnp.zeros((n_classes,), jnp.float32)}
            if ckpt:
                params, _ = load_params(ckpt, params)

            def apply(p, feats):
                return jax.nn.log_softmax(feats @ p["w"] + p["b"], -1)
        elif typ == "hybrid":
            from ..models.hybrid import HybridConformerAm
            model = HybridConformerAm(
                n_classes=n_classes,
                d_model=int(m.get("d-model") or 256),
                n_layers=int(m.get("n-layers") or 6),
                n_heads=int(m.get("n-heads") or 4),
                dtype=jnp.float32)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 8, dim)),
                                jnp.asarray([8]))["params"]
            if ckpt:
                params, _ = load_params(ckpt, params)

            def apply(p, feats):
                logits, _ = model.apply(
                    {"params": p}, feats[None],
                    jnp.asarray([feats.shape[0]], jnp.int32))
                return jax.nn.log_softmax(logits[0], -1)
        else:
            raise ValueError(f"unknown model type {typ!r}")

        def save(params, path):
            save_params(path, jax.device_get(params))

        return apply, params, save

    def _segmentwise(self, update_mode: str) -> int:
        """supervised-segmentwise-training / batch-estimation: lattice-
        based discriminative training per the [sequence-training]
        section (reference Nn::SegmentwiseNnTrainer via
        src/Tools/NnTrainer/NnTrainer.cc:133-144)."""
        import optax
        from ..am.acoustic_model import AcousticModel
        from ..nn.segmentwise_trainer import SegmentwiseNnTrainer
        corpus = CorpusDescription(self.config.sub("corpus"))
        lexicon = Lexicon(self.config.sub("lexicon"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path"))
        am = AcousticModel.create(self.config.sub("acoustic-model"),
                                  lexicon)
        st = self.config.sub("sequence-training")
        opt_cfg = self.config.sub("optimizer")
        lr = float(opt_cfg.get("learning-rate") or 1e-4)
        if (opt_cfg.get("type") or "adam").lower() == "rprop":
            from ..nn.optim import rprop
            optimizer = rprop(init_step=lr)
        else:
            optimizer = optax.adam(lr)
        lm = None
        if self.config.sub("lm").get("file"):
            from ..lm import ArpaLm, ScaledLanguageModel
            lm_cfg = self.config.sub("lm")
            lm = ScaledLanguageModel(ArpaLm(lm_cfg.get("file")),
                                     float(lm_cfg.get("scale") or 1.0))

        first = None
        for seg in corpus.segments():
            try:
                first = cache.features(seg.full_name)
                break
            except KeyError:
                continue
        if first is None:
            raise ValueError("no features found for any segment")
        apply, params, save = self._frame_model(first.shape[1])
        trainer = SegmentwiseNnTrainer(
            am, apply, params, optimizer,
            criterion=(st.get("criterion") or "mmi").lower(),
            am_scale=float(st.get("am-scale") or 1.0),
            lm_scale=float(st.get("lm-scale") or 1.0),
            frame_rejection_threshold=float(
                st.get("frame-rejection-threshold") or 0.0),
            beam_size=int(st.get("denominator-beam-size") or 128),
            lm=lm, update_mode=update_mode)
        epochs = int(self.config.sub("trainer").get("epochs") or 1)
        for _epoch in range(epochs):
            for seg in corpus.segments():
                try:
                    feats = cache.features(seg.full_name)
                except KeyError:
                    continue
                trainer.process_segment(feats, seg.orth or "")
        if update_mode == "batch":
            trainer.estimate()
        ckpt = self.config.sub("trainer").get("checkpoint") \
            or "model.msgpack"
        save(trainer.params, ckpt)
        for k, v in trainer.stats.summary().items():
            self.log("%s: %s", k, v)
        self.log("saved checkpoint -> %s", ckpt)
        return 0

    def action_supervised_segmentwise_training(self) -> int:
        return self._segmentwise("segment")

    def action_batch_estimation(self) -> int:
        return self._segmentwise("batch")

    def action_unsupervised_training(self) -> int:
        """Self-training without transcriptions: CTC pseudo-labels from
        the current model's greedy decode supervise the next step (the
        reference's unsupervised action trains from the un-labeled
        buffered feature stream, src/Tools/NnTrainer/NnTrainer.cc:185;
        pseudo-label self-training is its modern realization)."""
        import jax.numpy as jnp
        from ..nn.checkpoint import load_params, save_params
        corpus = CorpusDescription(self.config.sub("corpus"))
        lexicon = Lexicon(self.config.sub("lexicon"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path"))
        t = self.config.sub("trainer")
        batch_size = int(t.get("batch-size") or 8)
        epochs = int(t.get("epochs") or 1)
        data: List[np.ndarray] = []
        for seg in corpus.segments():
            try:
                data.append(cache.features(seg.full_name))
            except KeyError:
                continue
        if not data:
            raise ValueError("no training data")
        dim = data[0].shape[1]
        model, trainer = self._model_and_trainer(dim, len(lexicon.lemmas))
        resume = t.get("resume") or ""
        if resume:
            trainer.params, step = load_params(resume, trainer.params)
            trainer.step = step
        lp_fn = trainer.log_probs_fn()
        data.sort(key=len)
        trained = skipped = 0
        for _epoch in range(epochs):
            for start in range(0, len(data), batch_size):
                chunk = data[start:start + batch_size]
                dp = trainer.mesh.shape.get("data", 1)
                while len(chunk) % dp:
                    chunk = chunk + chunk[:dp - len(chunk) % dp]
                pad_T = -(-max(len(f) for f in chunk) // 32) * 32
                feats = np.zeros((len(chunk), pad_T, dim), np.float32)
                fl = np.zeros((len(chunk),), np.int32)
                for i, f in enumerate(chunk):
                    feats[i, :len(f)] = f[:pad_T]
                    fl[i] = min(len(f), pad_T)
                lp, out_lens = lp_fn(trainer.params, jnp.asarray(feats),
                                     jnp.asarray(fl))
                hyp = np.asarray(lp).argmax(-1)
                items = []
                for i in range(len(chunk)):
                    seq, prev = [], 0
                    for u in hyp[i, :int(out_lens[i])]:
                        if u != 0 and u != prev:
                            seq.append(int(u))
                        prev = u
                    items.append((chunk[i], seq))
                if all(not l for _f, l in items):
                    skipped += 1
                    continue
                items = [(f, l if l else [1]) for f, l in items]
                pad_L = max(len(l) for _f, l in items)
                bf, bfl, bl, bll = _pad_batch(items, pad_T, pad_L)
                trainer.train_step(bf, bfl, bl, bll)
                trained += 1
        ckpt = t.get("checkpoint") or "model.msgpack"
        save_params(ckpt, trainer.params, step=trainer.step)
        self.log("unsupervised: %d batches trained, %d skipped -> %s",
                 trained, skipped, ckpt)
        return 0

    def action_compute_priors(self) -> int:
        """Label priors by averaging model posteriors over the corpus
        (reference Nn::Prior, src/Nn/Prior.hh)."""
        import jax
        import jax.numpy as jnp
        from ..models import ConformerCtc
        from ..nn.checkpoint import load_params
        corpus = CorpusDescription(self.config.sub("corpus"))
        lexicon = Lexicon(self.config.sub("lexicon"))
        cache = FeatureCacheReader(self.config.sub("feature-cache").get("path"))
        t = self.config.sub("trainer")
        dim = None
        acc = None
        count = 0
        model, trainer = None, None
        for seg in corpus.segments():
            try:
                feats = cache.features(seg.full_name)
            except KeyError:
                continue
            if model is None:
                dim = feats.shape[1]
                model, trainer = self._model_and_trainer(
                    dim, len(lexicon.lemmas))
                trainer.params, _ = load_params(t.get("checkpoint"),
                                                trainer.params)
                fwd = trainer.log_probs_fn()
            lp, out_lens = fwd(trainer.params, jnp.asarray(feats)[None],
                               jnp.asarray([len(feats)], jnp.int32))
            probs = np.exp(np.asarray(lp[0, :int(out_lens[0])]))
            acc = probs.sum(0) if acc is None else acc + probs.sum(0)
            count += probs.shape[0]
        # raw statistics (sum of posteriors + frame count): the
        # distributable artifact; combine-statistics merges them
        # (reference Nn::Statistics combine-parallel IO,
        # src/Nn/Statistics.hh; nn-trainer combine-statistics,
        # src/Tools/NnTrainer/NnTrainer.cc:157-162)
        stats_out = t.get("statistics-file")
        if stats_out:
            np.savez(stats_out, sum=acc, count=np.asarray([count]))
            self.log("posterior statistics over %d frames -> %s",
                     count, stats_out)
        priors = np.log(np.maximum(acc / count, 1e-20))
        out = t.get("prior-file") or "priors.xml"
        from ..math.matrix_io import write_vector
        write_vector(out, priors.astype(np.float32))
        self.log("priors over %d frames -> %s", count, out)
        return 0

    def action_combine_statistics(self) -> int:
        """Merge statistics files from partitioned corpus runs — the
        reference's distributed-training reduce step
        (src/Tools/NnTrainer/NnTrainer.cc:157 combine-statistics over
        Nn::Statistics accumulator files).  Accepts the posterior
        statistics written by compute-priors (sum/count npz) and any
        npz whose arrays combine additively."""
        t = self.config.sub("trainer")
        files = (t.get("statistics-files") or "").split()
        if not files:
            raise ValueError("no statistics-files configured")
        totals = None
        for f in files:
            z = np.load(f)
            if totals is None:
                totals = {k: z[k].copy() for k in z.files}
            else:
                for k in z.files:
                    totals[k] = totals[k] + z[k]
        out = t.get("statistics-file") or "combined.stats.npz"
        np.savez(out, **totals)
        self.log("combined %d statistics files -> %s", len(files), out)
        # optionally re-estimate priors from the combined statistics
        prior_out = t.get("prior-file")
        if prior_out and "sum" in totals and "count" in totals:
            priors = np.log(np.maximum(
                totals["sum"] / max(float(totals["count"][0]), 1.0),
                1e-20))
            from ..math.matrix_io import write_vector
            write_vector(prior_out, priors.astype(np.float32))
            self.log("priors from combined statistics -> %s", prior_out)
        return 0

    def action_log_prior_from_mixture_set(self) -> int:
        """Log priors from a mixture set's per-mixture observation mass
        (reference get-log-prior-from-mixture-set,
        src/Tools/NnTrainer/NnTrainer.cc:154; Nn::Prior from mixture
        weights)."""
        from ..mm.mixture_set import MixtureSet
        t = self.config.sub("trainer")
        ms = MixtureSet.read_pms(t.get("mixture-set-file"))
        w = np.zeros(ms.n_mixtures)
        for i, mix in enumerate(ms.mixtures):
            w[i] = float(np.sum(np.exp(mix.log_weights)))
        priors = np.log(np.maximum(w / w.sum(), 1e-20))
        out = t.get("prior-file") or "priors.xml"
        from ..math.matrix_io import write_vector
        write_vector(out, priors.astype(np.float32))
        self.log("mixture-set priors (%d classes) -> %s",
                 ms.n_mixtures, out)
        return 0

    def action_estimate_mean_and_std(self) -> int:
        """Corpus feature mean/standard deviation for input normalization
        (reference estimate-mean-and-standard-deviation,
        src/Tools/NnTrainer/NnTrainer.cc:163)."""
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path"))
        t = self.config.sub("trainer")
        s = s2 = None
        n = 0
        for seg in corpus.segments():
            try:
                feats = cache.features(seg.full_name).astype(np.float64)
            except KeyError:
                continue
            if s is None:
                s = feats.sum(0)
                s2 = (feats * feats).sum(0)
            else:
                s += feats.sum(0)
                s2 += (feats * feats).sum(0)
            n += len(feats)
        if not n:
            raise ValueError("no features found")
        mean = s / n
        std = np.sqrt(np.maximum(s2 / n - mean * mean, 1e-12))
        from ..math.matrix_io import write_vector
        mean_out = t.get("mean-file") or "mean.xml"
        std_out = t.get("standard-deviation-file") or "std.xml"
        write_vector(mean_out, mean.astype(np.float32))
        write_vector(std_out, std.astype(np.float32))
        self.log("mean/std over %d frames -> %s / %s", n, mean_out,
                 std_out)
        return 0

    def action_show_statistics(self) -> int:
        t = self.config.sub("trainer")
        z = np.load(t.get("statistics-file"))
        for k in z.files:
            arr = z[k]
            print(f"{k}: shape={arr.shape} sum={float(arr.sum()):.6g} "
                  f"min={float(arr.min()):.6g} max={float(arr.max()):.6g}")
        return 0

    def action_init(self) -> int:
        from ..nn.checkpoint import save_params
        lexicon = Lexicon(self.config.sub("lexicon"))
        t = self.config.sub("trainer")
        dim = int(self.config.sub("model").get("feature-dim") or 80)
        model, trainer = self._model_and_trainer(dim, len(lexicon.lemmas))
        ckpt = t.get("checkpoint") or "model.msgpack"
        save_params(ckpt, trainer.params, step=0)
        self.log("initialized checkpoint -> %s", ckpt)
        return 0

    def run(self) -> int:
        action = self.config.get("action")
        dispatch = {
            "supervised-training": self.action_supervised_training,
            "supervised-segmentwise-training":
                self.action_supervised_segmentwise_training,
            "batch-estimation": self.action_batch_estimation,
            "unsupervised-training": self.action_unsupervised_training,
            "compute-priors": self.action_compute_priors,
            "combine-statistics": self.action_combine_statistics,
            "get-log-prior-from-mixture-set":
                self.action_log_prior_from_mixture_set,
            "estimate-mean-and-standard-deviation":
                self.action_estimate_mean_and_std,
            "show-statistics": self.action_show_statistics,
            "init": self.action_init,
            "init-network": self.action_init,
        }
        if action not in dispatch:
            raise ValueError(f"unknown action {action!r}; "
                             f"known: {sorted(dispatch)}")
        return dispatch[action]()


def main(argv=None) -> int:
    return NnTrainerApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
