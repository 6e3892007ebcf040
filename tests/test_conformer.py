

import jax.numpy as jnp


class TestPresets:
    def test_presets_construct_and_run(self):
        import jax
        from rasr_tpu.models.presets import (CONFORMER_PRESETS, aed,
                                             conformer_ctc, transducer)
        assert set(CONFORMER_PRESETS) >= {"conformer-s", "conformer-m",
                                          "conformer-l", "conformer-xl"}
        m = conformer_ctc("conformer-s", vocab_size=32, n_layers=1,
                          dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 8)),
                   jnp.asarray([16]))
        logits, out_lens, _ = m.apply(v, jnp.zeros((1, 16, 8)),
                                      jnp.asarray([16]),
                                      deterministic=True)
        assert logits.shape[-1] == 32
        aed("conformer-s", vocab_size=16, n_layers=1, dtype=jnp.float32)
        transducer("conformer-s", vocab_size=16, n_layers=1,
                   dtype=jnp.float32)
