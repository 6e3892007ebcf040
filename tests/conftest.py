"""Test configuration: force an 8-virtual-device CPU platform so
sharding/collective code paths run locally and deterministically.

NOTE: this environment pre-imports jax from sitecustomize (the TPU tunnel
plugin), so setting JAX_PLATFORMS via os.environ here is too late — the
config API must be used before any backend is initialized.
"""

import os

# keep env consistent for subprocesses spawned by tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU, got " + jax.default_backend())
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


# ---------------------------------------------------------------------------
# fast / slow test tiers
#
# `pytest -m fast` is the CI-style gate (<2 min) covering the end-to-end
# recipes plus one representative suite per subsystem; `-m "not slow"`
# skips only the long-running convergence/scaling tests.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

# individually heavy tests (>8 s wall on the CI box)
SLOW_TESTS = {
    "test_ring_attention.py::TestRingAttention::test_grad_flows",
    "test_ring_attention.py::TestRingAttention::test_matches_full_attention",
    "test_ring_attention.py::TestRingAttention::test_with_length_mask",
    "test_math_solvers.py::TestLbfgs::test_rosenbrock",
    "test_online_recognizer.py::TestOnlineRecognizer::"
    "test_streaming_matches_offline",
    "test_online_recognizer.py::TestOnlineRecognizer::"
    "test_partials_are_prefixes",
    "test_models.py::TestShardedTraining::test_train_step_decreases_loss",
    "test_models.py::TestCausalStreaming::test_prefix_outputs_equal_full",
    "test_recognizer_tool.py::TestBatchedRecognizer::"
    "test_bucketing_matches_single",
    "test_nn_trainer_tool.py::TestNnTrainerTool::"
    "test_supervised_training_and_priors",
    "test_signal.py::TestVoicedness::test_periodic_vs_noise",
    "test_pipeline_parallel.py::test_pipelined_trainer_converges",
    "test_tp_conformer.py::test_3d_trainer_smoke_and_converges",
    "test_tp_conformer.py::test_3d_trainer_from_config",
    "test_tp_conformer.py::test_3d_forward_is_differentiable",
}

# modules whose (non-slow) tests form the fast gate; includes every
# config-driven recipe test
FAST_MODULES = {
    "test_full_recipe.py", "test_flf_tool_config.py", "test_flf.py",
    "test_flf_core.py", "test_flf_nodes.py", "test_api.py",
    "test_tools.py", "test_recognizer_tool.py", "test_core.py",
    "test_bliss.py", "test_fsa.py", "test_fsa_io.py", "test_lm.py",
    "test_mm.py", "test_cart.py", "test_alignment.py", "test_flow.py",
    "test_hmm_search.py", "test_tree_search.py", "test_ctc_decode.py",
    "test_lattice_transform.py", "test_orthography.py",
    "test_analog.py", "test_am_trainer.py", "test_sparse_cachemgr.py",
    "test_checkpoint_manager.py", "test_native_io.py",
    "test_bliss_tools.py", "test_mt_aligner.py", "test_archive.py",
    "test_flow_tier3.py", "test_flow_speech_nodes.py",
    "test_quantized.py", "test_native_beam.py",
    "test_sat_recognition.py", "test_cart_hybrid.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running convergence/scale test")
    config.addinivalue_line(
        "markers", "fast: CI fast-gate test (recipes + per-layer units)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = os.path.basename(item.fspath.strpath)
        nodeid_tail = f"{module}::{item.nodeid.split('::', 1)[1]}" \
            if "::" in item.nodeid else module
        if nodeid_tail in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        elif module in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
