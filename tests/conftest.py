"""Test harness: force an 8-device CPU platform so multi-device sharding
paths are exercised without TPU hardware (better than the reference's
single-GPU-only CI — see SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when the axon TPU plugin is present —
# force the CPU platform explicitly so tests never run on the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# Test tiers (VERDICT r2 item 8): the default tier (`pytest -m "not slow
# and not medium"`) is the pre-commit loop and must stay <= ~3 min on the
# 8-virtual-CPU harness. Tests below were measured >= ~5 s (compile-heavy
# parity/gradient checks) and are auto-marked `medium`; run them with
# `pytest -m "not slow"` (the pre-merge tier) or plain `pytest` for
# everything. Matching is by nodeid substring so parametrized variants
# tier together.
MEDIUM_TESTS = (
    "test_att_context_and_dist.py::test_limited_context_differs",
    "test_flash_mhsa.py::test_encoder_flash",
    "test_flash_mhsa.py::test_flash_under_pjit_mesh",
    "test_flash_mhsa.py::test_gradient_parity",
    "test_beam_search.py::TestRNNTBeam::test_runs_and_returns",
    "test_beam_search.py::TestRNNTBeamBatched::test_score_monotone",
    "test_checkpoint_logger.py::test_frozen_prefix_partial_save",
    "test_checkpoint_logger.py::test_sequence_checkpointer_full_train",
    "test_checkpoint_logger.py::test_sequence_resume_across_scan",
    "test_conformer.py::test_encoder_shapes_and_lengths",
    "test_conformer.py::test_frozen_till_stops_gradients",
    "test_conformer.py::test_padding_invariance",
    "test_decoding.py::TestRNNTGreedy::test_matches_python_oracle",
    "test_eval.py::test_compute_wer_random_model_is_high",
    "test_eval.py::test_run_eval_metric_names",
    "test_features.py::TestSpecAugment::test_mask_distribution",
    "test_features.py::test_dither_only_when_training",
    "test_features.py::test_matmul_rdft_matches_fft",
    "test_features.py::test_pad_to_multiple",
    "test_hybrid_model.py::test_lstm_matches_torch",
    "test_joint_fused_pallas.py::test_loss_and_grads_match_xla_impl",
    "test_longformer_attention.py::test_no_global_tokens_param_tree",
    "test_losses.py::TestCTCLoss::test_matches_numpy_and_torch",
    "test_losses.py::TestCTCLoss::test_mean_batch_reduction",
    "test_losses.py::TestCTCNativeGradients::",
    "test_losses.py::TestRNNTLoss::",
    "test_results_analysis.py::test_generate_report",
    "test_results_analysis.py::test_plot_stats_families",
    "test_rnnt_fused.py::test_fused_chunk_size_invariance",
    "test_rnnt_fused.py::test_fused_dropout_deterministic",
    "test_rnnt_fused.py::test_fused_equals_materialized",
    "test_rnnt_pallas.py::test_full_loss_pallas_backend_matches_scan",
    "test_rnnt_variants.py::test_multiblank_matches_oracle",
    "test_rnnt_variants.py::test_variants_are_differentiable",
    "test_scan_stack.py::test_scan_frozen_output_matches_unfrozen",
    "test_scan_stack.py::test_scan_frozen_till_cuts_gradients",
    "test_scan_stack.py::test_scan_param_structure_matches",
    "test_streaming.py::test_cache_aware_matches_offline",
    "test_streaming.py::test_streaming_asr_matches_offline_greedy",
    "test_streaming.py::test_streaming_asr_partial_final_chunk",
    "test_streaming.py::test_streaming_matches_offline",
    "test_train_step.py::TestSharded::",
    "test_train_step.py::test_batch_stats_update",
    "test_train_step.py::test_frozen_params_do_not_move",
    "test_train_step.py::test_train_step_runs_and_loss_decreases",
    "test_vendored_nemo_parity.py::",
    # round-4 retune (VERDICT r3 item 8): fast tier measured 320 s vs the
    # <= 180 s target; items below measured >= ~5 s on this harness
    "test_train_step.py::test_uniform_lang_head_step_matches_per_sample",
    "test_fast_rng.py::test_forward_loss_deterministic_given_seed",
    "test_fast_rng.py::test_train_step_learns_with_fast_rng",
    "test_fast_rng.py::test_flag_off_matches_legacy_threefry",
    "test_scan_stack.py::test_partial_save_restores_across_layouts",
    "test_rnnt_fused.py::test_uniform_head_equals_per_sample_values_and_bank_grads",
    "test_rnnt_fused.py::test_fused_nonlast_blank_fallback",
    "test_rnnt_fused.py::test_uniform_head_dropout_value_and_grads",
    "test_beam_search.py::TestRNNTBeam::test_greedyish_beam1_close_to_greedy",
    "test_flash_mhsa.py::test_dropout_deterministic_and_consistent_bwd",
    "test_decode_fused.py::test_fused_long_T_multi_chunk_parity",
    # round-4b retune: fast tier crept to 235 s (new remat-invariance
    # test + fused-beam oversize check); durations-measured >= ~5 s
    "test_rnnt_fused.py::test_fused_remat_mode_invariance",
    "test_beam_fused.py::test_fused_beam_rejects_oversize",
    "test_conformer.py::test_train_mode_updates_batch_stats",
    "test_rnnt_variants.py::test_multiblank_no_bigblanks_equals_standard_rnnt",
    "test_decoding.py::TestRNNTLabelSync::test_matches_frame_sync",
    "test_beam_search.py::TestRNNTBeamBatched::test_beam1_matches_greedy_exactly",
    "test_flash_mhsa.py::test_edge_shapes",
    "test_flash_mhsa.py::test_forward_parity",
)


def pytest_collection_modifyitems(config, items):
    medium = pytest.mark.medium
    for item in items:
        if any(pat in item.nodeid for pat in MEDIUM_TESTS):
            item.add_marker(medium)
