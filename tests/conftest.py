"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``xla_force_host_platform_device_count`` (no TPU needed in CI); Pallas
kernels run in interpret mode on CPU (see psi_tpu.ops).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Full-scale sharded steps on a 1-core host serialize the 8 device
# threads, so XLA's default 40 s collective-rendezvous termination
# timeout aborts the process mid-all-reduce (rendezvous.cc CHECK).
# Raise it well past the worst compute-per-collective we run in tests.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

# Force CPU: the session env may point JAX at a tunneled TPU, which makes
# per-test compiles slow and uses bf16 matmuls by default. The env var
# alone is overridden by the TPU plugin, so use the config API.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Fast lane: `pytest -m "not slow"` (round-3 verdict item 7).
#
# Tests are marked slow from an explicit duration-derived list (every
# test measuring >=10 s call time in the round-4 full-suite run,
# /tmp-recorded `--durations=60`; the full suite is ~70 min on this
# 1-CPU box, the fast lane targets minutes). Listing nodeid substrings
# here instead of decorating each test keeps the policy in one place
# and trivially re-derivable from a fresh `--durations` run.
# ---------------------------------------------------------------------------

_SLOW_TESTS = [
    "test_serve.py::test_serving_queue_mini_soak",
    "test_fused_skinning.py::test_merged_dot_variant_matches_unmerged",
    "test_train.py::test_trainop_scan_epoch_stage_bf16",
    "test_fit_overlap.py::test_chunked_matches_batched",
    "test_fit_overlap.py::test_four_chunks",
    "test_multiprocess.py::test_two_process_population_fit",
    "test_serve.py::test_serve_cli_multi_model",
    "test_serve.py::test_serve_cli_malformed_lines",
    "test_cli.py::test_full_pipeline_synthetic",
    "test_serve.py::test_serve_cli_loop",
    "test_multiprocess.py::test_two_process_dp_train_step",
    "test_multichip_fullscale.py::test_dryrun_multichip_fullscale_8",
    "test_multichip.py::test_dryrun_multichip_8",
    "test_train.py::test_midepoch_wallclock_resume",
    "test_train.py::test_trainop_scan_epoch_chunked",
    "test_train.py::test_epoch_scan_matches_loop",
    "test_serve_mesh.py::test_mesh_engine_matches_single_device",
    "test_serve.py::test_serving_router_two_models",
    "test_fused_skinning.py::test_fit_step_fused_sharded",
    "test_fit_refresh.py::test_want_metrics_false_identical_params",
    "test_train_prune.py::test_pruned_training_loss_matches_exact",
    "test_fit_carryover.py::test_carryover_first_body_identical",
    "test_fit_refresh.py::test_sdf_warmup_gathers_off_matches_explicit_schedule",
    "test_fit_refresh.py::test_cheap_pass_exact_at_refresh_point",
    "test_fused_skinning.py::test_fit_step_fused_close_to_fast",
    "test_fused_skinning.py::test_fused_sharded_matches_unsharded",
    "test_fit_refresh.py::test_cheap_collision_verts_full_subset_is_exact",
    "test_fit_refresh.py::test_cheap_collision_verts_objective_close",
    "test_fit_refresh.py::test_sdf_warmup_gathers_off_objective_close",
    "test_fit_refresh.py::test_block_scan_matches_periter_schedule",
    "test_extras.py::test_vposer_trainer_vis",
    "test_multichip.py::test_dp_train_step_equals_single_device",
    "test_fit_refresh.py::test_refresh_final_objective_close",
    "test_multichip.py::test_dp_train_gradients_equal_single_device",
    "test_fit_prune.py::test_fitting_with_pruning_matches_exact",
    "test_serve.py::test_serving_queue_groups_by_fit_flag",
    "test_habitat_realformat.py::test_fittingop_cam_post_equivalence",
    "test_serve.py::test_engine_generate_and_fit",
    "test_fit_prune.py::test_remat_decode_equivalence",
    "test_fit_carryover.py::test_carryover_delta_measured",
    "test_habitat_realformat.py::test_habitat_pipeline_on_realformat_fixture",
    "test_gen_fit_eval.py::test_fitting_reduces_scene_losses",
    "test_serve.py::test_serving_queue_coalesces_concurrent_requests",
    "test_fit_refresh.py::test_refresh_still_reduces_collision",
    "test_train.py::test_train_step_updates_params",
    "test_fit_refresh.py::test_refresh_every_1_matches_production",
    "test_multichip.py::test_population_sharded_fitting_equals_unsharded",
    "test_train.py::test_trainop_end_to_end_and_resume",
    "test_real_npz_format.py::test_native_loader_feeds_trainop",
    "test_train.py::test_cvae_loss_all_terms_finite",
    "test_train.py::test_trainop_scan_epoch_mode",
    "test_serve.py::test_engine_coalesced_s2_model",
    "test_vposer_trainer.py::test_vposer_trainer_dp_mesh_equivalence",
    "test_body_model.py::test_body_model_with_poser",
    "test_fused_skinning.py::test_gradients_match_fast_lbs",
    "test_show_results.py::test_mixed_scene_fitting",
    "test_vposer_trainer.py::test_vposer_trainer_descends",
    "test_show_results.py::test_show_generated_results",
    "test_io_extra.py::test_fitting_verbose_trace",
    "test_gen_fit_eval.py::test_fitting_rec_anchor",
    "test_gen_fit_eval.py::test_fittingop_file_driver",
    "test_gen_fit_eval.py::test_fittingop_chunked_population",
    "test_serve.py::test_generate_coalesced_splits_rows",
    "test_reference_source_parity.py::TestLBSParity::test_lbs_f64_exact",
    "test_fused_skinning.py::test_forward_matches_fast_lbs",
    "test_train.py::test_scene_gate_zeroes_scene_losses",
    "test_data_production.py::test_virtualcam_production_to_training",
    "test_cli.py::test_habitat_cli_synthetic",
    "test_fit_refresh.py::test_cached_patch_tracks_small_displacement",
    "test_body.py::test_smplx_vertex_subset_matches_full_rows",
    "test_misc.py::test_launcher_success_and_retry",
    "test_multichip.py::test_entry_compiles",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
