"""Test config: run everything on CPU with 8 virtual devices so shard_map /
psum paths are exercised for real (SURVEY.md §4 implication).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
we must force the platform via jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache for the jitted tests (measured: the suite is
# trace/dispatch-bound rather than compile-bound, so the win is small — but
# the cache is free and helps the heavier jit tests on repeated runs)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


# ---------------------------------------------------------------------------
# Fast profile: `pytest -m "not slow"` for iteration; the full suite stays
# the CI gate. Measured on this image (8-virtual-device CPU conftest):
# fast profile ~7:30 warm cache / >10 min cold; full suite ~20+ min.
# Membership is measured by --durations (tests >= ~6 s), kept here centrally
# so re-tiering after a perf change is a one-list edit.
import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_near_optimal_vs_exhaustive",
    "test_conformer_data_parallel_matches_single",
    "test_conformer_trains_and_decodes",
    "test_weight_noise_perturbs_loss_and_keeps_grads_finite",
    "test_weight_noise_zero_is_identity_and_eval_ignores_it",
    "test_weight_noise_train_step_runs",
    "test_stateless_trains",
    "test_dryrun_multichip_reexec_from_one_device",
    "test_dryrun_multichip_direct",
    "test_zero_step_matches_replicated",
    "test_zero_composes_with_tp_and_accum",
    "test_zero_checkpoint_roundtrip",
    "test_trainer_fit_with_zero_sharding",
    "test_logmel_bundle_roundtrip",
    "test_wav_bundle_matches_live_frontend_decode",
    "test_multiplatform_export_serializes",
    "test_beam_bundle_matches_live_batched_beam",
    "test_streaming_bundle_matches_live_streaming",
    "test_dropout_config_trains",
    "test_pipeline_matches_stacked_rnn",
    "test_pipeline_multilayer_stages_and_per_layer_layout",
    "test_pipeline_encoder_wrapper",
    "test_beam_finds_high_probability_sequences",
    "test_scan_layers_matches_loop_layers",
    "test_scan_matches_oracle",
    "test_recognizer_end_to_end",
    "test_fit_validate_checkpoint_resume",
    "test_fit_raw_pcm_waveform_dataset",
    "test_fit_raw_pcm_int16_transfer",
    "test_pad_embedding_is_zero",
    "test_remat_scan_layers_trains",
    "test_fused_loss_matches_unfused",
    "test_fuzz_loss_and_grad_parity",
    "test_lattice_shape_and_finite",
    "test_joint_add_mode",
    "test_data_parallel_8_devices_matches_single",
    "test_grad_accum_matches_big_batch",
    "test_long_form_audio_trains",
    "test_beam1_equals_greedy",
    "test_checkpoint_roundtrip",
    "test_batched_beam_matches_numpy_oracle",
    "test_fit_no_double_save_when_max_steps_hits_val_interval",
    "test_loss_decreases",
    "test_convert_to_orbax_roundtrip",
    "test_streaming_beam_lm_matches_offline_beam_lm",
    "test_streaming_socket_server_lm_fusion",
    "test_trainer_fit_model_parallel",
    "test_checkpoint_cross_topology_dp_to_tp",
    "test_tensor_parallel_train_step_matches_single",
    "test_wavefront_matches_stacked_rnn",
    "test_wavefront_encoder_and_padding",
    "test_wavefront_single_layer",
    "test_train_step_with_reduction",
    "test_reduction_matches_manual_composition",
    "test_greedy_decode_respects_reduced_lengths",
    "test_checkpoint_averaging",
    "test_server_drain_waits_for_inflight",
    "test_server_drain_timeout_reports_false",
    "test_serve_cli_sigterm_drains",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True)
def _vm_map_guard():
    """Keep the process under vm.max_map_count (65530).

    Root cause of the round-2 full-suite SIGSEGV/SIGABRT at
    ``test_fit_validate_checkpoint_resume`` (~test 171 of 179): every
    XLA:CPU executable the suite compiles stays in jax's in-process caches
    holding its JIT code mappings; the map count grows linearly with tests
    (~33k after ~170) until mmap fails with ENOMEM and jaxlib dies throwing
    ``std::bad_alloc`` mid-compile (core-dump analysis in
    rnntransducer_tpu/utils/resource_guard.py).  Clearing jax's caches past
    a threshold bounds the growth; the persistent compilation cache above
    makes the re-compiles cheap."""
    from rnntransducer_tpu.utils.resource_guard import maybe_clear_jax_caches

    yield
    maybe_clear_jax_caches()


@pytest.fixture(autouse=True)
def _no_leaked_server_threads():
    """Fail any test that leaks a StreamingServer accept loop.  Round-2 crash
    dumps showed six `_accept_loop` threads still blocked in accept() after
    their `with StreamingServer(...)` blocks exited — stop() closed the fd
    without shutdown(), which does not wake a thread blocked in accept()."""
    import threading
    import time

    yield
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        leaked = [t.name for t in threading.enumerate()
                  if "_accept_loop" in t.name and t.is_alive()]
        if not leaked:
            return
        time.sleep(0.05)
    pytest.fail(f"leaked StreamingServer accept-loop threads: {leaked}")
