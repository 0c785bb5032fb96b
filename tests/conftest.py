"""Test configuration: force the CPU backend with 8 virtual devices so mesh /
sharding tests run without TPU hardware, matching the driver's
dryrun_multichip validation environment.

The axon sitecustomize hook sets ``jax_platforms="axon,cpu"`` at interpreter
start, which overrides the JAX_PLATFORMS env var — so we override the config
value itself (the backend initializes lazily, well after conftest import)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated test runs skip recompilation. Keyed by
# a CPU-feature fingerprint — XLA:CPU AOT artifacts compiled on a host with
# different vector extensions replay with shifted numerics (or SIGILL) when
# the underlying machine changes, which broke golden-parity tolerances once.
def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# Test tiers. `slow` (full-size golden parity, cross-stack runs) is marked at
# the test sites; `heavy` is maintained here centrally from measured wall
# times on a 1-core host (>=10s per test, or a full main() CLI run), so the
# fast tier
#
#     python -m pytest tests/ -q -m "not slow and not heavy"
#
# gives a full-signal green/red answer in under 5 minutes on one core.
# Everything still runs in the default (unfiltered) invocation.
import pytest  # noqa: E402

_HEAVY = {
    # full main() CLI e2e runs (one fresh XLA compile each, 50-140s)
    "test_training_simple.py::test_training_synthetic",
    "test_training_simple.py::test_training_accum_and_remat",
    "test_training_simple.py::test_training_resume_latest",
    "test_training_simple.py::test_training_resume_from_epoch_latest",
    "test_training_simple.py::test_training_native_ckpt",
    "test_training_simple.py::test_training_with_val_data",
    "test_training_simple.py::test_training_webdataset",
    "test_training_simple.py::test_training_wandb_offline",
    "test_training_simple.py::test_training_parallelism_zero",
    "test_training_simple.py::test_training_parallelism_tp",
    "test_training_simple.py::test_training_parallelism_zero_accum",
    "test_training_simple.py::test_training_profile_steps",
    "test_training_simple.py::test_training_parallelism_pp",
    "test_training_simple.py::test_training_parallelism_sp",
    # measured >=10s each (tests/ on one core, warm compile cache)
    "test_train.py::TestTowerLocking::test_frozen_params_do_not_move",
    "test_train.py::test_gather_without_grad_semantics",
    "test_train.py::test_clip_loss_matches_reference_torch",
    "test_train.py::test_sharded_local_loss_equals_global",
    "test_train.py::test_pjit_distill_matches_shard_map",
    "test_coca.py::test_coca_roberta_forward_shapes",
    "test_coca.py::test_coca_pjit_step_matches_shard_map",
    "test_coca.py::test_coca_step_grads",
    "test_sp.py::test_sp_train_step_matches_dp",
    "test_sp.py::test_sp_causal_mask_and_layerscale",
    "test_sp.py::test_sp_forward_matches_sequential_padded",
    "test_sp.py::test_sp_forward_matches_sequential_divisible",
    "test_hf_text.py::test_hf_tower_parity_vs_reference[mean_pooler-linear]",
    "test_tp.py::test_tp_step_matches_dp",
    "test_pp.py::test_pp_train_step_matches_dp",
    "test_model_parity.py::TestSmallModels::test_resnet_parity",
    "test_native_timm_registry.py::test_bf16_forward_every_family",
    "test_golden_regression.py::test_golden_regression[nllb-clip-base]",
    "test_golden_regression.py::test_golden_regression[MobileCLIP-S1]",
    "test_golden_regression.py::test_golden_regression[swin_tiny_patch4_window7_224]",
    "test_golden_regression.py::test_golden_regression[ViTamin-S]",
    "test_golden_regression.py::test_golden_regression[coca_base]",
    "test_golden_regression.py::test_golden_regression[convnext_tiny]",
    "test_golden_regression.py::test_golden_regression[ViT-B-16-SigLIP]",
    "test_golden_regression.py::test_golden_regression[RN50]",
    "test_mobileclip.py::test_fastvit_trains_through_step",
    "test_interp.py::TestCircuitProtocol::test_sae_basis_circuit",
    # second wave (measured 7-17s in the tier run); every subsystem keeps at
    # least one cheap numerics test in the fast tier
    "test_interp.py::TestCircuitProtocol::test_full_class_circuit",
    "test_interp.py::TestCircuitProtocol::test_activations_and_resume",
    "test_train.py::test_siglip_ring_equals_dense",
    "test_train.py::test_train_step_resnet_smoke",
    "test_coca.py::test_coca_roberta_golden_parity",
    "test_coca.py::TestCoCaLocal::test_forward_shapes",
    "test_coca.py::test_coca_training_cli",
    "test_ops.py::test_pallas_bottleneck_matches_xla_path",
    "test_mobileclip.py::test_fastvit_forward_shapes_and_state",
    "test_hf_text.py::test_clip_model_with_hf_text_tower",
    "test_evals.py::test_eval_precision_numerics",
    "test_aux.py::test_supervised_classifier_smoke",
    "test_native_timm_registry.py::test_stateless_wrapping_uniform",
    "test_model_parity.py::TestSmallModels::test_resnet_quickgelu_parity",
    "test_convnext.py::test_clip_integration",
    "test_pp.py::test_pp_grads_match_sequential",
    "test_swin.py::test_forward_shapes_and_capture",
    "test_vitamin.py::test_forward_shapes_and_capture",
    "test_train.py::TestTowerLocking::test_text_lock_and_rn_all_or_nothing",
    "test_model_parity.py::test_force_image_size_pos_embed_resize",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _HEAVY:
            item.add_marker(pytest.mark.heavy)
    # Loud notice when the reference tree is absent: the suite's strongest
    # guarantees (cross-stack train/eval parity, tokenizer/scheduler/script
    # byte-parity) silently become skips without /root/reference — surface
    # the count so a green run can't be mistaken for a fully-anchored one.
    if not os.path.exists("/root/reference"):
        n = sum(
            1 for item in items
            for m in item.iter_markers("skipif")
            if m.args and m.args[0]
            and "reference tree not mounted" in str(m.kwargs.get("reason", ""))
        )
        if n:
            config._xclip_ref_skips = n


def pytest_report_header(config):
    # runs pre-collection, so no count yet — the terminal summary carries it
    if not os.path.exists("/root/reference"):
        return ("WARNING: /root/reference NOT mounted — reference-anchored "
                "parity tests will SKIP; green here is weaker than full CI green")


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    n = getattr(config, "_xclip_ref_skips", None)
    if n:
        terminalreporter.write_sep(
            "!",
            f"/root/reference NOT mounted: {n} reference-anchored parity tests "
            "were SKIPPED — this run does not verify reference parity",
        )
