"""Test harness config: run JAX on CPU with an 8-device virtual mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; unit tests
must be hermetic and fast, and the multi-chip sharding tests need >1 device,
so we force the host platform with 8 virtual devices (the same mechanism the
driver uses for dryrun_multichip).

Note: the environment may pre-import jax with a TPU plugin selected via
JAX_PLATFORMS (sitecustomize), so we override through jax.config as well as
the environment.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache ON for tests, in its own directory (separate
# from the TPU program cache): the full 437-test tier recompiles the same
# CPU programs in every process and did not finish in <55 min on a 1-core
# host without it.  Hermeticity comes from XLA's cache KEY (serialized
# HLO + compile options + backend + jax version), not from disabling the
# cache: any source change that alters a traced program changes its HLO
# and therefore its key.  UHDR_TPU_NO_CACHE=1 still opts out.
os.environ.setdefault(
    "UHDR_TPU_CACHE_DIR",
    os.path.expanduser("~/.cache/uhdr_jax_cache_cpu_tests"))
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy e2e / fuzz / sanitizer tiers. Mid tier: "
        "pytest -m 'not slow'; full tier: plain pytest.")
    config.addinivalue_line(
        "markers",
        "smoke: <2-minute tier (pytest -m smoke): fast pure-logic "
        "modules + one tiny e2e; run it every session.")


# ---------------------------------------------------------------------------
# smoke tier: `pytest -m smoke` must finish <2 min on a 1-core host (the
# full-suite gate is too slow to run every session; VERDICT r3 item 5).
# Modules here are the fast pure-logic tiers plus one tiny e2e
# (test_smoke_e2e.py); everything heavier stays in the full/slow tiers.
_SMOKE_MODULES = {
    "test_container", "test_colors", "test_agtm", "test_ops",
    "test_golden_anchors", "test_smoke_e2e",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(_pytest.mark.smoke)


