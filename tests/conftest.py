"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Sharding/multi-host behavior is tested without TPU hardware via
xla_force_host_platform_device_count, the analog of the reference's sw_emu
Vitis target (functional emulation without the card, Makefile:114-138).
Pallas kernels run in interpreter mode on CPU (auto-detected).

Set SPMV_TPU_TESTS=1 to instead run the on-hardware smoke suite
(`-m tpu`, tests/test_tpu_smoke.py) on the real chip — the analog of the
reference's hw target; everything else is skipped in that mode:

    SPMV_TPU_TESTS=1 python -m pytest tests -m tpu -q
"""

import os

import numpy as np
import pytest

TPU_RUN = os.environ.get("SPMV_TPU_TESTS") == "1"

if not TPU_RUN:
    # The axon environment pre-imports jax from sitecustomize, so
    # JAX_PLATFORMS is already latched — update the live config instead
    # of the env var.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "backend_optimization_level" not in flags:
        # The suite's wall time is dominated by XLA:CPU (LLVM) compiles
        # of interpret-mode kernel programs; -O0 cuts the full suite
        # ~35% (test_octet: 143 -> 94 s measured) with all assertions
        # green — these programs run once on tiny data, codegen quality
        # is irrelevant.
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")

    # Interpret-mode program size (and so XLA:CPU compile time, the
    # suite's dominant cost) scales with chunks-per-block = geometry the
    # production defaults size for a 16 GB HBM chip (512/1024 sublanes),
    # 16x what a 2k-row interpret corpus needs. Tests that leave the
    # geometry at its defaults get small blocks; any test that sets
    # block_sublanes or fused_block_sublanes explicitly is untouched.
    # (Measured: the rest-of-suite block dropped 1140 s -> see PROGRESS;
    # the code paths are identical — one-vs-many blocks is exercised by
    # the tests that pick their geometry.)
    import spmv_topk_tpu.config as _cfg

    _orig_post_init = _cfg.TopKSpMVConfig.__post_init__

    def _test_post_init(self):
        if self.block_sublanes == 512 and self.fused_block_sublanes == 1024:
            object.__setattr__(self, "block_sublanes", 64)
            object.__setattr__(self, "fused_block_sublanes", 128)
        _orig_post_init(self)

    _cfg.TopKSpMVConfig.__post_init__ = _test_post_init


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not TPU_RUN:
            item.add_marker(pytest.mark.skip(
                reason="on-TPU smoke test: set SPMV_TPU_TESTS=1 on a TPU host"))
        elif TPU_RUN and "tpu" not in item.keywords:
            item.add_marker(pytest.mark.skip(
                reason="CPU-suite test skipped during the TPU smoke run"))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The suite compiles hundreds of distinct XLA:CPU programs in one
    process; with all of them kept loaded, a later LLVM JIT compile can
    segfault (observed deterministically at ~80 programs on jax 0.9.0,
    always inside backend_compile_and_load). Dropping the pjit/pallas
    executable caches between modules keeps the resident JIT state small.
    """
    yield
    import jax

    jax.clear_caches()


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _bound_resident_programs():
    """Also clear every few tests WITHIN a module.

    The heavy kernel modules (test_fused: ~40 tests, several compiles
    each) can cross the ~80-resident-program segfault threshold on their
    own — the per-module clear above is not enough (observed once at
    test_fused mid-module in a full-suite run). Intra-module sharing of
    compiled programs is rare (each test builds fresh shapes/configs), so
    the recompile cost of clearing every 4th test is small.
    """
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 4:
        _TESTS_SINCE_CLEAR[0] = 0
        import jax

        jax.clear_caches()
