import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (the fake-backend strategy SURVEY.md §4
# calls for).  Must be set before jax is imported.
_platform = os.environ.get("SSRLCV_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax and force a hardware platform via
# sitecustomize (jax.config wins over the env var) — override it back before
# any backend is initialised.
import jax

jax.config.update("jax_platforms", _platform)
# persistent compile cache: the SIFT pyramid costs ~45 s to compile cold on
# CPU; cached reruns take ~half that
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

REF_2VIEW = "/root/reference/test/checkpoints/Pipeline2View"
REF_3VIEW = "/root/reference/test/checkpoints/Pipeline3View"


def _have_ref():
    return os.path.isdir(REF_2VIEW)


requires_ref = pytest.mark.skipif(not _have_ref(), reason="reference fixtures not mounted")


@pytest.fixture(scope="session")
def fixture_2view():
    from ssrlcv_tpu.io import refdata

    if not _have_ref():
        pytest.skip("reference fixtures not mounted")
    return refdata.load_fixture_dir(REF_2VIEW, 2)


@pytest.fixture(scope="session")
def fixture_3view():
    from ssrlcv_tpu.io import refdata

    if not _have_ref():
        pytest.skip("reference fixtures not mounted")
    return refdata.load_fixture_dir(REF_3VIEW, 3)


@pytest.fixture(scope="session")
def cameras_2view(fixture_2view):
    from ssrlcv_tpu.io.images import cameras_from_refimages

    return cameras_from_refimages(fixture_2view["images"])


@pytest.fixture(scope="session")
def matchset_2view(fixture_2view):
    from ssrlcv_tpu.core.types import MatchSet

    kp_par, kp_loc = fixture_2view["keypoints0"]
    mm_num, mm_idx = fixture_2view["multimatches0"]
    return MatchSet.from_flat(kp_par, kp_loc, mm_num, mm_idx)
