"""Model registry: both flagship pipelines build, jit, and run."""

import jax
import numpy as np
import pytest

from point_cloud_tpu.models import PIPELINES, get_pipeline


@pytest.mark.parametrize("name", PIPELINES)
def test_pipeline_compiles_and_runs(name):
    fn, args = get_pipeline(name, n=4096)
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_unknown_pipeline():
    with pytest.raises(KeyError):
        get_pipeline("nope")


def test_entry_binds_conversion():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    packed = np.asarray(out[0])
    assert packed.shape[0] == 1 << 16
