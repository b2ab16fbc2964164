"""Multi-host helpers on a single process (the degenerate-but-common case)."""
import numpy as np
import jax.numpy as jnp

from nerf_tpu.parallel import multihost as mh


def test_single_process_semantics():
    assert mh.process_index() == 0
    assert mh.process_count() >= 1
    assert mh.is_main_process()
    mh.barrier("test")  # no-op, must not hang

    tree = {"a": jnp.arange(4), "b": [jnp.ones((2, 2))]}
    out = mh.broadcast_from_main(tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(4))

    g = mh.gather_to_main(jnp.arange(3))
    assert g.shape == (1, 3)  # leading per-host axis

    local = mh.fully_replicated_host_local(tree)
    assert isinstance(local["a"], np.ndarray)
    assert isinstance(local["b"][0], np.ndarray)
