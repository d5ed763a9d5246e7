"""Device prefetch: order preservation, depth handling, sharded placement."""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lrce_tpu.data.prefetch import device_prefetch


def test_prefetch_preserves_order_and_count():
    batches = [(np.full((4,), i), np.full((4, 2), i)) for i in range(7)]
    out = list(device_prefetch(batches, depth=3))
    assert len(out) == 7
    for i, (a, b) in enumerate(out):
        assert isinstance(a, jax.Array)
        np.testing.assert_array_equal(np.asarray(a), np.full((4,), i))


def test_prefetch_short_iterator():
    batches = [(np.zeros(2),)]
    out = list(device_prefetch(batches, depth=4))
    assert len(out) == 1


def test_prefetch_empty():
    assert list(device_prefetch([], depth=2)) == []


def test_prefetch_sharded_placement():
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    batches = [(np.arange(16, dtype=np.float32).reshape(16, 1),)
               for _ in range(3)]
    out = list(device_prefetch(batches, sharding=sh))
    for (a,) in out:
        assert a.sharding == sh
