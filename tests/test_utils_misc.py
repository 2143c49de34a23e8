import numpy as np

from genefaceplusplus_tpu.ops.fastmath import fast_cos, fast_sin, fast_tanh
from genefaceplusplus_tpu.utils.meters import AvgrageMeter, Timer
from genefaceplusplus_tpu.utils.seq import collate_1d, collate_2d, sequence_mask
from genefaceplusplus_tpu.utils.smoothing import mirror_index, smooth_features_xd


def test_fastmath_accuracy():
    import jax.numpy as jnp

    x = jnp.asarray(np.linspace(-1500, 1500, 100001, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(fast_sin(x)), np.sin(np.asarray(x)), atol=5e-4)
    np.testing.assert_allclose(np.asarray(fast_cos(x)), np.cos(np.asarray(x)), atol=5e-4)
    t = jnp.asarray(np.linspace(-10, 10, 10001, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(fast_tanh(t)), np.tanh(np.asarray(t)), atol=5e-4)


def test_collate():
    a = [np.ones(3), np.ones(5)]
    out = collate_1d(a, pad_value=-1)
    assert out.shape == (2, 5)
    assert out[0, 3] == -1
    b = [np.ones((3, 4)), np.ones((5, 4))]
    out2 = collate_2d(b)
    assert out2.shape == (2, 5, 4)
    m = sequence_mask(np.asarray([3, 5]))
    assert m.shape == (2, 5)
    assert m[0].sum() == 3


def test_mirror_index():
    seq = [mirror_index(i, 4) for i in range(10)]
    assert seq == [0, 1, 2, 3, 2, 1, 0, 1, 2, 3]


def test_smooth_features():
    x = np.zeros((10, 2), np.float32)
    x[5] = 1.0
    out = smooth_features_xd(x, kernel_size=3)
    assert out.shape == x.shape
    assert 0 < out[5, 0] < 1 and out[4, 0] > 0


def test_meters():
    m = AvgrageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    with Timer("t", print_interval=1000):
        pass
    assert Timer.counts["t"] == 1
