"""On-device augmentation semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from mop_tpu.ops import preprocess as pp


def test_random_crop_is_translation_of_padded():
    x = jnp.arange(2 * 3 * 8 * 8, dtype=jnp.float32).reshape(2, 3, 8, 8)
    out = pp.random_crop(jax.random.PRNGKey(0), x, padding=2)
    assert out.shape == x.shape
    # every output row is either zeros (pad) or a contiguous slice of the input
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)))
    found = False
    for oh in range(5):
        for ow in range(5):
            cand = xp[:, :, oh:oh + 8, ow:ow + 8]
            if bool(jnp.array_equal(cand[0], out[0])):
                found = True
    assert found


def test_random_hflip_flips_or_not():
    x = jnp.arange(4 * 1 * 2 * 4, dtype=jnp.float32).reshape(4, 1, 2, 4)
    out = pp.random_hflip(jax.random.PRNGKey(3), x, p=0.5)
    for i in range(4):
        same = bool(jnp.array_equal(out[i], x[i]))
        flipped = bool(jnp.array_equal(out[i], x[i, :, :, ::-1]))
        assert same or flipped


def test_random_erasing_zeroes_one_box():
    x = jnp.ones((8, 3, 16, 16))
    out = pp.random_erasing(jax.random.PRNGKey(0), x, p=1.0)
    zeros = np.asarray(out == 0)
    for i in range(8):
        # some pixels zeroed, not everything
        assert zeros[i].any() and not zeros[i].all()


def test_mixup_preserves_label_mass():
    x = jnp.ones((4, 3, 8, 8))
    y = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 10)
    xm, ym = pp.mixup(jax.random.PRNGKey(0), x, y, alpha=0.4)
    np.testing.assert_allclose(np.asarray(ym.sum(-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x), atol=1e-6)


def test_cutmix_label_weight_matches_area():
    x = jnp.zeros((2, 3, 16, 16))
    x = x.at[1].set(1.0)
    y = jax.nn.one_hot(jnp.array([0, 1]), 4)
    xm, ym = pp.cutmix(jax.random.PRNGKey(1), x, y, alpha=1.0)
    # sample 0 is zeros with a pasted box of ones from sample 1
    frac_pasted = float(jnp.mean(xm[0]))
    np.testing.assert_allclose(float(ym[0, 1]), frac_pasted, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ym.sum(-1)), 1.0, atol=1e-6)


def test_label_smoothing_sums_to_one():
    y = jnp.array([1, 3])
    t = pp.label_smoothing_onehot(y, 5, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, atol=1e-6)
    assert float(t[0, 1]) > float(t[0, 0])


def test_rand_augment_stays_in_range():
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 3, 16, 16))
    out = pp.rand_augment(jax.random.PRNGKey(1), x, n=2, m=9)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= -1e-6 and float(out.max()) <= 1.0 + 1e-6
