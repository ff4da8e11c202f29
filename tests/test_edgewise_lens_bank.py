"""Lens-bank contract (reference ``tests/test_edgewise_lens_bank.py``)."""

import jax
import jax.numpy as jnp
import pytest

from mop_tpu.models.attention_variants import EdgewiseMSA


@pytest.mark.parametrize(
    "use_lens_bank,use_lens_bank_qk,lens_dilations,lens_qk_dilations,n_views",
    [
        (True, False, (1, 2), (1, 2), 3),
        (False, True, (1,), (1, 2, 3), 3),
        (True, True, (1, 2), (2, 3), 4),
        (False, False, (1,), (1,), 3),
    ],
)
def test_edgewise_lens_bank_shapes(
    use_lens_bank, use_lens_bank_qk, lens_dilations, lens_qk_dilations, n_views
):
    dim, heads, n, b = 64, 4, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, dim))
    msa = EdgewiseMSA(
        dim=dim,
        heads=heads,
        n_views=n_views,
        share_qkv=True,
        gate_mode="lowrank",
        gate_rank=2,
        gate_init="neutral",
        use_k3=True,
        use_lens_bank=use_lens_bank,
        lens_kernel_size=3,
        lens_dilations=lens_dilations,
        use_lens_bank_qk=use_lens_bank_qk,
        lens_qk_kernel_size=3,
        lens_qk_dilations=lens_qk_dilations,
        lens_qk_causal=True,
    )
    y = msa.apply(msa.init(jax.random.PRNGKey(1), x), x)
    assert y.shape == (b, n, dim)


def test_edgewise_lens_bank_effect_nontrivial():
    dim, heads, n, b = 32, 2, 6, 1
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, dim))
    msa_no = EdgewiseMSA(dim=dim, heads=heads, n_views=3, share_qkv=True, use_lens_bank=False)
    y_no = msa_no.apply(msa_no.init(jax.random.PRNGKey(1), x), x)
    msa_yes = EdgewiseMSA(
        dim=dim,
        heads=heads,
        n_views=3,
        share_qkv=True,
        use_lens_bank_qk=True,
        lens_qk_kernel_size=3,
        lens_qk_dilations=(1, 2),
    )
    y_yes = msa_yes.apply(msa_yes.init(jax.random.PRNGKey(1), x), x)
    assert not jnp.allclose(y_no, y_yes), "Lens bank had no effect on outputs"
