"""Conv-transformer building-block unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vfi_tpu.nn.transformer import (
    ConvMultiHeadAttention,
    ConvTransformerDecoder,
    ConvTransformerEncoder,
    positional_encoding,
)


def test_positional_encoding_structure():
    """Interleaved sin/cos with 10000^(2i/d) denominators
    (reference submodules.py:303-336; fractional time steps allowed)."""
    t = jnp.asarray([[0.0, 1.0, 2.5]])
    d = 8
    pe = positional_encoding(t, d)
    assert pe.shape == (1, 3, d)
    # t=0: sin=0, cos=1 interleaved
    np.testing.assert_allclose(np.asarray(pe[0, 0, 0::2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[0, 0, 1::2]), 1.0, atol=1e-6)
    # first pair at t: sin(t), cos(t)
    np.testing.assert_allclose(float(pe[0, 2, 0]), np.sin(2.5), rtol=1e-5)
    np.testing.assert_allclose(float(pe[0, 2, 1]), np.cos(2.5), rtol=1e-5)


def test_mha_prod_mask_blocks_attention():
    B, T, H, W, d = 1, 3, 4, 4, 8
    rng = jax.random.PRNGKey(0)
    mha = ConvMultiHeadAttention(num_heads=2, d_qk=d, d_v=d)
    v = jax.random.normal(rng, (B, T, H, W, d))
    q = v.mean(axis=(2, 3))
    variables = mha.init(rng, v, q, q)

    # mask that forbids attending to position 2 from anywhere
    mask = jnp.ones((B, T, T)).at[:, :, 2].set(0)
    out_masked = mha.apply(variables, v, q, q, mask)
    # changing the masked value must not affect the output
    v2 = v.at[:, 2].add(10.0)
    q2 = v2.mean(axis=(2, 3))
    out_masked2 = mha.apply(variables, v2, q2.at[:, 2].set(q[:, 2]), q2.at[:, 2].set(q[:, 2]), mask)
    # queries for rows 0,1 unchanged; value at masked position changed
    np.testing.assert_allclose(
        np.asarray(out_masked[:, 0]), np.asarray(out_masked2[:, 0]), rtol=1e-4, atol=1e-5
    )


def test_encoder_decoder_shapes():
    B, Ti, To, H, W, d = 2, 4, 3, 4, 4, 8
    rng = jax.random.PRNGKey(0)
    enc = ConvTransformerEncoder(num_blocks=2, num_heads=2, d_v=d)
    x = jax.random.normal(rng, (B, Ti, H, W, d))
    mask = jnp.ones((B, Ti))
    times = jnp.broadcast_to(jnp.arange(Ti, dtype=jnp.float32)[None], (B, Ti))
    ev = enc.init(rng, x, mask, times)
    enc_out = enc.apply(ev, x, mask, times)
    assert enc_out.shape == (B, Ti, H, W, d)

    dec = ConvTransformerDecoder(num_blocks=2, num_heads=2, d_v=d)
    seed = x[:, :1]
    dtimes = jnp.broadcast_to(jnp.arange(To, dtype=jnp.float32)[None], (B, To))
    pmask = jnp.broadcast_to(jnp.tril(jnp.ones((To, To)))[None], (B, To, To))
    dv = dec.init(rng, enc_out, mask, seed, dtimes, pmask)
    dec_out = dec.apply(dv, enc_out, mask, seed, dtimes, pmask)
    assert dec_out.shape == (B, To, H, W, d)
