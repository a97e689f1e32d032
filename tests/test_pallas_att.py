"""Fused loc-attention Pallas kernel vs the jnp step_beam path."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.attention import Attention
from end_to_end_asr_pytorch_tpu.ops.pallas.att_kernel import loc_attention_fused


def test_fused_loc_attention_matches_jnp():
    B, K, T, Dq, Dk = 2, 3, 12, 16, 20
    att = Attention({"mode": "loc", "dim": 8, "num_head": 1,
                     "temperature": 0.7, "v_proj": True,
                     "loc_kernel_size": 5, "loc_kernel_num": 4,
                     "use_pallas": False}, Dq, Dk)
    p = att.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    enc = jnp.asarray(rng.randn(B, T, Dk), jnp.float32)
    enc_len = jnp.array([T, T - 5])
    cache = att.precompute(p, enc, enc_len)
    query = jnp.asarray(rng.randn(B, K, Dq), jnp.float32)
    align0 = jnp.broadcast_to(att.init_align(cache)[:, None], (B, K, 1, T))

    ctx_ref, align_ref = att.step_beam(p, cache, query, align0)

    # build fused-kernel inputs exactly as step_beam does
    q = jnp.dot(query, p.w_q).reshape(B, K, 1, 8)
    qb = q[:, :, 0] + p.bias[None, None]
    a = jnp.sum(align0, axis=2).reshape(B * K, T, 1)
    f_small = jax.lax.conv_general_dilated(
        a, p.loc_conv, (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    ctx, align = loc_attention_fused(
        qb, cache.keys[:, 0], f_small.reshape(B, K, T, -1), p.w_f,
        p.v_energy[0], cache.values, enc_len,
        temperature=0.7, interpret=True)

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(align[:, :, None]),
                               np.asarray(align_ref), rtol=1e-4, atol=1e-6)
    # masked frames get zero alignment
    assert np.all(np.asarray(align)[1, :, T - 5:] < 1e-8)
