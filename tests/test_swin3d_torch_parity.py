"""Torch-twin numerical parity for the Video Swin window attention — the
trickiest numerics in the 3-D stems (reference backbone.py:81-164). The torch
side re-derives the reference math independently (qkv projection, q scaling,
3-D relative position bias via the meshgrid index, shifted-window mask add,
softmax, output projection); matching it on random weights validates our
flax WindowAttention3D bit-for-bit up to f32 tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from frlw_evd_tpu.models.swin3d import WindowAttention3D, compute_shift_mask


def torch_window_attention(x, mask, w_qkv, b_qkv, w_proj, b_proj, bias_table,
                           window_size, num_heads):
    """Reference-equivalent W-MSA (torch, independent re-derivation)."""
    wd, wh, ww = window_size
    B_, N, C = x.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    # reference-style relative position index (meshgrid, ij order)
    coords = torch.stack(torch.meshgrid(
        torch.arange(wd), torch.arange(wh), torch.arange(ww), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    rel_index = rel.sum(-1)

    x = torch.tensor(x)
    qkv = x @ torch.tensor(w_qkv) + torch.tensor(b_qkv)
    qkv = qkv.reshape(B_, N, 3, num_heads, head_dim).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * scale) @ k.transpose(-2, -1)

    bias = torch.tensor(bias_table)[rel_index[:N, :N].reshape(-1)].reshape(
        N, N, num_heads).permute(2, 0, 1).contiguous()
    attn = attn + bias.unsqueeze(0)

    if mask is not None:
        m = torch.tensor(np.asarray(mask), dtype=attn.dtype)
        nW = m.shape[0]
        attn = attn.view(B_ // nW, nW, num_heads, N, N) \
            + m.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, N, N)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    out = out @ torch.tensor(w_proj) + torch.tensor(b_proj)
    return out.numpy()


@pytest.mark.parametrize("with_mask", [False, True])
def test_window_attention3d_matches_torch(rng, with_mask):
    window = (2, 4, 4)
    N = window[0] * window[1] * window[2]
    dim, heads = 24, 3
    nW = 4
    B_ = 2 * nW

    x = rng.normal(0, 1, (B_, N, dim)).astype(np.float32)
    mod = WindowAttention3D(dim, window, heads)
    if with_mask:
        mask = jnp.asarray(compute_shift_mask(2, 8, 8, window, (1, 2, 2)))
        assert mask.shape[0] == nW
    else:
        mask = None
    params = mod.init(jax.random.key(0), jnp.asarray(x), mask)["params"]
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x), mask))

    ref = torch_window_attention(
        x, np.asarray(mask) if mask is not None else None,
        np.asarray(params["qkv"]["kernel"]),
        np.asarray(params["qkv"]["bias"]),
        np.asarray(params["proj"]["kernel"]),
        np.asarray(params["proj"]["bias"]),
        np.asarray(params["relative_position_bias_table"]),
        window, heads)

    np.testing.assert_allclose(out, ref, atol=2e-5,
                               err_msg=f"mask={with_mask}")
