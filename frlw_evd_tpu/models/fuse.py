"""Inference-time conv+BN fusion (reference: core/yolox/utils/model_utils.py
fuse_conv_and_bn:31 / fuse_model:66).

Folds every BatchNorm that follows a conv in our `BaseConv`-style blocks into
the conv kernel/bias, producing a params tree whose BN becomes identity.
XLA already fuses the scale/shift elementwise work at runtime, so the win on
TPU is mainly fewer parameters and simpler HLO for deployment export.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fuse_conv_bn_params(params: Dict, batch_stats: Dict, eps: float = 1e-5):
    """Return (fused_params, fused_batch_stats) where every sibling pair
    {conv: {kernel}, bn: {scale, bias}} with matching batch_stats
    {bn: {mean, var}} is folded:

        k' = k * scale / sqrt(var + eps)
        b' = bias - scale * mean / sqrt(var + eps)

    The bn params are rewritten to identity (scale 1, bias 0, mean 0, var 1)
    so the module still applies — as a no-op.
    """

    def walk(p: Dict, bs: Dict):
        p = dict(p)
        bs = dict(bs) if isinstance(bs, dict) else {}
        for name in list(p.keys()):
            child = p[name]
            if not isinstance(child, dict):
                continue
            child_bs = bs.get(name, {})
            if ("conv" in child and "bn" in child
                    and isinstance(child_bs, dict) and "bn" in child_bs):
                conv = dict(child["conv"])
                bn = dict(child["bn"])
                stats = dict(child_bs["bn"])
                rstd = jax.lax.rsqrt(stats["var"] + eps)
                scale = bn["scale"] * rstd
                conv["kernel"] = conv["kernel"] * scale[None, None, None, :]
                fused_bias = bn["bias"] - bn["scale"] * stats["mean"] * rstd
                if "bias" in conv:
                    fused_bias = fused_bias + conv["bias"] * scale
                    conv["bias"] = jnp.zeros_like(conv["bias"])
                # our convs are bias-free, so the fused bias lives in the
                # now-identity BN: y = (x - 0) * rsqrt(var+eps) * 1 + b with
                # var = 1 - eps → exact identity scale
                child = dict(child)
                child["conv"] = conv
                child["bn"] = {"scale": jnp.ones_like(bn["scale"]),
                               "bias": fused_bias}
                child_bs = dict(child_bs)
                child_bs["bn"] = {
                    "mean": jnp.zeros_like(stats["mean"]),
                    "var": jnp.full_like(stats["var"], 1.0 - eps)}
                p[name] = child
                bs[name] = child_bs
            else:
                new_p, new_bs = walk(child, child_bs)
                p[name] = new_p
                if isinstance(child_bs, dict) and child_bs:
                    bs[name] = new_bs
        return p, bs

    return walk(params, batch_stats)
