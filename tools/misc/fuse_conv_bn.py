"""Fold eval-time BatchNorm affines into the preceding conv kernels
(reference tools/misc/fuse_conv_bn.py).

During inference BN is a fixed per-channel scale+shift; this tool bakes the
multiplicative factor into the adjacent conv kernel and rewrites the BN
variables to an identity-stats (+bias-only) form, producing an equivalent
checkpoint. Note on TPU this is a checkpoint-surgery/export convenience, not
a speed knob — XLA already fuses the BN affine into the conv at compile time
(the torch original exists because eager PyTorch does not).

Usage:
  python tools/misc/fuse_conv_bn.py CONFIG CKPT_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def fuse_variables(variables: dict, eps: float = 1e-3) -> dict:
    """Return a new variables dict with every (Conv_*, BatchNorm_*) sibling
    pair fused: kernel *= scale/sqrt(var+eps) on the out-channel axis, BN
    stats set to identity (mean 0, var 1-eps) with the residual shift kept
    in the BN bias (flax convs under ConvNormAct carry no bias)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables.get("batch_stats", {})))

    def _pairs(pnode):
        """(conv_key, bn_key) sibling pairs, matched by INDEX, not by zip
        position: flax auto-names Conv_i / BatchNorm_j independently, so a
        conv without a following BN must not steal the next BN. Also matches
        the repo's explicitly named deblock_conv_i / deblock_bn_i pairs
        (models/second.py SECONDFPN)."""
        out = []
        for ck in pnode:
            if ck.startswith("Conv_"):
                # Conv_i pairs with BatchNorm_i only when the scope holds
                # equally many of each (the ConvNormAct layout); scopes with
                # unpaired convs are skipped entirely to stay safe
                n_conv = sum(1 for k in pnode if k.startswith("Conv_"))
                n_bn = sum(1 for k in pnode if k.startswith("BatchNorm_"))
                if n_conv == n_bn:
                    bk = "BatchNorm_" + ck[len("Conv_"):]
                    if bk in pnode:
                        out.append((ck, bk))
            elif ck.startswith("deblock_conv_"):
                bk = "deblock_bn_" + ck[len("deblock_conv_"):]
                if bk in pnode:
                    out.append((ck, bk))
        return out

    def walk(pnode, snode):
        if not isinstance(pnode, dict):
            return
        for ck, bk in _pairs(pnode):
            if not (isinstance(snode, dict) and bk in snode):
                continue
            bn_p, bn_s = pnode[bk], snode[bk]
            factor = bn_p["scale"] / np.sqrt(bn_s["var"] + eps)
            pnode[ck] = dict(pnode[ck])
            pnode[ck]["kernel"] = pnode[ck]["kernel"] * factor  # [..., Cout]
            if "bias" in pnode[ck]:
                pnode[ck]["bias"] = (
                    pnode[ck]["bias"] - bn_s["mean"]) * factor + bn_p["bias"]
                new_bias = np.zeros_like(bn_p["bias"])
            else:
                new_bias = bn_p["bias"] - bn_s["mean"] * factor
            pnode[bk] = dict(scale=np.ones_like(bn_p["scale"]), bias=new_bias)
            snode[bk] = dict(mean=np.zeros_like(bn_s["mean"]),
                             var=np.full_like(bn_s["var"], 1.0 - eps))
        for k, v in pnode.items():
            if isinstance(v, dict):
                walk(v, snode.get(k, {}) if isinstance(snode, dict) else {})

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def main():
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser(description="fuse Conv+BN in a checkpoint")
    p.add_argument("config", help="config file path")
    p.add_argument("checkpoint", help="orbax checkpoint dir")
    p.add_argument("out", help="output checkpoint dir")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.abspath(args.checkpoint))
    fused = fuse_variables(variables)
    ckptr.save(os.path.abspath(args.out), fused)
    ckptr.wait_until_finished()
    print(f"fused checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
