"""Segmentation-pretrain → detector init converter.

Counterpart of the reference's tools/model_converters/fsd_pretrain_converter
.py (docs/overall_instructions.md:52-56): FSD trains the VoteSegmentor first,
then initializes the full detector's segmentor subtree from that checkpoint.

Here checkpoints are orbax pytrees; the conversion is a subtree remap:
the pretrain state's params/batch_stats (a VoteSegmentor or a detector with
`segmentor_mod`) are grafted under `<dest_prefix>` of a freshly-initialized
detector checkpoint.

Usage:
  python tools/model_converters/fsd_pretrain_converter.py \
      --src work_dirs/seg_pretrain/ckpt --dst work_dirs/fsd_init \
      [--src-prefix segmentor_mod] [--dst-prefix segmentor_mod]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def graft(src_tree: dict, dst_tree: dict, src_prefix: str, dst_prefix: str):
    """Copy src_tree[src_prefix...] over dst_tree[dst_prefix...]; shapes must
    match (asserted leaf-wise)."""
    import jax

    def get(tree, prefix):
        node = tree
        for k in [p for p in prefix.split("/") if p]:
            node = node[k]
        return node

    def setp(tree, prefix, value):
        keys = [p for p in prefix.split("/") if p]
        node = tree
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = value

    src = get(src_tree, src_prefix)
    dst = get(dst_tree, dst_prefix)
    s_leaves = jax.tree_util.tree_leaves_with_path(src)
    d_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(dst)}
    for p, leaf in s_leaves:
        assert jax.tree_util.keystr(p) in d_paths, \
            f"pretrain leaf {jax.tree_util.keystr(p)} missing in destination"
    setp(dst_tree, dst_prefix, src)
    return dst_tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--src-prefix", default="segmentor_mod")
    ap.add_argument("--dst-prefix", default="segmentor_mod")
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    src = ckpt.restore(os.path.abspath(args.src))
    dst = ckpt.restore(os.path.abspath(args.dst))
    for coll in ("params", "batch_stats"):
        if coll in src and coll in dst:
            # pretrain may be a bare VoteSegmentor (no prefix) or a detector
            src_pref = args.src_prefix if args.src_prefix in src[coll] else ""
            dst[coll] = graft(src[coll], dst[coll], src_pref, args.dst_prefix)
    out = os.path.abspath(args.dst) + "_init"
    ckpt.save(out, dst, force=True)
    print(f"saved grafted checkpoint to {out}")


if __name__ == "__main__":
    main()
