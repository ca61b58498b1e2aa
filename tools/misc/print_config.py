"""Print a fully-resolved config (reference tools/misc/print_config.py).

Loads the python config with `_base_` inheritance resolved and applies
--cfg-options overrides, then pretty-prints the merged dict.
"""

from __future__ import annotations

import argparse
import pprint
import sys


def parse_args():
    p = argparse.ArgumentParser(description="Print the whole config")
    p.add_argument("config", help="config file path")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="key=value overrides (dots traverse nesting)")
    return p.parse_args()


def main():
    sys.path.insert(0, ".")
    import ast

    from sst_tpu.utils.config import load_config, set_by_dotted

    args = parse_args()
    cfg = load_config(args.config)
    for opt in args.cfg_options or []:
        k, v = opt.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        set_by_dotted(cfg, k, v)
    print("Config:")
    pprint.pprint(cfg, width=100, sort_dicts=False)


if __name__ == "__main__":
    main()
