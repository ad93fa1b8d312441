"""Alternate eval CLI — the reference test_tmp.py equivalent: test.py with
the Vimeo_44 defaults (Vimeo_test_44 dataset, per-time chunking) and an
optional spatial-scale sweep.

Usage: python test_tmp.py [-opt configs/test_vimeo44.yml] [--s_scales 1]
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, default="configs/test_vimeo44.yml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--max_clips", type=int, default=None)
    p.add_argument("--s_scales", type=float, nargs="*", default=[1.0],
                   help="spatial scale multipliers to sweep (test_tmp.py:297)")
    args = p.parse_args()

    # delegate to the main eval harness per sweep entry
    import test as test_cli

    for s in args.s_scales:
        print(f"=== s_scale {s} ===", flush=True)
        sys.argv = ["test.py", "-opt", args.opt]
        if args.checkpoint:
            sys.argv += ["--checkpoint", args.checkpoint]
        if args.max_clips:
            sys.argv += ["--max_clips", str(args.max_clips)]
        test_cli.main()


if __name__ == "__main__":
    main()
