"""Alternate eval CLI — the reference test_tmp.py equivalent: test.py with
the Vimeo_44 defaults plus a (spatial scale × temporal rate) sweep that
actually mutates the config between runs (reference test_tmp.py:305-314
sets opt['scale'] and the dataset 'time' per entry).

Usage: python test_tmp.py [-opt configs/test_vimeo44.yml] \
           [--s_scales 1 2 4] [--t_scales 6]
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, default="configs/test_vimeo44.yml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--max_clips", type=int, default=None)
    p.add_argument("--s_scales", type=float, nargs="*", default=[1.0],
                   help="spatial scales to sweep (reference test_tmp.py:305)")
    p.add_argument("--t_scales", type=int, nargs="*", default=[6],
                   help="temporal rates to sweep (reference test_tmp.py:306)")
    args = p.parse_args()

    import test as test_cli

    results = {}
    for s in args.s_scales:
        for t in args.t_scales:
            print(f"=== s_scale {s} t_scale {t} ===", flush=True)
            sys.argv = ["test.py", "-opt", args.opt]
            if args.checkpoint:
                sys.argv += ["--checkpoint", args.checkpoint]
            if args.max_clips:
                sys.argv += ["--max_clips", str(args.max_clips)]
            overrides = {"time": t}
            if s != 1.0:
                overrides["scale"] = int(s) if float(s).is_integer() else s
            results[(s, t)] = test_cli.main(overrides=overrides)
    for (s, t), r in results.items():
        print(f"s{s} t{t}: psnr {r['psnr']:.3f} ssim {r['ssim']:.4f}")


if __name__ == "__main__":
    main()
