#!/usr/bin/env python
"""Videolist generation utilities.

Subcommands mirror the reference's videolist/ scripts:
  * master_to_contiguous — window master ranges into fixed-length clip specs
    (master_to_contiguous.py; keeps the KTH running/jogging stride-3 rule).
  * contiguous_to_split — split contiguous specs into preceding/middle/
    following ranges for disjoint-clip inference (contiguous_to_split.py).
"""

import argparse


def _rng(s):
    a, b = s.split("-")
    return int(a), int(b)


def master_to_contiguous(args):
    with open(args.input_path) as fin, open(args.output_path, "w") as fout:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            name, rng = line.split()
            start, end = _rng(rng)
            # KTH's running/jogging use stride 3 per Villegas et al. to balance
            # examples per class (master_to_contiguous.py:24-27).
            stride = 3 if ("running" in name or "jogging" in name) else args.default_stride
            for s in range(start, end - args.clip_length + 2, stride):
                fout.write(f"{name} {s}-{s + args.clip_length - 1}\n")
                if args.first_only:
                    break


def contiguous_to_split(args):
    p, m, f = args.p, args.m, args.f
    with open(args.input_path) as fin, open(args.output_path, "w") as fout:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            name, rng = line.split()
            start, end = _rng(rng)
            assert end - start == p + m + f, (line, p, m, f)
            fout.write(
                f"{name} {start}-{start + p} {start + p}-{start + p + m} {start + p + m}-{end}\n"
            )


def main(argv=None):
    parser = argparse.ArgumentParser()
    subs = parser.add_subparsers(dest="command", required=True)

    mc = subs.add_parser("master_to_contiguous")
    mc.add_argument("input_path", type=str)
    mc.add_argument("output_path", type=str)
    mc.add_argument("--clip_length", type=int, default=20)
    mc.add_argument("--default_stride", type=int, default=10)
    mc.add_argument("--first_only", action="store_true")
    mc.set_defaults(fn=master_to_contiguous)

    cs = subs.add_parser("contiguous_to_split")
    cs.add_argument("input_path", type=str)
    cs.add_argument("output_path", type=str)
    cs.add_argument("--p", type=int, required=True)
    cs.add_argument("--m", type=int, required=True)
    cs.add_argument("--f", type=int, required=True)
    cs.set_defaults(fn=contiguous_to_split)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
