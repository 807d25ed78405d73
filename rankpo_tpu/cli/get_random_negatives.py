"""Random-negative bootstrap entry point (reference src/get_random_negatives.py)."""

from __future__ import annotations

import argparse

from rankpo_tpu.tools import find_random_negatives


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_file", type=str, required=True)
    parser.add_argument("--output_file", type=str, required=True)
    parser.add_argument("--num_negatives", type=int, default=15)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)
    return find_random_negatives(
        args.input_file, args.output_file, args.num_negatives, seed=args.seed
    )


if __name__ == "__main__":
    main()
