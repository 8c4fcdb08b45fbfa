"""Dataset preparation CLI (reference prep.py:11-28 surface).

``byogan-prep <datapath> <start_size> <end_size>`` with the reference's
interactive per-set overwrite prompt (prep.py:55-60) — plus ``--yes`` to
rebuild unconditionally and ``--workers``.  The heavy lifting (single-decode
pyramid build) lives in data/prep.py.
"""

from __future__ import annotations

import argparse

from byogan_tpu.data.prep import prepare_pyramid


def main(argv=None):
    parser = argparse.ArgumentParser(description="Prepare a dataset pyramid")
    parser.add_argument(
        "datapath", help="path to data set. Eg './data/images'", type=str
    )
    parser.add_argument(
        "start_size", nargs="?", default=4, type=int,
        help="first progression image size (default is 4)",
    )
    parser.add_argument(
        "end_size", nargs="?", default=512, type=int,
        help="last progression image size (default is 512)",
    )
    parser.add_argument(
        "-y", "--yes", action="store_true",
        help="overwrite existing sets without prompting",
    )
    parser.add_argument("-w", "--workers", default=8, type=int)
    parser.add_argument(
        "--pack", action="store_true",
        help="also pack each set into a zero-decode packed.npy memmap "
        "(fastest training data path)",
    )
    args = parser.parse_args(argv)

    if args.yes:
        overwrite = lambda name: True  # noqa: E731
    else:
        overwrite = (
            lambda name: input(f"{name} exists. Delete? (y/N)") == "y"
        )  # noqa: E731

    def progress(done, total):
        if done % 200 == 0 or done == total:
            print(f"prepared {done}/{total} images")

    sets = prepare_pyramid(
        args.datapath,
        args.start_size,
        args.end_size,
        workers=args.workers,
        overwrite=overwrite,
        progress=progress,
    )
    if args.pack:
        from byogan_tpu.data.pipeline import pack_stage

        for k in range(1, len(sets) + 1):
            pack_stage(args.datapath, k, workers=args.workers)
            print(f"packed set_{k}")
    print(f"dataset ready: {len(sets)} resolution sets")


if __name__ == "__main__":
    main()
