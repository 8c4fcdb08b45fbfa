"""Build the native IO library (g++ -O3 -shared, links png/jpeg/z).

Run ``python -m byogan_tpu.native.build`` or let data/native.py build it
lazily on first use.  The artifact lands next to this file
(``libbyogan_io.so``) and is rebuilt whenever the source is newer.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "byogan_io.cpp")
LIBRARY = os.path.join(_DIR, "libbyogan_io.so")


def build(force: bool = False, quiet: bool = False) -> str:
    if (
        not force
        and os.path.exists(LIBRARY)
        and os.path.getmtime(LIBRARY) >= os.path.getmtime(SOURCE)
    ):
        return LIBRARY
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        SOURCE, "-o", LIBRARY, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    if not quiet:
        print("building native IO:", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIBRARY


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(LIBRARY)
