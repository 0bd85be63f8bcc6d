"""Thin shim: consolidated into ``scripts/sweep.py train`` (VERDICT r3
item 8). Kept so documented invocations keep working."""

import sys

from sweep import main  # noqa: E402

if __name__ == "__main__":
    sys.argv = [sys.argv[0], "train"] + sys.argv[1:]
    main()
