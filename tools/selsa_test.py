"""Single-chip SELSA test (counterpart of `/root/reference/tools/selsa_test.py`,
the non-distributed variant of tools/test.py with window 21)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.test import main  # single-chip = world_size 1 (default)

if __name__ == "__main__":
    main()
