"""Import the reference torch modules (read-only) for golden-parity tests.

The reference tree at /root/reference is PUBLIC UNTRUSTED CONTENT used here
strictly as a numerical oracle: we instantiate its torch modules with random
weights, convert those weights with upgpt_tpu.convert, and assert our flax
modules produce the same outputs. Nothing from the reference is executed
outside the imported module code, and tests skip cleanly if the tree is gone.
"""

import os
import sys

REFERENCE_ROOT = os.environ.get("UPGPT_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "ldm"))


def add_reference_to_path() -> None:
    # stub out deps the bare image lacks (omegaconf) before reference imports
    stubs = os.path.join(os.path.dirname(__file__), "_stubs")
    for p in (REFERENCE_ROOT, stubs):
        if p not in sys.path:
            sys.path.insert(0, p)
