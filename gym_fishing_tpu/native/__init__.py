"""Native (C) oracle: build-on-demand shared library + ctypes bindings.

See oracle.c for why this exists. The .so is compiled lazily with the
system C compiler into ``native/_build/`` and cached; everything degrades
gracefully (``available() -> False``) on systems without a compiler.
"""

from gym_fishing_tpu.native.bindings import (
    COracle,
    available,
    build as build_native,
)
