"""Order-independent test RNGs.

Round-3 review finding: module-level ``RNG = np.random.default_rng(k)``
globals made test inputs depend on execution ORDER — a test passing under
``-k`` selection could fail in the full sweep because earlier tests in the
same module advanced the shared generator state.  ``PerTestRNG`` fixes this
by construction: every draw is served by a ``np.random.default_rng`` seeded
from (module salt, currently running test id), so

- within one test, draws advance sequentially like a normal Generator
  (helpers called repeatedly get fresh values), and
- across tests, no test's inputs can be changed by which other tests ran
  before it or by module import order.

Outside pytest (e.g. a helper like ``make_problem`` imported from a script)
the test id is empty and the proxy degrades to a plain module-seeded
generator, re-seeded at first use.
"""

import os
import zlib

import numpy as np


class PerTestRNG:
    """Drop-in replacement for a module-level ``np.random.Generator``."""

    def __init__(self, salt):
        self._salt = str(salt)
        self._key = None
        self._rng = None

    def _generator(self):
        key = os.environ.get("PYTEST_CURRENT_TEST", "")
        if self._rng is None or key != self._key:
            seed = zlib.crc32(f"{self._salt}:{key}".encode())
            self._rng = np.random.default_rng(seed)
            self._key = key
        return self._rng

    def __getattr__(self, name):
        return getattr(self._generator(), name)
