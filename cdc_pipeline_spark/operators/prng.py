"""Deterministic parameter generation shared by every seeded operator.

One splitmix64 implementation (Steele et al. 2014, "Fast Splittable
Pseudorandom Number Generators" — the public-domain mixing constants)
feeds MinHash affine parameters (``dedup._perm_params``) and RP-LSH
hyperplanes (``similarity._hyperplanes``). A single copy matters more
than usual here: both call sites derive PERSISTED signatures from the
stream, and two drifting copies would silently desynchronize an
engine's signatures from the oracle replays that pin them.

No RNG state object anywhere — reproducible across runs, workers, and
cluster sizes by construction.
"""

from __future__ import annotations

_M64 = 0xFFFFFFFFFFFFFFFF
_GOLDEN = 0x9E3779B97F4A7C15


def splitmix64(x: int) -> tuple[int, int]:
    """One splitmix64 step: returns ``(advanced_state, scrambled_output)``.

    Callers own the state threading (some draw several outputs per
    logical parameter; MinHash's ``b`` intentionally uses the RAW
    advanced state — preserved bit-for-bit from the original inline
    implementations)."""
    x = (x + _GOLDEN) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return x, z
