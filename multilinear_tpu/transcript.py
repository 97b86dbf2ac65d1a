"""Fiat-Shamir transcript: a running SHA-256 state on the host.

Reproduces the reference semantics exactly (reference src/transcript.rs):

* ``absorb`` feeds bytes into the running hash state.
* ``random`` finalizes a *clone* of the state - the state itself does not
  advance (quirk Q1: two consecutive ``next_challenge`` calls return the
  same element; absorbing the produced data is the caller's job).
* ``next_challenge`` takes the first 16 digest bytes as a little-endian
  u128 and reduces mod p.

The transcript is deliberately host-side: it is inherently sequential and
absorbs only O(log n) data per round (Merkle roots, round-poly coefficients),
so it synchronizes device work without ever becoming a bottleneck.
"""

from __future__ import annotations

from .field.scalar import Fp


class Transcript:
    """Runs on a midstate-capable SHA-256 (native C++ / pure Python) so the
    state can hop to the device and back; digests are hashlib-identical."""

    __slots__ = ("_state",)

    def __init__(self):
        from .native import Sha256Stream

        self._state = Sha256Stream()

    def clone(self) -> "Transcript":
        t = Transcript.__new__(Transcript)
        t._state = self._state.copy()
        return t

    # -- midstate hopping ----------------------------------------------------
    def export_state(self):
        """(8 uint32 chaining words, partial block bytes, total length)."""
        return self._state.export_state()

    @staticmethod
    def import_state(st_words, buf: bytes, total: int) -> "Transcript":
        from .native import Sha256Stream

        t = Transcript.__new__(Transcript)
        t._state = Sha256Stream.import_state(st_words, buf, total)
        return t

    def absorb(self, data: bytes) -> None:
        self._state.update(data)

    def random(self) -> bytes:
        """32 digest bytes of a finalized clone; does NOT advance the state."""
        return self._state.copy().digest()

    def next_challenge(self) -> Fp:
        return Fp(int.from_bytes(self.random()[:16], "little"))

    # -- convenience helpers ----------------------------------------------
    def absorb_field(self, x: Fp) -> None:
        self.absorb(x.to_bytes())

    def absorb_fields(self, xs) -> None:
        for x in xs:
            self.absorb(x.to_bytes())

    def absorb_index(self, index: int) -> None:
        """Absorb a query index as 8 LE bytes (usize::to_le_bytes, quirk Q5)."""
        self.absorb(index.to_bytes(8, "little"))

    def random_index(self, modulus: int) -> int:
        """Draw a query index: first 8 digest bytes as LE u64, mod ``modulus``.

        Reference: src/fri/mod.rs:269-271.
        """
        return int.from_bytes(self.random()[:8], "little") % modulus
