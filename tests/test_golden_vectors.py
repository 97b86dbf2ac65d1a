"""Hand-derived golden vectors, INDEPENDENT of tests/golden_model.py.

Every expected value below is a pinned hex literal produced by
tools/derive_golden_vectors.py - pure hashlib + Python ints following the
reference Rust semantics (file:line cited per vector), sharing no code
with either the framework or the golden model.  A misreading common to
the framework and golden_model.py (both written from the same SURVEY
reading) would still fail here unless the independent derivation made the
identical mistake with different code.

A third independent check exists at the full-PCS level:
tests/test_native.py::test_baseline_binary_transcript_parity (C++
implementation, byte-identical transcript at 2^8).
"""

import jax.numpy as jnp

from multilinear_tpu.field import limbs
from multilinear_tpu.field.scalar import Fp
from multilinear_tpu.fri import FriProof
from multilinear_tpu.ntt import reed_solomon
from multilinear_tpu.transcript import Transcript

# SHA256("") = e3b0c442...; challenge = first 16 bytes LE mod p
# (reference src/transcript.rs:23-38)
EMPTY_CHALLENGE = 0x24B96F99C8F4FB9A141CFC9842C4B0E3
# SHA256("abc") = ba7816bf...; same extraction
ABC_CHALLENGE = 0x2322AE5DDE404141EACF018FBF1678BA
# 2^128 mod p = 45*2^40 - 1 (p = 2^128 - 45*2^40 + 1, src/ntt/mod.rs:34-36)
TWO_POW_128_MOD_P = 49478023249919
# g8 = 3^((p-1)/8) mod p (src/ntt/mod.rs:10-59)
G8 = 0xA2184C20306200B821273CB06325D9A9

# O(n^2) DFT of [1,2,3,4,0,0,0,0] over the 8-domain, natural order
# (reed_solomon: zero-pad + ntt, src/fri/mod.rs:19-28 + ntt/mod.rs:69-110)
CODE_2POW3 = [
    0x0000000000000000000000000000000A,
    0x21D9E8B72474A4FCFDCEC517A2E104A6,
    0xA98996AD054A51A8869D92CA2038E184,
    0x74AB6BC16F478C62114029E3C3620AB9,
    0xFFFFFFFFFFFFFFFFFFFFD2FFFFFFFFFF,
    0xE1895341CBAC66096E57FB89FC7456CD,
    0x56766952FAB5AE5779624035DFC71E79,
    0x87F15845A09768978298BB7A9D4899DA,
]

# hand-walked FRI transcript on CODE_2POW3 (prove flow src/fri/mod.rs:261-285:
# commit pairs + absorb root; fold with tail twiddles :79-134; absorb
# last_element :116-125; 128 queries absorbing 8-byte LE indices :269-276;
# last_random = final clone-digest :247-248)
FRI_ROOT0 = "f46228b36fc956ee71e261bef057ad6e558dcfe3e6b978bb92d2d49a4559b826"
FRI_COMMIT1 = "24dda8f87e5a2dc23e8bacce62cd371fd128f9871fe632ff5d9e15b5c59cc39f"
FRI_LAST_ELEMENT = 0x2AE710867770C891ED02813363F22B8B
FRI_LAST_RANDOM = "16173a33892a7c1340cf6d95e31a2d04c5c531e82f67b759b5487546983e2b29"


def test_transcript_challenges_match_hand_derived():
    t = Transcript()
    assert t.next_challenge().v == EMPTY_CHALLENGE
    # quirk Q1: challenges do not advance the sponge
    assert t.next_challenge().v == EMPTY_CHALLENGE

    t = Transcript()
    t.absorb(b"abc")
    assert t.next_challenge().v == ABC_CHALLENGE


def test_field_wraparound_matches_hand_derived():
    # 2^128 mod p, via 2^64 * 2^64 in the framework's field
    x = Fp(1 << 64)
    assert (x * x).v == TWO_POW_128_MOD_P


def test_ntt_generator_and_codeword_match_hand_derived():
    from multilinear_tpu.ntt import pow2_generator

    assert pow2_generator(3).v == G8

    msg = jnp.asarray(limbs.pack_ints([1, 2, 3, 4]))
    code = reed_solomon(msg)
    got = [int(v) for v in limbs.unpack_ints(code)]
    assert got == CODE_2POW3


def test_fri_transcript_matches_hand_derived():
    code = jnp.asarray(limbs.pack_ints(CODE_2POW3))
    proof = FriProof.prove(code, Transcript())
    assert proof.commitments[0].hex() == FRI_ROOT0
    assert proof.commitments[1].hex() == FRI_COMMIT1
    assert proof.last_elem.v == FRI_LAST_ELEMENT
    assert proof.last_random.hex() == FRI_LAST_RANDOM
    proof.verify()
