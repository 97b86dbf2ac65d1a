"""Pure-Python scalar golden model of the reference protocol semantics.

An intentionally naive, exact-integer re-statement of the reference
algorithms (row-by-row loops, host SHA-256) used ONLY to generate golden
vectors that the TPU pipeline must reproduce bit-for-bit.  Kept separate
from the framework so a bug cannot hide in shared code.

Semantics follow the reference as documented in SURVEY.md:
sumcheck (src/constraint_system/sumcheck.rs), FRI fold/queries
(src/fri/mod.rs), Mask/Delta big-endian eq evaluation
(src/constraint_system/evaluation.rs:50-91).
"""

import hashlib

P = (1 << 128) - 45 * (1 << 40) + 1
GEN = 3
INV2 = pow(2, P - 2, P)


class GoldenTranscript:
    def __init__(self):
        self.h = hashlib.sha256()

    def absorb(self, b: bytes):
        self.h.update(b)

    def absorb_felt(self, x: int):
        self.h.update(int(x % P).to_bytes(16, "little"))

    def challenge(self) -> int:
        return int.from_bytes(self.h.copy().digest()[:16], "little") % P

    def rand_index(self, modulus: int) -> int:
        return int.from_bytes(self.h.copy().digest()[:8], "little") % modulus

    def state(self) -> bytes:
        return self.h.copy().digest()

    def clone(self):
        t = GoldenTranscript.__new__(GoldenTranscript)
        t.h = self.h.copy()
        return t


def mask_eval(index, n_vars, points):
    """eq(points, bits(index)), big-endian: bit i pairs points[n_vars-1-i]."""
    acc = 1
    for i in range(n_vars):
        pt = points[n_vars - 1 - i]
        acc = acc * (pt if (index >> i) & 1 else (1 - pt) % P) % P
    return acc


def delta_eval(data, points):
    acc = 1
    for a, b in zip(data, points):
        acc = acc * ((a * b + (1 - a) % P * ((1 - b) % P)) % P) % P
    return acc


def mle_eval(evals, args):
    """Evaluation-form MLE at a point, big-endian (polynomials.rs:165-188)."""
    n_vars = len(args)
    total = 0
    for pos, e in enumerate(evals):
        term = e
        for bit_pos in range(n_vars):
            arg = args[n_vars - 1 - bit_pos]
            term = term * (arg if (pos >> bit_pos) & 1 else (1 - arg) % P) % P
        total = (total + term) % P
    return total


def interpolate(evals):
    """Lagrange interpolation over domain {0..n-1}; returns coeff list."""
    n = len(evals)
    coeffs = [0] * n
    for j, yj in enumerate(evals):
        basis = [1]
        denom = 1
        for m in range(n):
            if m == j:
                continue
            # basis *= (X - m)
            new = [0] * (len(basis) + 1)
            for i, a in enumerate(basis):
                new[i] = (new[i] - a * m) % P
                new[i + 1] = (new[i + 1] + a) % P
            basis = new
            denom = denom * (j - m) % P
        scale = yj * pow(denom, P - 2, P) % P
        for i, b in enumerate(basis):
            coeffs[i] = (coeffs[i] + scale * b) % P
    return coeffs


def poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def sumcheck_prove(matrix, width, delta, composition, comp_degree, transcript, sum_value):
    """Reference-semantics sumcheck; matrix row-major, returns (pols, randoms).

    pols entries are the nonzero-coeff lists (constant stripped, quirk Q7).
    """
    height = len(matrix) // width
    total_degree = comp_degree + 1
    matrix = list(matrix)
    delta = list(delta)
    pols, randoms = [], []
    prev = sum_value % P
    n_rounds = height.bit_length() - 1
    for _ in range(n_rounds):
        evals = [0] * (total_degree + 1)
        off = height >> 1
        for x in range(1, total_degree + 1):
            s = 0
            for i in range(off):
                d = ((1 - x) * delta[i] + x * delta[i + off]) % P
                vals = [
                    ((1 - x) * matrix[i * width + j] + x * matrix[(i + off) * width + j]) % P
                    for j in range(width)
                ]
                s = (s + composition(vals) * d) % P
            evals[x] = s
        evals[0] = (prev - evals[1]) % P
        coeffs = interpolate(evals)
        nonzero = coeffs[1:]
        for c in nonzero:
            transcript.absorb_felt(c)
        r = transcript.challenge()
        prev = poly_eval(coeffs, r)
        # fold
        new_h = off
        new_matrix = [0] * (new_h * width)
        new_delta = [0] * new_h
        for i in range(new_h):
            new_delta[i] = ((1 - r) * delta[i] + r * delta[i + new_h]) % P
            for j in range(width):
                new_matrix[i * width + j] = (
                    (1 - r) * matrix[i * width + j] + r * matrix[(i + new_h) * width + j]
                ) % P
        matrix, delta, height = new_matrix, new_delta, new_h
        pols.append(nonzero)
        randoms.append(r)
    return pols, randoms


def to_polynomial(nonzero, sum_value):
    a0 = (sum_value - sum(nonzero)) % P * INV2 % P
    return [a0] + list(nonzero)


# ---------------------------------------------------------------------------
# NTT / RS / FRI golden model
# ---------------------------------------------------------------------------


def pow2_gen(log_size):
    return pow(GEN, (P - 1) >> log_size, P)


def ntt(coeffs, gen):
    n = len(coeffs)
    bits = n.bit_length() - 1
    vals = list(coeffs)
    # bit-reverse
    for i in range(n):
        j = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        if i < j:
            vals[i], vals[j] = vals[j], vals[i]
    length = 2
    while length <= n:
        w = pow(gen, n // length, P)
        for start in range(0, n, length):
            acc = 1
            for j in range(length // 2):
                u = vals[start + j]
                v = vals[start + j + length // 2] * acc % P
                vals[start + j] = (u + v) % P
                vals[start + j + length // 2] = (u - v) % P
                acc = acc * w % P
        length *= 2
    return vals


def reed_solomon(coeffs, log_blowup=1):
    n = len(coeffs)
    log_n = n.bit_length() - 1
    padded = list(coeffs) + [0] * (((1 << log_blowup) - 1) * n)
    return ntt(padded, pow2_gen(log_n + log_blowup))


def bit_reverse_list(vals):
    n = len(vals)
    bits = n.bit_length() - 1
    out = list(vals)
    for i in range(n):
        j = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        if i < j:
            out[i], out[j] = out[j], out[i]
    return out


def mle_to_coeffs(evals):
    n = len(evals).bit_length() - 1
    coeffs = list(evals)
    for i in range(n):
        mask = 1 << i
        for j in range(1 << n):
            if j & mask:
                coeffs[j] = (coeffs[j] - coeffs[j ^ mask]) % P
    return coeffs


def sha_leaf(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


def sha_node(l: bytes, r: bytes) -> bytes:
    return hashlib.sha256(l + r).digest()


def merkle_layers(leaf_bytes_list):
    layers = [[sha_leaf(b) for b in leaf_bytes_list]]
    while len(layers[-1]) > 1:
        prev = layers[-1]
        layers.append([sha_node(prev[i], prev[i + 1]) for i in range(0, len(prev), 2)])
    return layers


def felt_bytes(x: int) -> bytes:
    return int(x % P).to_bytes(16, "little")


def pcs_prove(inputs, evals, transcript, log_blowup=1, num_queries=128):
    """Golden multilinear PCS prover: the full interleaved sumcheck<->FRI
    transcript (reference src/fri/multilinear_pcs.rs:89-136).

    Returns (roots, sumcheck_pols, last_elem, query_indices, final_state).
    """
    n_vars = len(inputs)
    n = len(evals)
    assert n == 1 << n_vars
    coeffs = bit_reverse_list(mle_to_coeffs(evals))
    code = reed_solomon(coeffs, log_blowup)
    m = len(code)
    log_domain = m.bit_length() - 1
    gen = pow2_gen(log_domain)
    inv_gen = pow(gen, P - 2, P)

    # init: commit layer 0
    pairs = [felt_bytes(code[i]) + felt_bytes(code[i + m // 2]) for i in range(m // 2)]
    tree = merkle_layers(pairs)
    roots = [tree[-1][0]]
    transcript.absorb(tree[-1][0])

    delta = [mask_eval(i, n_vars, inputs) for i in range(n)]
    matrix = list(evals)
    prev = mle_eval(evals, inputs)
    cur_code = code
    pols = []
    last_elem = None
    for k in range(n_vars):
        # round poly at X=1,2 (identity composition, total degree 2)
        off = len(matrix) // 2
        e = [0, 0, 0]
        for x in (1, 2):
            s = 0
            for i in range(off):
                mx = (matrix[i] + x * (matrix[i + off] - matrix[i])) % P
                dx = (delta[i] + x * (delta[i + off] - delta[i])) % P
                s = (s + mx * dx) % P
            e[x] = s
        e[0] = (prev - e[1]) % P
        cs = interpolate(e)
        nonzero = cs[1:]
        for c in nonzero:
            transcript.absorb_felt(c)
        pols.append(nonzero)
        r = transcript.challenge()
        prev = poly_eval(cs, r)
        matrix = [(matrix[i] + r * (matrix[i + off] - matrix[i])) % P for i in range(off)]
        delta = [(delta[i] + r * (delta[i + off] - delta[i])) % P for i in range(off)]
        # FRI fold with the SAME r
        half = len(cur_code) // 2
        nxt = []
        for i in range(half):
            a, b = cur_code[i], cur_code[i + half]
            tw = pow(inv_gen, i * (1 << k), P)
            nxt.append(((a + b) + r * ((a - b) * tw % P)) % P * INV2 % P)
        cur_code = nxt
        if half == (1 << log_blowup):
            assert all(v == cur_code[0] for v in cur_code)
            last_elem = cur_code[0]
            transcript.absorb(felt_bytes(last_elem))
        else:
            pairs = [
                felt_bytes(cur_code[i]) + felt_bytes(cur_code[i + half // 2])
                for i in range(half // 2)
            ]
            tree = merkle_layers(pairs)
            roots.append(tree[-1][0])
            transcript.absorb(tree[-1][0])

    indices = []
    for _ in range(num_queries):
        idx = transcript.rand_index(m // 2)
        indices.append(idx)
        transcript.absorb(idx.to_bytes(8, "little"))
    return roots, pols, last_elem, indices, transcript.state()


def batched_pcs_prove(inputs, polys, transcript, log_blowup=1, num_queries=128):
    """Golden batched PCS prover transcript (reference src/fri/batched_pcs.rs).

    Returns (batch_root, roots, pols, last_elem, final_state).
    """
    n_vars = len(inputs)
    n = len(polys[0])
    B = len(polys)
    outputs = [mle_eval(p, inputs) for p in polys]

    codes = []
    for p in polys:
        coeffs = bit_reverse_list(mle_to_coeffs(p))
        codes.append(reed_solomon(coeffs, log_blowup))
    m = len(codes[0])
    log_domain = m.bit_length() - 1
    gen = pow2_gen(log_domain)
    inv_gen = pow(gen, P - 2, P)

    # absorb claim: inputs then outputs
    for x in inputs:
        transcript.absorb_felt(x)
    for x in outputs:
        transcript.absorb_felt(x)

    # batch commit: leaf i = (c0[i]||c0[i+m/2]) || (c1[i]||...) ...
    half = m // 2
    leaves = [
        b"".join(felt_bytes(c[i]) + felt_bytes(c[i + half]) for c in codes)
        for i in range(half)
    ]
    batch_tree = merkle_layers(leaves)
    batch_root = batch_tree[-1][0]
    transcript.absorb(batch_root)
    fingerprint_r = transcript.challenge()
    transcript.absorb(felt_bytes(fingerprint_r))

    def fingerprint(r, items):
        acc = 0
        for x in items:
            acc = (acc * r + x) % P
        return acc

    # eval-wise RLC sumcheck polynomial
    matrix = [fingerprint(fingerprint_r, [p[i] for p in polys]) for i in range(n)]
    delta = [mask_eval(i, n_vars, inputs) for i in range(n)]
    prev = fingerprint(fingerprint_r, outputs)

    cur_code = None
    roots, pols = [], []
    last_elem = None
    for k in range(n_vars):
        off = len(matrix) // 2
        e = [0, 0, 0]
        for x in (1, 2):
            s = 0
            for i in range(off):
                mx = (matrix[i] + x * (matrix[i + off] - matrix[i])) % P
                dx = (delta[i] + x * (delta[i + off] - delta[i])) % P
                s = (s + mx * dx) % P
            e[x] = s
        e[0] = (prev - e[1]) % P
        cs = interpolate(e)
        nonzero = cs[1:]
        for c in nonzero:
            transcript.absorb_felt(c)
        pols.append(nonzero)
        r = transcript.challenge()
        prev = poly_eval(cs, r)
        matrix = [(matrix[i] + r * (matrix[i + off] - matrix[i])) % P for i in range(off)]
        delta = [(delta[i] + r * (delta[i + off] - delta[i])) % P for i in range(off)]

        if k == 0:
            # batched first fold on the fingerprinted columns
            src = [fingerprint(fingerprint_r, [c[i] for c in codes]) for i in range(m)]
        else:
            src = cur_code
        halfc = len(src) // 2
        nxt = []
        for i in range(halfc):
            a, b = src[i], src[i + halfc]
            tw = pow(inv_gen, i * (1 << k), P)
            nxt.append(((a + b) + r * ((a - b) * tw % P)) % P * INV2 % P)
        cur_code = nxt
        if halfc == (1 << log_blowup):
            assert all(v == cur_code[0] for v in cur_code)
            last_elem = cur_code[0]
            transcript.absorb(felt_bytes(last_elem))
        else:
            pairs = [
                felt_bytes(cur_code[i]) + felt_bytes(cur_code[i + halfc // 2])
                for i in range(halfc // 2)
            ]
            tree = merkle_layers(pairs)
            roots.append(tree[-1][0])
            transcript.absorb(tree[-1][0])

    for _ in range(num_queries):
        idx = transcript.rand_index(m // 2)
        transcript.absorb(idx.to_bytes(8, "little"))
    return batch_root, roots, pols, last_elem, transcript.state()


def fri_prove(code, transcript, log_blowup=1, num_queries=128):
    """Golden FRI prover: returns (roots, last_elem, query data, last_random)."""
    n = len(code)
    log_n = n.bit_length() - 1
    gen = pow2_gen(log_n)
    inv_gen = pow(gen, P - 2, P)

    layers = []  # list of codeword lists
    trees = []
    cur = list(code)
    # init commit
    pairs = [felt_bytes(cur[i]) + felt_bytes(cur[i + n // 2]) for i in range(n // 2)]
    tree = merkle_layers(pairs)
    trees.append(tree)
    layers.append(cur)
    transcript.absorb(tree[-1][0])
    roots = [tree[-1][0]]
    last_elem = None

    num_steps = log_n - log_blowup
    for k in range(num_steps):
        r = transcript.challenge()
        m = len(cur)
        half = m // 2
        nxt = []
        for i in range(half):
            a, b = cur[i], cur[i + half]
            tw = pow(inv_gen, i * (1 << k), P)
            nxt.append(((a + b) + r * ((a - b) * tw % P)) % P * INV2 % P)
        cur = nxt
        if half == (1 << log_blowup):
            assert all(v == cur[0] for v in cur), "not an RS code"
            last_elem = cur[0]
            transcript.absorb(felt_bytes(last_elem))
        else:
            pairs = [
                felt_bytes(cur[i]) + felt_bytes(cur[i + half // 2]) for i in range(half // 2)
            ]
            tree = merkle_layers(pairs)
            trees.append(tree)
            roots.append(tree[-1][0])
            transcript.absorb(tree[-1][0])
        layers.append(cur)

    queries = []
    for _ in range(num_queries):
        idx = transcript.rand_index(n // 2)
        queries.append(idx)
        transcript.absorb(idx.to_bytes(8, "little"))
    return roots, last_elem, queries, transcript.state(), layers, trees
