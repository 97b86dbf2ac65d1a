// Native host-side runtime for multilinear-tpu.
//
// The TPU owns the bulk compute (JAX/XLA kernels); this library owns the
// host tail: exact GF(p) arithmetic on u128 (p = 2^128 - 45*2^40 + 1),
// SHA-256 Merkle layer construction, FRI fold/query helpers, and byte
// packing - the work the reference does in Rust on the CPU
// (src/field.rs, src/merkle_tree/mod.rs, src/fri/mod.rs) and that this
// framework runs host-side once folded arrays drop below the device
// threshold.  Exposed as a C ABI for ctypes.
//
// Field elements cross the ABI as 16-byte little-endian canonical residues.

#include <cstdint>
#include <cstring>
#include <cstdlib>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

// ---------------------------------------------------------------------------
// GF(p), p = 2^128 - 45*2^40 + 1
// ---------------------------------------------------------------------------

static const u128 K = (((u128)45) << 40) - 1;  // 2^128 mod p
static const u128 P = (u128)0 - K;             // 2^128 - K  (wraps mod 2^128)

static inline u128 load_f(const u8* b) {
    u128 v;
    std::memcpy(&v, b, 16);  // little-endian host assumed (x86-64 / tpu VM)
    return v;
}

static inline void store_f(u8* b, u128 v) { std::memcpy(b, &v, 16); }

static inline u128 add_mod(u128 a, u128 b) {
    u128 s = a + b;
    int carry = s < a;
    if (carry) s += K;         // 2^128 = K (mod p); K < 2^46 so no re-carry
    if (s >= P) s -= P;
    return s;
}

static inline u128 sub_mod(u128 a, u128 b) {
    u128 d = a - b;
    if (a < b) d -= K;         // borrow: -2^128 = -K (mod p)
    if (d >= P) d -= P;        // handles the small-underflow corner
    return d;
}

static inline void mul_wide(u128 a, u128 b, u128* hi, u128* lo) {
    u64 a0 = (u64)a, a1 = (u64)(a >> 64);
    u64 b0 = (u64)b, b1 = (u64)(b >> 64);
    u128 p00 = (u128)a0 * b0;
    u128 p01 = (u128)a0 * b1;
    u128 p10 = (u128)a1 * b0;
    u128 p11 = (u128)a1 * b1;
    u128 mid = p01 + p10;            // may carry
    u128 mid_carry = (mid < p01) ? ((u128)1 << 64) : 0;
    u128 lo_ = p00 + (mid << 64);
    u128 lo_carry = (lo_ < p00) ? 1 : 0;
    *lo = lo_;
    *hi = p11 + (mid >> 64) + mid_carry + lo_carry;
}

static inline u128 mul_mod(u128 a, u128 b) {
    u128 hi, lo;
    mul_wide(a, b, &hi, &lo);
    // fold: value = hi*2^128 + lo = hi*K + lo (mod p); hi*K < 2^174
    u128 kh, kl;
    mul_wide(hi, K, &kh, &kl);       // kh < 2^46
    u128 s = lo + kl;
    u128 c = (s < lo) ? 1 : 0;
    u128 top = kh + c;               // < 2^47
    // top*2^128 = top*K < 2^93 - fold once more
    u128 add = top * K;              // exact (top < 2^47, K < 2^46 -> < 2^93)
    u128 r = s + add;
    if (r < s) r += K;               // rare carry
    if (r >= P) r -= P;
    return r;
}

static inline u128 pow_mod(u128 base, u128 exp) {
    u128 r = 1;
    while (exp) {
        if (exp & 1) r = mul_mod(r, base);
        base = mul_mod(base, base);
        exp >>= 1;
    }
    return r;
}

static inline u128 inv_mod(u128 a) { return pow_mod(a, P - 2); }

extern "C" {

// vector ops: arrays of 16-byte LE field elements
void mlt_vec_mul(const u8* a, const u8* b, u8* out, u64 n) {
    for (u64 i = 0; i < n; i++)
        store_f(out + 16 * i, mul_mod(load_f(a + 16 * i), load_f(b + 16 * i)));
}

void mlt_vec_add(const u8* a, const u8* b, u8* out, u64 n) {
    for (u64 i = 0; i < n; i++)
        store_f(out + 16 * i, add_mod(load_f(a + 16 * i), load_f(b + 16 * i)));
}

void mlt_vec_sub(const u8* a, const u8* b, u8* out, u64 n) {
    for (u64 i = 0; i < n; i++)
        store_f(out + 16 * i, sub_mod(load_f(a + 16 * i), load_f(b + 16 * i)));
}

// out[i] = lo[i] + r*(hi[i] - lo[i])   (sumcheck/FRI table fold)
void mlt_fold(const u8* lo, const u8* hi, const u8* r16, u8* out, u64 n) {
    u128 r = load_f(r16);
    for (u64 i = 0; i < n; i++) {
        u128 l = load_f(lo + 16 * i), h = load_f(hi + 16 * i);
        store_f(out + 16 * i, add_mod(l, mul_mod(r, sub_mod(h, l))));
    }
}

// delta[i] = eq(points, bits(i)) over {0,1}^n_vars, big-endian variable
// order (quirk Q8; reference src/constraint_system/evaluation.rs:50-91
// semantics) by in-place tensor-product doubling: new[2i] = old[i]*(1-p),
// new[2i+1] = old[i]*p.  points: n_vars elements; out: 2^n_vars elements.
void mlt_delta_table(const u8* points, u64 n_vars, u8* out) {
    store_f(out, 1);
    u64 size = 1;
    for (u64 v = 0; v < n_vars; v++) {
        u128 p = load_f(points + 16 * v);
        u128 om = sub_mod(1, p);
        for (u64 i = size; i-- > 0;) {
            u128 t = load_f(out + 16 * i);
            store_f(out + 16 * (2 * i), mul_mod(t, om));
            store_f(out + 16 * (2 * i + 1), mul_mod(t, p));
        }
        size <<= 1;
    }
}

// Host-native MLE -> RS-codeword encode: Moebius eval->coeff transform
// (reference src/polynomials.rs:150-163), coefficient bit-reversal
// (quirk Q8, reference src/fri/multilinear_pcs.rs:101-107), zero-pad x2
// and radix-2 NTT over the 2h-domain (reference src/ntt/mod.rs:69-110,
// src/fri/mod.rs:19-28).  evals: h elements; out: 2h elements.  Used by
// the fully-host prover path (code length under host_threshold) so the
// TPU-free fallback does not pay the XLA-CPU limb-arithmetic encode.
void mlt_encode_mle(const u8* evals, u64 h, u8* out) {
    u64 n = 2 * h;
    u128* a = (u128*)std::malloc(n * sizeof(u128));
    for (u64 i = 0; i < h; i++) a[i] = load_f(evals + 16 * i);
    // Moebius: for each bit, x[i] -= x[i ^ bit] where bit set in i
    for (u64 step = 1; step < h; step <<= 1)
        for (u64 i = 0; i < h; i++)
            if (i & step) a[i] = sub_mod(a[i], a[i ^ step]);
    // coefficient bit-reversal over the h coefficients
    int hbits = 0;
    while ((1ull << hbits) < h) hbits++;
    for (u64 i = 0; i < h; i++) {
        u64 j = 0;
        for (int b = 0; b < hbits; b++)
            if (i & (1ull << b)) j |= 1ull << (hbits - 1 - b);
        if (j > i) { u128 t = a[i]; a[i] = a[j]; a[j] = t; }
    }
    for (u64 i = h; i < n; i++) a[i] = 0;
    // radix-2 DIT NTT over the n-domain: bit-reverse then stages
    int nbits = hbits + 1;
    for (u64 i = 0; i < n; i++) {
        u64 j = 0;
        for (int b = 0; b < nbits; b++)
            if (i & (1ull << b)) j |= 1ull << (nbits - 1 - b);
        if (j > i) { u128 t = a[i]; a[i] = a[j]; a[j] = t; }
    }
    u128 w_n = pow_mod(3, (P - 1) / n);
    for (u64 len = 2; len <= n; len <<= 1) {
        u128 wl = pow_mod(w_n, n / len);
        u128 tw = 1;
        for (u64 j = 0; j < len / 2; j++) {
            for (u64 blk = 0; blk < n; blk += len) {
                u128 u = a[blk + j];
                u128 v = mul_mod(a[blk + j + len / 2], tw);
                a[blk + j] = add_mod(u, v);
                a[blk + j + len / 2] = sub_mod(u, v);
            }
            tw = mul_mod(tw, wl);
        }
    }
    for (u64 i = 0; i < n; i++) store_f(out + 16 * i, a[i]);
    std::free(a);
}

// FRI fold step: next[i] = ((a+b) + r*(a-b)*ginv^(i*step_pow)) / 2
// code: 2n elements (a = code[i], b = code[i+n]); tw_step = ginv^(2^k).
void mlt_fri_fold(const u8* code, u64 half, const u8* r16, const u8* tw_step16,
                  u8* out) {
    u128 r = load_f(r16);
    u128 step = load_f(tw_step16);
    u128 inv2 = inv_mod(2);
    u128 tw = 1;
    for (u64 i = 0; i < half; i++) {
        u128 a = load_f(code + 16 * i);
        u128 b = load_f(code + 16 * (i + half));
        u128 even = add_mod(a, b);
        u128 odd = mul_mod(sub_mod(a, b), tw);
        store_f(out + 16 * i, mul_mod(add_mod(even, mul_mod(r, odd)), inv2));
        tw = mul_mod(tw, step);
    }
}

// identity-composition sumcheck partial sums: s(X) for X = 1..d over the
// pair-extended table.  matrix/delta: h elements; out: d elements.
void mlt_pcs_partial_sums(const u8* matrix, const u8* delta, u64 h, u64 d,
                          u8* out) {
    u64 off = h / 2;
    for (u64 x = 1; x <= d; x++) {
        u128 s = 0;
        for (u64 i = 0; i < off; i++) {
            u128 ml = load_f(matrix + 16 * i), mh = load_f(matrix + 16 * (i + off));
            u128 dl = load_f(delta + 16 * i), dh = load_f(delta + 16 * (i + off));
            u128 mx = ml, dx = dl;
            for (u64 t = 0; t < x; t++) {  // x is tiny (<= 3)
                mx = add_mod(mx, sub_mod(mh, ml));
                dx = add_mod(dx, sub_mod(dh, dl));
            }
            s = add_mod(s, mul_mod(mx, dx));
        }
        store_f(out + 16 * (x - 1), s);
    }
}

// Horner fingerprint RLC over B vectors of length n (first vector gets the
// highest power of r - reference quirk Q6).
void mlt_fingerprint(const u8* vecs, u64 b, u64 n, const u8* r16, u8* out) {
    u128 r = load_f(r16);
    for (u64 i = 0; i < n; i++) {
        u128 acc = 0;
        for (u64 j = 0; j < b; j++)
            acc = add_mod(mul_mod(acc, r), load_f(vecs + 16 * (j * n + i)));
        store_f(out + 16 * i, acc);
    }
}

// ---------------------------------------------------------------------------
// SHA-256
// ---------------------------------------------------------------------------

static const u32 SHA_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline u32 rotr(u32 x, int r) { return (x >> r) | (x << (32 - r)); }

static void sha256_compress(u32 st[8], const u8* block) {
    u32 w[64];
    for (int t = 0; t < 16; t++)
        w[t] = ((u32)block[4 * t] << 24) | ((u32)block[4 * t + 1] << 16) |
               ((u32)block[4 * t + 2] << 8) | block[4 * t + 3];
    for (int t = 16; t < 64; t++) {
        u32 s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3);
        u32 s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10);
        w[t] = w[t - 16] + s0 + w[t - 7] + s1;
    }
    u32 a = st[0], b = st[1], c = st[2], d = st[3];
    u32 e = st[4], f = st[5], g = st[6], h = st[7];
    for (int t = 0; t < 64; t++) {
        u32 S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
        u32 ch = (e & f) ^ (~e & g);
        u32 t1 = h + S1 + ch + SHA_K[t] + w[t];
        u32 S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
        u32 maj = (a & b) ^ (a & c) ^ (b & c);
        u32 t2 = S0 + maj;
        h = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
    st[4] += e; st[5] += f; st[6] += g; st[7] += h;
}

static void sha256(const u8* msg, u64 len, u8 out[32]) {
    u32 st[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                 0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    u64 full = len / 64;
    for (u64 i = 0; i < full; i++) sha256_compress(st, msg + 64 * i);
    u8 tail[128] = {0};
    u64 rem = len % 64;
    std::memcpy(tail, msg + 64 * full, rem);
    tail[rem] = 0x80;
    u64 tail_blocks = (rem + 1 + 8 <= 64) ? 1 : 2;
    u64 bitlen = len * 8;
    for (int i = 0; i < 8; i++)
        tail[64 * tail_blocks - 1 - i] = (u8)(bitlen >> (8 * i));
    for (u64 i = 0; i < tail_blocks; i++) sha256_compress(st, tail + 64 * i);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (u8)(st[i] >> 24);
        out[4 * i + 1] = (u8)(st[i] >> 16);
        out[4 * i + 2] = (u8)(st[i] >> 8);
        out[4 * i + 3] = (u8)st[i];
    }
}

void mlt_sha256(const u8* msg, u64 len, u8* out) { sha256(msg, len, out); }

// Streaming SHA-256 with an EXPORTABLE midstate, so a Fiat-Shamir
// transcript can hop between host and device: the state is 8 u32 words +
// a partial block + byte counts, laid out as a flat 108-byte buffer:
//   [0..32)   8 x u32 chaining state (host endianness)
//   [32..96)  64-byte partial block
//   [96..104) u64 total bytes absorbed
//   [104..108) u32 partial-block fill (bytes)
struct ShaCtx {
    u32 st[8];
    u8 buf[64];
    u64 total;
    u32 fill;
};

void mlt_sha_init(u8* ctx_bytes) {
    ShaCtx* c = (ShaCtx*)ctx_bytes;
    static const u32 H0[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                              0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    std::memcpy(c->st, H0, 32);
    c->total = 0;
    c->fill = 0;
}

void mlt_sha_update(u8* ctx_bytes, const u8* data, u64 len) {
    ShaCtx* c = (ShaCtx*)ctx_bytes;
    c->total += len;
    while (len) {
        u64 space = 64 - c->fill;
        u64 take = len < space ? len : space;
        std::memcpy(c->buf + c->fill, data, take);
        c->fill += (u32)take;
        data += take;
        len -= take;
        if (c->fill == 64) {
            sha256_compress(c->st, c->buf);
            c->fill = 0;
        }
    }
}

// finalize a CLONE of the context (the transcript's clone-digest semantics)
void mlt_sha_digest(const u8* ctx_bytes, u8* out) {
    ShaCtx c;
    std::memcpy(&c, ctx_bytes, sizeof(ShaCtx));
    u8 tail[128] = {0};
    std::memcpy(tail, c.buf, c.fill);
    tail[c.fill] = 0x80;
    u64 blocks = (c.fill + 1 + 8 <= 64) ? 1 : 2;
    u64 bitlen = c.total * 8;
    for (int i = 0; i < 8; i++)
        tail[64 * blocks - 1 - i] = (u8)(bitlen >> (8 * i));
    for (u64 i = 0; i < blocks; i++) sha256_compress(c.st, tail + 64 * i);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (u8)(c.st[i] >> 24);
        out[4 * i + 1] = (u8)(c.st[i] >> 16);
        out[4 * i + 2] = (u8)(c.st[i] >> 8);
        out[4 * i + 3] = (u8)c.st[i];
    }
}

// Hash n messages of fixed length each (leaf layer).
void mlt_sha256_many(const u8* msgs, u64 msg_len, u64 n, u8* out) {
    for (u64 i = 0; i < n; i++) sha256(msgs + msg_len * i, msg_len, out + 32 * i);
}

// Build a full Merkle tree from n 32-byte leaf digests.  out must hold
// (2n - 1) digests: level 0 (n leaves) first, then n/2, ..., then the root.
void mlt_merkle_layers(const u8* leaves, u64 n, u8* out) {
    std::memcpy(out, leaves, 32 * n);
    const u8* src = out;
    u8* dst = out + 32 * n;
    u64 m = n;
    while (m > 1) {
        for (u64 i = 0; i < m / 2; i++) sha256(src + 64 * i, 64, dst + 32 * i);
        src = dst;
        dst += 32 * (m / 2);
        m /= 2;
    }
}

// Verify one Merkle inclusion path.  Returns the recomputed index, or -1 on
// root mismatch.  leaf_bytes hashed first; sibs = depth 32-byte digests;
// dirs = depth bytes (0 = sibling right, 1 = sibling left).
long long mlt_merkle_verify(const u8* leaf_bytes, u64 leaf_len, const u8* sibs,
                            const u8* dirs, u64 depth, const u8* root) {
    u8 h[32];
    sha256(leaf_bytes, leaf_len, h);
    long long index = 0;
    u8 buf[64];
    for (u64 i = 0; i < depth; i++) {
        if (dirs[i]) {  // sibling on the left
            index += 1LL << i;
            std::memcpy(buf, sibs + 32 * i, 32);
            std::memcpy(buf + 32, h, 32);
        } else {
            std::memcpy(buf, h, 32);
            std::memcpy(buf + 32, sibs + 32 * i, 32);
        }
        sha256(buf, 64, h);
    }
    if (std::memcmp(h, root, 32) != 0) return -1;
    return index;
}

// Batched mlt_merkle_verify: n paths in ONE call (the per-call ctypes
// marshalling is half the host verifier's Merkle cost at 128 queries x
// ~24 layers).  Concatenated inputs; per-item leaf byte length / path
// depth arrays; out[i] = recomputed index or -1 on root mismatch.
void mlt_merkle_verify_many(const u8* leaves, const u64* leaf_len,
                            const u8* sibs, const u8* dirs,
                            const u64* depth, const u8* roots, u64 n,
                            long long* out) {
    u64 leaf_off = 0, sib_off = 0, dir_off = 0;
    for (u64 i = 0; i < n; i++) {
        out[i] = mlt_merkle_verify(leaves + leaf_off, leaf_len[i],
                                   sibs + sib_off, dirs + dir_off, depth[i],
                                   roots + 32 * i);
        leaf_off += leaf_len[i];
        sib_off += 32 * depth[i];
        dir_off += depth[i];
    }
}

}  // extern "C"
