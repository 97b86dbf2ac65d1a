// Measured single-core CPU baseline with REFERENCE semantics.
//
// The reference (fr34za/multilinear) publishes no numbers; its benchmarks
// print wall-clock when run under cargo, which this environment lacks.
// This driver re-implements the reference's exact prover semantics
// (single thread, same algorithms at the same asymptotics:
// reference src/fri/multilinear_pcs.rs:89-136 PCS prove = Moebius
// to_coefficient + bit_reverse + radix-2 NTT RS-encode + interleaved
// sumcheck/FRI folds + SHA-256 Merkle commits + 128 queries) so the
// framework's speedups divide by a number MEASURED on this machine.
//
// Transcript parity: `baseline parity <log_n>` prints root/last_element/
// last_random hex digests; tests/test_native.py checks them byte-identical
// to the Python/TPU prover's proof, so the baseline provably performs the
// reference's work, not a strawman's.
//
// Build: g++ -O3 -o baseline baseline.cpp   (single file; field + SHA-256
// come from mlt_native.cpp, included below).
// Run:   ./baseline pcs 20   -> one JSON line {"metric": ..., "seconds": ...}

#include "mlt_native.cpp"

#include <cstdio>
#include <ctime>
#include <string>
#include <vector>

using std::vector;

static double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

// ---------------------------------------------------------------------------
// Transcript (reference src/transcript.rs): SHA-256 running state;
// random() finalizes a CLONE (quirk Q1); next_challenge = first 16 digest
// bytes as LE u128 reduced mod p.
// ---------------------------------------------------------------------------
struct BTranscript {
    ShaCtx ctx;
    BTranscript() { mlt_sha_init((u8*)&ctx); }
    void absorb(const u8* data, u64 len) { mlt_sha_update((u8*)&ctx, data, len); }
    void absorb_f(u128 v) {
        u8 b[16];
        store_f(b, v);
        absorb(b, 16);
    }
    void random32(u8 out[32]) const { mlt_sha_digest((const u8*)&ctx, out); }
    u128 next_challenge() const {
        u8 d[32];
        random32(d);
        u128 v = load_f(d);
        if (v >= P) v -= P;
        return v;
    }
};

// ---------------------------------------------------------------------------
// NTT, reference src/ntt/mod.rs:69-123: bit-reverse input then iterative
// radix-2 DIT with a per-stage twiddle table.
// ---------------------------------------------------------------------------
static void bit_reverse_permutation(vector<u128>& a) {
    u64 n = a.size();
    int bits = 0;
    while ((1ull << bits) < n) bits++;
    for (u64 i = 0; i < n; i++) {
        u64 j = 0;
        for (int b = 0; b < bits; b++)
            if (i & (1ull << b)) j |= 1ull << (bits - 1 - b);
        if (j > i) std::swap(a[i], a[j]);
    }
}

// generator of the size-n multiplicative subgroup: g^((p-1)/n), g = 3
// (reference src/ntt/mod.rs:34-59)
static u128 pow2_root(u64 n) {
    u128 exp = (P - 1) / n;  // p-1 divisible by 2^40
    return pow_mod(3, exp);
}

static void ntt_inplace(vector<u128>& a, u128 w_n) {
    u64 n = a.size();
    bit_reverse_permutation(a);
    for (u64 len = 2; len <= n; len <<= 1) {
        u128 wl = pow_mod(w_n, n / len);
        vector<u128> tw(len / 2);
        tw[0] = 1;
        for (u64 j = 1; j < len / 2; j++) tw[j] = mul_mod(tw[j - 1], wl);
        for (u64 blk = 0; blk < n; blk += len) {
            for (u64 j = 0; j < len / 2; j++) {
                u128 u = a[blk + j];
                u128 v = mul_mod(a[blk + j + len / 2], tw[j]);
                a[blk + j] = add_mod(u, v);
                a[blk + j + len / 2] = sub_mod(u, v);
            }
        }
    }
}

// RS encode, rate 1/2 (reference src/fri/mod.rs:19-28)
static vector<u128> reed_solomon(const vector<u128>& coeffs) {
    vector<u128> code(coeffs);
    code.resize(coeffs.size() * 2, 0);
    ntt_inplace(code, pow2_root(code.size()));
    return code;
}

// ---------------------------------------------------------------------------
// Merkle over ReedSolomonPair leaves (reference src/fri/mod.rs:30-55,
// src/merkle_tree/mod.rs:65-86): leaf i = H(value_i || minus_value_i),
// all layers retained.
// ---------------------------------------------------------------------------
struct BTree {
    // layers[0] = n leaf digests ... layers.back() = root
    vector<vector<u8>> layers;
    const u8* root() const { return layers.back().data(); }
};

// code has 2*half elements; pair i = (code[i], code[i + half])
static BTree commit_pairs(const vector<u128>& code) {
    u64 half = code.size() / 2;
    BTree t;
    t.layers.emplace_back(32 * half);
    for (u64 i = 0; i < half; i++) {
        u8 leaf[32];
        store_f(leaf, code[i]);
        store_f(leaf + 16, code[i + half]);
        sha256(leaf, 32, t.layers[0].data() + 32 * i);
    }
    u64 m = half;
    while (m > 1) {
        const vector<u8>& src = t.layers.back();
        vector<u8> dst(32 * (m / 2));
        for (u64 i = 0; i < m / 2; i++)
            sha256(src.data() + 64 * i, 64, dst.data() + 32 * i);
        t.layers.push_back(std::move(dst));
        m /= 2;
    }
    return t;
}

// path extraction (reference src/merkle_tree/mod.rs:134-175)
struct BPath {
    vector<u8> sibs;   // 32 bytes per level
    vector<u8> dirs;   // 1 = sibling left
};

static BPath open_path(const BTree& t, u64 index) {
    BPath p;
    for (u64 lvl = 0; lvl + 1 < t.layers.size(); lvl++) {
        u64 sib = index ^ 1;
        p.sibs.insert(p.sibs.end(), t.layers[lvl].data() + 32 * sib,
                      t.layers[lvl].data() + 32 * sib + 32);
        p.dirs.push_back(index & 1 ? 1 : 0);
        index >>= 1;
    }
    return p;
}

// ---------------------------------------------------------------------------
// FRI fold step, reference src/fri/mod.rs:79-134:
//   next[i] = ((a+b) + r*(a-b)*g^{-i*2^k}) / 2  over pairs of the half-split,
// with the inverse twiddle read from the tail of the full power table.
// ---------------------------------------------------------------------------
static vector<u128> fri_fold(const vector<u128>& code, u128 r, u128 tw_step,
                             u128 inv2) {
    u64 half = code.size() / 2;
    vector<u128> next(half);
    u128 tw = 1;
    for (u64 i = 0; i < half; i++) {
        u128 even = add_mod(code[i], code[i + half]);
        u128 odd = mul_mod(sub_mod(code[i], code[i + half]), tw);
        next[i] = mul_mod(add_mod(even, mul_mod(r, odd)), inv2);
        tw = mul_mod(tw, tw_step);
    }
    return next;
}

// ---------------------------------------------------------------------------
// Multilinear helpers
// ---------------------------------------------------------------------------

// eval -> coeff Moebius transform (reference src/polynomials.rs:150-163)
static void to_coefficient(vector<u128>& a) {
    u64 n = a.size();
    for (u64 step = 1; step < n; step <<= 1)
        for (u64 i = 0; i < n; i++)
            if (i & step) a[i] = sub_mod(a[i], a[i ^ step]);
}

// delta table: delta[i] = eq(inputs, bits(i)), first input = MSB (quirk Q8),
// built by tensor-product doubling (same output as the reference's per-row
// Mask loop, src/constraint_system/sumcheck.rs:128-145, evaluation.rs:50-73)
static vector<u128> delta_table(const vector<u128>& inputs) {
    vector<u128> d{1};
    for (u128 x : inputs) {
        vector<u128> nd(d.size() * 2);
        u128 one_minus = sub_mod(1, x);
        for (u64 t = 0; t < d.size(); t++) {
            // each new input becomes the LSB, pushing earlier inputs toward
            // the MSB - so inputs[0] ends up paired with the top bit (Q8)
            nd[2 * t] = mul_mod(d[t], one_minus);
            nd[2 * t + 1] = mul_mod(d[t], x);
        }
        d.swap(nd);
    }
    return d;
}

// MLE evaluation of an eval-form table at a point (big-endian variables)
static u128 evaluate_evals(vector<u128> a, const vector<u128>& inputs) {
    for (u128 x : inputs) {
        u64 half = a.size() / 2;
        for (u64 i = 0; i < half; i++)
            a[i] = add_mod(a[i], mul_mod(x, sub_mod(a[i + half], a[i])));
        a.resize(half);
    }
    return a[0];
}

// interpolate the degree-2 round polynomial through (0,s0),(1,s1),(2,s2)
// (reference src/polynomials.rs:51-87 over the {0..n-1} domain):
//   c2 = (s0 - 2 s1 + s2)/2 ; c1 = s1 - s0 - c2 ; c0 = s0
static void interp_deg2(u128 s0, u128 s1, u128 s2, u128 c[3]) {
    u128 inv2 = inv_mod(2);
    u128 c2 = mul_mod(sub_mod(add_mod(s0, s2), add_mod(s1, s1)), inv2);
    u128 c1 = sub_mod(sub_mod(s1, s0), c2);
    c[0] = s0;
    c[1] = c1;
    c[2] = c2;
}

// ---------------------------------------------------------------------------
// PCS prove (reference src/fri/multilinear_pcs.rs:89-136): the flagship
// workload.  Returns (root0, last_element, last_random) for parity checks
// and a byte checksum of the query paths so the work can't be elided.
// ---------------------------------------------------------------------------
struct PcsResult {
    u8 root0[32];
    u128 last_element;
    u8 last_random[32];
    u64 path_checksum;
};

static const int NUM_QUERIES_B = 128;

static PcsResult pcs_prove(const vector<u128>& evals,
                           const vector<u128>& inputs, u128 output) {
    u64 h = evals.size();
    u64 n_vars = inputs.size();
    u64 code_len = 2 * h;

    // full power table of the 2h-domain generator (reference
    // src/ntt/mod.rs:18-28: sequential muls, gen_pows[len] == 1)
    u128 g = pow2_root(code_len);
    vector<u128> gen_pows(code_len + 1);
    gen_pows[0] = 1;
    for (u64 i = 1; i <= code_len; i++) gen_pows[i] = mul_mod(gen_pows[i - 1], g);

    // encode: eval->coeff, bit-reverse (quirk Q8), RS encode
    vector<u128> coeffs(evals);
    to_coefficient(coeffs);
    bit_reverse_permutation(coeffs);
    vector<u128> code = reed_solomon(coeffs);

    // sumcheck tables (identity composition): matrix = evals, delta = eq
    vector<u128> matrix(evals);
    vector<u128> delta = delta_table(inputs);

    BTranscript tr;
    PcsResult res{};
    res.path_checksum = 0;

    vector<BTree> trees;
    trees.push_back(commit_pairs(code));
    std::memcpy(res.root0, trees[0].root(), 32);
    tr.absorb(trees[0].root(), 32);

    u128 inv2 = inv_mod(2);
    u128 previous_sum = output;
    u64 table_h = h;
    for (u64 k = 0; k < n_vars; k++) {
        // round polynomial s(X) at X = 1, 2 (reference sumcheck.rs:204-232)
        u64 off = table_h / 2;
        u128 s1 = 0, s2 = 0;
        for (u64 i = 0; i < off; i++) {
            u128 md = sub_mod(matrix[i + off], matrix[i]);
            u128 dd = sub_mod(delta[i + off], delta[i]);
            u128 m1 = add_mod(matrix[i], md);
            u128 d1 = add_mod(delta[i], dd);
            s1 = add_mod(s1, mul_mod(m1, d1));
            s2 = add_mod(s2, mul_mod(add_mod(m1, md), add_mod(d1, dd)));
        }
        u128 s0 = sub_mod(previous_sum, s1);
        u128 c[3];
        interp_deg2(s0, s1, s2, c);
        // absorb coeffs[1..] (quirk Q7 wire format)
        tr.absorb_f(c[1]);
        tr.absorb_f(c[2]);
        u128 r = tr.next_challenge();
        if (std::getenv("BASELINE_DEBUG")) {
            u8 b1[16], b2[16], br[16];
            store_f(b1, c[1]); store_f(b2, c[2]); store_f(br, r);
            auto hx = [](const u8* b) { std::string s; char t[3];
                for (int i = 0; i < 16; i++) { std::snprintf(t, 3, "%02x", b[i]); s += t; }
                return s; };
            std::fprintf(stderr, "round %llu c1=%s c2=%s r=%s\n",
                         (unsigned long long)k, hx(b1).c_str(), hx(b2).c_str(), hx(br).c_str());
        }
        // fold sumcheck tables: lo + r*(hi - lo)
        for (u64 i = 0; i < off; i++) {
            matrix[i] = add_mod(matrix[i], mul_mod(r, sub_mod(matrix[i + off], matrix[i])));
            delta[i] = add_mod(delta[i], mul_mod(r, sub_mod(delta[i + off], delta[i])));
        }
        matrix.resize(off);
        delta.resize(off);
        table_h = off;
        previous_sum = add_mod(c[0], mul_mod(r, add_mod(c[1], mul_mod(r, c[2]))));

        // FRI fold step with the SAME r; inverse twiddle step
        // g^{-2^k} = gen_pows[code_len - 2^k] (tail indexing)
        u128 tw_step = gen_pows[code_len - ((u64)1 << k)];
        code = fri_fold(code, r, tw_step, inv2);
        if (code.size() > 2) {
            trees.push_back(commit_pairs(code));
            tr.absorb(trees.back().root(), 32);
        } else {
            // length == blowup: assert constant, absorb last element
            res.last_element = code[0];
            tr.absorb_f(code[0]);
        }
    }

    // 128 queries (reference src/fri/mod.rs:261-285, quirk Q5)
    u64 half0 = h;  // layer-0 pair count
    for (int q = 0; q < NUM_QUERIES_B; q++) {
        u8 rnd[32];
        tr.random32(rnd);
        u64 raw;
        std::memcpy(&raw, rnd, 8);  // first 8 digest bytes, LE
        u64 index = raw % half0;
        u8 le[8];
        std::memcpy(le, &index, 8);
        tr.absorb(le, 8);
        u64 idx = index;
        for (auto& t : trees) {
            u64 leaves = t.layers[0].size() / 32;
            idx %= leaves;
            BPath p = open_path(t, idx);
            for (u8 b : p.sibs) res.path_checksum += b;
            idx >>= 1;
        }
    }
    tr.random32(res.last_random);
    return res;
}

// ---------------------------------------------------------------------------
// Standalone sumcheck (reference sumcheck_high_bench,
// src/constraint_system/sumcheck.rs:367-398): 4-column trace, two degree-2
// constraints combined by the eq-mask, round polys of degree 3.
// ---------------------------------------------------------------------------
static double sumcheck_bench(u64 log_n) {
    u64 h = 1ull << log_n;
    vector<vector<u128>> cols(4, vector<u128>(h));
    static const u64 base[64] = {
        3, 4, 5, 7, 5, 12, 13, 17, 8, 15, 17, 23, 7, 24, 25, 31,
        20, 21, 29, 41, 12, 35, 37, 47, 9, 40, 41, 49, 28, 45, 53, 73,
        11, 60, 61, 71, 16, 63, 65, 79, 33, 56, 65, 89, 48, 55, 73, 103,
        13, 84, 85, 97, 36, 77, 85, 113, 39, 80, 89, 119, 65, 72, 97, 137};
    for (u64 i = 0; i < h; i++)
        for (int j = 0; j < 4; j++) cols[j][i] = base[(i % 16) * 4 + j];

    // ChallengeSet quirk Q2: every challenge equals the empty-transcript one
    BTranscript tr;
    u128 ch = tr.next_challenge();
    vector<u128> row_challenges(log_n, ch);
    vector<u128> constraint_challenges(1, ch);  // 2 constraints -> 1 bit
    // constraint mask: eq(constraint_challenges, bits(i))
    vector<u128> mask = delta_table(constraint_challenges);

    double t0 = now_s();
    vector<u128> delta = delta_table(row_challenges);
    u128 previous_sum = 0;
    u128 inv6 = inv_mod(6);
    volatile u64 sink = 0;
    for (u64 k = 0; k < log_n; k++) {
        u64 off = cols[0].size() / 2;
        // degree-3 round poly: evaluate at X = 1, 2, 3
        u128 s[3] = {0, 0, 0};
        for (u64 i = 0; i < off; i++) {
            u128 v[4], dv[4];
            for (int j = 0; j < 4; j++) {
                dv[j] = sub_mod(cols[j][i + off], cols[j][i]);
                v[j] = add_mod(cols[j][i], dv[j]);
            }
            u128 dd = sub_mod(delta[i + off], delta[i]);
            u128 d = add_mod(delta[i], dd);
            for (int x = 0; x < 3; x++) {
                // composition = mask0*(a^2+b^2-c^2) + mask1*(a+b-d)
                u128 c0 = sub_mod(add_mod(mul_mod(v[0], v[0]), mul_mod(v[1], v[1])),
                                  mul_mod(v[2], v[2]));
                u128 c1 = sub_mod(add_mod(v[0], v[1]), v[3]);
                u128 comp = add_mod(mul_mod(mask[0], c0), mul_mod(mask[1], c1));
                s[x] = add_mod(s[x], mul_mod(d, comp));
                if (x < 2) {
                    for (int j = 0; j < 4; j++) v[j] = add_mod(v[j], dv[j]);
                    d = add_mod(d, dd);
                }
            }
        }
        u128 s0 = sub_mod(previous_sum, s[0]);
        // interpolate degree-3 through (0,s0),(1,s[0]),(2,s[1]),(3,s[2]) --
        // forward differences
        u128 d1 = sub_mod(s[0], s0), d2 = sub_mod(s[1], s[0]), d3 = sub_mod(s[2], s[1]);
        u128 dd2 = sub_mod(d2, d1), dd3 = sub_mod(d3, d2);
        u128 ddd = sub_mod(dd3, dd2);
        u128 c3 = mul_mod(ddd, inv6);
        // absorb the three nonzero coeffs' worth of data (approximate the
        // transcript cost; exact interp constants don't matter for timing)
        tr.absorb_f(d1);
        tr.absorb_f(dd2);
        tr.absorb_f(c3);
        u128 r = tr.next_challenge();
        for (int j = 0; j < 4; j++) {
            for (u64 i = 0; i < off; i++)
                cols[j][i] = add_mod(cols[j][i], mul_mod(r, sub_mod(cols[j][i + off], cols[j][i])));
            cols[j].resize(off);
        }
        for (u64 i = 0; i < off; i++)
            delta[i] = add_mod(delta[i], mul_mod(r, sub_mod(delta[i + off], delta[i])));
        delta.resize(off);
        previous_sum = s[0];  // placeholder telescoping (timing-equivalent)
        sink += (u64)previous_sum;
    }
    (void)sink;
    return now_s() - t0;
}

// ---------------------------------------------------------------------------
// FRI standalone (reference fri_benchmark_test, src/fri/mod.rs:365-398):
// gen_pows + RS encode of a 2^log_n message + full fold + 128 queries.
// ---------------------------------------------------------------------------
static double fri_bench(u64 log_n) {
    u64 h = 1ull << log_n;
    vector<u128> msg(h);
    for (u64 i = 0; i < h; i++) msg[i] = i;

    double t0 = now_s();
    u64 code_len = 2 * h;
    u128 g = pow2_root(code_len);
    vector<u128> gen_pows(code_len + 1);
    gen_pows[0] = 1;
    for (u64 i = 1; i <= code_len; i++) gen_pows[i] = mul_mod(gen_pows[i - 1], g);
    vector<u128> code = reed_solomon(msg);

    BTranscript tr;
    vector<BTree> trees;
    trees.push_back(commit_pairs(code));
    tr.absorb(trees[0].root(), 32);
    u128 inv2 = inv_mod(2);
    u64 k = 0;
    u128 last_element = 0;
    while (code.size() > 2) {
        u128 r = tr.next_challenge();
        u128 tw_step = gen_pows[code_len - ((u64)1 << k)];
        code = fri_fold(code, r, tw_step, inv2);
        if (code.size() > 2) {
            trees.push_back(commit_pairs(code));
            tr.absorb(trees.back().root(), 32);
        } else {
            last_element = code[0];
            tr.absorb_f(code[0]);
        }
        k++;
    }
    volatile u64 checksum = 0;
    u64 half0 = h;
    for (int q = 0; q < NUM_QUERIES_B; q++) {
        u8 rnd[32];
        tr.random32(rnd);
        u64 raw;
        std::memcpy(&raw, rnd, 8);
        u64 index = raw % half0;
        u8 le[8];
        std::memcpy(le, &index, 8);
        tr.absorb(le, 8);
        u64 idx = index;
        for (auto& t : trees) {
            u64 leaves = t.layers[0].size() / 32;
            idx %= leaves;
            BPath p = open_path(t, idx);
            for (u8 b : p.sibs) checksum += b;
            idx >>= 1;
        }
    }
    (void)checksum;
    (void)last_element;
    return now_s() - t0;
}

// ---------------------------------------------------------------------------
// Batched PCS (reference batched_pcs_verify_test, src/fri/batched_pcs.rs:
// 261-306): B polys committed column-wise, fingerprint-RLC'd, then one PCS.
// ---------------------------------------------------------------------------
static double batched_pcs_bench(u64 log_n, u64 n_polys) {
    u64 h = 1ull << log_n;
    vector<vector<u128>> polys(n_polys, vector<u128>(h));
    for (u64 j = 0; j < n_polys; j++)
        for (u64 i = 0; i < h; i++) polys[j][i] = (j * h + i) * 11 + 5;
    vector<u128> inputs(log_n);
    for (u64 i = 0; i < log_n; i++) inputs[i] = i + 2;

    double t0 = now_s();
    u64 code_len = 2 * h;
    u128 g = pow2_root(code_len);
    vector<u128> gen_pows(code_len + 1);
    gen_pows[0] = 1;
    for (u64 i = 1; i <= code_len; i++) gen_pows[i] = mul_mod(gen_pows[i - 1], g);

    // encode all B polys (reference: each poly to_coefficient + bitrev + RS)
    vector<vector<u128>> codes(n_polys);
    for (u64 j = 0; j < n_polys; j++) {
        vector<u128> c(polys[j]);
        to_coefficient(c);
        bit_reverse_permutation(c);
        codes[j] = reed_solomon(c);
    }

    // column-wise batch Merkle commit (batch_layer, batched_fri.rs:41-99):
    // leaf i = H(concat over j of pair(value, minus_value) of code j)
    BTranscript tr;
    u64 half = h;
    BTree batch_tree;
    batch_tree.layers.emplace_back(32 * half);
    {
        vector<u8> leaf(32 * n_polys);
        for (u64 i = 0; i < half; i++) {
            for (u64 j = 0; j < n_polys; j++) {
                store_f(leaf.data() + 32 * j, codes[j][i]);
                store_f(leaf.data() + 32 * j + 16, codes[j][i + half]);
            }
            sha256(leaf.data(), leaf.size(), batch_tree.layers[0].data() + 32 * i);
        }
        u64 m = half;
        while (m > 1) {
            const vector<u8>& src = batch_tree.layers.back();
            vector<u8> dst(32 * (m / 2));
            for (u64 i = 0; i < m / 2; i++)
                sha256(src.data() + 64 * i, 64, dst.data() + 32 * i);
            batch_tree.layers.push_back(std::move(dst));
            m /= 2;
        }
    }
    tr.absorb(batch_tree.root(), 32);
    u128 fp_r = tr.next_challenge();
    tr.absorb_f(fp_r);

    // RLC the codes and the eval tables (Horner: first poly highest power)
    vector<u128> code(code_len, 0);
    for (u64 i = 0; i < code_len; i++) {
        u128 acc = 0;
        for (u64 j = 0; j < n_polys; j++) acc = add_mod(mul_mod(acc, fp_r), codes[j][i]);
        code[i] = acc;
    }
    vector<u128> matrix(h, 0);
    for (u64 i = 0; i < h; i++) {
        u128 acc = 0;
        for (u64 j = 0; j < n_polys; j++) acc = add_mod(mul_mod(acc, fp_r), polys[j][i]);
        matrix[i] = acc;
    }
    vector<u128> delta = delta_table(inputs);

    // rounds: identical to plain PCS from here (trees on the folded code)
    vector<BTree> trees;
    u128 inv2 = inv_mod(2);
    u128 previous_sum = 0;
    u64 table_h = h;
    for (u64 k = 0; k < log_n; k++) {
        u64 off = table_h / 2;
        u128 s1 = 0, s2 = 0;
        for (u64 i = 0; i < off; i++) {
            u128 md = sub_mod(matrix[i + off], matrix[i]);
            u128 dd = sub_mod(delta[i + off], delta[i]);
            u128 m1 = add_mod(matrix[i], md);
            u128 d1 = add_mod(delta[i], dd);
            s1 = add_mod(s1, mul_mod(m1, d1));
            s2 = add_mod(s2, mul_mod(add_mod(m1, md), add_mod(d1, dd)));
        }
        u128 s0 = sub_mod(previous_sum, s1);
        u128 c[3];
        interp_deg2(s0, s1, s2, c);
        tr.absorb_f(c[1]);
        tr.absorb_f(c[2]);
        u128 r = tr.next_challenge();
        for (u64 i = 0; i < off; i++) {
            matrix[i] = add_mod(matrix[i], mul_mod(r, sub_mod(matrix[i + off], matrix[i])));
            delta[i] = add_mod(delta[i], mul_mod(r, sub_mod(delta[i + off], delta[i])));
        }
        matrix.resize(off);
        delta.resize(off);
        table_h = off;
        previous_sum = add_mod(c[0], mul_mod(r, add_mod(c[1], mul_mod(r, c[2]))));
        u128 tw_step = gen_pows[code_len - ((u64)1 << k)];
        code = fri_fold(code, r, tw_step, inv2);
        if (code.size() > 2) {
            trees.push_back(commit_pairs(code));
            tr.absorb(trees.back().root(), 32);
        } else {
            tr.absorb_f(code[0]);
        }
    }
    volatile u64 checksum = 0;
    for (int q = 0; q < NUM_QUERIES_B; q++) {
        u8 rnd[32];
        tr.random32(rnd);
        u64 raw;
        std::memcpy(&raw, rnd, 8);
        u64 index = raw % h;
        u8 le[8];
        std::memcpy(le, &index, 8);
        tr.absorb(le, 8);
        u64 idx = index;
        {
            BPath p = open_path(batch_tree, idx % h);
            for (u8 b : p.sibs) checksum += b;
            idx >>= 1;
        }
        for (auto& t : trees) {
            u64 leaves = t.layers[0].size() / 32;
            idx %= leaves;
            BPath p = open_path(t, idx);
            for (u8 b : p.sibs) checksum += b;
            idx >>= 1;
        }
    }
    (void)checksum;
    return now_s() - t0;
}

// ---------------------------------------------------------------------------
// main
// ---------------------------------------------------------------------------
int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: baseline <pcs|ntt|fri|sumcheck|batched-pcs|snark|parity> <log_n>\n");
        return 2;
    }
    std::string mode = argv[1];
    u64 log_n = std::strtoull(argv[2], nullptr, 10);
    u64 h = 1ull << log_n;

    if (mode == "parity") {
        // small-size transcript parity probe: print hex digests
        vector<u128> evals(h);
        for (u64 i = 0; i < h; i++) evals[i] = i * 7 + 3;
        vector<u128> inputs(log_n);
        for (u64 i = 0; i < log_n; i++) inputs[i] = i;
        u128 output = evaluate_evals(evals, inputs);
        PcsResult r = pcs_prove(evals, inputs, output);
        auto hex = [](const u8* b, int n) {
            std::string s;
            char t[3];
            for (int i = 0; i < n; i++) {
                std::snprintf(t, 3, "%02x", b[i]);
                s += t;
            }
            return s;
        };
        u8 le[16];
        store_f(le, r.last_element);
        std::printf("{\"root0\": \"%s\", \"last_element\": \"%s\", \"last_random\": \"%s\"}\n",
                    hex(r.root0, 32).c_str(), hex(le, 16).c_str(),
                    hex(r.last_random, 32).c_str());
        return 0;
    }

    double dt = 0;
    if (mode == "pcs" || mode == "snark") {
        vector<u128> evals(h);
        for (u64 i = 0; i < h; i++) evals[i] = (mode == "snark") ? (i * 7 + 3) % 97
                                                                  : i * 7 + 3;
        vector<u128> inputs(log_n);
        for (u64 i = 0; i < log_n; i++) inputs[i] = i;
        u128 output = evaluate_evals(evals, inputs);
        double extra = 0;
        if (mode == "snark") {
            // snark = width-1 sumcheck over the composed (trivial) constraint
            // + trace MLE evaluation + the PCS (reference snark_test,
            // src/fri/multilinear_pcs.rs:279-316).  The sumcheck pass over a
            // width-1 trace with a degree-1 constraint is one fold+sum sweep.
            double t0 = now_s();
            vector<u128> delta = delta_table(inputs);
            vector<u128> col(evals);
            BTranscript str;
            for (u64 k = 0; k < log_n; k++) {
                u64 off = col.size() / 2;
                u128 s1 = 0;
                for (u64 i = 0; i < off; i++)
                    s1 = add_mod(s1, mul_mod(delta[i], col[i]));
                str.absorb_f(s1);
                u128 r = str.next_challenge();
                for (u64 i = 0; i < off; i++) {
                    col[i] = add_mod(col[i], mul_mod(r, sub_mod(col[i + off], col[i])));
                    delta[i] = add_mod(delta[i], mul_mod(r, sub_mod(delta[i + off], delta[i])));
                }
                col.resize(off);
                delta.resize(off);
            }
            // trace MLE evaluation at the sumcheck point (O(h log h) naive
            // in the reference, O(h) here - favors the baseline)
            volatile u64 sink = (u64)evaluate_evals(evals, inputs);
            (void)sink;
            extra = now_s() - t0;
        }
        double t0 = now_s();
        PcsResult r = pcs_prove(evals, inputs, output);
        dt = (now_s() - t0) + extra;
        if (r.path_checksum == 0xdeadbeef) std::printf("!");  // keep live
    } else if (mode == "ntt") {
        vector<u128> a(h);
        for (u64 i = 0; i < h; i++) a[i] = i;
        u128 w = pow2_root(h);
        double t0 = now_s();
        ntt_inplace(a, w);
        dt = now_s() - t0;
        volatile u64 sink = (u64)a[1];
        (void)sink;
    } else if (mode == "fri") {
        dt = fri_bench(log_n);
    } else if (mode == "sumcheck") {
        dt = sumcheck_bench(log_n);
    } else if (mode == "batched-pcs") {
        dt = batched_pcs_bench(log_n, 10);
    } else {
        std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
        return 2;
    }
    std::printf("{\"metric\": \"%s_single_core_2^%llu\", \"seconds\": %.4f}\n",
                mode.c_str(), (unsigned long long)log_n, dt);
    return 0;
}
