// Native BLS12-446 group arithmetic: Pippenger MSM + fixed-base power chains.
//
// The analog of tfhe-zk-pok's hand-rolled curve backend (tfhe-zk-pok/
// src/curve_446/ + curve_api/msm.rs) and of the zk-cuda-backend GPU MSM:
// the hot loops of ZK CRS generation and proving, behind a C ABI consumed
// from Python via ctypes (tfhe_tpu/zk/curve446.py).  Field constants are
// injected at init time by the Python side, so this file contains only
// generic 7x64-limb Montgomery arithmetic.
//
// Point encodings on the ABI: affine, little-endian 56-byte coordinates.
// G1 = 112 bytes (x, y); G2 = 224 bytes (x.c0, x.c1, y.c0, y.c1).
// The all-zero encoding is the point at infinity.  Scalars: 40-byte LE.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtfhe_bls446.so bls446.cpp

#include <cstdint>
#include <cstring>
#include <vector>

typedef uint64_t u64;
typedef unsigned __int128 u128;

static const int NL = 7; // 446-bit modulus in 7x64 limbs

struct Fp {
    u64 v[NL];
};

static Fp P_MOD;      // modulus p
static Fp R2;         // (2^448)^2 mod p
static Fp ONE_M;      // Montgomery one = 2^448 mod p
static u64 N0;        // -p^{-1} mod 2^64
static Fp P_MINUS_2;  // exponent for Fermat inversion

static inline bool fp_is_zero(const Fp &a) {
    u64 acc = 0;
    for (int i = 0; i < NL; i++) acc |= a.v[i];
    return acc == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
    u64 acc = 0;
    for (int i = 0; i < NL; i++) acc |= a.v[i] ^ b.v[i];
    return acc == 0;
}

static inline bool fp_geq(const Fp &a, const Fp &b) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
    }
    return true;
}

static inline void fp_sub_raw(Fp &r, const Fp &a, const Fp &b) {
    u64 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
}

static inline void fp_add(Fp &r, const Fp &a, const Fp &b) {
    u64 carry = 0;
    for (int i = 0; i < NL; i++) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (u64)s;
        carry = (u64)(s >> 64);
    }
    // p is 446-bit: a+b < 2^447 fits without limb overflow (carry==0 here)
    if (fp_geq(r, P_MOD)) fp_sub_raw(r, r, P_MOD);
}

static inline void fp_sub(Fp &r, const Fp &a, const Fp &b) {
    u64 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
    if (borrow) {
        u64 carry = 0;
        for (int i = 0; i < NL; i++) {
            u128 s = (u128)r.v[i] + P_MOD.v[i] + carry;
            r.v[i] = (u64)s;
            carry = (u64)(s >> 64);
        }
    }
}

static inline void fp_dbl(Fp &r, const Fp &a) { fp_add(r, a, a); }

// CIOS Montgomery multiplication
static void fp_mul(Fp &r, const Fp &a, const Fp &b) {
    u64 t[NL + 2];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < NL; i++) {
        u64 c = 0;
        for (int j = 0; j < NL; j++) {
            u128 x = (u128)a.v[j] * b.v[i] + t[j] + c;
            t[j] = (u64)x;
            c = (u64)(x >> 64);
        }
        u128 x = (u128)t[NL] + c;
        t[NL] = (u64)x;
        t[NL + 1] = (u64)(x >> 64);

        u64 m = t[0] * N0;
        u128 y = (u128)m * P_MOD.v[0] + t[0];
        c = (u64)(y >> 64);
        for (int j = 1; j < NL; j++) {
            u128 z = (u128)m * P_MOD.v[j] + t[j] + c;
            t[j - 1] = (u64)z;
            c = (u64)(z >> 64);
        }
        u128 z = (u128)t[NL] + c;
        t[NL - 1] = (u64)z;
        t[NL] = t[NL + 1] + (u64)(z >> 64);
        t[NL + 1] = 0;
    }
    Fp out;
    for (int i = 0; i < NL; i++) out.v[i] = t[i];
    if (t[NL] || fp_geq(out, P_MOD)) fp_sub_raw(out, out, P_MOD);
    r = out;
}

static inline void fp_sqr(Fp &r, const Fp &a) { fp_mul(r, a, a); }

static void fp_inv(Fp &r, const Fp &a) {
    // Fermat: a^(p-2), square-and-multiply MSB-first
    Fp acc = ONE_M;
    for (int i = NL - 1; i >= 0; i--) {
        for (int b = 63; b >= 0; b--) {
            fp_sqr(acc, acc);
            if ((P_MINUS_2.v[i] >> b) & 1) fp_mul(acc, acc, a);
        }
    }
    r = acc;
}

// --------------------------------------------------------------------------
// Fp2 = Fp[u]/(u^2+1)
// --------------------------------------------------------------------------

struct Fp2 {
    Fp c0, c1;
};

static inline bool fp2_is_zero(const Fp2 &a) {
    return fp_is_zero(a.c0) && fp_is_zero(a.c1);
}
static inline bool fp2_eq(const Fp2 &a, const Fp2 &b) {
    return fp_eq(a.c0, b.c0) && fp_eq(a.c1, b.c1);
}
static inline void fp2_add(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    fp_add(r.c0, a.c0, b.c0);
    fp_add(r.c1, a.c1, b.c1);
}
static inline void fp2_sub(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    fp_sub(r.c0, a.c0, b.c0);
    fp_sub(r.c1, a.c1, b.c1);
}
static inline void fp2_dbl(Fp2 &r, const Fp2 &a) { fp2_add(r, a, a); }
static void fp2_mul(Fp2 &r, const Fp2 &a, const Fp2 &b) {
    Fp ac, bd, s1, s2, t;
    fp_mul(ac, a.c0, b.c0);
    fp_mul(bd, a.c1, b.c1);
    fp_add(s1, a.c0, a.c1);
    fp_add(s2, b.c0, b.c1);
    fp_mul(t, s1, s2);
    fp_sub(t, t, ac);
    fp_sub(t, t, bd);
    fp_sub(r.c0, ac, bd);
    r.c1 = t;
}
static void fp2_sqr(Fp2 &r, const Fp2 &a) {
    Fp s, d, m;
    fp_add(s, a.c0, a.c1);
    fp_sub(d, a.c0, a.c1);
    fp_mul(m, a.c0, a.c1);
    fp_mul(r.c0, s, d);
    fp_dbl(r.c1, m);
}
static void fp2_inv(Fp2 &r, const Fp2 &a) {
    Fp t0, t1;
    fp_sqr(t0, a.c0);
    fp_sqr(t1, a.c1);
    fp_add(t0, t0, t1);
    fp_inv(t0, t0);
    fp_mul(r.c0, a.c0, t0);
    Fp neg;
    Fp zero;
    memset(&zero, 0, sizeof(zero));
    fp_sub(neg, zero, a.c1);
    fp_mul(r.c1, neg, t0);
}

// --------------------------------------------------------------------------
// Field trait dispatch (templates over Fp / Fp2)
// --------------------------------------------------------------------------

template <class F> struct FOps;

template <> struct FOps<Fp> {
    static void add(Fp &r, const Fp &a, const Fp &b) { fp_add(r, a, b); }
    static void sub(Fp &r, const Fp &a, const Fp &b) { fp_sub(r, a, b); }
    static void mul(Fp &r, const Fp &a, const Fp &b) { fp_mul(r, a, b); }
    static void sqr(Fp &r, const Fp &a) { fp_sqr(r, a); }
    static void inv(Fp &r, const Fp &a) { fp_inv(r, a); }
    static bool is_zero(const Fp &a) { return fp_is_zero(a); }
    static bool eq(const Fp &a, const Fp &b) { return fp_eq(a, b); }
    static void set_one(Fp &r) { r = ONE_M; }
    static const int NBYTES = 56;
};

template <> struct FOps<Fp2> {
    static void add(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_add(r, a, b); }
    static void sub(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_sub(r, a, b); }
    static void mul(Fp2 &r, const Fp2 &a, const Fp2 &b) { fp2_mul(r, a, b); }
    static void sqr(Fp2 &r, const Fp2 &a) { fp2_sqr(r, a); }
    static void inv(Fp2 &r, const Fp2 &a) { fp2_inv(r, a); }
    static bool is_zero(const Fp2 &a) { return fp2_is_zero(a); }
    static bool eq(const Fp2 &a, const Fp2 &b) { return fp2_eq(a, b); }
    static void set_one(Fp2 &r) {
        r.c0 = ONE_M;
        memset(&r.c1, 0, sizeof(r.c1));
    }
    static const int NBYTES = 112;
};

// --------------------------------------------------------------------------
// Jacobian point arithmetic on y^2 = x^3 + b (a = 0 short Weierstrass)
// --------------------------------------------------------------------------

template <class F> struct Jac {
    F X, Y, Z; // Z == 0 -> infinity
};

template <class F> static inline bool jac_is_inf(const Jac<F> &p) {
    return FOps<F>::is_zero(p.Z);
}

template <class F> static void jac_dbl(Jac<F> &r, const Jac<F> &p) {
    typedef FOps<F> O;
    if (jac_is_inf(p)) {
        r = p;
        return;
    }
    F A, B, C, D, E, Ff, t;
    O::sqr(A, p.X);           // A = X^2
    O::sqr(B, p.Y);           // B = Y^2
    O::sqr(C, B);             // C = B^2
    O::add(t, p.X, B);
    O::sqr(t, t);
    O::sub(t, t, A);
    O::sub(t, t, C);
    O::add(D, t, t);          // D = 2((X+B)^2 - A - C)
    O::add(E, A, A);
    O::add(E, E, A);          // E = 3A
    O::sqr(Ff, E);            // F = E^2
    F X3, Y3, Z3;
    O::sub(X3, Ff, D);
    O::sub(X3, X3, D);        // X3 = F - 2D
    O::sub(t, D, X3);
    O::mul(t, E, t);
    F C8;
    O::add(C8, C, C);
    O::add(C8, C8, C8);
    O::add(C8, C8, C8);       // 8C
    O::sub(Y3, t, C8);        // Y3 = E(D - X3) - 8C
    O::mul(Z3, p.Y, p.Z);
    O::add(Z3, Z3, Z3);       // Z3 = 2YZ
    r.X = X3;
    r.Y = Y3;
    r.Z = Z3;
}

template <class F> static void jac_add(Jac<F> &r, const Jac<F> &p, const Jac<F> &q) {
    typedef FOps<F> O;
    if (jac_is_inf(p)) {
        r = q;
        return;
    }
    if (jac_is_inf(q)) {
        r = p;
        return;
    }
    F Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    O::sqr(Z1Z1, p.Z);
    O::sqr(Z2Z2, q.Z);
    O::mul(U1, p.X, Z2Z2);
    O::mul(U2, q.X, Z1Z1);
    O::mul(t, q.Z, Z2Z2);
    O::mul(S1, p.Y, t);
    O::mul(t, p.Z, Z1Z1);
    O::mul(S2, q.Y, t);
    if (O::eq(U1, U2)) {
        if (O::eq(S1, S2)) {
            jac_dbl(r, p);
        } else {
            memset(&r, 0, sizeof(r)); // infinity
        }
        return;
    }
    F H, I, J, rr, V;
    O::sub(H, U2, U1);
    O::add(I, H, H);
    O::sqr(I, I);             // I = (2H)^2
    O::mul(J, H, I);
    O::sub(rr, S2, S1);
    O::add(rr, rr, rr);       // r = 2(S2 - S1)
    O::mul(V, U1, I);
    F X3, Y3, Z3;
    O::sqr(X3, rr);
    O::sub(X3, X3, J);
    O::sub(X3, X3, V);
    O::sub(X3, X3, V);        // X3 = r^2 - J - 2V
    O::sub(t, V, X3);
    O::mul(t, rr, t);
    F S1J;
    O::mul(S1J, S1, J);
    O::add(S1J, S1J, S1J);
    O::sub(Y3, t, S1J);       // Y3 = r(V - X3) - 2 S1 J
    O::add(Z3, p.Z, q.Z);
    O::sqr(Z3, Z3);
    O::sub(Z3, Z3, Z1Z1);
    O::sub(Z3, Z3, Z2Z2);
    O::mul(Z3, Z3, H);        // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H
    r.X = X3;
    r.Y = Y3;
    r.Z = Z3;
}

// --------------------------------------------------------------------------
// byte <-> field conversions (LE bytes, Montgomery domain internally)
// --------------------------------------------------------------------------

static void fp_from_bytes(Fp &r, const uint8_t *b) {
    for (int i = 0; i < NL; i++) {
        u64 w = 0;
        for (int j = 7; j >= 0; j--) w = (w << 8) | b[i * 8 + j];
        r.v[i] = w;
    }
    fp_mul(r, r, R2); // into Montgomery domain
}

static void fp_to_bytes(uint8_t *b, const Fp &a) {
    Fp one;
    memset(&one, 0, sizeof(one));
    one.v[0] = 1;
    Fp n;
    fp_mul(n, a, one); // out of Montgomery domain (REDC by 1)
    for (int i = 0; i < NL; i++) {
        for (int j = 0; j < 8; j++) b[i * 8 + j] = (uint8_t)(n.v[i] >> (8 * j));
    }
}

template <class F> static void f_from_bytes(F &r, const uint8_t *b);
template <> void f_from_bytes<Fp>(Fp &r, const uint8_t *b) { fp_from_bytes(r, b); }
template <> void f_from_bytes<Fp2>(Fp2 &r, const uint8_t *b) {
    fp_from_bytes(r.c0, b);
    fp_from_bytes(r.c1, b + 56);
}
template <class F> static void f_to_bytes(uint8_t *b, const F &a);
template <> void f_to_bytes<Fp>(uint8_t *b, const Fp &a) { fp_to_bytes(b, a); }
template <> void f_to_bytes<Fp2>(uint8_t *b, const Fp2 &a) {
    fp_to_bytes(b, a.c0);
    fp_to_bytes(b + 56, a.c1);
}

template <class F> static bool bytes_all_zero(const uint8_t *b) {
    int n = 2 * FOps<F>::NBYTES;
    uint8_t acc = 0;
    for (int i = 0; i < n; i++) acc |= b[i];
    return acc == 0;
}

template <class F> static void point_from_bytes(Jac<F> &r, const uint8_t *b) {
    if (bytes_all_zero<F>(b)) {
        memset(&r, 0, sizeof(r));
        return;
    }
    f_from_bytes<F>(r.X, b);
    f_from_bytes<F>(r.Y, b + FOps<F>::NBYTES);
    FOps<F>::set_one(r.Z);
}

template <class F> static void point_to_bytes(uint8_t *b, const Jac<F> &p) {
    int n = 2 * FOps<F>::NBYTES;
    if (jac_is_inf(p)) {
        memset(b, 0, n);
        return;
    }
    F zi, zi2, zi3, x, y;
    FOps<F>::inv(zi, p.Z);
    FOps<F>::sqr(zi2, zi);
    FOps<F>::mul(zi3, zi2, zi);
    FOps<F>::mul(x, p.X, zi2);
    FOps<F>::mul(y, p.Y, zi3);
    f_to_bytes<F>(b, x);
    f_to_bytes<F>(b + FOps<F>::NBYTES, y);
}

// --------------------------------------------------------------------------
// scalar helpers (40-byte LE, up to 320 bits)
// --------------------------------------------------------------------------

static const int SC_BYTES = 40;
static const int SC_BITS = 320;

static inline u64 scalar_window(const uint8_t *s, int bit0, int width) {
    u64 w = 0;
    for (int i = width - 1; i >= 0; i--) {
        int bit = bit0 + i;
        int byte = bit >> 3;
        u64 b = (byte < SC_BYTES) ? ((s[byte] >> (bit & 7)) & 1) : 0;
        w = (w << 1) | b;
    }
    return w;
}

template <class F>
static void jac_scalar_mul(Jac<F> &r, const Jac<F> &p, const uint8_t *s) {
    Jac<F> acc;
    memset(&acc, 0, sizeof(acc));
    int top = SC_BITS - 1;
    while (top >= 0 && !((s[top >> 3] >> (top & 7)) & 1)) top--;
    for (int bit = top; bit >= 0; bit--) {
        jac_dbl(acc, acc);
        if ((s[bit >> 3] >> (bit & 7)) & 1) jac_add(acc, acc, p);
    }
    r = acc;
}

// --------------------------------------------------------------------------
// Pippenger MSM
// --------------------------------------------------------------------------

template <class F>
static void msm(uint8_t *out, const uint8_t *pts, const uint8_t *scalars, u64 n) {
    int psz = 2 * FOps<F>::NBYTES;
    std::vector<Jac<F>> points(n);
    for (u64 i = 0; i < n; i++) point_from_bytes<F>(points[i], pts + i * psz);

    int c = 2;
    while ((1u << c) < n && c < 16) c++; // window size ~ log2(n)
    int nbuckets = (1 << c) - 1;
    std::vector<Jac<F>> buckets(nbuckets);

    Jac<F> total;
    memset(&total, 0, sizeof(total));
    int nwin = (SC_BITS + c - 1) / c;
    for (int w = nwin - 1; w >= 0; w--) {
        for (int k = 0; k < c; k++) jac_dbl(total, total);
        for (int k = 0; k < nbuckets; k++) memset(&buckets[k], 0, sizeof(Jac<F>));
        for (u64 i = 0; i < n; i++) {
            u64 idx = scalar_window(scalars + i * SC_BYTES, w * c, c);
            if (idx) jac_add(buckets[idx - 1], buckets[idx - 1], points[i]);
        }
        Jac<F> acc, sum;
        memset(&acc, 0, sizeof(acc));
        memset(&sum, 0, sizeof(sum));
        for (int k = nbuckets - 1; k >= 0; k--) {
            jac_add(acc, acc, buckets[k]);
            jac_add(sum, sum, acc);
        }
        jac_add(total, total, sum);
    }
    point_to_bytes<F>(out, total);
}

// --------------------------------------------------------------------------
// fixed-base power chains: out[i] = alpha^(i+1) * base  (CRS generation)
// --------------------------------------------------------------------------

template <class F>
static void powers(uint8_t *out, const uint8_t *base, const uint8_t *alpha,
                   u64 count, int64_t skip) {
    int psz = 2 * FOps<F>::NBYTES;
    Jac<F> cur;
    point_from_bytes<F>(cur, base);
    std::vector<Jac<F>> res(count);
    for (u64 i = 0; i < count; i++) {
        jac_scalar_mul(cur, cur, alpha);
        res[i] = cur;
    }
    // batch inversion of the Z coordinates for affine output
    std::vector<F> zs, prefix;
    std::vector<u64> idx;
    for (u64 i = 0; i < count; i++) {
        if ((int64_t)i == skip || jac_is_inf(res[i])) continue;
        zs.push_back(res[i].Z);
        idx.push_back(i);
    }
    u64 m = zs.size();
    prefix.resize(m + 1);
    FOps<F>::set_one(prefix[0]);
    for (u64 i = 0; i < m; i++) FOps<F>::mul(prefix[i + 1], prefix[i], zs[i]);
    F inv_all;
    FOps<F>::inv(inv_all, prefix[m]);
    std::vector<F> zinv(m);
    for (u64 i = m; i-- > 0;) {
        FOps<F>::mul(zinv[i], inv_all, prefix[i]);
        FOps<F>::mul(inv_all, inv_all, zs[i]);
    }
    memset(out, 0, count * psz);
    for (u64 j = 0; j < m; j++) {
        u64 i = idx[j];
        F zi2, zi3, x, y;
        FOps<F>::sqr(zi2, zinv[j]);
        FOps<F>::mul(zi3, zi2, zinv[j]);
        FOps<F>::mul(x, res[i].X, zi2);
        FOps<F>::mul(y, res[i].Y, zi3);
        f_to_bytes<F>(out + i * psz, x);
        f_to_bytes<F>(out + i * psz + FOps<F>::NBYTES, y);
    }
}

// --------------------------------------------------------------------------
// C ABI
// --------------------------------------------------------------------------

extern "C" {

void bls446_init(const uint8_t *p56, const uint8_t *r2_56, u64 n0) {
    for (int i = 0; i < NL; i++) {
        u64 w = 0, w2 = 0;
        for (int j = 7; j >= 0; j--) {
            w = (w << 8) | p56[i * 8 + j];
            w2 = (w2 << 8) | r2_56[i * 8 + j];
        }
        P_MOD.v[i] = w;
        R2.v[i] = w2; // R2 arrives already reduced, raw (non-Montgomery) form
    }
    N0 = n0;
    // P_MINUS_2 = p - 2 (p is odd and > 2, no borrow past limb 0 structure)
    P_MINUS_2 = P_MOD;
    u64 borrow = 2;
    for (int i = 0; i < NL && borrow; i++) {
        u128 d = (u128)P_MINUS_2.v[i] - borrow;
        P_MINUS_2.v[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
    // Montgomery one = REDC(R2) = 2^448 mod p
    Fp one_raw;
    memset(&one_raw, 0, sizeof(one_raw));
    one_raw.v[0] = 1;
    fp_mul(ONE_M, one_raw, R2);
}

void bls446_g1_msm(const uint8_t *pts, const uint8_t *scalars, u64 n, uint8_t *out) {
    msm<Fp>(out, pts, scalars, n);
}

void bls446_g2_msm(const uint8_t *pts, const uint8_t *scalars, u64 n, uint8_t *out) {
    msm<Fp2>(out, pts, scalars, n);
}

void bls446_g1_powers(const uint8_t *base, const uint8_t *alpha, u64 count,
                      int64_t skip, uint8_t *out) {
    powers<Fp>(out, base, alpha, count, skip);
}

void bls446_g2_powers(const uint8_t *base, const uint8_t *alpha, u64 count,
                      int64_t skip, uint8_t *out) {
    powers<Fp2>(out, base, alpha, count, skip);
}

void bls446_g1_mul(const uint8_t *pt, const uint8_t *scalar, uint8_t *out) {
    Jac<Fp> p, r;
    point_from_bytes<Fp>(p, pt);
    jac_scalar_mul(r, p, scalar);
    point_to_bytes<Fp>(out, r);
}

void bls446_g2_mul(const uint8_t *pt, const uint8_t *scalar, uint8_t *out) {
    Jac<Fp2> p, r;
    point_from_bytes<Fp2>(p, pt);
    jac_scalar_mul(r, p, scalar);
    point_to_bytes<Fp2>(out, r);
}

} // extern "C"
