// Native host-side field/Poseidon engine.
//
// Role in the framework: the reference gets its *native* (non-circuit) hot
// paths from compiled Rust (ark-ff Montgomery backends); our host tier is
// python-int based (exact but slow).  This C++ engine provides the compiled
// host path: 4x64-limb Montgomery arithmetic (CIOS with __int128 carries),
// the Poseidon permutation, batched two-to-one compression, and full Merkle
// level builds — used for host-side proof generation/updates and as an
// independent cross-model oracle for the JAX kernels.
//
// Pure C ABI, loaded via ctypes (no pybind11 in this image).  All values
// are little-endian 4x64 limbs in Montgomery form unless noted; the Python
// side precomputes R^2 and -p^-1 mod 2^64 (setup is python-int exact).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct FieldCtx {
  u64 p[4];
  u64 r2[4];
  u64 n0;  // -p^{-1} mod 2^64
};

inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;  // equal
}

inline void sub_p(u64 a[4], const u64 p[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - p[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void add_mod(const FieldCtx* c, const u64 a[4], const u64 b[4], u64 out[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(out, c->p)) sub_p(out, c->p);
}

// CIOS Montgomery multiplication (Acar et al.)
inline void mont_mul(const FieldCtx* c, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a[j] * b[i] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * c->n0;
    carry = ((u128)t[0] + (u128)m * c->p[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * c->p[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (u64)cur3;
    t[4] = t[5] + (u64)(cur3 >> 64);
  }
  std::memcpy(out, t, 32);
  if (t[4] || geq(out, c->p)) sub_p(out, c->p);
}

inline void pow_u64(const FieldCtx* c, const u64 base[4], u64 e, const u64 one[4],
                    u64 out[4]) {
  u64 acc[4];
  std::memcpy(acc, one, 32);
  u64 sq[4];
  std::memcpy(sq, base, 32);
  while (e) {
    if (e & 1) mont_mul(c, acc, sq, acc);
    mont_mul(c, sq, sq, sq);
    e >>= 1;
  }
  std::memcpy(out, acc, 32);
}

struct PoseidonCtx {
  FieldCtx field;
  int t;
  u64 alpha;
  int full_rounds;
  int partial_rounds;
  u64 one[4];               // R mod p (Montgomery 1)
  std::vector<u64> ark;     // (R_F+R_P) * t * 4
  std::vector<u64> mds;     // t * t * 4
};

inline void permute_one(const PoseidonCtx* pc, u64* state /* t*4 */) {
  const FieldCtx* c = &pc->field;
  int t = pc->t;
  int rf2 = pc->full_rounds / 2;
  int total = pc->full_rounds + pc->partial_rounds;
  std::vector<u64> nw(t * 4);
  u64 term[4];
  for (int r = 0; r < total; ++r) {
    bool full = (r < rf2) || (r >= rf2 + pc->partial_rounds);
    const u64* ark_row = &pc->ark[(size_t)r * t * 4];
    for (int i = 0; i < t; ++i)
      add_mod(c, &state[i * 4], &ark_row[i * 4], &state[i * 4]);
    int nbox = full ? t : 1;
    for (int i = 0; i < nbox; ++i)
      pow_u64(c, &state[i * 4], pc->alpha, pc->one, &state[i * 4]);
    for (int i = 0; i < t; ++i) {
      u64 acc[4] = {0, 0, 0, 0};
      for (int j = 0; j < t; ++j) {
        mont_mul(c, &pc->mds[((size_t)i * t + j) * 4], &state[j * 4], term);
        add_mod(c, acc, term, acc);
      }
      std::memcpy(&nw[i * 4], acc, 32);
    }
    std::memcpy(state, nw.data(), (size_t)t * 32);
  }
}

}  // namespace

extern "C" {

FieldCtx* cpm_field_new(const u64 p[4], const u64 r2[4], u64 n0) {
  FieldCtx* c = new FieldCtx();
  std::memcpy(c->p, p, 32);
  std::memcpy(c->r2, r2, 32);
  c->n0 = n0;
  return c;
}

void cpm_field_free(FieldCtx* c) { delete c; }

void cpm_mont_mul(const FieldCtx* c, const u64* a, const u64* b, u64* out) {
  mont_mul(c, a, b, out);
}

void cpm_add(const FieldCtx* c, const u64* a, const u64* b, u64* out) {
  add_mod(c, a, b, out);
}

// batched: a, b, out are n*4 limb arrays
void cpm_mont_mul_batch(const FieldCtx* c, const u64* a, const u64* b, u64* out,
                        long n) {
  for (long i = 0; i < n; ++i) mont_mul(c, a + i * 4, b + i * 4, out + i * 4);
}

PoseidonCtx* cpm_poseidon_new(const u64 p[4], const u64 r2[4], u64 n0,
                              const u64 one[4], int t, u64 alpha, int full_rounds,
                              int partial_rounds, const u64* ark, const u64* mds) {
  PoseidonCtx* pc = new PoseidonCtx();
  std::memcpy(pc->field.p, p, 32);
  std::memcpy(pc->field.r2, r2, 32);
  pc->field.n0 = n0;
  std::memcpy(pc->one, one, 32);
  pc->t = t;
  pc->alpha = alpha;
  pc->full_rounds = full_rounds;
  pc->partial_rounds = partial_rounds;
  size_t nark = (size_t)(full_rounds + partial_rounds) * t * 4;
  pc->ark.assign(ark, ark + nark);
  pc->mds.assign(mds, mds + (size_t)t * t * 4);
  return pc;
}

void cpm_poseidon_free(PoseidonCtx* pc) { delete pc; }

// states: n * t * 4 limbs, Montgomery; permuted in place
void cpm_poseidon_permute(const PoseidonCtx* pc, u64* states, long n) {
  for (long i = 0; i < n; ++i) permute_one(pc, states + (size_t)i * pc->t * 4);
}

// two-to-one compression: capacity-1 duplex absorb(l), absorb(r), squeeze(1)
// == state [0, l, r] permuted once, output element 1 (rate>=2 configs).
void cpm_poseidon_two_to_one(const PoseidonCtx* pc, const u64* left,
                             const u64* right, u64* out, long n) {
  int t = pc->t;
  std::vector<u64> state((size_t)t * 4);
  for (long i = 0; i < n; ++i) {
    std::memset(state.data(), 0, (size_t)t * 32);
    std::memcpy(&state[4], left + i * 4, 32);
    std::memcpy(&state[8], right + i * 4, 32);
    permute_one(pc, state.data());
    std::memcpy(out + i * 4, &state[4], 32);
  }
}

// dense Merkle build over field digests: leaves n*4 -> nodes (n-1)*4 in
// level order (root first), mirroring merkle_tree/mod.rs layout.
void cpm_merkle_build(const PoseidonCtx* pc, const u64* leaves, long n,
                      u64* non_leaf) {
  // bottom non-leaf layer occupies indices [n/2 - 1, n - 1)
  long level = n / 2;
  long start = level - 1;
  {
    std::vector<u64> l((size_t)level * 4), r((size_t)level * 4);
    for (long i = 0; i < level; ++i) {
      std::memcpy(&l[i * 4], leaves + (2 * i) * 4, 32);
      std::memcpy(&r[i * 4], leaves + (2 * i + 1) * 4, 32);
    }
    cpm_poseidon_two_to_one(pc, l.data(), r.data(), non_leaf + start * 4, level);
  }
  while (level > 1) {
    long prev_start = start;
    level /= 2;
    start = level - 1;
    std::vector<u64> l((size_t)level * 4), r((size_t)level * 4);
    for (long i = 0; i < level; ++i) {
      std::memcpy(&l[i * 4], non_leaf + (prev_start + 2 * i) * 4, 32);
      std::memcpy(&r[i * 4], non_leaf + (prev_start + 2 * i + 1) * 4, 32);
    }
    cpm_poseidon_two_to_one(pc, l.data(), r.data(), non_leaf + start * 4, level);
  }
}

}  // extern "C"
