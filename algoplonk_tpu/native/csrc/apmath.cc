// Native host math for algoplonk_tpu.
//
// Plays the role gnark-crypto's amd64/arm64 assembly plays for the reference
// (the hot host-side layer under algoplonk.go:89): fast batch conversions
// between canonical big-endian bytes and the TPU limb format, and a 64-bit
// Montgomery field implementation used both as a golden reference for the
// device kernels and as the fast path for host-side witness/SRS marshalling.
//
// Build: make native   (produces libapmath.so, loaded via ctypes)

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr int MAXL = 6;  // up to 384-bit moduli

struct Ctx {
  u64 nlimbs;      // 64-bit limb count (4 or 6)
  u64 mod[MAXL];   // modulus, little-endian limbs
  u64 n0inv;       // -mod^-1 mod 2^64
  u64 r2[MAXL];    // R^2 mod mod (R = 2^(64*nlimbs))
  u64 one[MAXL];   // R mod mod (Montgomery 1)
};

static_assert(sizeof(Ctx) == 8 * (2 + 3 * MAXL), "ctx layout");

inline int geq(const u64* a, const u64* b, int L) {
  for (int i = L - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return 1;
}

inline void sub_mod_once(u64* a, const u64* mod, int L) {
  if (!geq(a, mod, L)) return;
  u128 borrow = 0;
  for (int i = 0; i < L; ++i) {
    u128 t = (u128)a[i] - mod[i] - borrow;
    a[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
}

// CIOS Montgomery multiplication.
inline void mont_mul(const Ctx* c, const u64* a, const u64* b, u64* out) {
  const int L = (int)c->nlimbs;
  u64 t[MAXL + 2] = {0};
  for (int i = 0; i < L; ++i) {
    u128 carry = 0;
    for (int j = 0; j < L; ++j) {
      u128 cur = (u128)a[j] * b[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[L] + carry;
    t[L] = (u64)cur;
    t[L + 1] = (u64)(cur >> 64);

    u64 m = t[0] * c->n0inv;
    carry = ((u128)m * c->mod[0] + t[0]) >> 64;
    for (int j = 1; j < L; ++j) {
      u128 cur2 = (u128)m * c->mod[j] + t[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[L] + carry;
    t[L - 1] = (u64)cur3;
    t[L] = t[L + 1] + (u64)(cur3 >> 64);
    t[L + 1] = 0;
  }
  std::memcpy(out, t, 8 * L);
  sub_mod_once(out, c->mod, L);
}

inline void add_mod(const Ctx* c, const u64* a, const u64* b, u64* out) {
  const int L = (int)c->nlimbs;
  u128 carry = 0;
  u64 tmp[MAXL];
  for (int i = 0; i < L; ++i) {
    u128 t = (u128)a[i] + b[i] + carry;
    tmp[i] = (u64)t;
    carry = t >> 64;
  }
  // carry can only be set for moduli near 2^384; with our curves headroom
  // exists, but subtract anyway when >= mod
  std::memcpy(out, tmp, 8 * L);
  sub_mod_once(out, c->mod, L);
}

inline void sub_mod(const Ctx* c, const u64* a, const u64* b, u64* out) {
  const int L = (int)c->nlimbs;
  u128 borrow = 0;
  for (int i = 0; i < L; ++i) {
    u128 t = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < L; ++i) {
      u128 t = (u128)out[i] + c->mod[i] + carry;
      out[i] = (u64)t;
      carry = t >> 64;
    }
  }
}

}  // namespace

extern "C" {

// ctx must point to at least sizeof(Ctx)/8 u64s. Returns 0 on success.
int ap_field_init(const uint8_t* mod_be, int nbytes, u64* ctx_out) {
  Ctx* c = reinterpret_cast<Ctx*>(ctx_out);
  std::memset(c, 0, sizeof(Ctx));
  int L = (nbytes + 7) / 8;
  if (L > MAXL) return 1;
  c->nlimbs = L;
  // big-endian bytes -> little-endian limbs
  for (int i = 0; i < nbytes; ++i) {
    int bit = 8 * (nbytes - 1 - i);
    c->mod[bit / 64] |= (u64)mod_be[i] << (bit % 64);
  }
  // n0inv = -mod^-1 mod 2^64 (Newton iteration)
  u64 m0 = c->mod[0];
  u64 inv = 1;
  for (int i = 0; i < 6; ++i) inv *= 2 - m0 * inv;
  c->n0inv = (u64)(0 - inv);
  // one = R mod m via repeated doubling of 1 shifted 64*L times
  u64 acc[MAXL] = {1};
  for (int s = 0; s < 64 * L; ++s) {
    // acc = 2*acc mod m
    u128 carry = 0;
    for (int i = 0; i < L; ++i) {
      u128 t = ((u128)acc[i] << 1) | carry;
      acc[i] = (u64)t;
      carry = t >> 64;
    }
    if (carry || geq(acc, c->mod, L)) {
      u128 borrow = 0;
      for (int i = 0; i < L; ++i) {
        u128 t = (u128)acc[i] - c->mod[i] - borrow;
        acc[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
      }
    }
  }
  std::memcpy(c->one, acc, 8 * L);
  // r2 = one^2 * R ... compute by shifting one another 64*L bits
  for (int s = 0; s < 64 * L; ++s) {
    u128 carry = 0;
    for (int i = 0; i < L; ++i) {
      u128 t = ((u128)acc[i] << 1) | carry;
      acc[i] = (u64)t;
      carry = t >> 64;
    }
    if (carry || geq(acc, c->mod, L)) {
      u128 borrow = 0;
      for (int i = 0; i < L; ++i) {
        u128 t = (u128)acc[i] - c->mod[i] - borrow;
        acc[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
      }
    }
  }
  std::memcpy(c->r2, acc, 8 * L);
  return 0;
}

void ap_mont_mul_batch(const u64* ctx, const u64* a, const u64* b, u64* out,
                       long n) {
  const Ctx* c = reinterpret_cast<const Ctx*>(ctx);
  const int L = (int)c->nlimbs;
  for (long i = 0; i < n; ++i)
    mont_mul(c, a + i * L, b + i * L, out + i * L);
}

void ap_add_batch(const u64* ctx, const u64* a, const u64* b, u64* out, long n) {
  const Ctx* c = reinterpret_cast<const Ctx*>(ctx);
  const int L = (int)c->nlimbs;
  for (long i = 0; i < n; ++i) add_mod(c, a + i * L, b + i * L, out + i * L);
}

void ap_sub_batch(const u64* ctx, const u64* a, const u64* b, u64* out, long n) {
  const Ctx* c = reinterpret_cast<const Ctx*>(ctx);
  const int L = (int)c->nlimbs;
  for (long i = 0; i < n; ++i) sub_mod(c, a + i * L, b + i * L, out + i * L);
}

void ap_to_mont_batch(const u64* ctx, const u64* a, u64* out, long n) {
  const Ctx* c = reinterpret_cast<const Ctx*>(ctx);
  const int L = (int)c->nlimbs;
  for (long i = 0; i < n; ++i) mont_mul(c, a + i * L, c->r2, out + i * L);
}

void ap_from_mont_batch(const u64* ctx, const u64* a, u64* out, long n) {
  const Ctx* c = reinterpret_cast<const Ctx*>(ctx);
  const int L = (int)c->nlimbs;
  u64 one_raw[MAXL] = {1, 0, 0, 0, 0, 0};
  for (long i = 0; i < n; ++i) mont_mul(c, a + i * L, one_raw, out + i * L);
}

// ---------------------------------------------------------------- packing
// Conversions between canonical big-endian byte strings and the device's
// 12-bit little-endian limb format (int32 lanes) — the layout contract of
// fields/limbs.py.

// bit offset of limb j is 12j, so offset mod 8 is always 0 or 4 and a limb
// spans exactly two little-endian bytes.

void ap_be_to_limbs12(const uint8_t* be, int nbytes, int32_t* out, int nlimbs,
                      long n) {
  for (long k = 0; k < n; ++k) {
    const uint8_t* src = be + k * nbytes;
    int32_t* dst = out + k * nlimbs;
    for (int j = 0; j < nlimbs; ++j) {
      int bit0 = 12 * j;
      int byte_le = bit0 / 8;
      int off = bit0 % 8;  // 0 or 4
      uint32_t v = 0;
      if (byte_le < nbytes) v |= (uint32_t)src[nbytes - 1 - byte_le] >> off;
      if (byte_le + 1 < nbytes)
        v |= (uint32_t)src[nbytes - 2 - byte_le] << (8 - off);
      dst[j] = (int32_t)(v & 0xFFF);
    }
  }
}

void ap_limbs12_to_be(const int32_t* limbs, int nlimbs, uint8_t* be,
                      int nbytes, long n) {
  for (long k = 0; k < n; ++k) {
    const int32_t* src = limbs + k * nlimbs;
    uint8_t* dst = be + k * nbytes;
    std::memset(dst, 0, nbytes);
    for (int j = 0; j < nlimbs; ++j) {
      uint32_t v = (uint32_t)(src[j] & 0xFFF);
      int bit0 = 12 * j;
      int byte_le = bit0 / 8;
      int off = bit0 % 8;  // 0 or 4
      if (byte_le < nbytes)
        dst[nbytes - 1 - byte_le] |= (uint8_t)((v << off) & 0xFF);
      if (byte_le + 1 < nbytes)
        dst[nbytes - 2 - byte_le] |= (uint8_t)((v >> (8 - off)) & 0xFF);
    }
  }
}

long ap_version() { return 1; }

}  // extern "C"
