"""Low-discrepancy sequences (analog of ``util/lowdiscrepancy.h``).

The wavefront samplers built on these use only the first two Sobol'
dimensions with per-dimension random padding — exactly the reference's
PaddedSobolSampler / ZSobolSampler strategy (samplers.h:144,225), so the
9k-line direction-number tables reduce to two closed-form generator
matrices: dim 0 is the van der Corput identity (bit reversal) and dim 1
the Pascal/upper-triangular recurrence. Randomization is Owen scrambling
via the Laine-Karras style hash (util/lowdiscrepancy.h FastOwenScrambler)
— owen-scrambled Sobol keeps the O(1/N) variance for smooth integrands.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
# numpy scalar on purpose: jnp.float32(...) at module level would commit
# a device op at import time (breaks the CPU-pinned multichip dryrun).
_INV_2_32 = np.float32(2.3283064365386963e-10)


def reverse_bits32(v):
    v = v.astype(_U32)
    v = ((v << 16) | (v >> 16)) & _U32(0xFFFFFFFF)
    v = ((v & _U32(0x00FF00FF)) << 8) | ((v & _U32(0xFF00FF00)) >> 8)
    v = ((v & _U32(0x0F0F0F0F)) << 4) | ((v & _U32(0xF0F0F0F0)) >> 4)
    v = ((v & _U32(0x33333333)) << 2) | ((v & _U32(0xCCCCCCCC)) >> 2)
    v = ((v & _U32(0x55555555)) << 1) | ((v & _U32(0xAAAAAAAA)) >> 1)
    return v


def sobol_dim0(index):
    """First Sobol dimension = radical inverse base 2 (identity matrix)."""
    return reverse_bits32(index)


def sobol_dim1(index):
    """Second Sobol dimension (Pascal-matrix recurrence), branchless.

    v_0 = 0x80000000; v_{k+1} = v_k ^ (v_k >> 1); XOR v_k where bit k of
    index is set.
    """
    index = index.astype(_U32)
    result = jnp.zeros_like(index)
    v = jnp.full_like(index, 1 << 31)
    for k in range(32):  # static unroll of uint ops
        bit = (index >> _U32(k)) & _U32(1)
        result = result ^ (v * bit)
        v = v ^ (v >> _U32(1))
    return result


def fast_owen_scramble(v, seed):
    """Hash-based Owen scrambling on reversed bits (FastOwenScrambler)."""
    v = reverse_bits32(v)
    seed = seed.astype(_U32)
    v = v ^ (v * _U32(0x3D20ADEA))
    v = v + seed
    v = v * ((seed >> _U32(16)) | _U32(1))
    v = v ^ (v * _U32(0x05526C56))
    v = v ^ (v * _U32(0x53A22864))
    return reverse_bits32(v)


def u32_to_unit_float(v):
    """uint32 -> [0,1) float32 (strictly below 1)."""
    return jnp.minimum(v.astype(jnp.float32) * _INV_2_32,
                       jnp.float32(0.99999994))


def sobol_sample(index, sobol_dim, scramble_seed):
    """Owen-scrambled Sobol' point component in [0,1)."""
    v = sobol_dim1(index) if sobol_dim == 1 else sobol_dim0(index)
    v = fast_owen_scramble(v, scramble_seed)
    return u32_to_unit_float(v)


def permutation_element(i, n, seed):
    """Kensler-style stateless random permutation of [0,n) (pbrt
    PermutationElement): returns the position of element i under a random
    permutation keyed by seed. n may be a traced array (uint32)."""
    i = i.astype(_U32)
    n = n.astype(_U32) if hasattr(n, "astype") else _U32(n)
    seed = seed.astype(_U32)
    # w = bitmask of n-1
    w = n - _U32(1)
    w = w | (w >> 1)
    w = w | (w >> 2)
    w = w | (w >> 4)
    w = w | (w >> 8)
    w = w | (w >> 16)

    def rounds(i):
        i = i ^ seed
        i = i * _U32(0xE170893D)
        i = i ^ (seed >> _U32(16))
        i = i ^ ((i & w) >> _U32(4))
        i = i ^ (seed >> _U32(8))
        i = i * _U32(0x0929EB3F)
        i = i ^ (seed >> _U32(23))
        i = i ^ ((i & w) >> _U32(1))
        i = i * (_U32(1) | (seed >> _U32(27)))
        i = i * _U32(0x6935FA69)
        i = i ^ ((i & w) >> _U32(11))
        i = i * _U32(0x74DCB303)
        i = i ^ ((i & w) >> _U32(2))
        i = i * _U32(0x9E501CC3)
        i = i ^ ((i & w) >> _U32(2))
        i = i * _U32(0xC860A3DF)
        i = i & w
        i = i ^ (i >> _U32(5))
        return i

    # cycle-walk until inside [0, n); bounded tries suffice since w < 2n
    out = rounds(i)
    for _ in range(12):
        out = jnp.where(out >= n, rounds(out), out)
    out = jnp.where(out >= n, i, out)  # ~2^-13 fallback keeps validity
    return (out + seed) % n


# ---------------------------------------------------------------------------
# Full-dimensional Sobol' generator matrices
#
# The reference ships 1024 dims x 52 bits of precomputed direction numbers
# (util/sobolmatrices.cpp, 9.2k lines). Here the matrices are *generated* at
# import: primitive polynomials over GF(2) found by exhaustive order search,
# direction-number recurrence seeded with deterministic pseudorandom odd
# initial values (Bratley-Fox construction). Joe-Kuo's hand-optimized
# initial numbers mainly reduce structured 2D projections, which the
# per-dimension Owen scrambling we always apply randomizes anyway.
# ---------------------------------------------------------------------------

N_SOBOL_DIMS = 1024


def _gf2_mulmod(a, b, poly, s):
    """(a*b) mod poly over GF(2), poly of degree s (as int bitmasks)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> s & 1:
            a ^= poly
    return r


def _is_primitive(poly, s):
    """poly (degree s, bitmask incl. x^s term) primitive over GF(2)?"""
    n = (1 << s) - 1
    # factor n
    factors = []
    m = n
    d = 2
    while d * d <= m:
        if m % d == 0:
            factors.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        factors.append(m)

    def powx(e):
        r, base = 1, 2  # x
        while e:
            if e & 1:
                r = _gf2_mulmod(r, base, poly, s)
            base = _gf2_mulmod(base, base, poly, s)
            e >>= 1
        return r

    if powx(n) != 1:
        return False
    return all(powx(n // q) != 1 for q in factors)


def _primitive_polynomials(count):
    """First `count` primitive polynomials in degree order (bitmask incl.
    leading term); degree-1 'x+1' (0b11) first, matching the classic
    dimension assignment."""
    out = []
    s = 1
    while len(out) < count:
        for p in range(1 << s, 1 << (s + 1)):
            if not (p & 1):  # constant term required
                continue
            if _is_primitive(p, s):
                out.append((p, s))
                if len(out) == count:
                    break
        s += 1
    return out


def _generate_sobol_matrices(n_dims=N_SOBOL_DIMS, bits=32):
    """(n_dims, bits) uint32 direction numbers v_k, MSB-aligned."""
    import numpy as np

    mats = np.zeros((n_dims, bits), np.uint64)
    mats[0] = [1 << (31 - k) for k in range(bits)]  # identity (van der Corput)
    polys = _primitive_polynomials(n_dims - 1)
    rng = np.random.default_rng(0x5B0B01)
    for j, (poly, s) in enumerate(polys, start=1):
        a = [(poly >> (s - 1 - i)) & 1 for i in range(1, s)]  # interior coeffs
        m = [0] * (bits + 1)
        for i in range(1, min(s, bits) + 1):
            # odd initial value < 2^i; m_1 = 1 keeps the first column dense
            m[i] = 1 if i == 1 else (int(rng.integers(0, 1 << (i - 1))) * 2 + 1)
        for k in range(s + 1, bits + 1):
            v = m[k - s] ^ (m[k - s] << s)
            for i in range(1, s):
                if a[i - 1]:
                    v ^= m[k - i] << i
            m[k] = v
        for k in range(1, bits + 1):
            mats[j, k - 1] = m[k] << (32 - k)
    return (mats & 0xFFFFFFFF).astype(np.uint32)


_SOBOL_MATRICES = None


def sobol_matrices():
    """Cached (N_SOBOL_DIMS, 32) uint32 direction-number table (device)."""
    global _SOBOL_MATRICES
    if _SOBOL_MATRICES is None:
        _SOBOL_MATRICES = jnp.asarray(_generate_sobol_matrices())
    return _SOBOL_MATRICES


def sobol_u32(index, dim_idx):
    """Sobol' component for arbitrary (traced) dimension indices.

    index: (R,) uint32 sample indices; dim_idx: (R,) int32 dimension per
    lane (clipped to the table). Gathers each lane's 32 direction numbers
    and XOR-folds the set bits of index — a (R,32) gather + fused bit ops,
    fully vectorized.
    """
    mats = sobol_matrices()
    dim_idx = jnp.clip(dim_idx.astype(jnp.int32), 0, N_SOBOL_DIMS - 1)
    cols = mats[dim_idx]  # (R, 32)
    index = index.astype(_U32)
    bits = (index[..., None] >> jnp.arange(32, dtype=_U32)) & _U32(1)
    masked = cols * bits
    # XOR-fold the 32 columns (log-depth tree)
    v = masked
    for shift in (16, 8, 4, 2, 1):
        v = v[..., :shift] ^ v[..., shift:2 * shift]
    return v[..., 0]


# ---------------------------------------------------------------------------
# Halton: radical inverse in prime bases with affine digit scrambling
# (util/lowdiscrepancy.h RadicalInverse/ScrambledRadicalInverse semantics)
# ---------------------------------------------------------------------------

PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)
# digits of a uint32 in each base (ceil(32 / log2(base)))
_N_DIGITS = {2: 32, 3: 21, 5: 14, 7: 12, 11: 10, 13: 9, 17: 8, 19: 8,
             23: 8, 29: 7, 31: 7, 37: 6}


def radical_inverse(prime_index, index):
    """Van der Corput inverse of `index` in base PRIMES[prime_index]."""
    base = PRIMES[prime_index % len(PRIMES)]
    if base == 2:
        return u32_to_unit_float(reverse_bits32(index))
    index = index.astype(jnp.uint32)
    inv_base = 1.0 / base
    rev = jnp.zeros(index.shape, jnp.float32)
    scale = jnp.float32(1.0)
    for _ in range(_N_DIGITS[base]):
        digit = (index % _U32(base)).astype(jnp.float32)
        index = index // _U32(base)
        scale = scale * inv_base
        rev = rev + digit * scale
        # digits are consumed LSB-first and written MSB-first in value space:
        # accumulate digit * base^-(k+1) then shift earlier digits deeper
        rev = rev  # (kept explicit for clarity)
    return jnp.minimum(rev, jnp.float32(0.99999994))


def scrambled_radical_inverse(prime_index, index, seed):
    """Radical inverse with per-digit-position affine permutations
    (d -> (a*d + b) mod base, a coprime to the prime base), keyed by seed.
    Owen-style: the permutation at digit k also depends on the more
    significant consumed digits via the running index."""
    base = PRIMES[prime_index % len(PRIMES)]
    index = index.astype(jnp.uint32)
    seed = seed.astype(_U32) if hasattr(seed, "astype") else _U32(seed)
    inv_base = 1.0 / base
    rev = jnp.zeros(index.shape, jnp.float32)
    scale = jnp.float32(1.0)
    from . import rng as _rng

    for k in range(_N_DIGITS[base]):
        digit = index % _U32(base)
        index = index // _U32(base)
        h = _rng.hash_u32(seed, _U32(k), index, _U32(base))
        a = h % _U32(base - 1) + _U32(1)  # in [1, base)
        b = (h >> _U32(8)) % _U32(base)
        digit = (a * digit + b) % _U32(base)
        scale = scale * inv_base
        rev = rev + digit.astype(jnp.float32) * scale
    return jnp.minimum(rev, jnp.float32(0.99999994))


# ---------------------------------------------------------------------------
# ZSobol: Morton-shuffled Sobol (samplers.h ZSobolSampler:225 semantics)
# ---------------------------------------------------------------------------

def encode_morton2(x, y):
    """Interleave 16-bit x (even bits) and y (odd bits)."""
    def part1by1(v):
        v = v.astype(_U32) & _U32(0x0000FFFF)
        v = (v | (v << 8)) & _U32(0x00FF00FF)
        v = (v | (v << 4)) & _U32(0x0F0F0F0F)
        v = (v | (v << 2)) & _U32(0x33333333)
        v = (v | (v << 1)) & _U32(0x55555555)
        return v

    return part1by1(x) | (part1by1(y) << _U32(1))


# the 24 permutations of {0,1,2,3} (samplers.cpp ZSobol permutations table)
import itertools as _it
import numpy as _np

_PERM4 = _np.asarray(list(_it.permutations(range(4))), _np.int32)  # (24,4)


def zsobol_shuffled_index(morton, n_base4_digits, seed):
    """Hierarchically permute the base-4 digits of the Morton index, the
    permutation of each digit keyed by the hash of its more significant
    digits (ZSobolSampler::GetSampleIndex top-down walk)."""
    from . import rng as _rng

    morton = morton.astype(_U32)
    seed = seed.astype(_U32) if hasattr(seed, "astype") else _U32(seed)
    out = jnp.zeros_like(morton)
    for i in range(int(n_base4_digits)):
        digit_shift = _U32(2 * (int(n_base4_digits) - 1 - i))
        digit = (morton >> digit_shift) & _U32(3)
        higher = morton >> (digit_shift + _U32(2))
        p = _rng.hash_u32(higher, seed, _U32(i), _U32(0x55)) % _U32(24)
        digit = _PERM4[p, digit].astype(_U32)
        out = out | (digit << digit_shift)
    return out


# ---------------------------------------------------------------------------
# PMJ02 point sets (samplers.h PMJ02BNSampler:367 role)
#
# Progressive multi-jittered (0,2) sets: every prefix of an Owen-scrambled
# (0,2)-sequence is a pmj02 set (Christensen et al. 2018 note the
# equivalence class), so tables are generated from Sobol dims (0,1) under
# full per-dimension Owen scrambling instead of the reference's shipped
# blue-noise-optimized tables; pixel decorrelation uses hashed scrambles
# rather than the blue-noise pixel arrangement.
# ---------------------------------------------------------------------------


def generate_pmj02_table(n, seed=0):
    """Generate one pmj02 point set of n samples as a (n,2) float array
    (host-usable; progressive: every power-of-two prefix is stratified on
    all elementary (0,2) intervals)."""
    idx = jnp.arange(n, dtype=jnp.uint32)
    sx = jnp.uint32((seed * 0x9E3779B9 + 0x1234567) & 0xFFFFFFFF)
    sy = jnp.uint32((seed * 0x85EBCA6B + 0x89ABCD) & 0xFFFFFFFF)
    x = fast_owen_scramble(sobol_dim0(idx), jnp.full(n, sx, jnp.uint32))
    y = fast_owen_scramble(sobol_dim1(idx), jnp.full(n, sy, jnp.uint32))
    return jnp.stack([u32_to_unit_float(x), u32_to_unit_float(y)], -1)
