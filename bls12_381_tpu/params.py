"""BLS12-381 curve parameters (canonical integers) and limb configuration.

Parameter provenance (reference: zkcrypto/bls12_381 at /root/reference):
  - p:     src/fp.rs:69-77        (381-bit base field modulus)
  - q:     src/scalar.rs:75-81    (255-bit scalar field modulus, `Scalar`)
  - BLS_X: src/lib.rs:70-74       (BLS parameter z = -0xd201000000010000)
  - generators: src/notes/design.rs:12-62 (standard, spec-defined values)
  - scalar NTT constants: src/scalar.rs:99-222

Device limb configuration: the TPU has no native 64-bit integer multiply, so
field elements are tensors of 16-bit limbs held in uint32 lanes.  16-bit limbs
make the Montgomery radix R identical to the reference's (R = 2^384 = 2^(16*24)
for Fp, R = 2^256 = 2^(16*16) for Scalar), so device-side Montgomery values are
bit-identical to the reference's internal representation.
"""

# ---------------------------------------------------------------------------
# Field moduli
# ---------------------------------------------------------------------------

# Base field modulus p = (z-1)^2 (z^4 - z^2 + 1)/3 + z  (381 bits)
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# Scalar field modulus q = z^4 - z^2 + 1  (255 bits)
Q = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter z (stored as |z|; z itself is negative)
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

# Curve equations: G1: y^2 = x^3 + 4 over Fp; G2: y^2 = x^3 + 4(u+1) over Fp2
B_G1 = 4
B_G2 = (4, 4)  # 4 + 4u

# ---------------------------------------------------------------------------
# Cofactors (draft-irtf-cfrg-hash-to-curve-16 §8.8; reference src/g1.rs:800,
# src/g2.rs:934)
# ---------------------------------------------------------------------------

# G1 effective cofactor 1 - z = 1 + |z|
H_EFF_G1 = 0xD201000000010001
# G2 effective cofactor h_eff (draft-16 §8.8.2)
H_EFF_G2 = 0xBC69F08F2EE75B3584C6A0EA91B352888E2A8E9145AD7689986FF031508FFE1329C2F178731DB956D82BF015D1212B02EC0EC69D7477C1AE954CBC06689F6A359894C0ADEBBF6B4E8020005AAA95551

# ---------------------------------------------------------------------------
# Generators (canonical affine coordinates; standard spec values, cross-checked
# against tests/vectors/g1_uncompressed_valid_test_vectors.dat entry 1)
# ---------------------------------------------------------------------------

G1_GEN = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)

G2_GEN = (
    (
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    (
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)

# ---------------------------------------------------------------------------
# Scalar field NTT constants (reference src/scalar.rs:99-222)
# ---------------------------------------------------------------------------

FR_GENERATOR = 7          # multiplicative generator of Fq*
FR_S = 32                 # q - 1 = 2^32 * t with t odd
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, (Q - 1) >> FR_S, Q)  # 2^32-th root of unity

# ---------------------------------------------------------------------------
# Device limb configuration (radix 2^16 limbs in uint32 lanes)
# ---------------------------------------------------------------------------

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

FP_LIMBS = 24             # 24 * 16 = 384 bits;  R_fp = 2^384 (matches fp.rs:13)
FR_LIMBS = 16             # 16 * 16 = 256 bits;  R_fr = 2^256 (matches scalar.rs:20)

FP_R = 1 << (LIMB_BITS * FP_LIMBS)
FR_R = 1 << (LIMB_BITS * FR_LIMBS)

FP_R2 = FP_R * FP_R % P   # Montgomery conversion constant R^2 mod p
FR_R2 = FR_R * FR_R % Q

# -p^-1 mod 2^16 and -q^-1 mod 2^16 (per-limb Montgomery factor; the 16-bit
# analog of the reference's 64-bit INV, fp.rs:79-80 / scalar.rs:155-156)
FP_INV16 = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
FR_INV16 = (-pow(Q, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)


def to_limbs(value: int, n_limbs: int) -> list[int]:
    """Split an integer into n little-endian 16-bit limbs."""
    return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)]


def from_limbs(limbs) -> int:
    """Combine little-endian 16-bit limbs into an integer."""
    out = 0
    for i, l in enumerate(limbs):
        out |= int(l) << (LIMB_BITS * i)
    return out
